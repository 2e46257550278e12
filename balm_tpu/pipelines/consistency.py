"""Statistical-consistency (NEES) experiment — the reference's `consistency`
node (src/simulation/consistency.cpp), the strongest correctness oracle:
it validates gradient, Hessian AND covariance propagation jointly.

Protocol (consistency.cpp:96-199, BAs_left.hpp:13-21):
  1. load 101 simulator poses + scans (datas/consistency)
  2. voxelize all 101 scans (voxel 1 m, layer_limit 0, ratio 1/64,
     min_ps 10, no min-observer gate, unit weights)
  3. marginalize the first scan into the fixed clusters (fix_size = 1) —
     this anchors the gauge, making H invertible
  4. corrupt the remaining points with iid N(0, pnoise^2) noise and
     rebuild the window clusters (OCTO_TREE_NODE::corrupt,
     BAs_left.hpp:886-907)
  5. solve (u0 = 0.01, <= 1000 iters, |dres| < 1e-9, NO gauge fix)
  6. Rcov = H^{-1} (sum L ccov L^T) H^{-T}; NEES = err^T Rcov^{-1} err
     with the left-invariant error vs the noise-free trajectory;
     E[NEES] = 6 * win_size (consistency.cpp:160-179)
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..config import SolverConfig, VoxelConfig
from ..io import pcd, poses
from ..ops import clusters, covariance, factors as Fmod, lie
from ..solver import lm
from ..voxel import grid, marginalize


@dataclasses.dataclass
class ConsistencyConfig:
    data_dir: str = "/root/reference/datas/consistency"
    num_scans: int = 101
    fix_size: int = 1
    pnoise: float = 0.02            # launch/consistency.launch pnoise
    seed: int = 0
    # the consistency build's extra plane gates (BAs_left.hpp:674):
    # max point deviation along the normal, lambda_2/lambda_1 cap, and an
    # absolute lambda_0 cap — all evaluated on the NOISE-FREE clusters
    # before corruption
    gate_max_dis: float = 0.001
    gate_l2_l1: float = 25.0
    gate_l0_abs: float = 1e-10
    use_variant_gates: bool = True
    voxel: VoxelConfig = VoxelConfig(
        voxel_size=1.0,
        layer_limit=0,
        eigen_ratio=(1.0 / 64,),
        min_points=10,
        min_observers=1,
    )
    solver: SolverConfig = SolverConfig(
        max_iters=1000, u_init=0.01, rel_tol=0.0, abs_tol=1e-9,
        min_planes_per_pose=1, gauge_fix=False,
    )
    # 'xla' = the f64 oracle path (reference protocol); 'packed' = the
    # PRODUCTION TPU path: f32 centered body-recentered factors through
    # the packed evaluator (hess_precision='high'), with the covariance
    # H taken from the SAME evaluator at the converged estimate — the
    # deepest oracle run against the configuration users actually get.
    backend: str = "xla"
    # build the voxel map INCREMENTALLY, scan by scan, exactly as the
    # reference streams them (cut_voxel per scan into a persistent map,
    # recut/harvest once the window fills — consistency.cpp:127-136);
    # False = one-shot batch association (equivalent final state,
    # tests/test_voxelize.py::test_streaming_voxelizer_equals_batch)
    streaming: bool = False


def load(cfg: ConsistencyConfig):
    d = pathlib.Path(cfg.data_dir)
    R, p, _ = poses.read_pose_csv(d / "lidarPose.csv", cfg.num_scans)
    p = p - p[0]                       # consistency.cpp:85-88
    scans = [
        pcd.read_pcd_xyz(d / f"{m + 1}.pcd", np.float64)
        for m in range(cfg.num_scans)
    ]
    return R, p, scans


def corrupt_and_rebuild(body, scan_id, point_leaf, keep_mask, G, W, rng, pnoise):
    """Re-noise raw points and rebuild per-(plane, scan) window moments
    (OCTO_TREE_NODE::corrupt, BAs_left.hpp:886-907)."""
    noisy = body + rng.normal(0.0, pnoise, size=body.shape)
    sel = keep_mask & (point_leaf >= 0)
    seg = point_leaf[sel] * W + scan_id[sel]
    C = grid._moment_bincount(noisy[sel], seg, G * W)
    return C.reshape(G, W, 4, 4)


def variant_gates(vres, scans, R, p, cfg: ConsistencyConfig):
    """The consistency build's extra plane gates (BAs_left.hpp:674),
    evaluated on the noise-free clusters: returns a (G,) keep mask."""
    f = vres.factors
    G = f.C.shape[0]
    T = lie.pose_matrix(jnp.asarray(R), jnp.asarray(p))
    TC = jnp.einsum("wab,gwbc->gwac", T, jnp.asarray(f.C))
    Q = jnp.asarray(f.Cfix) + jnp.einsum("gwac,wdc->gad", TC, T)
    N = jnp.maximum(Q[:, 3, 3], 1.0)
    c = Q[:, :3, 3] / N[:, None]
    cov = Q[:, :3, :3] / N[:, None, None] - c[:, :, None] * c[:, None, :]
    lam, U = np.linalg.eigh(np.asarray(cov))
    keep = lam[:, 2] / np.maximum(lam[:, 1], 1e-300) < cfg.gate_l2_l1
    keep &= lam[:, 0] < cfg.gate_l0_abs

    # max point deviation along the normal, per leaf (vectorized)
    body = np.concatenate(scans)
    sid = vres.point_scan
    world = np.einsum(
        "nab,nb->na", np.asarray(R)[sid], body) + np.asarray(p)[sid]
    leaf = vres.point_leaf
    sel = leaf >= 0
    nrm = np.asarray(U[:, :, 0])
    dev = np.abs(np.einsum(
        "na,na->n", world[sel] - np.asarray(c)[leaf[sel]],
        nrm[leaf[sel]]))
    max_dis = np.zeros(G)
    np.maximum.at(max_dis, leaf[sel], dev)
    keep &= max_dis < cfg.gate_max_dis
    return keep


def prepare(cfg: ConsistencyConfig, *, scans_override=None):
    """Seed-independent setup: load, voxelize, gate, marginalize.
    Returns (R, p, scans, vres, f_marginalized)."""
    if scans_override is not None:
        R, p, scans = scans_override
    else:
        R, p, scans = load(cfg)
    fix = cfg.fix_size
    if cfg.streaming:
        sv = grid.StreamingVoxelizer(len(scans), cfg.voxel)
        for m, s in enumerate(scans):       # consistency.cpp:127
            sv.insert(m, s, R[m], p[m])
        vres = sv.finalize(weighting="unit")
    else:
        vres = grid.voxelize(
            scans, R, p, cfg.voxel, dtype=np.float64, weighting="unit"
        )
    f_all = vres.factors
    if cfg.use_variant_gates:
        keep = variant_gates(vres, scans, R, p, cfg)
        f_all = f_all._replace(
            coe=jnp.asarray(np.where(keep, np.asarray(f_all.coe), 0.0)))
    T_all = np.asarray(lie.pose_matrix(jnp.asarray(R), jnp.asarray(p)))
    f = marginalize.marginalize(f_all, T_all[:fix], fix, weighting="unit")
    return R, p, scans, vres, f


def run_multi(cfg: ConsistencyConfig = ConsistencyConfig(),
              seeds=tuple(range(10)), *, verbose: bool = False,
              scans_override=None):
    """Monte-Carlo NEES protocol (consistency.cpp:181-197): repeat the
    corrupt-solve-NEES experiment over seeds; report mean ratio and a
    normal-approximation confidence interval.  E[NEES] = 6W; for one
    chi-square_{6W} sample Var = 2*6W, so the mean ratio over S seeds has
    sd = sqrt(2/(6W S))."""
    prepared = prepare(cfg, scans_override=scans_override)
    runs = []
    for s in seeds:
        out = run(dataclasses.replace(cfg, seed=int(s)),
                  _prepared=prepared, verbose=verbose)
        runs.append(out)
    W = len(prepared[2]) - cfg.fix_size
    ratios = np.array([r["ratio"] for r in runs])
    sd_theory = float(np.sqrt(2.0 / (6 * W * len(seeds))))
    # per-pose protocol (consistency.cpp:181-197): mean per-pose NEES
    # over seeds is chi^2_6/6-distributed around 1 with
    # sd = sqrt(12/S)/6 per pose; the 3-sigma bound check counts the
    # fraction of standardized per-component errors inside +-3
    S = len(seeds)
    nees_pose = np.stack([r["nees_pose"] for r in runs])   # (S, W)
    std_err = np.stack([r["std_err"] for r in runs])       # (S, W, 6)
    pose_sd = float(np.sqrt(12.0 / S) / 6.0)
    return {
        "seeds": list(map(int, seeds)),
        "ratios": ratios.tolist(),
        "mean_ratio": float(ratios.mean()),
        "sd_ratio": float(ratios.std(ddof=1)) if len(seeds) > 1 else 0.0,
        "sd_theory_of_mean": sd_theory,
        "expected": 6 * W,
        "nees": [r["nees"] for r in runs],
        "num_planes": runs[0]["num_planes"],
        "nees_pose_mean_ratio": (nees_pose.mean(axis=0) / 6.0).tolist(),
        "nees_pose_band_3sigma": [1.0 - 3 * pose_sd, 1.0 + 3 * pose_sd],
        "frac_within_3sigma": float(np.mean(np.abs(std_err) <= 3.0)),
        "frac_within_2sigma": float(np.mean(np.abs(std_err) <= 2.0)),
    }


def run(cfg: ConsistencyConfig = ConsistencyConfig(), *, verbose: bool = False,
        scans_override=None, _prepared=None):
    """Returns dict with nees, expected, pose errors, covariance.

    _prepared: optional output of prepare() — lets the multi-seed sweep
    reuse the (seed-independent) association and marginalization.
    """
    if _prepared is not None:
        R, p, scans, vres, f = _prepared
    else:
        R, p, scans, vres, f = prepare(cfg, scans_override=scans_override)
    W_all = len(scans)
    fix = cfg.fix_size
    W = W_all - fix
    G = vres.factors.C.shape[0]  # padded size

    # corrupt raw window points and rebuild the window moments
    rng = np.random.default_rng(cfg.seed)
    body = np.concatenate(scans)
    scan_id = vres.point_scan
    keep_pts = scan_id >= fix
    C_noisy = corrupt_and_rebuild(
        body, scan_id - fix, vres.point_leaf, keep_pts, G, W, rng,
        cfg.pnoise
    )
    f = f._replace(C=C_noisy)

    # ground-truth (noise-free) window trajectory
    R_gt, p_gt = R[fix:], p[fix:]

    if cfg.backend == "packed":
        # PRODUCTION PATH: f32, centered, body-recentered factors through
        # the packed evaluator — solve and covariance H from the same
        # code path users run on TPU.  recenter_bodies stays f64 numpy
        # (the one place the cancellation must happen in f64), exactly as
        # in the production realworld pipeline.
        from ..ops import packed as packed_mod
        from ..ops import pallas_evaluate as pe
        import jax

        fr = Fmod.recenter_bodies(f).astype(jnp.float32)
        fr = jax.tree_util.tree_map(jnp.asarray, fr)
        # f32 cannot resolve the f64 protocol's 1e-9 absolute residual
        # deltas (cost ~0.5, f32 step noise ~1e-6): stop at the f32
        # floor — measured convergence to the same pose set in ~10 vs
        # 1000 iters with identical NEES to 4 digits
        scfg = dataclasses.replace(
            cfg.solver, abs_tol=max(cfg.solver.abs_tol, 1e-6))
        res = lm.damping_iter(
            jnp.asarray(R_gt, jnp.float32), jnp.asarray(p_gt, jnp.float32),
            fr, scfg, centered=True, backend="packed",
            hess_precision="high")
        Rw = np.asarray(res.R, np.float64)
        pw = np.asarray(res.p, np.float64)

        # covariance: H from the SAME packed path at the converged poses
        pkf = packed_mod.pack_factors(fr)
        interp = jax.default_backend() != "tpu"
        _, _, H32 = pe.evaluate_packed(
            res.R, res.p, pkf, interpret=interp,
            hess_precision=jax.lax.Precision.HIGH)
        H = np.asarray(H32, np.float64)
        # the noise-propagation rhs is the EXPERIMENT's noise model, not a
        # production quantity — it stays on the f64 oracle path (raw
        # uncentered moments in f32 would hit exactly the cancellation
        # recenter_bodies exists to avoid); what this mode tests is the
        # production solve + the production H
        fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in f])
        T_est = lie.pose_matrix(jnp.asarray(Rw), jnp.asarray(pw))
        ccov = clusters.stat_noise_cov(fj.C, cfg.pnoise)
        rhs = np.asarray(
            covariance.scatter_jacobian_rhs(T_est, fj, ccov), np.float64)
        Rcov = np.linalg.solve(H, np.linalg.solve(H, rhs).T).T
    else:
        res = lm.damping_iter(
            jnp.asarray(R_gt), jnp.asarray(p_gt),
            Fmod.PlaneFactors(*[jnp.asarray(x) for x in f]),
            cfg.solver,
        )
        Rw = np.asarray(res.R)
        pw = np.asarray(res.p)

        # covariance at the converged estimate
        T_est = lie.pose_matrix(jnp.asarray(Rw), jnp.asarray(pw))
        fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in f])
        ccov = clusters.stat_noise_cov(fj.C, cfg.pnoise)
        Rcov = np.asarray(covariance.pose_covariance(T_est, fj, ccov))

    # left-invariant error vs gt (consistency.cpp:168-175)
    err = np.zeros(6 * W)
    for i in range(W):
        Rr = R_gt[i] @ Rw[i].T
        err[6 * i:6 * i + 3] = np.asarray(lie.so3_log(jnp.asarray(Rr)))
        err[6 * i + 3:6 * i + 6] = -Rr @ pw[i] + p_gt[i]

    nees = float(err @ np.linalg.solve(Rcov, err))
    # per-pose NEES (the reference's commented multi-run protocol,
    # consistency.cpp:181-189): err_i^T Rcov[ii]^{-1} err_i against the
    # 6x6 marginal block, E = 6 per pose
    errW = err.reshape(W, 6)
    blocks = Rcov.reshape(W, 6, W, 6)[np.arange(W), :, np.arange(W), :]
    nees_pose = np.einsum(
        "wi,wi->w", errW, np.linalg.solve(blocks, errW[..., None])[..., 0])
    # 3-sigma bound check (consistency.cpp:190-197): per-component
    # standardized errors |err| / sigma from the covariance diagonal
    sig = np.sqrt(np.maximum(np.diagonal(Rcov), 1e-300)).reshape(W, 6)
    out = {
        "nees": nees,
        "expected": 6 * W,
        "ratio": nees / (6 * W),
        "nees_pose": nees_pose,
        "std_err": errW / sig,
        "iters": int(res.iters),
        "residual": float(res.residual),
        "num_planes": vres.num_planes,
        "err_rot_rms_deg": float(
            np.sqrt(np.mean(err.reshape(W, 6)[:, :3] ** 2)) * 57.2958
        ),
        "err_trans_rms_m": float(
            np.sqrt(np.mean(err.reshape(W, 6)[:, 3:] ** 2))
        ),
        "Rcov": Rcov,
        "err": err,
    }
    if verbose:
        print(
            f"NEES {nees:.1f} (expected {6 * W}, ratio {out['ratio']:.3f}) "
            f"planes {vres.num_planes} iters {out['iters']}"
        )
    return out
