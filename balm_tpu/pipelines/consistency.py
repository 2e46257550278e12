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


def run(cfg: ConsistencyConfig = ConsistencyConfig(), *, verbose: bool = False,
        scans_override=None):
    """Returns dict with nees, expected, pose errors, covariance."""
    if scans_override is not None:
        R, p, scans = scans_override
    else:
        R, p, scans = load(cfg)
    W_all = len(scans)
    fix = cfg.fix_size
    W = W_all - fix

    vres = grid.voxelize(
        scans, R, p, cfg.voxel, dtype=np.float64, weighting="unit"
    )
    f_all = vres.factors
    G = f_all.C.shape[0]  # padded size

    # marginalize the first fix scans at their (noise-free) poses
    T_all = np.asarray(lie.pose_matrix(jnp.asarray(R), jnp.asarray(p)))
    f = marginalize.marginalize(
        f_all, T_all[:fix], fix, weighting="unit"
    )

    # corrupt raw window points and rebuild the window moments
    rng = np.random.default_rng(cfg.seed)
    body = np.concatenate(scans)
    scan_id = vres.point_scan
    keep = scan_id >= fix
    C_noisy = corrupt_and_rebuild(
        body, scan_id - fix, vres.point_leaf, keep, G, W, rng, cfg.pnoise
    )
    f = f._replace(C=C_noisy)

    # ground-truth (noise-free) window trajectory
    R_gt, p_gt = R[fix:], p[fix:]

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
    out = {
        "nees": nees,
        "expected": 6 * W,
        "ratio": nees / (6 * W),
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
