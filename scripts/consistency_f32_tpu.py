"""NEES through the PRODUCTION f32 packed path, solve on the real TPU.

Round-4 verdict item 3.  Three phases (separate processes, because the
noise-model f64 math needs CPU x64 while the production solve runs on the
TPU with x64 off):

  prep  (CPU, x64): load + voxelize + gate + marginalize the consistency
        dataset, corrupt per seed, recenter -> save f32 factors + the raw
        f64 factors per seed.
  solve (TPU):      damping_iter(backend='packed', hess_precision='high')
        per seed + the covariance H from the SAME packed evaluator at the
        converged poses.
  nees  (CPU, x64): f64 noise-propagation rhs, Rcov = H^-1 rhs H^-T with
        the TPU H, NEES vs the noise-free trajectory; aggregate the
        multi-seed bands (consistency.cpp:160-197 protocol).

Run: python scripts/consistency_f32_tpu.py          # orchestrates all 3
     python scripts/consistency_f32_tpu.py <phase>  # one phase
"""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
WORK = ROOT / "artifacts" / "consistency_f32_tpu"
SEEDS = list(range(10))


def phase_prep():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from balm_tpu.ops import factors as Fmod
    from balm_tpu.pipelines import consistency

    cfg = consistency.ConsistencyConfig()
    R, p, scans, vres, f = consistency.prepare(cfg)
    fix = cfg.fix_size
    W = len(scans) - fix
    G = vres.factors.C.shape[0]
    body = np.concatenate(scans)
    scan_id = vres.point_scan
    keep = scan_id >= fix
    WORK.mkdir(parents=True, exist_ok=True)
    np.savez(WORK / "common.npz", R_gt=R[fix:], p_gt=p[fix:],
             Cfix=np.asarray(f.Cfix), coe=np.asarray(f.coe),
             centers=np.asarray(f.centers), pnoise=cfg.pnoise)
    for s in SEEDS:
        rng = np.random.default_rng(s)
        C = consistency.corrupt_and_rebuild(
            body, scan_id - fix, vres.point_leaf, keep, G, W, rng,
            cfg.pnoise)
        fs = f._replace(C=C)
        fr = Fmod.recenter_bodies(fs)
        np.savez(WORK / f"seed{s}.npz",
                 C=C,
                 rc_C=np.asarray(fr.C, np.float32),
                 rc_Cfix=np.asarray(fr.Cfix, np.float32),
                 rc_coe=np.asarray(fr.coe, np.float32),
                 rc_centers=np.asarray(fr.centers, np.float32),
                 rc_bc=np.asarray(fr.body_centers, np.float32))
        print(f"prep seed {s} done", flush=True)


def phase_solve():
    import jax

    if os.environ.get("NEES_FORCE_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from balm_tpu.config import SolverConfig
    from balm_tpu.ops import factors as Fmod
    from balm_tpu.ops import packed as packed_mod
    from balm_tpu.ops import pallas_evaluate as pe
    from balm_tpu.utils import sync

    common = np.load(WORK / "common.npz")
    Rg = jnp.asarray(common["R_gt"], jnp.float32)
    pg = jnp.asarray(common["p_gt"], jnp.float32)
    scfg = SolverConfig(max_iters=1000, u_init=0.01, rel_tol=0.0,
                        abs_tol=1e-6, min_planes_per_pose=1,
                        gauge_fix=False)
    from balm_tpu.solver import lm

    interp = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend(), flush=True)
    for s in SEEDS:
        z = np.load(WORK / f"seed{s}.npz")
        fr = Fmod.PlaneFactors(
            C=jnp.asarray(z["rc_C"]), Cfix=jnp.asarray(z["rc_Cfix"]),
            coe=jnp.asarray(z["rc_coe"]),
            centers=jnp.asarray(z["rc_centers"]),
            body_centers=jnp.asarray(z["rc_bc"]))
        res = lm.damping_iter(Rg, pg, fr, scfg, centered=True,
                              backend="packed", hess_precision="high")
        hess_mode = os.environ.get("NEES_HESS", "packed32")
        if hess_mode == "oracle64":
            # diagnostic: f32 solve but f64 oracle H (isolates whether a
            # NEES failure comes from the solve floor or the H precision)
            z64 = np.load(WORK / f"seed{s}.npz")
            import jax.numpy as _jnp

            from balm_tpu.ops import lie as _lie
            with jax.experimental.enable_x64():
                f64 = Fmod.PlaneFactors(
                    C=_jnp.asarray(z64["C"], _jnp.float64),
                    Cfix=_jnp.asarray(np.load(WORK / "common.npz")["Cfix"]),
                    coe=_jnp.asarray(np.load(WORK / "common.npz")["coe"]),
                    centers=_jnp.asarray(
                        np.load(WORK / "common.npz")["centers"]),
                    body_centers=_jnp.zeros(
                        (z64["C"].shape[0], Rg.shape[0], 3)))
                T = _lie.pose_matrix(
                    _jnp.asarray(np.asarray(res.R), _jnp.float64),
                    _jnp.asarray(np.asarray(res.p), _jnp.float64))
                _, _, H32 = Fmod.evaluate(T, f64)
        else:
            pkf = packed_mod.pack_factors(fr)
            # the f32 matmul-precision scope is mandatory on TPU: outside
            # it the default is ONE bf16 pass and the H comes out ~25%
            # wrong (the round-4 first-run NEES failure: mean ratio 2.46)
            with jax.default_matmul_precision("float32"):
                _, _, H32 = pe.evaluate_packed(
                    res.R, res.p, pkf, interpret=interp,
                    hess_precision=jax.lax.Precision.HIGH)
        sync.fetch_scalar(res.residual)
        np.savez(WORK / f"solved{s}.npz",
                 R=np.asarray(res.R), p=np.asarray(res.p),
                 H=np.asarray(H32), iters=int(res.iters),
                 residual=float(res.residual),
                 device=str(jax.devices()[0]))
        print(f"solve seed {s}: iters {int(res.iters)} "
              f"res {float(res.residual):.6f}", flush=True)


def phase_nees():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from balm_tpu.ops import clusters, covariance, factors as Fmod, lie

    common = np.load(WORK / "common.npz")
    R_gt = common["R_gt"]
    p_gt = common["p_gt"]
    pnoise = float(common["pnoise"])
    W = len(R_gt)
    ratios = []
    nees_pose_all = []
    std_err_all = []
    device = None
    iters_all = []
    for s in SEEDS:
        z = np.load(WORK / f"seed{s}.npz")
        zs = np.load(WORK / f"solved{s}.npz")
        device = str(zs["device"])
        iters_all.append(int(zs["iters"]))
        f = Fmod.PlaneFactors(
            C=jnp.asarray(z["C"]), Cfix=jnp.asarray(common["Cfix"]),
            coe=jnp.asarray(common["coe"]),
            centers=jnp.asarray(common["centers"]),
            body_centers=jnp.zeros((z["C"].shape[0], W, 3)))
        Rw = zs["R"].astype(np.float64)
        pw = zs["p"].astype(np.float64)
        H = zs["H"].astype(np.float64)
        T_est = lie.pose_matrix(jnp.asarray(Rw), jnp.asarray(pw))
        ccov = clusters.stat_noise_cov(f.C, pnoise)
        rhs = np.asarray(covariance.scatter_jacobian_rhs(T_est, f, ccov))
        Rcov = np.linalg.solve(H, np.linalg.solve(H, rhs).T).T

        err = np.zeros(6 * W)
        for i in range(W):
            Rr = R_gt[i] @ Rw[i].T
            err[6 * i:6 * i + 3] = np.asarray(
                lie.so3_log(jnp.asarray(Rr)))
            err[6 * i + 3:6 * i + 6] = -Rr @ pw[i] + p_gt[i]
        nees = float(err @ np.linalg.solve(Rcov, err))
        ratios.append(nees / (6 * W))
        errW = err.reshape(W, 6)
        blocks = Rcov.reshape(W, 6, W, 6)[np.arange(W), :, np.arange(W), :]
        nees_pose_all.append(np.einsum(
            "wi,wi->w", errW,
            np.linalg.solve(blocks, errW[..., None])[..., 0]))
        sig = np.sqrt(np.maximum(np.diagonal(Rcov), 1e-300)).reshape(W, 6)
        std_err_all.append(errW / sig)
        print(f"seed {s}: NEES ratio {ratios[-1]:.4f}", flush=True)

    S = len(SEEDS)
    ratios = np.asarray(ratios)
    sd_theory = float(np.sqrt(2.0 / (6 * W * S)))
    nees_pose = np.stack(nees_pose_all)
    std_err = np.stack(std_err_all)
    pose_sd = float(np.sqrt(12.0 / S) / 6.0)
    out = {
        "protocol": "production f32 packed path: solve + covariance H on "
                    "the packed evaluator (hess_precision=high); f64 "
                    "noise-model rhs; consistency.cpp:160-197",
        "device": device,
        "seeds": SEEDS,
        "iters": iters_all,
        "ratios": ratios.tolist(),
        "mean_ratio": float(ratios.mean()),
        "sd_ratio": float(ratios.std(ddof=1)),
        "sd_theory_of_mean": sd_theory,
        "within_2sigma_band": bool(
            abs(ratios.mean() - 1.0) < 2 * max(sd_theory,
                                               ratios.std(ddof=1) /
                                               np.sqrt(S))),
        "expected_per_seed": 6 * W,
        "nees_pose_mean_ratio_minmax": [
            float((nees_pose.mean(axis=0) / 6.0).min()),
            float((nees_pose.mean(axis=0) / 6.0).max())],
        "nees_pose_band_3sigma": [1.0 - 3 * pose_sd, 1.0 + 3 * pose_sd],
        "frac_within_3sigma": float(np.mean(np.abs(std_err) <= 3.0)),
        "frac_within_2sigma": float(np.mean(np.abs(std_err) <= 2.0)),
    }
    with open(ROOT / "artifacts" / "consistency_f32_packed.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


def main():
    if len(sys.argv) > 1:
        {"prep": phase_prep, "solve": phase_solve,
         "nees": phase_nees}[sys.argv[1]]()
        return
    env = dict(os.environ)
    for phase in ("prep", "solve", "nees"):
        print(f"=== phase {phase} ===", flush=True)
        r = subprocess.run([sys.executable, __file__, phase], env=env)
        if r.returncode != 0:
            raise SystemExit(f"phase {phase} failed: {r.returncode}")


if __name__ == "__main__":
    main()
