"""Large-W scaling demo: corridor BA at W up to 2000 poses.

Produces artifacts/corridor_scale.json:
  * W=400: matrix-free solver vs the dense flat solver (accuracy ratio —
    the VERDICT acceptance bar is <= 1.2x flat)
  * W=1000, 2000: matrix-free only (dense H would be 576 MB at W=2000
    with O(G W^2) assembly — the regime the reference cannot reach,
    bavoxel.hpp:1113-1114)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # CPU by default: querying the backend first would initialize the
    # tunneled TPU (axon overrides JAX_PLATFORMS) and contend with bench
    if os.environ.get("CORRIDOR_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from balm_tpu.config import SolverConfig
    from balm_tpu.ops import factors_windowed as FW
    from balm_tpu.pipelines import corridor
    from balm_tpu.solver import large, lm

    results = {"device": str(jax.devices()[0]), "runs": []}

    # --- W=400: accuracy vs dense flat ---
    cfg = corridor.CorridorConfig(W=400, dtype="float32", seed=7,
                                  max_iters=30, cg_iters=250, cg_tol=1e-8)
    R_gt, p_gt, wf = corridor.make_corridor(cfg)
    R0, p0 = corridor.corrupt_poses(R_gt, p_gt, cfg)
    scfg = SolverConfig(max_iters=cfg.max_iters, rel_tol=1e-10,
                        min_planes_per_pose=0)

    t0 = time.perf_counter()
    rb = large.damping_iter_large(R0, p0, wf, scfg,
                                  cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol)
    rb.R.block_until_ready()
    t_large = time.perf_counter() - t0

    f = FW.to_dense(wf, cfg.W)
    t0 = time.perf_counter()
    ra = lm.damping_iter(R0, p0, f, scfg, centered=True)
    ra.R.block_until_ready()
    t_dense = time.perf_counter() - t0

    ga = corridor.pose_rmse(ra.R, ra.p, R_gt, p_gt)
    gb = corridor.pose_rmse(rb.R, rb.p, R_gt, p_gt)
    g0 = corridor.pose_rmse(R0, p0, R_gt, p_gt)
    results["runs"].append({
        "W": 400, "planes": int(wf.num_planes), "span": int(wf.span),
        "init_rmse": {"rot_deg": g0[0], "trans_m": g0[1]},
        "dense_flat": {"rot_deg": ga[0], "trans_m": ga[1],
                       "residual": float(ra.residual),
                       "iters": int(ra.iters), "solve_s": t_dense},
        "matrix_free": {"rot_deg": gb[0], "trans_m": gb[1],
                        "residual": float(rb.residual),
                        "iters": int(rb.iters), "solve_s": t_large},
        "accuracy_ratio_rot": gb[0] / max(ga[0], 1e-12),
        "accuracy_ratio_trans": gb[1] / max(ga[1], 1e-12),
    })
    print(json.dumps(results["runs"][-1]), flush=True)

    # --- W=1000, 2000: beyond the dense regime ---
    for Wbig in (1000, 2000):
        cfg = corridor.CorridorConfig(W=Wbig, dtype="float32", seed=8,
                                      max_iters=30, cg_iters=250,
                                      cg_tol=1e-8)
        R_gt, p_gt, wf = corridor.make_corridor(cfg)
        R0, p0 = corridor.corrupt_poses(R_gt, p_gt, cfg)
        g0 = corridor.pose_rmse(R0, p0, R_gt, p_gt)
        t0 = time.perf_counter()
        rb = large.damping_iter_large(
            R0, p0, wf, SolverConfig(max_iters=cfg.max_iters, rel_tol=1e-10,
                                     min_planes_per_pose=0),
            cg_iters=cfg.cg_iters, cg_tol=cfg.cg_tol)
        rb.R.block_until_ready()
        t_large = time.perf_counter() - t0
        gb = corridor.pose_rmse(rb.R, rb.p, R_gt, p_gt)
        results["runs"].append({
            "W": Wbig, "planes": int(wf.num_planes), "span": int(wf.span),
            "init_rmse": {"rot_deg": g0[0], "trans_m": g0[1]},
            "matrix_free": {"rot_deg": gb[0], "trans_m": gb[1],
                            "residual": float(rb.residual),
                            "iters": int(rb.iters), "solve_s": t_large},
            "cg_iters_per_lm": [int(k) for k in np.asarray(rb.trace_cg)
                                [:int(rb.iters)]],
        })
        print(json.dumps(results["runs"][-1]), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "artifacts", "corridor_scale.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", os.path.normpath(out))


if __name__ == "__main__":
    main()
