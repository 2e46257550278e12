"""Method comparison on the virtual benchmark — the reference's
compare_test experiment (src/compare_test/{PA,BAREG}_test.cpp
method_test): BALM2 vs BALM1 vs EF vs PA vs BAREG over multiple seeds.

Produces artifacts/method_comparison.json with per-method gauge-aligned
RMSE (deg, m), iteration counts, and wall time.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_seeds=5):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from balm_tpu.baselines import balm1, bareg, ef, pa, pa_whitened
    from balm_tpu.config import SolverConfig
    from balm_tpu.ops import lie
    from balm_tpu.pipelines import virtual
    from balm_tpu.solver import lm
    from balm_tpu.utils import metrics

    def setup(seed):
        cfg = virtual.VirtualConfig(win_size=6, surf_size=12, pts_size=25,
                                    seed=seed)
        R_gt, p_gt, body = virtual.generate(cfg)
        R0, p0 = virtual.perturb(R_gt, p_gt, cfg)
        f = virtual.build_factors(body, jnp.float64)
        G, W, K, _ = body.shape
        pf = balm1.PointPlanes(points=jnp.asarray(body),
                               mask=jnp.ones((G, W, K)), coe=f.coe)
        return R_gt, p_gt, R0, p0, f, pf

    methods = {}

    def record(name, seed, Rr, pr, iters, dt, Rg, pg):
        rot, tra = metrics.pose_rsme(jnp.asarray(Rr), jnp.asarray(pr),
                                     Rg, pg)
        methods.setdefault(name, []).append(
            {"seed": seed, "rot_deg": float(rot) * 57.2958,
             "trans_m": float(tra), "iters": int(iters), "time_s": dt})

    for seed in range(n_seeds):
        R_gt, p_gt, R0, p0, f, pf = setup(100 + seed)
        Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))

        t0 = time.perf_counter()
        out = lm.damping_iter(jnp.asarray(R0), jnp.asarray(p0), f,
                              SolverConfig(max_iters=30, rel_tol=1e-9,
                                           min_planes_per_pose=1))
        jax.block_until_ready(out.R)
        record("balm2", seed, out.R, out.p, out.iters,
               time.perf_counter() - t0, Rg, pg)

        t0 = time.perf_counter()
        R1, p1, _, it = balm1.damping_iter(jnp.asarray(R0), jnp.asarray(p0),
                                           pf, max_iters=30)
        record("balm1", seed, *lie.gauge_fix(R1, p1), it,
               time.perf_counter() - t0, Rg, pg)

        t0 = time.perf_counter()
        R1, p1, _, it = ef.descend(jnp.asarray(R0), jnp.asarray(p0), f,
                                   max_iters=200)
        record("ef", seed, *lie.gauge_fix(R1, p1), it,
               time.perf_counter() - t0, Rg, pg)

        t0 = time.perf_counter()
        R1, p1, _, it = pa.alternate(jnp.asarray(R0), jnp.asarray(p0), f,
                                     outer_iters=20)
        record("pa_cluster(ours)", seed, R1, p1, it,
               time.perf_counter() - t0, Rg, pg)

        t0 = time.perf_counter()
        R1, p1, _, it = pa_whitened.solve(R0, p0, f)
        record("pa(reference)", seed, R1, p1, it,
               time.perf_counter() - t0, Rg, pg)

        t0 = time.perf_counter()
        R1, p1, _, it = bareg.solve(R0, p0, f)
        record("bareg(reference)", seed, R1, p1, it,
               time.perf_counter() - t0, Rg, pg)
        print(f"seed {seed} done", flush=True)

    summary = {}
    for name, runs in methods.items():
        summary[name] = {
            "rot_deg_mean": float(np.mean([r["rot_deg"] for r in runs])),
            "trans_m_mean": float(np.mean([r["trans_m"] for r in runs])),
            "iters_mean": float(np.mean([r["iters"] for r in runs])),
            "time_s_mean": float(np.mean([r["time_s"] for r in runs])),
            "runs": runs,
        }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "artifacts", "method_comparison.json")
    with open(path, "w") as fh:
        json.dump(summary, fh, indent=1)
    for name, s in summary.items():
        print(f"{name:18s} rot {s['rot_deg_mean']:.4f} deg  "
              f"trans {s['trans_m_mean']:.4f} m  iters {s['iters_mean']:.0f}"
              f"  {s['time_s_mean']:.2f} s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
