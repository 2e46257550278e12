"""Time the whole realworld177 LM solve (one fused dispatch) on the TPU.

Minimal: load, voxelize, recenter, then best-of-N whole damping_iter
dispatches for each backend.  Usage:
    BENCH_FORCE_TPU=1 python scripts/time_loop_tpu.py [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if __name__ == "__main__":
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from balm_tpu.config import SolverConfig
    from balm_tpu.ops import factors as Fmod
    from balm_tpu.pipelines import realworld
    from balm_tpu.solver import lm
    from balm_tpu.voxel import grid

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cfg = realworld.RealworldConfig(dtype="float32", centered=True)
    R, p, scans = realworld.load(cfg)
    vres = grid.voxelize(scans, R, p, cfg.voxel, dtype=np.float64)
    f = Fmod.recenter_bodies(vres.factors).astype(jnp.float32)
    R = jnp.asarray(R, jnp.float32)
    p = jnp.asarray(p, jnp.float32)
    print(f"device={jax.devices()[0]} W={R.shape[0]} G={vres.num_planes} "
          f"iters={iters}", flush=True)

    # NO device->host transfer until all timing is done: one scalar fetch
    # through the axon tunnel degrades every later dispatch ~16x
    # (artifacts/transfer_poisoning.md)
    scfg = SolverConfig(max_iters=iters, u_init=0.01, rel_tol=0.0)
    results = []
    for backend in ("packed", "xla"):
        def run(backend=backend):
            return lm.damping_iter(R, p, f, scfg, centered=True,
                                   backend=backend)
        r0 = run()
        jax.block_until_ready(r0.R)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            jax.block_until_ready(run().R)
            ts.append(time.perf_counter() - t0)
        results.append((backend, r0, ts))
    for backend, r0, ts in results:
        print(f"{backend}: best {min(ts)*1e3:.1f} ms / {iters} iters "
              f"({iters/min(ts):.1f} iter/s)  residual "
              f"{float(r0.residual):.2f}  all "
              f"{[round(t*1e3,1) for t in ts]}", flush=True)
