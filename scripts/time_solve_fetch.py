"""Re-measure the realworld LM solve with RELIABLE synchronization.

Through the axon tunnel `jax.block_until_ready` returns immediately even
for multi-hundred-ms computations (verified: a 16M-point segment_sum
"blocks" in 0.2 ms; fetching one scalar afterwards waits the full compute
time) — so any timing that syncs via block_until_ready measures dispatch
ENQUEUE, not execution.  The only working sync is a device->host fetch.

This script times the full jitted LM loop (the bench.py workload) as

    per_run = (t[k runs + fetch] - t[1 run + fetch]) / (k - 1)

with the k runs made data-dependent (each run's pose input is perturbed
by the previous run's residual*0) so the device cannot elide or overlap
them.  Prints one JSON line; compare `iter_per_s_fetch` against the
bench.py number measured the broken way.

Run: python scripts/time_solve_fetch.py [k]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from balm_tpu.config import SolverConfig
from balm_tpu.ops import factors as Fmod
from balm_tpu.pipelines import realworld
from balm_tpu.solver import lm
from balm_tpu.voxel import grid


def main(k=6):
    dtype = "float32"
    cfg = realworld.RealworldConfig(dtype=dtype, centered=True)
    R, p, scans = realworld.load(cfg)
    vres = grid.voxelize(scans, R, p, cfg.voxel, dtype=np.float64)
    f = Fmod.recenter_bodies(vres.factors).astype(jnp.dtype(dtype))
    R = jnp.asarray(R, dtype)
    p = jnp.asarray(p, dtype)

    on_tpu = jax.default_backend() == "tpu"
    backend = os.environ.get("BENCH_BACKEND", "pallas" if on_tpu else "xla")
    solver_cfg = SolverConfig(max_iters=10, u_init=0.01, rel_tol=0.0)

    def run(Rin):
        return lm.damping_iter(Rin, p, f, solver_cfg, centered=True,
                               backend=backend,
                               packed_impl=os.environ.get(
                                   "BENCH_PACKED_IMPL", "xla"))

    res = run(R)
    float(res.residual)  # sync: compile + first execution done

    def chain(n):
        t0 = time.perf_counter()
        Rin = R
        res = None
        for _ in range(n):
            res = run(Rin)
            # data dependency WITHOUT changing the problem: residual*0
            Rin = R + jnp.zeros((), R.dtype) * res.residual
        v = float(res.residual)
        return time.perf_counter() - t0, v

    best1 = min(chain(1)[0] for _ in range(3))
    bestk = min(chain(k)[0] for _ in range(3))
    per_run = (bestk - best1) / (k - 1)
    iters = max(int(res.iters), 1)

    # the broken sync, for the record
    t0 = time.perf_counter()
    r2 = run(R)
    r2.R.block_until_ready()
    t_block = time.perf_counter() - t0

    print(json.dumps({
        "backend": backend,
        "device": str(jax.devices()[0]),
        "iters": iters,
        "per_run_s_fetch": round(per_run, 4),
        "iter_per_s_fetch": round(iters / per_run, 2),
        "one_run_plus_fetch_s": round(best1, 4),
        "k_runs_plus_fetch_s": round(bestk, 4),
        "k": k,
        "block_until_ready_s_BROKEN": round(t_block, 4),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
