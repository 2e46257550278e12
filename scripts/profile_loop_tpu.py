"""Decompose the realworld177 LM iteration cost on the real TPU.

Times each phase of the damping loop separately (best-of-N whole jitted
dispatches, tunnel-floor reported) so optimization effort goes where the
milliseconds are:

  pack      pack_factors (once per solve)
  eval_x    XLA full evaluate (res, J, H)
  eval_p    Pallas full evaluate
  res_x     XLA residual-only
  res_p     Pallas residual-only
  chol      cho_factor + cho_solve on (6W, 6W)
  lu        jnp.linalg.solve on (6W, 6W)
  loop_x    full damping_iter backend=xla
  loop_p    full damping_iter backend=pallas

Usage: BENCH_FORCE_TPU=1 python scripts/profile_loop_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


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
    from balm_tpu.ops import lie, packed as packed_mod
    from balm_tpu.ops import pallas_evaluate as pe
    from balm_tpu.pipelines import realworld
    from balm_tpu.solver import lm
    from balm_tpu.voxel import grid

    dtype = "float32"
    cfg = realworld.RealworldConfig(dtype=dtype, centered=True)
    R, p, scans = realworld.load(cfg)
    vres = grid.voxelize(scans, R, p, cfg.voxel, dtype=np.float64)
    f = Fmod.recenter_bodies(vres.factors).astype(jnp.dtype(dtype))
    R = jnp.asarray(R, dtype)
    p = jnp.asarray(p, dtype)
    W = int(R.shape[0])
    G = int(vres.num_planes)
    print(f"device={jax.devices()[0]} W={W} G={G}", flush=True)

    out = {}

    # dispatch floor
    noop = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros(())
    noop(z).block_until_ready()
    out["floor"] = best_of(lambda: noop(z), 10)

    # pack
    pack_j = jax.jit(packed_mod.pack_factors)
    pkf = jax.block_until_ready(pack_j(f))
    out["pack"] = best_of(lambda: pack_j(f))

    # evaluates
    with jax.default_matmul_precision("float32"):
        ev_x = jax.jit(lambda R, p: Fmod.evaluate(
            lie.pose_matrix(R, p), f, centered=True))
        ev_p = jax.jit(lambda R, p: pe.evaluate_packed(R, p, pkf))
        rs_x = jax.jit(lambda R, p: Fmod.residual_only(
            lie.pose_matrix(R, p), f, centered=True))
        rs_p = jax.jit(lambda R, p: pe.residual_only_packed(R, p, pkf))

        res, J, H = jax.block_until_ready(ev_x(R, p))
        jax.block_until_ready(ev_p(R, p))
        jax.block_until_ready(rs_x(R, p))
        jax.block_until_ready(rs_p(R, p))
        out["eval_x"] = best_of(lambda: ev_x(R, p))
        out["eval_p"] = best_of(lambda: ev_p(R, p))
        out["res_x"] = best_of(lambda: rs_x(R, p))
        out["res_p"] = best_of(lambda: rs_p(R, p))

        # solves
        D = jnp.diag(H)
        A = H + 0.01 * jnp.diag(D)

        def chol(A, J):
            L = jax.scipy.linalg.cho_factor(A, lower=True)
            return jax.scipy.linalg.cho_solve(L, -J)

        chol_j = jax.jit(chol)
        lu_j = jax.jit(lambda A, J: jnp.linalg.solve(A, -J))
        jax.block_until_ready(chol_j(A, J))
        jax.block_until_ready(lu_j(A, J))
        out["chol"] = best_of(lambda: chol_j(A, J))
        out["lu"] = best_of(lambda: lu_j(A, J))

        # guarded solve exactly as the loop body compiles it
        def guarded(A, J):
            L = jax.scipy.linalg.cho_factor(A, lower=True)
            dx_c = jax.scipy.linalg.cho_solve(L, -J)
            return jax.lax.cond(
                jnp.all(jnp.isfinite(dx_c)), lambda: dx_c,
                lambda: jnp.linalg.solve(A, -J))
        g_j = jax.jit(guarded)
        jax.block_until_ready(g_j(A, J))
        out["chol_guarded"] = best_of(lambda: g_j(A, J))

    # full loops
    scfg = SolverConfig(max_iters=10, u_init=0.01, rel_tol=0.0)
    for name, backend in (("loop_x", "xla"), ("loop_p", "pallas")):
        def run():
            return lm.damping_iter(R, p, f, scfg, centered=True,
                                   backend=backend)
        jax.block_until_ready(run().R)
        out[name] = best_of(lambda: run().R, 5)

    out = {k: round(v * 1e3, 3) for k, v in out.items()}
    print(json.dumps(out))
    # accounting: 10-iter loop with ~4 accepted =
    #   pack + 4*eval + 10*(chol_guarded + res) + overhead
    for bk, ev, rs in (("x", "eval_x", "res_x"), ("p", "eval_p", "res_p")):
        acc = (out["pack"] + 4 * out[ev]
               + 10 * (out["chol_guarded"] + out[rs]))
        print(f"accounted_{bk}: {acc:.1f} ms vs loop_{bk}: "
              f"{out['loop_' + bk]:.1f} ms", flush=True)
