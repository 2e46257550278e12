"""A/B the dense linear solvers + re-time the loop after the csum rewrite.

Usage: BENCH_FORCE_TPU=1 python scripts/profile_solve_tpu.py
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
    print(f"device={jax.devices()[0]} W={W} G={int(vres.num_planes)}",
          flush=True)

    out = {}
    pack_j = jax.jit(packed_mod.pack_factors)
    pkf = jax.block_until_ready(pack_j(f))

    with jax.default_matmul_precision("float32"):
        ev_p = jax.jit(lambda R, p: pe.evaluate_packed(R, p, pkf))
        ev_k = jax.jit(
            lambda R, p: pe.evaluate_packed(R, p, pkf, impl="pallas"))
        rs_p = jax.jit(lambda R, p: pe.residual_only_packed(R, p, pkf))
        res, J, H = jax.block_until_ready(ev_p(R, p))
        resk, Jk, Hk = jax.block_until_ready(ev_k(R, p))
        out["eval_H_relerr"] = float(jnp.max(jnp.abs(H - Hk))
                                     / (jnp.max(jnp.abs(H)) + 1e-30))
        jax.block_until_ready(rs_p(R, p))
        out["eval_xla"] = best_of(lambda: ev_p(R, p))
        out["eval_pallas"] = best_of(lambda: ev_k(R, p))
        out["res_p"] = best_of(lambda: rs_p(R, p))

        D = jnp.diag(H)
        A = H + 0.01 * jnp.diag(D)

        cf_j = jax.jit(
            lambda A: jax.scipy.linalg.cho_factor(A, lower=True)[0])
        Lc = jax.block_until_ready(cf_j(A))
        out["chol_factor"] = best_of(lambda: cf_j(A))
        cs_j = jax.jit(
            lambda Lc, J: jax.scipy.linalg.cho_solve((Lc, True), -J))
        jax.block_until_ready(cs_j(Lc, J))
        out["chol_solve"] = best_of(lambda: cs_j(Lc, J))

        from balm_tpu.solver import large as _large

        def pcg_solve(A, J):
            Ablk = lm._blocks6(A, W)
            Minv = _large._inv6(Ablk)
            return _large._pcg(lambda v: A @ v, -J, Minv, 400, 1e-6)

        pc_j = jax.jit(pcg_solve)
        dx_pcg, k = jax.block_until_ready(pc_j(A, J))
        dx_ref = jax.scipy.linalg.cho_solve((Lc, True), -J)
        err = float(jnp.linalg.norm(dx_pcg - dx_ref)
                    / jnp.linalg.norm(dx_ref))
        out["pcg_solve"] = best_of(lambda: pc_j(A, J))
        out["pcg_iters"] = int(k)
        out["pcg_relerr"] = round(err, 6)

    scfg = SolverConfig(max_iters=10, u_init=0.01, rel_tol=0.0)
    variants = {
        "loop_p_chol": dict(backend="pallas", linear_solver="cholesky"),
        "loop_p_pcg": dict(backend="pallas", linear_solver="pcg"),
        "loop_x_chol": dict(backend="xla", linear_solver="cholesky"),
    }
    for name, kw in variants.items():
        def run():
            return lm.damping_iter(R, p, f, scfg, centered=True, **kw)
        r = jax.block_until_ready(run().R)
        out[name] = best_of(lambda: run().R, 6)
        res_f = float(run().residual)
        out[name + "_res"] = round(res_f, 2)

    out = {k: (round(v * 1e3, 3) if isinstance(v, float) and "res" not in k
               and "err" not in k and "iters" not in k else v)
           for k, v in out.items()}
    print(json.dumps(out), flush=True)
