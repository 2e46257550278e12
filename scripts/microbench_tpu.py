"""Device-side per-op timing that the tunnel cannot distort.

The axon tunnel adds a ~24 ms per-dispatch floor to any nontrivial
program (artifacts/profile_loop_r2b.log: residual-only, Cholesky and LU
all "cost" the same 24 ms while a noop costs 28 us), so single-op wall
timings are useless.  Instead each op is chained K times inside ONE
jitted fori_loop with a data dependency between trips (no DCE, no
overlap); the slope (t_K2 - t_K1)/(K2 - K1) is the true device time per
op.

Usage: BENCH_FORCE_TPU=1 python scripts/microbench_tpu.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K1, K2 = 4, 24


def slope_ms(make_chain, *args):
    """make_chain(K) -> jitted fn(*args) running the op K times."""
    import jax

    f1, f2 = make_chain(K1), make_chain(K2)
    jax.block_until_ready(f1(*args))
    jax.block_until_ready(f2(*args))
    ts = {}
    for name, f in (("k1", f1), ("k2", f2)):
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        ts[name] = best
    return (ts["k2"] - ts["k1"]) / (K2 - K1) * 1e3


if __name__ == "__main__":
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from balm_tpu.ops import factors as Fmod
    from balm_tpu.ops import lie, packed as packed_mod
    from balm_tpu.ops import pallas_evaluate as pe
    from balm_tpu.pipelines import realworld
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

    pkf = jax.block_until_ready(jax.jit(packed_mod.pack_factors)(f))
    out = {}

    with jax.default_matmul_precision("float32"):
        # perturb the pose by a tiny function of the previous result so
        # each trip depends on the last (defeats CSE) but computes the
        # same-shaped problem
        def chain_eval(evalfn):
            # consume EVERY output (res, J, H) in the carry dependency —
            # summing only the residual lets XLA dead-code-eliminate the
            # whole Hessian matmul and report absurd times (0.14 ms for
            # a 3.7e10-FLOP evaluation)
            def make(K):
                @jax.jit
                def run(R, p):
                    def body(_, c):
                        Rc, pc, s = c
                        o = evalfn(Rc, pc)
                        leaves = (o if isinstance(o, tuple) else (o,))
                        s2 = sum(jnp.sum(x) for x in leaves)
                        return (Rc, pc + 1e-30 * s2, s2)
                    return lax.fori_loop(
                        0, K, body, (R, p, jnp.zeros((), R.dtype)))[2]
                return run
            return make

        ev_p = lambda Rc, pc: pe.evaluate_packed(Rc, pc, pkf)
        rs_p = lambda Rc, pc: pe.residual_only_packed(Rc, pc, pkf)
        ev_x = lambda Rc, pc: Fmod.evaluate(
            lie.pose_matrix(Rc, pc), f, centered=True)
        rs_x = lambda Rc, pc: Fmod.residual_only(
            lie.pose_matrix(Rc, pc), f, centered=True)

        out["eval_p"] = slope_ms(chain_eval(ev_p), R, p)
        out["res_p"] = slope_ms(chain_eval(rs_p), R, p)
        out["eval_x"] = slope_ms(chain_eval(ev_x), R, p)
        out["res_x"] = slope_ms(chain_eval(rs_x), R, p)

        # csum alone (inside evaluate_packed)
        pose0 = packed_mod.pad_poses(R, p, pkf.wp).astype(jnp.float32)

        def make_csum(K):
            @jax.jit
            def run(pose):
                def body(_, c):
                    po, s = c
                    cs = pe.csum_packed_xla(po, pkf.mom, pkf.cen, pkf.cfix)
                    s2 = jnp.sum(cs)
                    return (po + 1e-30 * s2, s2)
                return lax.fori_loop(0, K, body, (pose, jnp.zeros(())))[1]
            return run
        out["csum_x"] = slope_ms(make_csum, pose0)

        # solves on a representative damped system
        _, J, H = jax.jit(ev_x)(R, p)
        A = H + 0.01 * jnp.diag(jnp.diag(H))
        A = jax.block_until_ready(A)
        J = jax.block_until_ready(J)

        def make_solver(solver):
            def make(K):
                @jax.jit
                def run(A, J):
                    def body(_, c):
                        Ac, s = c
                        dx = solver(Ac, J)
                        s2 = jnp.sum(dx)
                        return (Ac + 1e-30 * s2, s2)
                    return lax.fori_loop(0, K, body, (A, jnp.zeros(())))[1]
                return run
            return make

        def chol(A, J):
            L = jax.scipy.linalg.cho_factor(A, lower=True)
            return jax.scipy.linalg.cho_solve(L, -J)

        out["chol"] = slope_ms(make_solver(chol), A, J)
        out["chol_factor"] = slope_ms(make_solver(
            lambda A, J: jnp.sum(jax.scipy.linalg.cho_factor(
                A, lower=True)[0], axis=1)), A, J)
        out["lu"] = slope_ms(make_solver(
            lambda A, J: jnp.linalg.solve(A, -J)), A, J)

        # guarded solve as the loop compiles it
        def guarded(A, J):
            L = jax.scipy.linalg.cho_factor(A, lower=True)
            dx_c = jax.scipy.linalg.cho_solve(L, -J)
            return lax.cond(
                jnp.all(jnp.isfinite(dx_c)), lambda: dx_c,
                lambda: jnp.linalg.solve(A, -J))
        out["chol_guarded"] = slope_ms(make_solver(guarded), A, J)

        # the left update + q1 bookkeeping (everything else in an iter)
        def make_update(K):
            @jax.jit
            def run(R, p, dx):
                def body(_, c):
                    Rc, pc, s = c
                    Rt, pt = lie.se3_left_update(Rc, pc, dx.reshape(W, 6))
                    s2 = jnp.sum(pt)
                    return (Rt, pc + 1e-30 * s2, s2)
                return lax.fori_loop(
                    0, K, body, (R, p, jnp.zeros(())))[2]
            return run
        dx0 = jnp.zeros((6 * W,), R.dtype)
        out["update"] = slope_ms(make_update, R, p, dx0)

    out = {k: round(v, 3) for k, v in out.items()}
    print(json.dumps(out), flush=True)
    acc = (4 * out["eval_p"] + 10 * (out["chol_guarded"] + out["res_p"]
                                     + out["update"]))
    print(f"accounted 10-iter loop_p (4 evals): {acc:.1f} ms", flush=True)
