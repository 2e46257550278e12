"""TPU smoke + microbench for the fused Pallas evaluate path.

Loads the realworld 177-scan problem, checks the compiled kernels against
the XLA evaluator on-device, and times evaluate/residual/solve.
Everything is jitted at top level: eager glue through the tunneled TPU
pays ~0.3 s per op dispatch.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from balm_tpu.ops import factors as Fmod
    from balm_tpu.ops import lie
    from balm_tpu.ops import packed as pkmod
    from balm_tpu.ops import pallas_evaluate as pe
    from balm_tpu.pipelines import realworld
    from balm_tpu.voxel import grid

    cfg = realworld.RealworldConfig(dtype="float32", centered=True)
    R, p, scans = realworld.load(cfg)
    vres = grid.voxelize(scans, R, p, cfg.voxel, dtype=np.float64)
    f = Fmod.recenter_bodies(vres.factors).astype(jnp.float32)
    R = jnp.asarray(R, jnp.float32)
    p = jnp.asarray(p, jnp.float32)
    W, G = int(R.shape[0]), int(f.num_planes)
    print(f"W={W} G={G}", flush=True)

    pk = jax.device_put(pkmod.pack_factors(f))

    ev_p = jax.jit(lambda R, p: pe.evaluate_packed(R, p, pk))
    ev_x = jax.jit(lambda R, p: Fmod.evaluate(
        lie.pose_matrix(R, p), f, centered=True))
    rs_p = jax.jit(lambda R, p: pe.residual_only_packed(R, p, pk))

    def timeit(fn, n=5, reps=3):
        out = fn()
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    # per-dispatch floor through the tunnel (subtract from every number)
    noop = jax.jit(lambda x: x + 1.0)
    xs = jnp.zeros(())
    jax.block_until_ready(noop(xs))

    t0 = time.perf_counter()
    res1, J1, H1 = jax.block_until_ready(ev_p(R, p))
    print(f"pallas evaluate compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    res0, J0, H0 = jax.block_until_ready(ev_x(R, p))
    print(f"xla evaluate compile+run: {time.perf_counter()-t0:.1f}s",
          flush=True)

    print("res rel diff:",
          abs(float(res0) - float(res1)) / abs(float(res0)), flush=True)
    js = float(jnp.max(jnp.abs(J0)))
    print("J maxerr rel:", float(jnp.max(jnp.abs(J0 - J1))) / js, flush=True)
    hs = float(jnp.max(jnp.abs(H0)))
    print("H maxerr rel:", float(jnp.max(jnp.abs(H0 - H1))) / hs, flush=True)

    tn = timeit(lambda: noop(xs))
    print(f"dispatch floor (noop): {tn*1e3:.3f} ms", flush=True)
    tp = timeit(lambda: ev_p(R, p))
    print(f"evaluate pallas: {tp*1e3:.2f} ms "
          f"(minus floor {max(tp-tn,0)*1e3:.2f} ms)", flush=True)
    tx = timeit(lambda: ev_x(R, p))
    print(f"evaluate xla:    {tx*1e3:.2f} ms  (speedup {tx/tp:.2f}x)",
          flush=True)
    rp = timeit(lambda: rs_p(R, p))
    print(f"residual pallas: {rp*1e3:.3f} ms", flush=True)

    import jax.scipy.linalg as jsl
    Hd = H0 + 0.01 * jnp.diag(jnp.diag(H0))
    sol = jax.jit(lambda H, J: jsl.cho_solve(
        jsl.cho_factor(H, lower=True), -J))
    ts = timeit(lambda: sol(Hd, J0))
    print(f"cholesky solve 6W={6*W}: {ts*1e3:.2f} ms", flush=True)

    flops_h = 2.0 * (6 * pk.wp) ** 2 * (3 * pk.gp)
    print(f"achieved on hessian matmul (incl padding): "
          f"{flops_h / tp / 1e12:.2f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
