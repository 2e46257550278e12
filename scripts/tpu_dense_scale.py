"""Dense-window scaling on the real TPU: evaluate/loop cost and achieved
FLOP/s as the window grows past the reference's W=177 ceiling.

The packed evaluator's Hessian is one (6Wp, 3Gp) x (3Gp, 6Wp) MXU
product, so utilization RISES with W (the reference's dense path is
capped at W=177 and single-threaded Eigen).  Device times use the
slope method (immune to tunnel dispatch overhead and host-transfer
poisoning, see artifacts/transfer_poisoning.md).

Produces artifacts/tpu_dense_scale.json.
Usage: BENCH_FORCE_TPU=1 python scripts/tpu_dense_scale.py [W ...]
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def slope(fn_maker, args, K1=4, K2=24):
    import jax
    f1, f2 = fn_maker(K1), fn_maker(K2)
    jax.block_until_ready(f1(*args))
    jax.block_until_ready(f2(*args))
    t = {}
    for nm, g in (("1", f1), ("2", f2)):
        best = np.inf
        for _ in range(6):
            t0 = time.perf_counter()
            jax.block_until_ready(g(*args))
            best = min(best, time.perf_counter() - t0)
        t[nm] = best
    return (t["2"] - t["1"]) / (K2 - K1)


if __name__ == "__main__":
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from balm_tpu.config import SolverConfig
    from balm_tpu.ops import factors as Fmod
    from balm_tpu.ops import packed as packed_mod, pallas_evaluate as pe
    from balm_tpu.pipelines import virtual
    from balm_tpu.solver import lm

    # (W, G): window x plane-count pairs; the virtual generator gives an
    # association-free dense problem (benchmark_virtual protocol) so the
    # measurement isolates the evaluator, not voxelization variance
    sizes = [(128, 1024), (256, 2048), (512, 4096)]
    if len(sys.argv) > 2:
        sizes = [(int(sys.argv[1]), int(sys.argv[2]))]
    # tunnel-state fingerprint: a fixed 512^3 matmul chain whose device
    # time is known (~1.3 ms quiet).  The shared tunnel time-slices the
    # chip; captures where this reads far above quiet are degraded and
    # should be re-taken (compare runs by this field).
    A = jnp.eye(512, dtype=jnp.float32)

    def _mm(K):
        @jax.jit
        def f(A):
            from jax import lax as _lax
            return _lax.fori_loop(
                0, K, lambda i, X: 0.5 * (X @ X) + 0.5 * A, A)
        return f
    fingerprint_ms = round(slope(_mm, (A,)) * 1e3, 3)

    out = {"device": str(jax.devices()[0]),
           "tunnel_fingerprint_ms_per_512matmul": fingerprint_ms,
           "windows": []}
    pending = []
    print(f"fingerprint {fingerprint_ms} ms/512-matmul", flush=True)
    for W, G in sizes:
        vcfg = virtual.VirtualConfig(win_size=W, surf_size=G, pts_size=6,
                                     seed=3)
        R_gt, p_gt, body = virtual.generate(vcfg)
        R0, p0 = virtual.perturb(R_gt, p_gt, vcfg)
        # host-side moment build: the on-device per-point (N,4,4) outer
        # product intermediate is 32x-padded by the (4,128) tile layout
        # (25.8 GB at W=512, G=4096 — exceeds HBM)
        q = np.concatenate([body, np.ones(body.shape[:-1] + (1,))], -1)
        C = np.einsum("gwka,gwkb->gwab", q, q)
        fK = body.shape[2]
        # stay in NUMPY f64 through recentering (x64 is off in this TPU
        # process; jnp would silently truncate before the cancellation)
        f64 = Fmod.PlaneFactors(
            C=C, Cfix=np.zeros((G, 4, 4)),
            coe=np.full((G,), float(W * fK)),
            centers=np.zeros((G, 3)), body_centers=np.zeros((G, W, 3)))
        f = Fmod.recenter_bodies(f64).astype(np.float32)
        del q, C, f64
        R = jnp.asarray(R0, jnp.float32)
        p = jnp.asarray(p0, jnp.float32)
        pkf = jax.block_until_ready(jax.jit(packed_mod.pack_factors)(f))
        Wp, Gp = pkf.wp, pkf.mom.shape[2]
        flops_h = 3 * 2 * (6 * Wp) ** 2 * Gp

        rec = {"W": W, "Wp": Wp, "planes": G, "Gp": Gp}
        with jax.default_matmul_precision("float32"):
            # xla_bf16: one-pass bf16 Hessian matmul (H only steers the
            # Newton step; J/res stay exact-f32) — the cheapest form
            for impl, hp in (("xla", lax.Precision.HIGH),
                             ("pallas2", lax.Precision.HIGH),
                             ("pallas3", lax.Precision.HIGH),
                             ("xla_bf16", lax.Precision.DEFAULT)):
                def ev(Rc, pc, impl=impl, hp=hp):
                    return pe.evaluate_packed(
                        Rc, pc, pkf, impl=impl.split("_")[0],
                        hess_precision=hp)

                def maker(K):
                    @jax.jit
                    def run(R, p):
                        def body(_, c):
                            Rc, pc, s = c
                            o = ev(Rc, pc)
                            s2 = sum(jnp.sum(jnp.abs(x)) for x in o)
                            return (Rc, pc + 1e-30 * s2, s2)
                        return lax.fori_loop(
                            0, K, body, (R, p, jnp.zeros(())))[2]
                    return run

                try:
                    dt = slope(maker, (R, p))
                    rec[f"eval_{impl}_ms"] = round(dt * 1e3, 3)
                    # bf16 is a ONE-pass dot: 1/3 the MXU passes
                    fl = flops_h / (3 if hp == lax.Precision.DEFAULT else 1)
                    rec[f"eval_{impl}_tflops"] = round(fl / dt / 1e12, 2)
                except Exception as e:  # VMEM overflow at large W
                    rec[f"eval_{impl}_ms"] = None
                    rec[f"eval_{impl}_error"] = str(e).split("\n")[0][:120]

            # whole 10-iteration fused LM solve, wall clock (one dispatch)
            scfg = SolverConfig(max_iters=10, u_init=0.1, rel_tol=0.0,
                                min_planes_per_pose=0)
            outs = {}
            for hp_name in ("high", "bf16"):
                def run_loop(hp_name=hp_name):
                    return lm.damping_iter(R, p, f, scfg, centered=True,
                                           backend="packed",
                                           hess_precision=hp_name)
                jax.block_until_ready(run_loop().R)
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    o = run_loop()
                    jax.block_until_ready(o.R)
                    ts.append(time.perf_counter() - t0)
                outs[hp_name] = o
                key = "loop10" if hp_name == "high" else "loop10_bf16"
                rec[f"{key}_wall_ms"] = round(min(ts) * 1e3, 1)
                rec[f"{key}_iter_per_s"] = round(10 / min(ts), 1)
            # convergence-equality data for the one-pass bf16 Hessian;
            # ALL host fetches deferred past the last timed dispatch
            # (transfer poisoning — artifacts/transfer_poisoning.md)
            pending.append((rec, outs))
        out["windows"].append(rec)
        print(json.dumps(rec), flush=True)

    for rec, outs in pending:
        rec["loop10_residual"] = float(outs["high"].residual)
        rec["loop10_bf16_residual"] = float(outs["bf16"].residual)
        rec["loop10_iters"] = int(outs["high"].iters)
        rec["loop10_bf16_iters"] = int(outs["bf16"].iters)
        print(json.dumps(rec), flush=True)

    outp = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    with open(outp / "tpu_dense_scale.json", "w") as fh:
        json.dump(out, fh, indent=2)
