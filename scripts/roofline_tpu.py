"""Roofline for the Hessian evaluation at HBA scale (VERDICT r2 #2).

Separates the packed evaluator's phases on the real chip and compares
achieved FLOP/s against (a) the same-shape bare matmul (the attainable
ceiling for the rank-row product) and (b) the chip's bf16 peak:

  moments  csum_packed_xla      O(W G * 30)    memory-bound channel ops
  eigh     residual_only's tail O(G * 100)     3x3 closed-form eigvals
  rows     _rows_channels_xla   O(W G * 200)   elementwise channel math
  matmul   3x (6W, G)@(G, 6W)   2*(6W)^2*3G    the MXU phase

All timings use the fetch-synced slope protocol (utils/sync.py).
Synthetic plane-like factors (thin PSD covariances) keep the eigh branch
realistic.  Produces artifacts/roofline.json.

Run: python scripts/roofline_tpu.py [--configs WxG ...]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

_CACHE = str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from balm_tpu.ops import packed as packed_mod  # noqa: E402
from balm_tpu.ops import pallas_evaluate as pe  # noqa: E402
from balm_tpu.utils import sync  # noqa: E402

PEAK_BF16 = 197.0  # v5e TFLOP/s
PEAK_F32_3PASS = PEAK_BF16 / 3.0  # bf16x3 'high' ceiling


def synth(W, G, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((G, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    t1 = np.cross(u, rng.standard_normal((G, 3)))
    t1 /= np.linalg.norm(t1, axis=1, keepdims=True)
    t2 = np.cross(u, t1)
    n = np.full((W, G), 40.0, np.float32)
    s1 = (0.3 + 0.2 * rng.random((W, G)))[..., None, None]
    s2 = (0.3 + 0.2 * rng.random((W, G)))[..., None, None]
    sn = 1e-4
    P = (t1[None, :, :, None] * t1[None, :, None, :] * s1 ** 2
         + t2[None, :, :, None] * t2[None, :, None, :] * s2 ** 2
         + u[None, :, :, None] * u[None, :, None, :] * sn) * n[..., None, None]
    b = rng.standard_normal((W, G, 3)).astype(np.float32) * 0.05
    chans = [P[..., 0, 0], P[..., 0, 1], P[..., 0, 2],
             P[..., 1, 1], P[..., 1, 2], P[..., 2, 2],
             b[..., 0], b[..., 1], b[..., 2], n]
    mom = np.stack(chans, axis=1).astype(np.float32)    # (W, 10, G)
    cen = rng.standard_normal((3, G)).astype(np.float32) * 2
    coe = np.full((1, G), 40.0 * W, np.float32)
    cfix = np.zeros((10, G), np.float32)
    pk = packed_mod.PackedFactors(
        mom=jax.device_put(mom), cen=jax.device_put(cen),
        coe=jax.device_put(coe), cfix=jax.device_put(cfix))
    R = np.tile(np.eye(3, dtype=np.float32), (W, 1, 1))
    p = rng.standard_normal((W, 3)).astype(np.float32) * 0.1
    return pk, jax.device_put(R), jax.device_put(p)


def slope(fn, arg, k=4, reps=2):
    def perturb(c, r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return c + (leaf.ravel()[0] * 0).astype(c.dtype)

    sync.fetch_scalar(fn(arg))
    t1 = min(sync.timed_chain(fn, arg, 1, perturb) for _ in range(reps))
    tk = min(sync.timed_chain(fn, arg, k, perturb) for _ in range(reps))
    return max((tk - t1) / (k - 1), 1e-9)


def slope_args(fn, args, k=4, reps=2):
    """Slope-time fn(carry, *args) with a f32 scalar carry dependency."""
    import time as _t

    sync.fetch_scalar(fn(jnp.float32(0.0), *args))

    def chain(n):
        t0 = _t.perf_counter()
        c = jnp.float32(0.0)
        outv = None
        for _ in range(n):
            outv = fn(c, *args)
            leaf = jax.tree_util.tree_leaves(outv)[0]
            c = (leaf.ravel()[0] * 0).astype(jnp.float32)
        sync.fetch_scalar(outv)
        return _t.perf_counter() - t0

    t1 = min(chain(1) for _ in range(reps))
    tk = min(chain(k) for _ in range(reps))
    return max((tk - t1) / (k - 1), 1e-9)


def run_config(W, G):
    pk, R, p = synth(W, G)
    Wp, Gp = pk.wp, pk.gp
    out = {"W": W, "G": G, "Wp": Wp, "Gp": Gp}

    # NOTE: pk/p ride as ARGUMENTS via slope's (carry, *args) pattern —
    # a closed-over device array becomes a jaxpr constant and ships with
    # the remote compile request (HTTP 413 past ~200 MB)

    def slope_a(fn, *args):
        g = jax.jit(lambda c, R_, p_, *f: fn(R_ + c * 0, p_, pk._replace(
            mom=f[0], cen=f[1], coe=f[2], cfix=f[3])))
        return slope_args(g, (R, p) + tuple(pk))

    # phase: full evaluate (HIGH = bf16x3 rank-row product)
    out["evaluate_high_s"] = slope_a(
        lambda R_, p_, k: pe.evaluate_packed(
            R_, p_, k, hess_precision=lax.Precision.HIGH))
    out["evaluate_bf16_s"] = slope_a(
        lambda R_, p_, k: pe.evaluate_packed(
            R_, p_, k, hess_precision=lax.Precision.DEFAULT))

    # fused kernel: rows assembled in VMEM, no HBM rows round-trip
    try:
        out["evaluate_pallas3_s"] = slope_a(
            lambda R_, p_, k: pe.evaluate_packed(
                R_, p_, k, impl="pallas3",
                hess_precision=lax.Precision.HIGH))
    except Exception as e:  # noqa: BLE001 — record, don't die
        out["evaluate_pallas3_error"] = str(e)[:200]

    # phase: residual only (moments + eigvals)
    out["residual_s"] = slope_a(
        lambda R_, p_, k: pe.residual_only_packed(R_, p_, k))

    # phase: moments alone
    out["moments_s"] = slope_a(
        lambda R_, p_, k: pe.csum_packed_xla(
            packed_mod.pad_poses(R_, p_, Wp).astype(jnp.float32),
            k.mom, k.cen, k.cfix))

    # ceiling: bare 3x (6Wp, Gp)@(Gp, 6Wp) matmul at both precisions
    rng = np.random.default_rng(1)
    A = jax.device_put(
        rng.standard_normal((3, 6 * Wp, Gp)).astype(np.float32))

    def mk_mm(prec):
        @jax.jit
        def mm(A_):
            H = None
            for k in range(3):
                Hk = lax.dot_general(
                    A_[k], A_[k],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=prec)
                H = Hk if H is None else H + Hk
            return H
        return mm

    out["matmul_high_s"] = slope(mk_mm(lax.Precision.HIGH), A)
    out["matmul_bf16_s"] = slope(mk_mm(lax.Precision.DEFAULT), A)

    flops = 2.0 * (6 * Wp) ** 2 * (3 * Gp)
    out["hessian_flops"] = flops
    for k in ("evaluate_high", "evaluate_bf16", "matmul_high",
              "matmul_bf16", "evaluate_pallas3"):
        if f"{k}_s" in out:
            out[f"{k}_tflops"] = round(flops / out[f"{k}_s"] / 1e12, 2)
    out["mfu_evaluate_high_vs_bf16_peak"] = round(
        out["evaluate_high_tflops"] / PEAK_BF16, 4)
    out["mfu_evaluate_bf16_vs_bf16_peak"] = round(
        out["evaluate_bf16_tflops"] / PEAK_BF16, 4)
    out["mfu_matmul_high_vs_3pass_ceiling"] = round(
        out["matmul_high_tflops"] / PEAK_F32_3PASS, 4)
    out["mfu_matmul_bf16_vs_peak"] = round(
        out["matmul_bf16_tflops"] / PEAK_BF16, 4)
    # phase decomposition: rows-assembly = evaluate - matmul - moments
    # - eig (eig bundled in residual - moments)
    out["eig_s"] = max(out["residual_s"] - out["moments_s"], 0.0)
    out["rows_s"] = max(out["evaluate_high_s"] - out["matmul_high_s"]
                        - out["residual_s"], 0.0)
    for k, v in out.items():
        if k.endswith("_s"):
            out[k] = round(v, 5)
    print(json.dumps(out), flush=True)
    return out


def main(argv):
    configs = [(512, 8192), (1024, 16384), (2048, 16384)]
    if argv:
        configs = [tuple(map(int, a.split("x"))) for a in argv]
    print(f"backend={jax.default_backend()}", flush=True)
    results = [run_config(W, G) for W, G in configs]
    path = pathlib.Path("artifacts/roofline.json")
    with open(path, "w") as fh:
        json.dump({
            "peak_bf16_tflops": PEAK_BF16,
            "peak_f32_3pass_tflops": PEAK_F32_3PASS,
            "protocol": "fetch-synced slope (utils/sync.py)",
            "configs": results,
        }, fh, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
