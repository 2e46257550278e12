"""Isolate the cost pieces of the v3 per-point pass + table phase (TPU).

Pieces at realworld scale (N=16M, n_cs=1.85M):
  a. 10-ch data build (elementwise)                       [bandwidth]
  b. blocked in-block cumsum (NB, B, 10)                  [XLA cumsum]
  c. boundary gathers at cs_cap rows x 10ch               [gather]
  d. 1-ch bounds scatter to cs_cap                        [scatter]
  e. banchor per-point gather (16M x 3)                   [gather]
  f. full sorted_segment_sum with precomputed bounds
each at cs_cap in {2^21, 2^22} and block in {512, 1024, 2048}.

Run: python scripts/microbench_pass_pieces.py
"""

import functools
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

from balm_tpu.ops import segments  # noqa: E402
from balm_tpu.utils import sync  # noqa: E402


def slope(fn, *args, k=4, reps=2):
    def chain(kk):
        t0 = time.perf_counter()
        c = jnp.float32(0.0)
        out = None
        for _ in range(kk):
            out = fn(c, *args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            c = (leaf.ravel()[0] * 0).astype(jnp.float32)
        sync.fetch_scalar(out)
        return time.perf_counter() - t0

    chain(1)  # compile
    t1 = min(chain(1) for _ in range(reps))
    tk = min(chain(k) for _ in range(reps))
    return max((tk - t1) / (k - 1), 0.0)


def main():
    N = 16 << 20
    n_seg_real = 1_850_000
    rng = np.random.default_rng(0)
    # sorted contiguous segment ids with realistic run lengths (~N/n_seg)
    lens = rng.poisson(N / n_seg_real, n_seg_real) + 1
    seg = np.repeat(np.arange(n_seg_real, dtype=np.int32), lens)[:N]
    if len(seg) < N:
        seg = np.concatenate([seg, np.full(N - len(seg), seg[-1],
                                           np.int32)])
    body = rng.normal(size=(N, 3)).astype(np.float32)
    segd = jax.device_put(jnp.asarray(seg))
    bodyd = jax.device_put(jnp.asarray(body))
    sync.fetch_scalar(bodyd[0, 0])
    out = {"backend": jax.default_backend(), "N": N,
           "n_seg": int(seg.max()) + 1}

    @jax.jit
    def build(c, b):
        x, y, z = b[:, 0] + c, b[:, 1], b[:, 2]
        one = jnp.ones_like(x)
        return jnp.stack([x * x, x * y, x * z, y * y, y * z, z * z,
                          x, y, z, one], -1)

    out["a_build10"] = round(slope(build, bodyd), 4)
    data = build(jnp.float32(0.0), bodyd)
    data = jax.device_put(data)

    for B in (512, 1024, 2048):
        @jax.jit
        def cs(c, d):
            return jnp.cumsum((d + c).reshape(-1, B, 10), axis=1)

        out[f"b_cumsum_B{B}"] = round(slope(cs, data), 4)

    for cap in (1 << 21, 1 << 22):
        bounds = segments.segment_bounds(segd, cap)
        bounds = jax.tree_util.tree_map(jax.device_put, bounds)

        @jax.jit
        def gath(c, d, b0):
            flat = d + c
            return flat[jnp.where(b0[2], b0[0], 0)]

        out[f"c_gather1_cap{cap >> 20}M"] = round(
            slope(gath, data, bounds), 4)

        @functools.partial(jax.jit, static_argnums=())
        def bscatter(c, s):
            pos = jnp.arange(N, dtype=jnp.int32)
            new = jnp.ones(N, bool).at[1:].set(s[1:] != s[:-1])
            return jnp.zeros(cap + 1, jnp.int32).at[
                jnp.where(new, jnp.minimum(s, cap), cap)].set(
                pos + c.astype(jnp.int32), mode="drop")

        out[f"d_boundscatter_cap{cap >> 20}M"] = round(
            slope(bscatter, segd), 4)

        @jax.jit
        def anch(c, b, s):
            tab = jnp.zeros((cap, 3), jnp.float32) + c
            return tab[jnp.minimum(s, cap - 1)] + b

        out[f"e_ptgather_cap{cap >> 20}M"] = round(
            slope(anch, bodyd, segd), 4)

        for B in (512, 1024):
            @functools.partial(jax.jit, static_argnums=())
            def full(c, d, s, b0):
                return segments.sorted_segment_sum(
                    d + c, s, num_segments=cap, block=B, bounds=b0)

            out[f"f_segsum_cap{cap >> 20}M_B{B}"] = round(
                slope(full, data, segd, bounds), 4)
        print(json.dumps(out), flush=True)

    with open("artifacts/microbench_pass_pieces.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
