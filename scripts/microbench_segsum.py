"""Which segment-sum formulation is fast on the v5e?

The staged profile (artifacts/assoc_stage_profile.json) shows the device
voxelizer is 100% scatter-bound: 10ch segment_sum at 2M segments costs
1.8 s for 16M points while the SORT of the same points costs 0.066 s.
This sweeps the design space: table size, sortedness flags, channel
count/padding, and the cumsum+boundary-gather reformulation (which does
no scatter at all).

Run: python scripts/microbench_segsum.py [N_millions]
"""

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

from balm_tpu.utils import sync  # noqa: E402


def slope(fn, args, k=4, reps=2):
    sync.fetch_scalar(fn(jnp.float32(0.0), *args))

    def chain(k):
        t0 = time.perf_counter()
        c = jnp.float32(0.0)
        out = None
        for _ in range(k):
            out = fn(c, *args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            c = (leaf.ravel()[0] * 0).astype(jnp.float32)
        sync.fetch_scalar(out)
        return time.perf_counter() - t0

    t1 = min(chain(1) for _ in range(reps))
    tk = min(chain(k) for _ in range(reps))
    return max((tk - t1) / (k - 1), 0.0)


def main(nm=16):
    N = nm * 1_000_000
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} N={N}", flush=True)

    data = jax.device_put(rng.standard_normal((N, 10)).astype(np.float32))

    for S in (1 << 17, 1 << 19, 1 << 21):
        seg = jax.device_put(np.sort(rng.integers(0, S, N)).astype(np.int32))

        @jax.jit
        def f_sorted(c, d, s, S=S):
            return jax.ops.segment_sum(d + c, s, num_segments=S,
                                       indices_are_sorted=True)

        @jax.jit
        def f_unsorted(c, d, s, S=S):
            return jax.ops.segment_sum(d + c, s, num_segments=S)

        t_s = slope(f_sorted, (data, seg))
        t_u = slope(f_unsorted, (data, seg))
        print(f"S={S}: sorted={t_s:.3f}s unsorted={t_u:.3f}s", flush=True)

    S = 1 << 21
    seg = jax.device_put(np.sort(rng.integers(0, S, N)).astype(np.int32))

    # channel scaling: 1 vs 4 vs 10 vs 16
    for ch in (1, 4, 16):
        d = data[:, :ch] if ch <= 10 else jnp.concatenate(
            [data, data[:, :6]], axis=1)

        @jax.jit
        def f_ch(c, d_, s):
            return jax.ops.segment_sum(d_ + c, s, num_segments=S,
                                       indices_are_sorted=True)

        print(f"ch={ch}: {slope(f_ch, (d, seg)):.3f}s", flush=True)

    # cumsum + boundary gather (NO scatter): per-segment sum =
    # csum[last_of_segment] - csum[last_of_previous_segment].
    # last-of-segment positions come from a searchsorted on the sorted
    # segment ids — also scatter-free.
    @jax.jit
    def f_cumsum(c, d, s):
        csum = jnp.cumsum(d + c, axis=0, dtype=jnp.float32)
        # last index of each segment id q: searchsorted(s, q, 'right')-1
        q = jnp.arange(S, dtype=jnp.int32)
        last = jnp.searchsorted(s, q, side="right") - 1
        have = jnp.searchsorted(s, q, side="left") <= last
        hi_v = csum[jnp.maximum(last, 0)]
        prev = jnp.where(q > 0, jnp.maximum(last, 0), 0)
        # previous segment's last = left boundary - 1
        left = jnp.searchsorted(s, q, side="left")
        lo_v = jnp.where((left > 0)[:, None], csum[jnp.maximum(left - 1, 0)],
                         0.0)
        return jnp.where(have[:, None], hi_v - lo_v, 0.0)

    print(f"cumsum+gather: {slope(f_cumsum, (data, seg)):.3f}s", flush=True)

    # two-level blocked: dense per-block partial sums (B=512) for the
    # dominant in-block mass + scatter of per-(block, segment) partials.
    # Here just measure the dense block reduction to bound the idea:
    B = 512

    @jax.jit
    def f_block(c, d):
        return jnp.sum((d + c).reshape(N // B, B, 10), axis=1)

    print(f"dense block-sum B={B}: {slope(f_block, (data,)):.3f}s",
          flush=True)

    # scatter with ONE row per segment (the cell-table scale): 2M rows
    # onto 2M slots
    small = jax.device_put(
        rng.standard_normal((S, 10)).astype(np.float32))
    segs2 = jax.device_put(np.sort(rng.integers(0, S // 8, S))
                           .astype(np.int32))

    @jax.jit
    def f_table(c, d, s):
        return jax.ops.segment_sum(d + c, s, num_segments=S // 8,
                                   indices_are_sorted=True)

    print(f"table-level segsum (2M rows): {slope(f_table, (small, segs2)):.3f}s",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
