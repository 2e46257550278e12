"""Sorted segmented reductions without big scatters — the TPU-native way.

`jax.ops.segment_sum` lowers to scatter-add, whose throughput on the v5e
collapses once the output table leaves on-chip memory: measured at N=16M
(scripts/microbench_segsum.py, slope protocol)

    rows (N, 10) -> 131k segments : 0.155 s
    rows (N, 10) -> 524k segments : 1.832 s   (12x per-channel slowdown)
    rows (N, 10) ->   2M segments : 1.751 s
    rows (N,  1) ->   2M segments : 0.141 s

while the dense primitives stay fast at any table size: a (N/B, B, C)
block reduction costs 0.017 s and a 2M-row table scatter 0.022 s.  The
voxelizer's association pass is segment-sum-bound (artifacts/
assoc_stage_profile.json: 11.95 s of which ~10 s is scatter), so this
module implements the classic two-level blocked segmented reduction for
SORTED indices out of exactly those fast primitives:

  1. block-local inclusive cumsum over (N/B, B, C)           [dense scan]
  2. PURE blocks (one segment covers the whole block) add their totals
     to the output row via a (N/B)-row table scatter          [small]
  3. every segment reads its head/tail partial sums from the block-local
     cumsum at its boundary positions                         [3 gathers]
  4. segment boundaries come from two 1-channel index scatters (min/max
     of position per segment)                                 [fast path]

Accuracy is BETTER than scatter-add's sequential accumulation: in-block
partials are exact to B*eps*|prefix| and the cross-block accumulation
adds ~n/B terms instead of n, so the error constant drops by the block
size.  Float32 counts stay exact below 2^24 points per segment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def segment_bounds(seg, num_segments: int):
    """Start (inclusive) / end (exclusive) positions of each segment id
    in a SORTED (N,) int32 segment array.  Out-of-range ids are dropped.
    Returns (start (S,), end (S,), have (S,) bool)."""
    N = seg.shape[0]
    idx = jnp.arange(N, dtype=jnp.int32)
    segc = jnp.where((seg >= 0) & (seg < num_segments), seg, num_segments)
    start = jnp.full((num_segments + 1,), N, jnp.int32).at[segc].min(
        idx, mode="drop")[:num_segments]
    end = jnp.full((num_segments + 1,), -1, jnp.int32).at[segc].max(
        idx, mode="drop")[:num_segments] + 1
    have = start < N
    return start, end, have


@functools.partial(jax.jit, static_argnames=("num_segments", "block"))
def sorted_segment_sum(data, seg, *, num_segments: int, block: int = 512,
                       bounds=None):
    """segment_sum for SORTED `seg`, scatter-free on the hot path.

    data (N, C) float; seg (N,) int32 ascending (out-of-range rows are
    dropped).  Returns (num_segments, C).  Matches jax.ops.segment_sum
    to blocked-summation roundoff (tests/test_segments.py pins both the
    values and an f64 oracle).

    bounds: optional precomputed `segment_bounds(seg, num_segments)` —
    the two index scatters inside it are the priciest piece at 16M
    points, so callers running several reductions over the SAME
    segmentation should compute them once.
    """
    N, C = data.shape
    S = num_segments
    B = block
    pad = (-N) % B
    if pad:
        data = jnp.concatenate(
            [data, jnp.zeros((pad, C), data.dtype)], axis=0)
        seg = jnp.concatenate(
            [seg, jnp.full((pad,), S, jnp.int32)], axis=0)
        N = N + pad
    NB = N // B

    start, end, have = (bounds if bounds is not None
                        else segment_bounds(seg, S))
    # empty segments: give them a harmless in-range span, mask at the end
    s = jnp.where(have, start, 0)
    e = jnp.where(have, end, 1)

    d3 = data.reshape(NB, B, C)
    seg3 = seg.reshape(NB, B)
    csum = jnp.cumsum(d3, axis=1)                    # block-local inclusive
    flat = csum.reshape(NB * B, C)

    # --- pure blocks: whole block inside one segment -> table scatter ---
    pure = seg3[:, 0] == seg3[:, -1]
    pure_id = jnp.where(
        pure & (seg3[:, 0] >= 0) & (seg3[:, 0] < S), seg3[:, 0], S)
    out = jnp.zeros((S + 1, C), data.dtype).at[pure_id].add(
        csum[:, -1, :], mode="drop")[:S]

    # --- boundary partials ---
    b0 = s // B
    b1 = (e - 1) // B
    l0 = s - b0 * B
    h_end = jnp.minimum(e - 1 - b0 * B, B - 1)

    head = flat[b0 * B + h_end]
    head = head - jnp.where((l0 > 0)[:, None],
                            flat[b0 * B + jnp.maximum(l0 - 1, 0)], 0.0)
    head = jnp.where((have & ~pure[b0])[:, None], head, 0.0)

    tail = flat[b1 * B + (e - 1 - b1 * B)]
    tail = jnp.where((have & (b1 > b0) & ~pure[b1])[:, None], tail, 0.0)

    return out + head + tail


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_first(values, seg, *, num_segments: int, bounds=None):
    """Representative (first-row) value per segment of a SORTED segment
    array: values (N, C) -> (S, C).  One gather at table granularity."""
    start, _, have = (bounds if bounds is not None
                      else segment_bounds(seg, num_segments))
    out = values[jnp.where(have, start, 0)]
    return jnp.where(have[:, None], out, 0)
