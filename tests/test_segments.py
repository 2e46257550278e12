"""Blocked sorted-segment-sum vs the jax.ops oracle (+ f64 accuracy)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from balm_tpu.ops import segments


def _case(rng, N, S, skew):
    """Sorted segment ids with a size skew: a few giant segments plus
    many small ones (the voxel-cell regime)."""
    w = rng.pareto(skew, S) + 0.01
    cnt = np.maximum((w / w.sum() * N).astype(int), 0)
    # make some segments empty and fix the total
    cnt[rng.integers(0, S, max(S // 10, 1))] = 0
    while cnt.sum() > N:
        cnt[np.argmax(cnt)] -= cnt.sum() - N
    seg = np.repeat(np.arange(S), cnt)
    if len(seg) < N:
        seg = np.concatenate([seg, np.full(N - len(seg), S - 1)])
    return np.sort(seg).astype(np.int32)


@pytest.mark.parametrize("N,S,block", [
    (10_000, 777, 256),
    (10_000, 7, 128),          # giant segments spanning many blocks
    (4_096, 4_096, 512),       # ~1 point per segment
    (1_000, 64, 512),          # N < block
    (1_001, 64, 256),          # N not a multiple of block
])
def test_matches_segment_sum(N, S, block):
    rng = np.random.default_rng(N + S)
    seg = _case(rng, N, S, 1.2)
    data = rng.standard_normal((N, 5))
    ours = segments.sorted_segment_sum(
        jnp.asarray(data, jnp.float32), jnp.asarray(seg),
        num_segments=S, block=block)
    ref = jax.ops.segment_sum(
        jnp.asarray(data, jnp.float64), jnp.asarray(seg), num_segments=S)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-6, atol=2e-5)


def test_out_of_range_rows_dropped():
    seg = jnp.asarray(np.sort(np.r_[np.zeros(5), np.full(4, 3),
                                    np.full(3, 99)]).astype(np.int32))
    data = jnp.ones((12, 2), jnp.float32)
    out = segments.sorted_segment_sum(data, seg, num_segments=4, block=4)
    np.testing.assert_allclose(np.asarray(out[:, 0]), [5, 0, 0, 4])


def test_accuracy_beats_pointwise_at_scale():
    """Blocked accumulation must track the f64 oracle tightly even for a
    segment of 100k near-cancelling values."""
    rng = np.random.default_rng(0)
    N = 1 << 17
    data = (rng.standard_normal((N, 1)) + 0.01).astype(np.float32)
    seg = np.zeros(N, np.int32)
    ours = segments.sorted_segment_sum(
        jnp.asarray(data), jnp.asarray(seg), num_segments=1)
    ref = float(np.sum(np.asarray(data, np.float64)))
    assert abs(float(ours[0, 0]) - ref) < 64 * abs(ref) * 1e-7


def test_segment_first_and_bounds():
    seg = jnp.asarray([0, 0, 2, 2, 2, 5], jnp.int32)
    vals = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    first = segments.segment_first(vals, seg, num_segments=6)
    np.testing.assert_allclose(np.asarray(first[0]), [0, 1])
    np.testing.assert_allclose(np.asarray(first[2]), [4, 5])
    np.testing.assert_allclose(np.asarray(first[5]), [10, 11])
    np.testing.assert_allclose(np.asarray(first[1]), [0, 0])
    start, end, have = segments.segment_bounds(seg, 6)
    assert list(np.asarray(have)) == [True, False, True, False, False, True]
    assert list(np.asarray(start)[[0, 2, 5]]) == [0, 2, 5]
    assert list(np.asarray(end)[[0, 2, 5]]) == [2, 5, 6]
