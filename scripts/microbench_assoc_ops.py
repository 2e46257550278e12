"""Microbenchmark the candidate device-voxelization primitives on TPU.

The device-side association design (voxel/device.py) is built from a few
primitive shapes; this measures each on the real chip so the design picks
the right root-assignment strategy (hash-table scatter vs global sort).

TIMING GOTCHA (discovered here): through the axon tunnel,
`jax.block_until_ready` returns immediately WITHOUT waiting for the remote
computation (0.2 ms for a 16M-point segment_sum whose true cost is
~100 ms+).  The only reliable sync is a device->host fetch of a scalar.
So each op is timed as slope((k runs + 1 scalar fetch) for k in {1, K}):
per-op cost = (t_K - t_1) / (K - 1), which cancels both the dispatch
round-trip and the fetch/stall cost.  Chained runs are data-dependent
(out feeds the next call) so the device can't overlap them away.

Run: python scripts/microbench_assoc_ops.py [N_millions]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def timed_chain(fn, reduce_fn, args, k):
    """Run fn k times (data-dependent chain via a scalar carry), fetch one
    scalar at the end; returns wall seconds."""
    t0 = time.perf_counter()
    carry = jnp.float32(0.0)
    for _ in range(k):
        out = fn(carry, *args)
        carry = reduce_fn(out)
    float(carry)  # the ONLY sync that works through the tunnel
    return time.perf_counter() - t0


def bench(name, fn, reduce_fn, args, n_pts, k=5):
    # compile + warm
    float(reduce_fn(fn(jnp.float32(0.0), *args)))
    t1 = min(timed_chain(fn, reduce_fn, args, 1) for _ in range(2))
    tk = min(timed_chain(fn, reduce_fn, args, k) for _ in range(2))
    per = (tk - t1) / (k - 1)
    print(f"{name}: {per*1e3:.1f} ms/op ({n_pts/max(per,1e-9)/1e6:.0f} "
          f"Mpts/s; 1-run wall {t1*1e3:.0f} ms)", flush=True)
    return per


def main(nm=16):
    N = nm * 1_000_000
    S = 1 << 17
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} N={N} S={S}", flush=True)

    seg = jax.device_put(rng.integers(0, S, N).astype(np.int32))
    data = jax.device_put(rng.standard_normal((N, 13)).astype(np.float32))
    keys = jax.device_put(rng.integers(0, 1 << 30, N).astype(np.int32))

    rsum = jax.jit(lambda x: jnp.sum(x).astype(jnp.float32))

    @jax.jit
    def seg_sum(c, d, s):
        return jax.ops.segment_sum(d + c, s, num_segments=S)

    bench("segment_sum 13ch", seg_sum, rsum, (data, seg), N)

    @jax.jit
    def seg_sum1(c, d, s):
        return jax.ops.segment_sum(d + c, s, num_segments=S)

    bench("segment_sum 1ch", seg_sum1, rsum, (data[:, 0], seg), N)

    @jax.jit
    def scat_min(c, k_, s):
        tbl = jnp.full((S,), np.iinfo(np.int32).max, jnp.int32)
        return tbl.at[s].min(k_ + c.astype(jnp.int32), mode="drop")

    bench("scatter_min", scat_min,
          jax.jit(lambda x: jnp.sum(x % 97).astype(jnp.float32)),
          (keys, seg), N)

    @jax.jit
    def do_sort(c, k_):
        sk, si = jax.lax.sort(
            (k_ + c.astype(jnp.int32), jnp.arange(N, dtype=jnp.int32)),
            num_keys=1)
        return sk

    bench("sort+payload", do_sort,
          jax.jit(lambda x: jnp.sum(x % 97).astype(jnp.float32)),
          (keys,), N)

    W, Nmax = 177, (N + 176) // 177
    body = jax.device_put(
        rng.standard_normal((W, Nmax, 3)).astype(np.float32))
    Rm = jax.device_put(np.stack([np.eye(3, dtype=np.float32)] * W))
    pm = jax.device_put(np.zeros((W, 3), np.float32))

    @jax.jit
    def xform(c, b, R, p):
        return jnp.einsum("wij,wnj->wni", R, b) + p[:, None, :] + c

    bench("transform", xform, rsum, (body, Rm, pm), W * Nmax)

    tbl = jax.device_put(rng.standard_normal(S).astype(np.float32))

    @jax.jit
    def gath(c, t_, s):
        return t_[s] + c

    bench("gather", gath, rsum, (tbl, seg), N)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
