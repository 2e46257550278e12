"""Reliable device synchronization + timing through the axon tunnel.

`jax.block_until_ready` does NOT block through the tunneled TPU runtime:
it returns in ~0.2 ms for computations whose true device time is hundreds
of ms (measured 2026-08, scripts/microbench_assoc_ops.py), because the
remote runtime acknowledges enqueue, not completion.  Every timing that
synced via block_until_ready measured dispatch latency — the round-2
bench headline was ~14x optimistic because of this.

The ONLY working sync is a device->host fetch.  But fetches are
expensive and historically destabilized subsequent dispatches
(artifacts/transfer_poisoning.md), so timings here use the SLOPE
protocol:

    per_run = (t[k runs + 1 fetch] - t[1 run + 1 fetch]) / (k - 1)

with runs chained through a data dependency (each run consumes a zero
multiple of the previous result) so the device cannot elide, reorder or
overlap them.  The single trailing fetch and the dispatch round-trips
cancel in the subtraction.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def fetch_scalar(tree) -> float:
    """Force completion of `tree`'s computation; returns a (meaningless)
    scalar derived from its first leaf.  The one sync that works."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timed_chain(run: Callable, carry_in, k: int,
                perturb: Callable | None = None) -> float:
    """Wall time of k data-dependent executions of `run` + one fetch.

    run(carry) -> result (a pytree); perturb(carry_in, result) -> next
    carry (default: carry_in + 0 * first-leaf-sum, which keeps the input
    values identical while creating a true dependency edge).
    """
    if perturb is None:
        def perturb(c, r):
            leaf = jax.tree_util.tree_leaves(r)[0]
            z = (jnp.sum(leaf) * 0).astype(c.dtype)
            return c + z

    t0 = time.perf_counter()
    carry = carry_in
    result = None
    for _ in range(k):
        result = run(carry)
        carry = perturb(carry_in, result)
    fetch_scalar(result)
    return time.perf_counter() - t0


def time_per_run(run: Callable, carry_in, k: int = 5, reps: int = 3,
                 warmup: bool = True) -> dict:
    """Slope-timed per-execution cost of `run` (see module docstring).

    Returns {"per_run_s", "t1_s", "tk_s", "k"}; best-of-`reps` for both
    chain lengths (the tunnel shows up to 15x run-to-run variance).
    """
    if warmup:
        fetch_scalar(run(carry_in))
    t1 = min(timed_chain(run, carry_in, 1) for _ in range(reps))
    tk = min(timed_chain(run, carry_in, k) for _ in range(reps))
    per = max((tk - t1) / (k - 1), 1e-9)
    return {"per_run_s": per, "t1_s": t1, "tk_s": tk, "k": k}


def assert_sync_works() -> bool:
    """True if block_until_ready actually blocks on this backend (CPU:
    yes; tunneled TPU: no).  Used by scripts to choose a protocol."""
    x = jnp.ones((1 << 20,), jnp.float32)

    @jax.jit
    def f(v):
        for _ in range(50):
            v = jnp.sin(v)
        return v

    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(x * 2))
    t_block = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(out[0])
    t_fetch = time.perf_counter() - t0
    # if the fetch waited much longer than the "blocking" call, block is
    # not blocking
    return not (t_fetch > 10 * max(t_block, 1e-4))
