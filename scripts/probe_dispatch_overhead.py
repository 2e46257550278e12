"""Probe WHAT the axon tunnel's per-dispatch overhead scales with.

Hypotheses: (a) fixed floor, (b) argument bytes, (c) output bytes,
(d) program size (op count).  Each probe isolates one axis.

Usage: BENCH_FORCE_TPU=1 python scripts/probe_dispatch_overhead.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def best_of(fn, n=6):
    import jax
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"device={jax.devices()[0]}", flush=True)
    out = {}

    z = jnp.zeros(())
    noop = jax.jit(lambda x: x + 1.0)
    noop(z).block_until_ready()
    out["noop"] = best_of(lambda: noop(z))

    # (b) argument bytes: big on-device arg, trivial program
    big = jnp.zeros((4096, 4096), jnp.float32)  # 64 MB
    argf = jax.jit(lambda a, x: x + a[0, 0])
    argf(big, z).block_until_ready()
    out["arg64MB"] = best_of(lambda: argf(big, z))

    # (c) output bytes: tiny arg, 64 MB output
    outf = jax.jit(lambda x: jnp.full((4096, 4096), x))
    outf(z).block_until_ready()
    out["out64MB"] = best_of(lambda: outf(z))

    # (d) program size: unrolled elementwise chains on a tiny array
    for k in (100, 1000, 4000):
        def chain(x, k=k):
            for i in range(k):
                x = x * 1.0000001 + 1e-9 * (i % 7)
            return x
        cf = jax.jit(chain)
        cf(z).block_until_ready()
        out[f"chain{k}"] = best_of(lambda: cf(z))

    # (d') same op count inside a fori_loop body (rolled program, tiny HLO)
    def rolled(x):
        return lax.fori_loop(
            0, 4000, lambda i, x: x * 1.0000001 + 1e-9 * (i % 7), x)
    rf = jax.jit(rolled)
    rf(z).block_until_ready()
    out["rolled4000"] = best_of(lambda: rf(z))

    # (e) iteration count with identical program: 10 vs 30 trips of a
    # fori_loop doing a real matmul (compute scales, program fixed)
    A = jnp.eye(512, dtype=jnp.float32)
    def mm(n):
        @jax.jit
        def f(A):
            return lax.fori_loop(
                0, n, lambda i, X: 0.5 * (X @ X) + 0.5 * A, A)
        return f
    m10, m30 = mm(10), mm(30)
    m10(A).block_until_ready()
    m30(A).block_until_ready()
    out["mmloop10"] = best_of(lambda: m10(A))
    out["mmloop30"] = best_of(lambda: m30(A))

    out = {k: round(v * 1e3, 3) for k, v in out.items()}
    print(json.dumps(out), flush=True)
