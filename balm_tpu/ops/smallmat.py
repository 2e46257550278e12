"""Unrolled small-matrix products for TPU.

The factor kernels are full of per-(plane, scan) products of 3x3/4x4/6x4
matrices.  Lowering those as batched `dot_general` puts 4-wide contractions
on the 128x128 MXU (~1/1000 utilization); measured on v5e, a (G, W, 4, 4)
matmul chain runs ~10x faster when unrolled into elementwise multiply-adds
over the (G, W) batch — pure VPU work that XLA fuses into one kernel.
These helpers unroll the last two (static, tiny) dims at trace time.
"""

from __future__ import annotations

import jax.numpy as jnp


def matmul(A, B, *, transpose_b: bool = False):
    """(..., m, k) @ (..., k, n) (or B^T) with tiny static m, k, n.

    Batch dims broadcast like jnp.matmul.
    """
    m, k = A.shape[-2], A.shape[-1]
    n = B.shape[-2] if transpose_b else B.shape[-1]
    rows = []
    for a in range(m):
        cols = []
        for b in range(n):
            if transpose_b:
                s = A[..., a, 0] * B[..., b, 0]
                for c in range(1, k):
                    s = s + A[..., a, c] * B[..., b, c]
            else:
                s = A[..., a, 0] * B[..., 0, b]
                for c in range(1, k):
                    s = s + A[..., a, c] * B[..., c, b]
            cols.append(s)
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


def matvec(A, v):
    """(..., m, k) @ (..., k) -> (..., m) with tiny static m, k."""
    m, k = A.shape[-2], A.shape[-1]
    outs = []
    for a in range(m):
        s = A[..., a, 0] * v[..., 0]
        for c in range(1, k):
            s = s + A[..., a, c] * v[..., c]
        outs.append(s)
    return jnp.stack(outs, axis=-1)


def congruence(A, B, *, transpose_first: bool = False):
    """A B A^T (or A^T B A) with tiny static dims."""
    if transpose_first:
        At = jnp.swapaxes(A, -1, -2)
        return matmul(matmul(At, B), At, transpose_b=True)
    return matmul(matmul(A, B), A, transpose_b=True)
