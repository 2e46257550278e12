"""Block-tridiagonal direct solve of the banded BA normal equations.

The reference solves (H + uD) dx = -J with a DENSE LDLT capped at
W = 177 (bavoxel.hpp:1113-1114).  For mapping-scale windows the Hessian
is block-BANDED (every plane factor spans <= S contiguous poses — see
ops/factors_windowed.band_hessian), so grouping poses into supernodes of
B >= S poses makes H block-TRIDIAGONAL with (6B, 6B) blocks:

    [A_0  B_1^T            ]
    [B_1  A_1   B_2^T      ]
    [     B_2   A_2  ...   ]          K = ceil(W / B) supernodes.

The factorization is a block-tridiagonal Thomas recursion with pivoted
LU on each (6B, 6B) pivot block — ONE lax.scan of K steps, each an
MXU-sized LU + solves + GEMM, O(W B^2) total, LINEAR in W, with EXACT
dense-solver steps.  Per-block pivoting keeps it working on INDEFINITE
damped systems (far-from-optimum exact-Newton H), matching the robust
regime of the reference's dense LDLT.  This is the single-chip answer
to the round-4 large-W stall: the span-PCG's block-Jacobi steps capture
~89% of the cost reduction and stall; these steps are the dense
solver's, at any W.

A singular pivot block yields NaNs that the caller detects (dx
non-finite -> LM rejects, raises u, retries).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def supernode_blocks(Hband, B: int):
    """Hband (W, S, 6, 6) -> (Adiag (K, 6B, 6B), Asub (K, 6B, 6B)).

    B must be >= S (the block half-bandwidth) so each factor couples at
    most two adjacent supernodes.  Poses beyond W are padded with
    identity diagonal blocks (decoupled; their solution entries are
    discarded by the caller).

    Asub[k] = H[rows of supernode k, cols of supernode k-1] (Asub[0]
    is zero).
    """
    W, S, _, _ = Hband.shape
    assert B >= S, (B, S)
    K = -(-W // B)
    Wp = K * B
    pad = Wp - W
    Hb = jnp.pad(Hband, ((0, pad), (0, 0), (0, 0), (0, 0)))
    if pad:
        eye = jnp.eye(6, dtype=Hband.dtype)
        Hb = Hb.at[W:, 0].set(eye)

    a = jnp.arange(B)
    d_ab = a[None, :] - a[:, None]                       # (B, B) col - row

    def gather(wrow, d):
        """Block H[wrow, wrow + d] from the band, using symmetry for
        d < 0 and zero outside the band.  wrow, d: (K, B, B) int."""
        dpos = jnp.abs(d)
        wbase = jnp.where(d >= 0, wrow, wrow + d)        # row of the
        ok = dpos < S                                    # stored block
        wb = jnp.clip(wbase, 0, Wp - 1)
        blk = Hb[wb, jnp.where(ok, dpos, 0)]             # (K, B, B, 6, 6)
        blk = jnp.where((d < 0)[..., None, None],
                        jnp.swapaxes(blk, -1, -2), blk)
        return jnp.where(ok[..., None, None], blk, 0.0)

    k = jnp.arange(K)[:, None, None]
    # row pose index of entry (a, b) of supernode k's blocks: kB + a
    wrow = jnp.broadcast_to(k * B + a[None, :, None], (K, B, B))

    Adiag = gather(wrow, jnp.broadcast_to(d_ab, (K, B, B)))
    # sub block: rows in supernode k, cols in supernode k-1:
    # col = (k-1)B + b, row = kB + a -> d = col - row = -B + (b - a)
    Asub = gather(wrow, jnp.broadcast_to(d_ab - B, (K, B, B)))
    Asub = Asub.at[0].set(0.0)

    def to_mat(X):                                       # (K,B,B,6,6)->(K,6B,6B)
        return X.transpose(0, 1, 3, 2, 4).reshape(K, 6 * B, 6 * B)

    return to_mat(Adiag), to_mat(Asub)


def block_tridiag_factor(Adiag, Asub):
    """Block-tridiagonal Thomas factorization with per-block pivoted LU.

    Returns (lu (K, m, m), piv (K, m), Wsub (K, m, m)) with
    D_0 = A_0,  W_k = B_k D_{k-1}^{-1},  D_k = A_k - W_k B_k^T,
    each D_k stored LU-factored.  Per-block partial pivoting makes this
    robust on INDEFINITE damped systems — the same regime the
    reference's dense LDLT handles (bavoxel.hpp:1114) and a plain block
    Cholesky cannot (far-from-optimum exact-Newton H with u still
    small).  For an SPD input it produces the same solution as the
    Cholesky variant.
    """
    import jax.scipy.linalg as jsl

    m = Adiag.shape[1]

    def step(carry, AB):
        lu_prev, piv_prev = carry
        A, Bs = AB
        # W = Bs D_{k-1}^{-1}  <=>  D_{k-1}^T W^T = Bs^T
        Wt = jsl.lu_solve((lu_prev, piv_prev), Bs.T, trans=1)
        W = Wt.T
        Dk = A - W @ Bs.T
        lu, piv = jsl.lu_factor(Dk)
        return (lu, piv), (lu, piv, W)

    eye_lu, eye_piv = jax.scipy.linalg.lu_factor(
        jnp.eye(m, dtype=Adiag.dtype))
    (_, _), (lu, piv, W) = lax.scan(step, (eye_lu, eye_piv),
                                    (Adiag, Asub))
    return lu, piv, W


def block_tridiag_solve(lu, piv, Wsub, Bsupt, b):
    """Solve A x = b given block_tridiag_factor output; b (K, m).

    Bsupt: the (K, m, m) SUPER-diagonal blocks B_{k+1}^T shifted so
    Bsupt[k] couples x_{k+1} into row k (zero for the last supernode).
    """
    import jax.scipy.linalg as jsl

    m = b.shape[1]

    def fwd(yprev, WB):
        Wk, bk = WB
        y = bk - Wk @ yprev
        return y, y

    _, y = lax.scan(fwd, jnp.zeros((m,), b.dtype), (Wsub, b))

    def bwd(xnext, luPyB):
        luk, pivk, yk, Bn = luPyB
        x = jsl.lu_solve((luk, pivk), (yk - Bn @ xnext)[:, None])[:, 0]
        return x, x

    _, x = lax.scan(bwd, jnp.zeros((m,), b.dtype),
                    (lu, piv, y, Bsupt), reverse=True)
    return x


@functools.partial(jax.jit, static_argnames=("B",))
def solve_banded(Hband, b, B: int):
    """Solve H x = b for block-banded H given as Hband (W, S, 6, 6).

    b: (6W,) flat (w-major).  Returns (x (6W,), ok bool) — ok False when
    the factorization produced non-finite values (singular pivot).
    """
    W = Hband.shape[0]
    Adiag, Asub = supernode_blocks(Hband, B)
    K, m = Adiag.shape[:2]
    lu, piv, Wf = block_tridiag_factor(Adiag, Asub)
    # super-diagonal blocks B_{k+1}^T, aligned so index k couples x_{k+1}
    Bsupt = jnp.concatenate(
        [jnp.swapaxes(Asub[1:], -1, -2), jnp.zeros_like(Asub[:1])], axis=0)
    bp = jnp.pad(b, (0, K * m - 6 * W)).reshape(K, m)
    x = block_tridiag_solve(lu, piv, Wf, Bsupt, bp)
    x = x.reshape(-1)[: 6 * W]
    ok = jnp.all(jnp.isfinite(x))
    return jnp.where(ok, x, 0.0), ok
