"""Closed-form batched symmetric 3x3 eigendecomposition.

The reference calls Eigen::SelfAdjointEigenSolver<Matrix3d> once per plane
per evaluation (bavoxel.hpp:79, 214, 345, 452).  On TPU an iterative LAPACK
style solver would serialize; instead we use the trigonometric closed form
(Smith 1961) plus a Newton polish, fully vectorized over the plane axis so it
runs as pure VPU element-wise code and fuses with the surrounding kernel.

Eigenvalues are returned in ASCENDING order (matching Eigen and
jnp.linalg.eigh); eigenvectors are the COLUMNS of U.  All outputs are
consumed through outer products u u^T so eigenvector sign is irrelevant.
"""

from __future__ import annotations

import jax.numpy as jnp


def _char_poly_coeffs(A):
    """p(l) = -l^3 + c2 l^2 + c1 l + c0 = det(A - l I)."""
    a00 = A[..., 0, 0]
    a11 = A[..., 1, 1]
    a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a12 = A[..., 1, 2]
    c2 = a00 + a11 + a22
    c1 = -(a00 * a11 + a00 * a22 + a11 * a22) + a01 * a01 + a02 * a02 + a12 * a12
    c0 = (
        a00 * a11 * a22
        + 2.0 * a01 * a02 * a12
        - a00 * a12 * a12
        - a11 * a02 * a02
        - a22 * a01 * a01
    )
    return c0, c1, c2


def _polish_deflate(A, lam):
    """Refine trig-formula eigenvalues to ~machine precision.

    The trigonometric formula loses ~sqrt(eps) accuracy exactly when roots
    repeat (acos derivative blows up at r = +-1).  Fix: Newton-polish the
    root where |p'| is largest (that root is simple, so convergence is
    quadratic), then DEFLATE the cubic to a quadratic for the other two.
    """
    c0, c1, c2 = _char_poly_coeffs(A)

    def p(l):
        return ((-l + c2) * l + c1) * l + c0

    def dp(l):
        return (-3.0 * l + 2.0 * c2) * l + c1

    # choose the best-conditioned (most separated) root
    dps = jnp.stack([jnp.abs(dp(lam[..., k])) for k in range(3)], axis=-1)
    s = jnp.argmax(dps, axis=-1)
    ls = jnp.take_along_axis(lam, s[..., None], axis=-1)[..., 0]
    for _ in range(3):
        d = dp(ls)
        safe = jnp.abs(d) > 1e-300
        ls = jnp.where(safe, ls - p(ls) / jnp.where(safe, d, 1.0), ls)

    # deflate: p(l) = -(l - ls)(l^2 + beta l + gamma)
    beta = ls - c2
    gamma = ls * beta - c1
    disc = jnp.maximum(beta * beta - 4.0 * gamma, 0.0)
    sq = jnp.sqrt(disc)
    # numerically stable quadratic roots
    qq = -0.5 * (beta + jnp.where(beta >= 0, sq, -sq))
    r1 = qq
    r2 = jnp.where(jnp.abs(qq) > 1e-300, gamma / jnp.where(jnp.abs(qq) > 1e-300, qq, 1.0), -0.5 * beta)
    out = jnp.stack([ls, r1, r2], axis=-1)
    return jnp.sort(out, axis=-1)


def eigvals3(A):
    """Eigenvalues (ascending) of symmetric (..., 3, 3) -> (..., 3)."""
    dtype = A.dtype
    q = (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(B * B, axis=(-1, -2)) / 6.0
    small = p2 < 1e-30
    p = jnp.sqrt(jnp.where(small, 1.0, p2))
    Bn = B / p[..., None, None]
    # explicit symmetric 3x3 determinant: elementwise VPU code that fuses
    # with the rest of the kernel (jnp.linalg.det would lower to a batched
    # LU on TPU and break the fusion)
    b00 = Bn[..., 0, 0]
    b11 = Bn[..., 1, 1]
    b22 = Bn[..., 2, 2]
    b01 = Bn[..., 0, 1]
    b02 = Bn[..., 0, 2]
    b12 = Bn[..., 1, 2]
    det = (b00 * (b11 * b22 - b12 * b12)
           - b01 * (b01 * b22 - b12 * b02)
           + b02 * (b01 * b12 - b11 * b02))
    r = det * 0.5
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e2 = q + 2.0 * p * jnp.cos(phi)
    e0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e1 = 3.0 * q - e0 - e2
    lam = jnp.stack([e0, e1, e2], axis=-1)
    lam = jnp.where(small[..., None], q[..., None] * jnp.ones_like(lam), lam)
    return _polish_deflate(A, lam)


def _null_vector(M):
    """Best unit null vector of (..., 3, 3) via row cross products.

    Returns (vector, quality); quality ~ 0 means the null space has
    dimension >= 2 (repeated eigenvalue) and the vector is unreliable.
    """
    r0 = M[..., 0, :]
    r1 = M[..., 1, :]
    r2 = M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    c = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    nmax = jnp.maximum(jnp.maximum(n01, n02), n12)
    safe = jnp.where(nmax > 0, jnp.sqrt(jnp.where(nmax > 0, nmax, 1.0)), 1.0)
    return c / safe[..., None], nmax


def _any_orthogonal(u):
    """Some unit vector orthogonal to unit u (..., 3)."""
    ex = jnp.zeros_like(u).at[..., 0].set(1.0)
    ez = jnp.zeros_like(u).at[..., 2].set(1.0)
    a = jnp.cross(u, ex)
    small = (jnp.sum(a * a, axis=-1) < 1e-8)[..., None]
    a = jnp.where(small, jnp.cross(u, ez), a)
    return a / jnp.linalg.norm(a, axis=-1, keepdims=True)


def eigh3(A):
    """Full decomposition of symmetric (..., 3, 3).

    Returns (lam (..., 3) ascending, U (..., 3, 3)) with eigenvectors in
    the columns of U, like jnp.linalg.eigh.  Repeated-eigenvalue cases
    return a valid orthonormal eigenbasis: the eigenvector of the most
    separated extreme eigenvalue is extracted first (its null space is
    guaranteed 1-dimensional), the rest completes the basis.
    """
    dtype = A.dtype
    batch = A.shape[:-2]
    # scale-normalize for conditioning
    m = jnp.max(jnp.abs(A), axis=(-1, -2))
    degenerate_all = m < 1e-30
    ms = jnp.where(degenerate_all, 1.0, m)
    An = A / ms[..., None, None]
    lam_n = eigvals3(An)

    eye3 = jnp.eye(3, dtype=dtype)
    v0, q0 = _null_vector(An - lam_n[..., 0, None, None] * eye3)
    v2, q2 = _null_vector(An - lam_n[..., 2, None, None] * eye3)

    # primary = eigenvector of the better-separated extreme eigenvalue
    lam0_sep = (lam_n[..., 1] - lam_n[..., 0]) >= (lam_n[..., 2] - lam_n[..., 1])
    primary = jnp.where(lam0_sep[..., None], v0, v2)
    # if even the primary is unreliable the matrix is ~isotropic
    q_primary = jnp.where(lam0_sep, q0, q2)
    primary = jnp.where((q_primary < 1e-24)[..., None],
                        jnp.zeros_like(primary).at[..., 2].set(1.0), primary)

    other_raw = jnp.where(lam0_sep[..., None], v2, v0)
    other = other_raw - jnp.sum(other_raw * primary, axis=-1, keepdims=True) * primary
    n_other = jnp.sum(other * other, axis=-1)
    small = (n_other < 1e-12)[..., None]
    other = jnp.where(
        small,
        _any_orthogonal(primary),
        other / jnp.sqrt(jnp.where(n_other < 1e-12, 1.0, n_other))[..., None],
    )

    u0 = jnp.where(lam0_sep[..., None], primary, other)
    u2 = jnp.where(lam0_sep[..., None], other, primary)
    u1 = jnp.cross(u2, u0)

    U = jnp.stack([u0, u1, u2], axis=-1)
    U = jnp.where(
        degenerate_all[..., None, None],
        jnp.broadcast_to(eye3, batch + (3, 3)),
        U,
    )
    lam = jnp.where(degenerate_all[..., None], 0.0, lam_n * ms[..., None])
    return lam, U
