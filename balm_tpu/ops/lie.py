"""Batched SO(3)/SE(3) operations, vmap/jit friendly.

Functional re-design of the reference's scalar Lie helpers
(hku-mars/BALM include/tools.hpp:56-139: Exp/Log/hat/jr/jr_inv and the IMUST
boxplus, tools.hpp:158-167).  Everything here broadcasts over arbitrary
leading batch dimensions and is safe to differentiate (small-angle branches
use jnp.where with protected denominators, so gradients are NaN-free at 0).

Conventions:
  * rotations are (..., 3, 3) matrices; translations (..., 3)
  * a pose is the pair (R, p) with world = R @ body + p
  * a twist is (..., 6) ordered (omega, rho): rotation first, translation
    last — matching the reference's 6-DoF state layout (dxi blocks at
    bavoxel.hpp:1123-1125)
  * the solver uses LEFT perturbation: T <- Exp(eps) * T
    (bavoxel.hpp:1122-1125)
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-8


def hat(v):
    """Skew-symmetric matrix of (..., 3) -> (..., 3, 3).

    Reference: tools.hpp:99-106.
    """
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], axis=-1),
            jnp.stack([z, o, -x], axis=-1),
            jnp.stack([-y, x, o], axis=-1),
        ],
        axis=-2,
    )


def vee(M):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack(
        [M[..., 2, 1] - M[..., 1, 2],
         M[..., 0, 2] - M[..., 2, 0],
         M[..., 1, 0] - M[..., 0, 1]],
        axis=-1,
    ) * 0.5


def _sinc_coeffs(theta2):
    """Return a = sin(t)/t and b = (1-cos(t))/t^2 with Taylor guards."""
    small = theta2 < _SMALL
    t2s = jnp.where(small, 1.0, theta2)  # protected denominator
    theta = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    return a, b


def so3_exp(w):
    """Rodrigues exponential of (..., 3) axis-angle -> (..., 3, 3).

    Reference: tools.hpp:56-71 (Exp).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    a, b = _sinc_coeffs(theta2)
    K = hat(w)
    K2 = K @ K
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def so3_log(R):
    """Logarithm of (..., 3, 3) rotation -> (..., 3) axis-angle.

    Reference: tools.hpp:92-97 (Log), with an added theta~pi branch the
    reference omits (its formula degrades as sin(theta) -> 0).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    # d(arccos)/dx -> inf at x -> 1, and theta is shared by every branch
    # below, so an exactly-satisfied rotation (R = I, e.g. odometry-chain
    # pose-graph edges measured FROM the current trajectory) would leak
    # NaN into the gradient of ALL branches through the chain rule.
    # Guard the arccos input on the small branch and keep that branch's
    # math free of theta entirely (sin^2 theta = |K|^2/4 instead).
    small = cos_t > 1.0 - 5e-7          # theta < ~1e-3
    safe_cos = jnp.where(small, 0.0, jnp.clip(cos_t, -1.0 + 1e-12, 1.0))
    theta = jnp.where(small, 0.0, jnp.arccos(safe_cos))
    K = jnp.stack(
        [R[..., 2, 1] - R[..., 1, 2],
         R[..., 0, 2] - R[..., 2, 0],
         R[..., 1, 0] - R[..., 0, 1]],
        axis=-1,
    )
    # generic branch: 0.5 * theta / sin(theta) * K; Taylor near 0 written
    # in |K|^2 (= 4 sin^2 theta), which is smooth at K = 0 where a norm
    # or arccos would not be
    k2 = 0.25 * jnp.sum(K * K, axis=-1)   # sin^2 theta
    sin_t = jnp.where(small, 1.0, jnp.sin(theta))
    factor = jnp.where(small, 0.5 + k2 / 12.0, 0.5 * theta / sin_t)
    w_generic = factor[..., None] * K

    # near-pi branch: axis from the dominant column of R + I
    near_pi = theta > jnp.pi - 1e-3
    B = R + jnp.eye(3, dtype=R.dtype)  # columns ~ 2 cos^2(..) * axis
    norms = jnp.linalg.norm(B, axis=-2)
    col = jnp.argmax(norms, axis=-1)
    axis = jnp.take_along_axis(B, col[..., None, None], axis=-1)[..., 0]
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12)
    # fix the sign so that axis agrees with K (K ~ 2 sin(theta) * axis)
    sign = jnp.sign(jnp.sum(axis * K, axis=-1) + 1e-30)
    w_pi = theta[..., None] * axis * sign[..., None]

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_jr(w):
    """Right Jacobian of SO(3) (reference jr, tools.hpp:108-122;
    defined-but-unused in the reference's main BA path, carried for API
    completeness).  Batched (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _SMALL
    t2s = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2s)
    ra = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    rb = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    axis = w / jnp.where(small, 1.0, theta)[..., None]
    eye = jnp.eye(3, dtype=w.dtype)
    aa = axis[..., :, None] * axis[..., None, :]
    return (
        ra[..., None, None] * eye
        + (1.0 - ra)[..., None, None] * aa
        - (rb * theta)[..., None, None] * hat(axis)
    )


def so3_jr_inv(w):
    """Inverse right Jacobian (reference jr_inv, tools.hpp:124-139), from
    the axis-angle vector rather than the rotation matrix."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _SMALL
    t2s = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2s)
    half = 0.5 * theta
    ctt = jnp.where(
        small, 1.0 - theta2 / 12.0, half / jnp.tan(half)
    )
    axis = w / jnp.where(small, 1.0, theta)[..., None]
    eye = jnp.eye(3, dtype=w.dtype)
    aa = axis[..., :, None] * axis[..., None, :]
    return (
        ctt[..., None, None] * eye
        + (1.0 - ctt)[..., None, None] * aa
        + half[..., None, None] * hat(axis)
    )


def pose_matrix(R, p):
    """(R, p) -> homogeneous (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], p.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    p = jnp.broadcast_to(p, batch + (3,))
    top = jnp.concatenate([R, p[..., None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype)
    bottom = bottom.at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_left_update(R, p, dx):
    """LEFT boxplus: (Exp(w) R, Exp(w) p + t) for twist dx = (w, t).

    Reference: bavoxel.hpp:1122-1125 ("left update").
    """
    dR = so3_exp(dx[..., :3])
    return dR @ R, jnp.einsum("...ij,...j->...i", dR, p) + dx[..., 3:]


def se3_right_update(R, p, dx):
    """RIGHT boxplus: (R Exp(w), p + t) — the reference's alternative update
    (bavoxel.hpp:1118-1120, commented-out 'right update')."""
    return R @ so3_exp(dx[..., :3]), p + dx[..., 3:]


def gauge_fix(R, p, anchor=0):
    """Re-anchor a trajectory so pose `anchor` becomes identity.

    Reference: bavoxel.hpp:1159-1164.
    """
    R0 = R[anchor]
    p0 = p[anchor]
    Rf = jnp.einsum("ji,njk->nik", R0, R)  # R0^T @ R_n
    pf = jnp.einsum("ji,nj->ni", R0, p - p0)
    return Rf, pf


def adjoint_translation_vec(v6, c):
    """Apply Adj([I, -c; 0, 1])^T to twist-space covectors.

    Used by the per-plane centering trick in ops/factors.py: gradients taken
    w.r.t. a perturbation of the shifted pose S@T (S = translation by -c)
    map back to the original frame by (g_w, g_r) -> (g_w + c x g_r, g_r).
    Shapes: v6 (..., 6), c broadcastable (..., 3).
    """
    gw = v6[..., :3]
    gr = v6[..., 3:]
    return jnp.concatenate([gw + jnp.cross(c, gr), gr], axis=-1)


def centering_hessian_correction(g_rho, c):
    """Second-order chain term for Hessians mapped through the centering
    shift.

    The solver's left-update chart eps = (w, t) -> [Exp(w), t] conjugated
    by the translation S = (I, -c) gives S M(w, t) S^{-1} = M(w, t~) with
    t~ = (Exp(w) - I) c + t — NONLINEAR in w.  The exact Hessian map is
    therefore H = J^T H~ J + sum_a g~_a d^2 t~_a/dw^2 where g~ is the
    shifted-frame gradient; this returns that extra (3, 3) w-w block:

        0.5 (g c^T + c g^T) - (g . c) I,   g = g~_rho (translation part,
    which the shift leaves unchanged).  Shapes: g_rho (..., 3), c (..., 3).
    """
    outer = 0.5 * (
        g_rho[..., :, None] * c[..., None, :] + c[..., :, None] * g_rho[..., None, :]
    )
    dot = jnp.sum(g_rho * c, axis=-1)
    return outer - dot[..., None, None] * jnp.eye(3, dtype=g_rho.dtype)


def adjoint_translation_mat(M66, c):
    """Apply Adj^T M Adj for the same S as adjoint_translation_vec.

    With J = Adj(S) = [[I, 0], [-hat(c), I]] (twist order (w, r)):
    out = J^T M J. Shapes: M66 (..., 6, 6), c (..., 3).
    """
    hc = hat(c)
    A = M66[..., :3, :3]
    B = M66[..., :3, 3:]
    C = M66[..., 3:, :3]
    D = M66[..., 3:, 3:]
    # J = [[I,0],[-hat(c),I]]; M J = [[A - B hc, B],[C - D hc, D]]
    A2 = A - B @ hc
    C2 = C - D @ hc
    # J^T (.) : row0 += hc^T * row1 = -hc * row1... J^T = [[I, -hat(c)^T],[0,I]]
    # = [[I, hat(c)],[0, I]]
    top = jnp.concatenate([A2 + hc @ C2, B + hc @ D], axis=-1)
    bot = jnp.concatenate([C2, D], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
