"""Point-cluster sufficient statistics as batched homogeneous 4x4 moments.

The reference's PointCluster (include/tools.hpp:290-349) stores (P = sum
p p^T, v = sum p, N).  We pack it as the symmetric homogeneous moment matrix

    C = [[P, v],
         [v^T, N]]  =  sum_i q_i q_i^T,   q_i = [p_i; 1]

which is exactly the form the reference's production evaluator builds
internally (bavoxel.hpp:316-318).  In this form:

  * rigid transform  (tools.hpp:341-347)  is   C' = T C T^T
  * cluster merge    (tools.hpp:324-331)  is   C' = Ca + Cb
  * covariance       (tools.hpp:318-322)  is   P/N - (v/N)(v/N)^T

so every cluster operation is a batched matmul/add — MXU-native.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def homogenize(points):
    """(..., 3) -> (..., 4) by appending 1."""
    return jnp.concatenate(
        [points, jnp.ones(points.shape[:-1] + (1,), points.dtype)], axis=-1
    )


def from_points(points, seg_ids=None, num_segments=None):
    """Build cluster moments from points.

    points: (N, 3).  Without seg_ids returns a single (4, 4) moment; with
    seg_ids (N,) int32 returns (num_segments, 4, 4) via segment_sum —
    the batched equivalent of PointCluster::push (tools.hpp:311-316).
    """
    q = homogenize(points)
    outer = q[..., :, None] * q[..., None, :]
    if seg_ids is None:
        return jnp.sum(outer, axis=0)
    return jax.ops.segment_sum(outer, seg_ids, num_segments=num_segments)


def transform(C, T):
    """Rigid transform of moments: T C T^T, broadcasting over batch dims.

    Reference: PointCluster::transform (tools.hpp:341-347).
    """
    return T @ C @ jnp.swapaxes(T, -1, -2)


def count(C):
    """Point count N (reference PointCluster::N)."""
    return C[..., 3, 3]


def mean(C):
    """Centroid v/N with a protected denominator."""
    N = count(C)
    Ns = jnp.where(N > 0.5, N, 1.0)
    return C[..., :3, 3] / Ns[..., None]


def cov(C):
    """Covariance P/N - vbar vbar^T (reference tools.hpp:318-322)."""
    N = count(C)
    Ns = jnp.where(N > 0.5, N, 1.0)
    vbar = C[..., :3, 3] / Ns[..., None]
    return C[..., :3, :3] / Ns[..., None, None] - vbar[..., :, None] * vbar[..., None, :]


def recenter(C, c):
    """Shift moments by -c: S C S^T with S = [[I, -c], [0, 1]].

    Used for f32 conditioning: a cluster whose centroid is far from the
    origin suffers catastrophic cancellation in cov(); shifting by an
    approximate center first makes P/N ~ O(extent^2).
    """
    S = jnp.broadcast_to(jnp.eye(4, dtype=C.dtype), c.shape[:-1] + (4, 4))
    S = S.at[..., :3, 3].set(-c)
    return transform(C, S)


# --- first-order noise covariance of the statistics (consistency/NEES) ---
#
# The reference's POINT_NOISE build extends PointCluster with running
# covariances of the stacked statistic s = [vech-ish(P); v] accumulated
# per point through the B(p) stacking matrix (src/simulation/toolss.hpp:
# 315-344).  Because B(p) is LINEAR in p, all those accumulators are linear
# functions of (P, v, N) themselves, so we derive them from the moments in
# closed form instead of carrying four extra arrays.
#
# Statistic order (toolss.hpp:323-329): s9 = (Pxx, Pxy, Pxz, Pyy, Pyz, Pzz,
# vx, vy, vz); B(p) = dP6/dp with P6 the 6 upper-tri entries.

def _stack_E():
    # B(p) = E_x * x + E_y * y + E_z * z, each E_c is 6x3
    Ex = jnp.zeros((6, 3))
    Ex = Ex.at[0, 0].set(2.0).at[1, 1].set(1.0).at[2, 2].set(1.0)
    Ey = jnp.zeros((6, 3))
    Ey = Ey.at[1, 0].set(1.0).at[3, 1].set(2.0).at[4, 2].set(1.0)
    Ez = jnp.zeros((6, 3))
    Ez = Ez.at[2, 0].set(1.0).at[4, 1].set(1.0).at[5, 2].set(2.0)
    return jnp.stack([Ex, Ey, Ez])  # (3, 6, 3)


def stat_noise_cov(C, sigma):
    """9x9 covariance of the statistic s9 under iid point noise sigma^2 I.

    Equals the reference's c_cov accumulator (toolss.hpp:338-341):
      c_cov = sigma^2 * sum_i Bf(p_i) Bf(p_i)^T,  Bf = [B(p); I3]
    but computed from the moments:
      sum B B^T   = sum_{c,d} P_{cd} E_c E_d^T
      sum B       = sum_c v_c E_c
      sum I I^T   = N I
    Input C (..., 4, 4); returns (..., 9, 9).
    """
    E = _stack_E().astype(C.dtype)  # (3, 6, 3)
    P = C[..., :3, :3]
    v = C[..., :3, 3]
    N = C[..., 3, 3]
    BB = jnp.einsum("...cd,cef,dgf->...eg", P, E, E)  # (..., 6, 6)
    B1 = jnp.einsum("...c,cef->...ef", v, E)  # (..., 6, 3)
    eye3 = jnp.eye(3, dtype=C.dtype)
    top = jnp.concatenate([BB, B1], axis=-1)
    bot = jnp.concatenate(
        [jnp.swapaxes(B1, -1, -2), N[..., None, None] * eye3], axis=-1
    )
    return (sigma**2) * jnp.concatenate([top, bot], axis=-2)
