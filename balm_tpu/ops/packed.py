"""Packed lane-major factor layout for the fused Pallas evaluation path.

The XLA evaluator (ops/factors.py) stores per-(plane, scan) cluster moments
as (G, W, 4, 4) homogeneous matrices.  That layout is convenient for einsum
math but hostile to TPU memory: the trailing (4, 4) dims tile terribly
(lane dim 4 of 128) and every elementwise pass re-reads ~62 MB of HBM for
the realworld problem.

This module re-packs the SAME information channel-major with the PLANE axis
on the 128-wide lane dimension:

    mom  (Wp, 10, Gp)  per-scan channels (pxx,pxy,pxz,pyy,pyz,pzz,
                       bx,by,bz, n): recentered body moment vech(P),
                       body centroid b, point count n
    cen  (3, Gp)       world-frame conditioning centers c_g
    coe  (1, Gp)       factor weights (0 = padding)
    cfix (10, Gp)      marginalized fixed moment, already shifted by -c_g
                       (channels like Csum: vech(P), v, n)

Wp is the scan window padded to a multiple of 8 (sublane tile), Gp the
plane count padded to a multiple of 512 (lane tile x kernel block).
Padding scans carry zero moments, padding planes zero coe -- both
contribute exactly zero downstream (everything scales with n, P or coe).

Requires body-recentered moments (factors.recenter_bodies); any residual
first moment v is folded into b here so v == 0 holds exactly.

Reference behavior being re-laid-out: VOX_HESS factor storage
(src/benchmark/bavoxel.hpp:20-51).  The reference keeps vectors of
per-plane pointers into pose-indexed moment vectors; this is the
TPU-native equivalent (dense padded channel planes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import factors as F

LANES = 128
GPAD = 512  # plane-axis padding multiple (lane tile x csum kernel block)
WPAD = 8    # scan-axis padding multiple (sublane tile)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class PackedFactors(NamedTuple):
    mom: jnp.ndarray    # (Wp, 10, Gp)
    cen: jnp.ndarray    # (3, Gp)
    coe: jnp.ndarray    # (1, Gp)
    cfix: jnp.ndarray   # (10, Gp)

    @property
    def wp(self):
        return self.mom.shape[0]

    @property
    def gp(self):
        return self.mom.shape[2]


def _sym_channels(M):
    """(..., 3+, 3+) symmetric -> 6 channels (xx,xy,xz,yy,yz,zz)."""
    return [M[..., 0, 0], M[..., 0, 1], M[..., 0, 2],
            M[..., 1, 1], M[..., 1, 2], M[..., 2, 2]]


def pack_factors(f: F.PlaneFactors) -> PackedFactors:
    """PlaneFactors (body-recentered, centered mode) -> PackedFactors.

    Pure XLA transposes/reshapes; call once per problem (the layout is
    pose-independent and persists across all LM iterations).  Always
    float32: this layout exists only for the f32 TPU kernels (the f64
    oracle path stays on ops/factors.py).
    """
    G, W = f.C.shape[:2]
    dt = jnp.float32
    Gp = _round_up(max(G, 1), GPAD)
    Wp = _round_up(max(W, 1), WPAD)

    n = f.C[..., 3, 3]                                    # (G, W)
    ns = jnp.where(n > 0.5, n, 1.0)
    v = f.C[..., :3, 3]                                   # (G, W, 3)
    # fold any residual first moment into the body centroid (exact
    # refactorization; a no-op when recenter_bodies already ran)
    b = f.body_centers + v / ns[..., None]
    P = f.C[..., :3, :3] - v[..., :, None] * v[..., None, :] / ns[..., None, None]

    chans = _sym_channels(P) + [b[..., 0], b[..., 1], b[..., 2], n]
    mom = jnp.stack(chans, axis=-1)                       # (G, W, 10)
    mom = jnp.transpose(mom, (1, 2, 0))                   # (W, 10, G)
    mom = jnp.pad(mom, ((0, Wp - W), (0, 0), (0, Gp - G))).astype(dt)

    cen = jnp.pad(f.centers.T, ((0, 0), (0, Gp - G))).astype(dt)
    coe = jnp.pad(f.coe[None, :], ((0, 0), (0, Gp - G))).astype(dt)

    # fixed moment: shift, then recenter about its own centroid so the
    # kernels' two-pass covariance never sees large-offset products
    Cfs = F._shifted_fix(f)                               # (G, 4, 4)
    nf = Cfs[..., 3, 3]
    nfs = jnp.where(nf > 0.5, nf, 1.0)
    vf = Cfs[..., :3, 3]
    bf = vf / nfs[..., None]
    Pf = Cfs[..., :3, :3] - vf[..., :, None] * vf[..., None, :] / nfs[..., None, None]
    cfx = jnp.stack(
        _sym_channels(Pf) + [bf[..., 0], bf[..., 1], bf[..., 2], nf],
        axis=0,
    )                                                     # (10, G)
    cfix = jnp.pad(cfx, ((0, 0), (0, Gp - G))).astype(dt)

    return PackedFactors(mom=mom, cen=cen, coe=coe, cfix=cfix)


def csum_to_cov(out, coe):
    """Kernel-A channels (10, Gp) = [N*cov (6), vsum (3), N] ->
    (N, Ns, valid, vbar (3,Gp), cov (Gp,3,3)).

    Fills the role of factors._plane_moment's normalization
    (bavoxel.hpp:331-343) for the two-pass centered accumulation: the
    covariance arrives already mean-subtracted (no cancellation here).
    """
    N = out[9]
    Ns = jnp.where(N > 0.5, N, 1.0)
    valid = (N > 0.5) & (coe[0] > 0)
    vbar = out[6:9] / Ns[None, :]                         # (3, Gp)
    c = out[:6] / Ns[None, :]
    row0 = jnp.stack([c[0], c[1], c[2]], axis=-1)
    row1 = jnp.stack([c[1], c[3], c[4]], axis=-1)
    row2 = jnp.stack([c[2], c[4], c[5]], axis=-1)
    cov = jnp.stack([row0, row1, row2], axis=-2)          # (Gp, 3, 3)
    return N, Ns, valid, vbar, cov


def pad_planes(pk: PackedFactors, multiple: int) -> PackedFactors:
    """Extend the plane (lane) axis with zeros to a multiple (padding
    planes carry n = coe = 0 and contribute exactly zero)."""
    Gp = pk.gp
    Gt = _round_up(Gp, multiple)
    if Gt == Gp:
        return pk
    ext = Gt - Gp
    return PackedFactors(
        mom=jnp.pad(pk.mom, ((0, 0), (0, 0), (0, ext))),
        cen=jnp.pad(pk.cen, ((0, 0), (0, ext))),
        coe=jnp.pad(pk.coe, ((0, 0), (0, ext))),
        cfix=jnp.pad(pk.cfix, ((0, 0), (0, ext))),
    )


def pad_poses(R, p, Wp):
    """(W,3,3),(W,3) -> (Wp, 12) row-major [R | t] pose channels.

    Padding rows are zero: every kernel term scales with the (zero) padded
    moments, so the pose values there are never observable.
    """
    W = R.shape[0]
    pose = jnp.concatenate([R.reshape(W, 9), p], axis=1)
    return jnp.pad(pose, ((0, Wp - W), (0, 0)))
