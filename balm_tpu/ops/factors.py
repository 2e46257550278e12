"""Plane-factor evaluation: residual, gradient, and analytic Hessian.

TPU-native re-design of the reference's production evaluator
`VOX_HESS::left_evaluate_acc2` (src/benchmark/bavoxel.hpp:304-426) and
`evaluate_only_residual` (bavoxel.hpp:428-470).

Math (BALM2 paper / bavoxel.hpp): each plane factor holds per-scan cluster
moments C_i (body frame) and an optional marginalized moment C_fix (world
frame).  With pose matrices T_i the world-frame plane moment is

    Csum = C_fix + sum_i T_i C_i T_i^T ,    N = Csum[3,3]

and the cost is coe * lambda_0 of cov = Csum[:3,:3]/N - vbar vbar^T.  The
gradient and the full second-order Hessian w.r.t. LEFT pose perturbations
T_i <- Exp(eps_i) T_i have closed forms built from the eigenvectors u_k and
per-(plane, pose) 6-vectors.

Key structural observation exploited here (not in the reference): all
pose-pair (i, j) Hessian blocks are sums of OUTER PRODUCTS of per-(plane,
pose) 6-vectors

    H += sum_g [ -w_a(g) a_gi a_gj^T  -  sum_{k=1,2} w_k(g) b_gki b_gkj^T ]

plus block-diagonal corrections.  Stacking the scaled vectors into a
(3G, 6W) matrix turns the reference's O(planes * W^2) scalar loop
(bavoxel.hpp:397-418, its dominant cost) into a single (6W x 3G)(3G x 6W)
matmul on the MXU, and the 4-thread assembly + join (bavoxel.hpp:1025-1059)
into an XLA reduction that shards over the plane axis.

A plane with coe == 0 or N == 0 is padding and contributes exactly zero.

f32 conditioning: pass `centers` (G, 3) ~ plane centroids to evaluate each
plane in a frame shifted by -center (cov is translation invariant), then the
per-plane gradients/Hessians are mapped back through the SE(3) adjoint
(ops/lie.py: adjoint_translation_*).  In f64 this is a no-op to machine
precision; in f32 it avoids the catastrophic cancellation of P/N - vbar^2.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import lie
from . import smallmat as sm
from .eigh3 import eigh3, eigvals3


class PlaneFactors(NamedTuple):
    """Padded batch of plane factors (a pytree).

    C:       (G, W, 4, 4) body-frame cluster moments per (plane, scan);
             all-zero where a scan does not observe the plane.  May be
             stored recentered about per-cluster body centroids (see
             body_centers / recenter_bodies).
    Cfix:    (G, 4, 4) marginalized world-frame moments (zeros if none).
    coe:     (G,) factor weights (reference bavoxel.hpp:39-44: total point
             count; 0 marks padding).
    centers: (G, 3) approximate world-frame plane centers used only for
             numerical conditioning (zeros disable the shift).
    body_centers: (G, W, 3) per-cluster body-frame centroids that were
             subtracted from C.  The world moment is invariantly
             T_i C_i T_i^T = (T_i B_gi) C~_gi (T_i B_gi)^T with B = shift
             by +body_center, so the evaluator composes the offset into
             the per-(plane, scan) pose.  Zeros = raw moments.
    """

    C: jnp.ndarray
    Cfix: jnp.ndarray
    coe: jnp.ndarray
    centers: jnp.ndarray
    body_centers: jnp.ndarray

    @classmethod
    def create(cls, C, Cfix=None, coe=None, centers=None, body_centers=None):
        G, W = C.shape[:2]
        dt = C.dtype
        if Cfix is None:
            Cfix = jnp.zeros((G, 4, 4), dt)
        if coe is None:
            coe = jnp.sum(C[..., 3, 3], axis=-1)
        if centers is None:
            centers = jnp.zeros((G, 3), dt)
        if body_centers is None:
            body_centers = jnp.zeros((G, W, 3), dt)
        return cls(C=C, Cfix=Cfix, coe=coe, centers=centers,
                   body_centers=body_centers)

    def astype(self, dtype):
        return PlaneFactors(*[x.astype(dtype) for x in self])

    @property
    def num_planes(self):
        return self.C.shape[0]

    @property
    def window(self):
        return self.C.shape[1]

    def observes(self):
        """(G, W) bool: scan i contributes to plane g."""
        return self.C[..., 3, 3] > 0.5

    def planes_per_pose(self):
        """(W,) number of valid planes observed by each pose
        (reference degeneracy guard, bavoxel.hpp:1071-1078)."""
        valid = (self.coe > 0)[:, None]
        return jnp.sum(self.observes() & valid, axis=0)


def recenter_bodies(f: PlaneFactors) -> PlaneFactors:
    """Recenter every (plane, scan) body moment about its own centroid.

    Must run in float64 BEFORE casting to float32: the subtraction
    P - v v^T / N is exactly the cancellation the fast path must avoid
    (body-frame lidar points sit up to ~100 m from the sensor, so raw P
    entries are ~range^2 * N while the plane covariance is ~voxel^2).
    With recentered moments plus the world `centers` shift, every product
    in the centered evaluator stays O(voxel extent).

    Works on numpy OR jax arrays in-kind — numpy inputs are processed with
    numpy so the math stays f64 even when jax x64 mode is off (jnp would
    silently truncate).
    """
    import numpy as np

    xp = np if isinstance(f.C, np.ndarray) else jnp
    N = f.C[..., 3, 3]
    Ns = xp.where(N > 0.5, N, 1.0)
    v = f.C[..., :3, 3]
    b = v / Ns[..., None]                                  # (G, W, 3)
    # with b the exact centroid: P' = P - v v^T / N, v' = 0
    P2 = f.C[..., :3, :3] - v[..., :, None] * v[..., None, :] / Ns[..., None, None]
    zero3 = xp.zeros_like(v)
    top = xp.concatenate([P2, zero3[..., :, None]], axis=-1)
    bot = xp.concatenate(
        [zero3[..., None, :], N[..., None, None]], axis=-1
    )
    Cc = xp.concatenate([top, bot], axis=-2)
    return f._replace(C=Cc, body_centers=f.body_centers + b)


def _shifted_poses(T, f: PlaneFactors):
    """(T_i composed with the body offset, then world-shifted by -c_g):
    rotation R_i, translation R_i b_gi + t_i - c_g -> (G, W, 4, 4)."""
    G = f.centers.shape[0]
    W = T.shape[0]
    t_new = (
        sm.matvec(T[None, :, :3, :3], f.body_centers)
        + T[None, :, :3, 3]
        - f.centers[:, None, :]
    )
    Rb = jnp.broadcast_to(T[None, :, :3, :3], (G, W, 3, 3))
    top = jnp.concatenate([Rb, t_new[..., None]], axis=-1)
    bot = jnp.zeros((G, W, 1, 4), T.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bot], axis=-2)


def _shifted_fix(f: PlaneFactors):
    """Recenter the world-frame fixed moment: S Cfix S^T with S = shift
    by -centers, written as the explicit parallel-axis form

        P' = P - c v^T - v c^T + N c c^T,   v' = v - N c

    Elementwise on purpose: `S @ Cfix @ S^T` would ride the MXU, whose
    f32 matmuls default to ONE bf16 pass on TPU — for a nonzero Cfix
    (marginalized prior, e.g. the consistency pipeline) that corrupts
    the moment at the 0.4% level and sends lambda_0 negative (found via
    a NEES mean ratio of 2.46 in round 4; realworld never sees it
    because its Cfix is zero)."""
    P = f.Cfix[..., :3, :3]
    v = f.Cfix[..., :3, 3]
    N = f.Cfix[..., 3, 3]
    c = f.centers
    Pn = (P - c[..., :, None] * v[..., None, :]
          - v[..., :, None] * c[..., None, :]
          + N[..., None, None] * c[..., :, None] * c[..., None, :])
    vn = v - N[..., None] * c
    out = jnp.zeros_like(f.Cfix)
    out = out.at[..., :3, :3].set(Pn)
    out = out.at[..., :3, 3].set(vn)
    out = out.at[..., 3, :3].set(vn)
    out = out.at[..., 3, 3].set(N)
    return out


def _plane_moment(T, f: PlaneFactors, centered: bool):
    """Common prefix: world moments, eigen decomposition inputs."""
    if centered:
        Tg = _shifted_poses(T, f)
        Cfix = _shifted_fix(f)
        TC = sm.matmul(Tg, f.C)
        TCT = sm.matmul(TC, Tg, transpose_b=True)
    else:
        Tg = None
        Cfix = f.Cfix
        TC = sm.matmul(T[None], f.C)
        TCT = sm.matmul(TC, T[None], transpose_b=True)
    Csum = Cfix + jnp.sum(TCT, axis=1)
    NN = Csum[..., 3, 3]
    NNs = jnp.where(NN > 0.5, NN, 1.0)
    Cn = Csum / NNs[..., None, None]
    vbar = Cn[..., :3, 3]
    covM = Cn[..., :3, :3] - vbar[..., :, None] * vbar[..., None, :]
    return Tg, TC, TCT, NNs, NN, vbar, covM


def estimate_centers(T, f: PlaneFactors):
    """World-frame plane centroids under poses T — used to fill
    PlaneFactors.centers for the f32 conditioning mode."""
    TC = jnp.einsum("wab,gwbc->gwac", T, f.C)
    TCT = jnp.einsum("gwac,wdc->gwad", TC, T)
    Csum = f.Cfix + jnp.sum(TCT, axis=1)
    N = Csum[..., 3, 3]
    Ns = jnp.where(N > 0.5, N, 1.0)
    return Csum[..., :3, 3] / Ns[..., None]


def evaluate_right(T, f: PlaneFactors, *, use_lapack_eigh: bool = False,
                   gap_eps: float = 1e-9):
    """Residual/gradient/Hessian under RIGHT perturbation
    (R <- R Exp(w), p <- p + t).

    Reference: acc_evaluate2 (bavoxel.hpp:53-158) — the alternative update
    form the reference keeps alongside the production left evaluator
    (bavoxel.hpp:1108, 1118-1120).  Requires RAW body moments (no
    body_centers / centering: right perturbation does not commute with the
    body-offset composition).

    Note: like the reference, the returned Hessian carries the
    -0.5 hat(grad_rot) term on the rotation-rotation diagonal blocks
    (bavoxel.hpp:124), which is antisymmetric and vanishes at critical
    points; its symmetric part equals the true second derivative.
    """
    with jax.default_matmul_precision("float32"):
        return _evaluate_right_impl(T, f, use_lapack_eigh, gap_eps)


def _evaluate_right_impl(T, f, use_lapack_eigh, gap_eps):
    G, W = f.C.shape[:2]
    dtype = f.C.dtype
    _, TC, TCT, NNs, NN, vbar, covM = _plane_moment(T, f, centered=False)
    if use_lapack_eigh:
        lam, U = jnp.linalg.eigh(covM)
    else:
        lam, U = eigh3(covM)

    valid = (NN > 0.5) & (f.coe > 0)
    coe = jnp.where(valid, f.coe, 0.0)
    residual = jnp.sum(coe * lam[..., 0])

    R = T[:, :3, :3]
    pfull = T[:, :3, 3]
    u0 = U[..., :, 0]                                 # (G, 3)
    uT = jnp.swapaxes(U, -1, -2)                      # (G, 3k, 3)

    Pi = f.C[..., :3, :3]                             # (G, W, 3, 3)
    vi = f.C[..., :3, 3]                              # (G, W, 3)
    ni = f.C[..., 3, 3]                               # (G, W)
    inv_NN = (1.0 / NNs)[:, None]                     # (G, 1)

    Rt = jnp.swapaxes(R, -1, -2)
    RiTuk = sm.matvec(Rt[None], u0[:, None])          # (G, W, 3)
    RiTukhat = lie.hat(RiTuk)
    PiRiTuk = sm.matvec(Pi, RiTuk)
    viRiTuk = jnp.cross(vi, RiTuk)
    ti_v = pfull[None] - vbar[:, None]                # (G, W, 3)
    ukTti_v = jnp.sum(u0[:, None] * ti_v, axis=-1)    # (G, W)

    combo1 = lie.hat(PiRiTuk) + lie.hat(vi) * ukTti_v[..., None, None]
    combo2 = sm.matvec(R[None], vi) + ni[..., None] * ti_v

    RP_tv = sm.matmul(R[None], Pi) + ti_v[..., :, None] * vi[..., None, :]
    left3 = sm.matmul(RP_tv, RiTukhat) - sm.matmul(R[None], combo1)
    eye3 = jnp.eye(3, dtype=dtype)
    right3 = (
        combo2[..., :, None] * u0[:, None, None, :]
        + jnp.sum(combo2 * u0[:, None], axis=-1)[..., None, None] * eye3
    )
    Auk = jnp.concatenate([left3, right3], axis=-1) * inv_NN[..., None, None]
    # (G, W, 3, 6)

    jjt = sm.matvec(jnp.swapaxes(Auk, -1, -2), u0[:, None])   # (G, W, 6)
    JacT = jnp.sum(coe[:, None, None] * jjt, axis=0).reshape(6 * W)

    # rank-1 assembly over all pose pairs
    # b_m = Auk^T u_m (m = 1, 2), weight 2 coe/(lam_m - lam_0)
    b = jnp.sum(
        Auk[:, None] * uT[:, 1:, None, :, None], axis=-2
    )                                                 # (G, 2, W, 6)
    scale = jnp.maximum(lam[..., 2], 1e-30)
    gap = lam[..., 1:] - lam[..., 0:1]
    wk = jnp.where(
        gap > gap_eps * scale[..., None],
        2.0 * coe[..., None] / jnp.maximum(gap, 1e-30), 0.0
    )
    # c = [viRiTuk ; ni u0], weight 2 coe / NN^2
    c = jnp.concatenate(
        [viRiTuk, ni[..., None] * u0[:, None]], axis=-1
    )                                                 # (G, W, 6)
    wc = 2.0 * coe / (NNs * NNs)

    rows = jnp.concatenate(
        [
            (jnp.sqrt(wk)[..., None, None] * b).reshape(G, 2, 6 * W),
            (jnp.sqrt(wc)[:, None, None] * c).reshape(G, 6 * W)[:, None, :],
        ],
        axis=1,
    ).reshape(3 * G, 6 * W)
    H = -(rows.T @ rows)

    # diagonal-only corrections
    tl = (
        sm.matmul(combo1 - sm.matmul(RiTukhat, Pi), RiTukhat)
        * (2.0 * inv_NN)[..., None, None]
        - 0.5 * lie.hat(jjt[..., :3])
    )
    tr = (2.0 * inv_NN)[..., None, None] * (
        viRiTuk[..., :, None] * u0[:, None, None, :]
    )
    br = (2.0 * ni * inv_NN)[..., None, None] * (
        u0[:, None, :, None] * u0[:, None, None, :]
    )
    Dblk = jnp.concatenate(
        [
            jnp.concatenate([tl, tr], axis=-1),
            jnp.concatenate([jnp.swapaxes(tr, -1, -2), br], axis=-1),
        ],
        axis=-2,
    )                                                 # (G, W, 6, 6)
    D = jnp.sum(coe[:, None, None, None] * Dblk, axis=0)
    Hr = H.reshape(W, 6, W, 6)
    iw = jnp.arange(W)
    Hr = Hr.at[iw, :, iw, :].add(D)
    return residual, JacT, Hr.reshape(6 * W, 6 * W)


def residual_only(T, f: PlaneFactors, *, centered: bool = False,
                  use_lapack_eigh: bool = False, l_set=(0,),
                  use_pallas: bool = False, pallas_interpret: bool = False):
    """Total cost sum_g coe_g * sum_{l in l_set} lambda_l(g).

    Reference: evaluate_only_residual (bavoxel.hpp:428-470).

    All matmuls run at full f32 precision: the TPU default (bf16 MXU
    passes) loses ~4e-3 relative on the moment products, fatal for
    lambda_0 which is a tiny difference of O(1) covariance entries.

    use_pallas (centered mode only): fuse the moment accumulation into
    the Pallas kernel (ops/pallas_moments.py) — skips the (G, W, 4, 4)
    HBM intermediates.
    """
    with jax.default_matmul_precision("float32"):
        if use_pallas and centered:
            from . import pallas_moments

            Csum = pallas_moments.residual_moments(
                T, f, interpret=pallas_interpret
            ) + _shifted_fix(f)
            NN = Csum[..., 3, 3]
            NNs = jnp.where(NN > 0.5, NN, 1.0)
            Cn = Csum / NNs[..., None, None]
            vbar = Cn[..., :3, 3]
            covM = Cn[..., :3, :3] - vbar[..., :, None] * vbar[..., None, :]
        else:
            _, _, _, _, NN, _, covM = _plane_moment(T, f, centered)
        if use_lapack_eigh:
            lam = jnp.linalg.eigvalsh(covM)
        else:
            lam = eigvals3(covM)
        valid = (NN > 0.5) & (f.coe > 0)
        cost = sum(lam[..., l] for l in l_set)
        return jnp.sum(jnp.where(valid, f.coe * cost, 0.0))


def evaluate(T, f: PlaneFactors, *, centered: bool = False,
             use_lapack_eigh: bool = False, gap_eps: float = 1e-9,
             l_set=(0,)):
    """Residual, gradient (6W,), and full Newton Hessian (6W, 6W).

    Reference: left_evaluate_acc2 (bavoxel.hpp:304-426).  The returned
    Hessian is the exact second derivative of the cost w.r.t. the stacked
    left-perturbation twists (w_0, t_0, ..., w_{W-1}, t_{W-1}).

    l_set selects the summed eigenvalues: (0,) = plane factors (cost
    lambda_0), (0, 1) = line/edge factors (cost lambda_0 + lambda_1, the
    BALM 1.0 edge feature, reference balmclass.hpp:483-493).  The
    divergent 1/(lambda_0 - lambda_1) gap terms between eigenvalues
    inside the set cancel exactly (g_kl is symmetric in k, l), so only
    gaps to the complement are kept — the sum is smooth even for
    degenerate lambda_0 ~ lambda_1 line clusters.

    Runs at full f32 matmul precision (see residual_only docstring).
    """
    with jax.default_matmul_precision("float32"):
        return _evaluate_impl(
            T, f, centered=centered, use_lapack_eigh=use_lapack_eigh,
            gap_eps=gap_eps, l_set=tuple(l_set),
        )


def _evaluate_impl(T, f: PlaneFactors, *, centered, use_lapack_eigh, gap_eps,
                   l_set=(0,)):
    G, W = f.C.shape[:2]
    dtype = f.C.dtype
    Tg, TC, TCT, NNs, NN, vbar, covM = _plane_moment(T, f, centered)

    if use_lapack_eigh:
        lam, U = jnp.linalg.eigh(covM)
    else:
        lam, U = eigh3(covM)

    valid = (NN > 0.5) & (f.coe > 0)
    coe = jnp.where(valid, f.coe, 0.0)
    residual = jnp.sum(
        coe * sum(lam[..., l] for l in l_set)
    )

    uT = jnp.swapaxes(U, -1, -2)             # (G, 3k, 3) rows are u_k

    # U_k 6x4 operators (bavoxel.hpp:354-360): [[-hat(u_k), 0], [0, u_k]]
    Uk = jnp.zeros((G, 3, 6, 4), dtype)
    Uk = Uk.at[..., :3, :3].set(-lie.hat(uT))
    Uk = Uk.at[..., 3:, 3].set(uT)

    # temp = T[:3, :] with translation column shifted by -vbar
    # (bavoxel.hpp:368-369)
    if centered:
        temp = Tg[..., :3, :]
    else:
        temp = jnp.broadcast_to(T[None, :, :3, :], (G, W, 3, 4))
    temp = temp.at[..., :, 3].add(-vbar[:, None, :])

    # X = TC @ temp^T  (bavoxel.hpp:370 TC_TCFSp), (G, W, 4, 3)
    X = sm.matmul(TC, temp, transpose_b=True)

    inv_NN = (1.0 / NNs)[:, None]            # (G, 1) broadcast over W
    scale = jnp.maximum(lam[..., 2], 1e-30)
    ks_all = [k for k in range(3) if k not in l_set]

    jvec_total = jnp.zeros((G, W, 6), dtype)
    Dblk = jnp.zeros((G, W, 6, 6), dtype)
    row_groups = []

    for l in l_set:
        u_l = U[..., :, l]                   # (G, 3)
        Ul = Uk[:, l]                        # (G, 6, 4)

        # g_kl vectors (bavoxel.hpp:372-378)
        Xul = sm.matvec(X, u_l[:, None])              # (G, W, 4)
        g1 = jnp.sum(
            Uk[:, :, None, :, :] * Xul[:, None, :, None, :], axis=-1
        )                                             # (G, 3, W, 6)
        UlX = sm.matmul(Ul[:, None], X)               # (G, W, 6, 3)
        g2 = jnp.sum(
            UlX[:, None] * uT[:, :, None, None, :], axis=-1
        )                                             # (G, 3, W, 6)
        g_kl = (g1 + g2) * inv_NN[..., None, None]

        # a_i = U_l (TC_i) e_3 (bavoxel.hpp:380 UlTCF), (G, W, 6)
        a = sm.matvec(Ul[:, None], TC[..., :, 3])

        # block-diagonal corrections (bavoxel.hpp:385-401)
        UlTCT = sm.matmul(Ul[:, None], TCT)           # (G, W, 6, 4)
        Hb = sm.matmul(UlTCT, Ul[:, None], transpose_b=True)
        Hb = Hb * (2.0 * inv_NN)[..., None, None]
        y = sm.matvec(X[..., :3, :], u_l[:, None])    # (G, W, 3)
        Ell = sm.matmul(
            lie.hat(y), lie.hat(u_l)[:, None]
        ) * inv_NN[..., None, None]
        Dl = jnp.zeros((G, W, 6, 6), dtype)
        Dl = Dl.at[..., :3, :3].add(Ell + jnp.swapaxes(Ell, -1, -2))
        Dl = Dl + Hb

        jvec = g_kl[:, l]                             # (G, W, 6)
        g_k = jnp.stack([g_kl[:, k] for k in ks_all], axis=1)

        if centered:
            c = f.centers[:, None, :]
            a = lie.adjoint_translation_vec(a, c)
            jvec = lie.adjoint_translation_vec(jvec, c)
            g_k = lie.adjoint_translation_vec(
                g_k.reshape(G, len(ks_all) * W, 6), c
            ).reshape(G, len(ks_all), W, 6)
            Dl = lie.adjoint_translation_mat(Dl, c)
            # exact second-order chain term of the conjugated left chart
            Dl = Dl.at[..., :3, :3].add(
                lie.centering_hessian_correction(jvec[..., 3:], c)
            )

        jvec_total = jvec_total + jvec
        Dblk = Dblk + Dl

        # eigen-gap weights to the COMPLEMENT of l_set
        # (bavoxel.hpp:390-392; intra-set terms cancel pairwise)
        gapk = jnp.stack([lam[..., k] - lam[..., l] for k in ks_all], axis=-1)
        wk = jnp.where(
            gapk > gap_eps * scale[..., None],
            2.0 * coe[..., None] / jnp.maximum(gapk, 1e-30), 0.0,
        )
        wa = 2.0 * coe / (NNs * NNs)
        row_groups.append(
            (jnp.sqrt(wa)[:, None, None] * a).reshape(G, 6 * W)[:, None, :]
        )
        row_groups.append(
            (jnp.sqrt(wk)[..., None, None] * g_k).reshape(
                G, len(ks_all), 6 * W
            )
        )

    # gradient (bavoxel.hpp:381)
    JacT = jnp.sum(coe[:, None, None] * jvec_total, axis=0).reshape(6 * W)

    # stack scaled rows -> one big MXU matmul gives ALL (i, j) blocks at once
    rows = jnp.concatenate(row_groups, axis=1)
    rows = rows.reshape(rows.shape[0] * rows.shape[1], 6 * W)
    H = -(rows.T @ rows)

    # add block-diagonal corrections
    D = jnp.sum(coe[:, None, None, None] * Dblk, axis=0)  # (W, 6, 6)
    Hr = H.reshape(W, 6, W, 6)
    iw = jnp.arange(W)
    Hr = Hr.at[iw, :, iw, :].add(D)
    H = Hr.reshape(6 * W, 6 * W)

    return residual, JacT, H
