"""First-order pose-covariance propagation (BALM2 paper sec. V).

Re-design of the reference's `left_jacobian_point` + `multi_second`
(src/simulation/BAs_left.hpp:342-473, 995-1023) and the final
`Rcov = H^{-1} (sum_gj L c L^T) H^{-T}` (BAs_left.hpp:1089-1096).

Math: the converged gradient J(x*, s) = 0 defines x*(s) implicitly, where
s_gj are the per-(plane, scan) cluster statistics (9 numbers: 6 of P, 3 of
v) corrupted by iid point noise.  First order:

    cov(x*) = H^{-1} [ sum_{g,j} L_gj ccov_gj L_gj^T ] H^{-T}

with L_gj = dJ/ds_gj (6W x 9) and ccov_gj the statistic covariance
(derived in closed form from the moments, ops/clusters.stat_noise_cov).

Structure exploited here (the reference loops p over the window for every
(g, j), its "second hot path"): L_gj rows decompose as

    L_gj[p] = 2/NN * ( A_gp G_gj  -  (1/NN) a_gp q_gj^T  +  delta_jp D_gj )

with per-(g,p) A (6x3), a (6,) and per-(g,j) G (3x9), q (9,), D (6x9).
Stacking V_gj = [G_gj ; -q_gj^T/NN] (4x9), S_g = sum_j V c V^T (4x4, PSD)
and P_gp = [A_gp | a_gp] (6x4):

    sum_j L c L^T = P S P^T + P N + (P N)^T + blockdiag_j(D c D^T)
    with N_gq = V_gq ccov_gq D_gq^T (4x6).

Summing over planes, P S P^T becomes (M^T M) with M = chol(S)^T P^T
stacked over g — one MXU matmul — and the cross term is one
(6W x 4G)(4G x 6W) matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import lie
from . import smallmat as sm
from .eigh3 import eigh3
from .factors import PlaneFactors, _plane_moment, evaluate


def _stat_basis(dtype):
    """E4 (9, 4, 4): C(s) = sum_i s_i E4_i for the statistic order
    (Pxx, Pxy, Pxz, Pyy, Pyz, Pzz, vx, vy, vz) — matches the reference's
    g1 stacking (BAs_left.hpp:322-331)."""
    import numpy as np

    E = np.zeros((9, 4, 4))
    idx = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    for i, (a, b) in enumerate(idx):
        E[i, a, b] = 1.0
        E[i, b, a] = 1.0
    E[0, 0, 0] = 1.0
    E[3, 1, 1] = 1.0
    E[5, 2, 2] = 1.0
    for i, a in enumerate([0, 1, 2]):
        E[6 + i, a, 3] = 1.0
        E[6 + i, 3, a] = 1.0
    return jnp.asarray(E, dtype)


def _g1(w, E4):
    """g1(w) (.., 4, 9) = d(C(s) w)/ds (BAs_left.hpp:322-331)."""
    return jnp.einsum("iab,...b->...ai", E4, w)


def _g2(w):
    """(.., 4) -> (.., 6, 3): [[hat(w[:3])], [w3 I]] (BAs_left.hpp:333-340)."""
    h = lie.hat(w[..., :3])
    eye = jnp.eye(3, dtype=w.dtype)
    lower = w[..., 3, None, None] * eye
    return jnp.concatenate([h, lower], axis=-2)


def scatter_jacobian_rhs(T, f: PlaneFactors, ccov, *, gap_eps: float = 1e-9):
    """sum_{g,j} L_gj ccov_gj L_gj^T  (6W, 6W).

    T (W,4,4) poses (converged), f PlaneFactors (coe used as weights must
    be 1 for the consistency protocol, BAs_left.hpp:43-45), ccov
    (G, W, 9, 9) per-cluster statistic covariances.

    Reference: VOX_HESS::left_jacobian_point (BAs_left.hpp:342-473).
    NOTE: centering/body-recentring is not supported here (consistency
    runs in f64); factors must hold raw body moments.
    """
    with jax.default_matmul_precision("float32"):
        return _scatter_rhs_impl(T, f, ccov, gap_eps)


def _scatter_rhs_impl(T, f, ccov, gap_eps):
    G, W = f.C.shape[:2]
    dtype = f.C.dtype
    E4 = _stat_basis(dtype)
    l = 0

    _, TC, TCT, NNs, NN, vbar, covM = _plane_moment(T, f, centered=False)
    lam, U = eigh3(covM)
    valid = (NN > 0.5) & (f.coe > 0)
    coe = jnp.where(valid, f.coe, 0.0)

    u_l = U[..., :, l]                               # (G, 3)
    uT = jnp.swapaxes(U, -1, -2)                     # (G, k, 3)

    # U_k (6,4) operators
    Uk = jnp.zeros((G, 3, 6, 4), dtype)
    Uk = Uk.at[..., :3, :3].set(-lie.hat(uT))
    Uk = Uk.at[..., 3:, 3].set(uT)
    Ul = Uk[:, 0]                                    # (G, 6, 4)

    # normalized world moment Cn (the reference's C after /NN)
    # rebuild from _plane_moment outputs
    Cn_sum = f.Cfix + jnp.sum(TCT, axis=1)
    Cn = Cn_sum / NNs[..., None, None]               # (G, 4, 4)

    SpTul = jnp.concatenate([u_l, jnp.zeros((G, 1), dtype)], axis=-1)  # (G,4)

    # T_FC[p] = T[p]^T - F Cn : bottom row of F Cn is Cn[3,:] = [vbar, 1]
    Tt = jnp.swapaxes(T, -1, -2)                     # (W, 4, 4)
    FC = jnp.zeros((G, 4, 4), dtype).at[:, 3, :].set(Cn[:, 3, :])
    T_FC = Tt[None] - FC[:, None]                    # (G, W, 4, 4)

    inv_NN = 1.0 / NNs                               # (G,)

    # --- per-(g,p) pieces ---
    UlTC = sm.matmul(Ul[:, None], TC)                # (G, W, 6, 4)
    a = UlTC[..., :, 3]                              # (G, W, 6)  = UlTCF
    w2 = sm.matvec(sm.matmul(TC, T_FC), SpTul[:, None])        # (G, W, 4)
    A = _g2(w2) + sm.matmul(UlTC, T_FC)[..., :, :3]  # g2_combos (G, W, 6, 3)
    # NOTE: UlTC @ T_FC @ Sp^T = first 3 columns of UlTC @ T_FC

    # --- per-(g,j) pieces ---
    # w_j = T[j]^T SpTul = [R_j^T u_l ; t_j . u_l]   (G, W, 4)
    wj = sm.matvec(Tt[None], SpTul[:, None])
    g1_TSu = _g1(wj, E4)                             # (G, W, 4, 9)

    # G_j = sum_{k != l} 1/((lam_l - lam_k) NN) u_k u_k^T Sp Gkl
    #   Gkl = T_FC[j]^T g1_TSu - T[j] g1(F Cn Sp^T u_l)
    # F Cn Sp^T u_l = e3 * (vbar . u_l)
    vu = jnp.sum(vbar * u_l, axis=-1)                # (G,)
    w_fc = jnp.zeros((G, 4), dtype).at[:, 3].set(vu)
    g1_fc = _g1(w_fc, E4)                            # (G, 4, 9)
    # Gkl = T_FC[j]^T g1_TSu - T[j] g1(F Cn Sp^T u_l)
    Gkl = sm.matmul(jnp.swapaxes(T_FC, -1, -2), g1_TSu) - sm.matmul(
        T[None], g1_fc[:, None]
    )                                                # (G, W, 4, 9)
    SpGkl = Gkl[..., :3, :]                          # (G, W, 3, 9)

    gap = lam[..., 1:] - lam[..., 0:1]               # (G, 2) >= 0
    scale = jnp.maximum(lam[..., 2], 1e-30)
    wgap = jnp.where(
        gap > gap_eps * scale[..., None],
        -1.0 / (jnp.maximum(gap, 1e-30) * NNs[..., None]),
        0.0,
    )                                                # (G, 2): 1/((lam_l-lam_k) NN)
    # sum_k wgap_k u_k u_k^T  (k = 1, 2)
    ukuk = uT[:, 1:, :, None] * uT[:, 1:, None, :]   # (G, 2, 3, 3)
    Pgap = jnp.sum(wgap[..., None, None] * ukuk, axis=1)  # (G, 3, 3)
    Gj = sm.matmul(Pgap[:, None], SpGkl)             # (G, W, 3, 9)

    # q_j (9,): nonzero only in the v-slot, = R_j^T u_l
    Rtu = wj[..., :3]                                # (G, W, 3)
    qj = jnp.concatenate(
        [jnp.zeros((G, W, 6), dtype), Rtu], axis=-1
    )                                                # (G, W, 9)

    # D_j = U_l T[j] g1(T_FC[j] SpTul)  (G, W, 6, 9)
    wD = sm.matvec(T_FC, SpTul[:, None])             # (G, W, 4)
    UlT = sm.matmul(Ul[:, None], T[None])            # (G, W, 6, 4) -- wait: Ul (G,6,4) @ T (W,4,4)
    Dj = sm.matmul(UlT, _g1(wD, E4))                 # (G, W, 6, 9)

    # mask invalid (g, j): clusters with no points contribute nothing
    obs = (f.C[..., 3, 3] > 0.5) & valid[:, None]    # (G, W)
    m = obs.astype(dtype)[..., None, None]
    ccov = ccov * m

    # stack V = [G_j ; -q_j^T / NN] (G, W, 4, 9)
    V = jnp.concatenate(
        [Gj, (-inv_NN[:, None, None, None]) * qj[..., None, :]], axis=-2
    )

    # S_g = sum_j V c V^T  (G, 4, 4); N_gq = V c D^T (G, W, 4, 6)
    Vc = sm.matmul(V, ccov)                          # (G, W, 4, 9)
    S = jnp.sum(sm.matmul(Vc, V, transpose_b=True), axis=1)   # (G, 4, 4)
    Ncross = sm.matmul(Vc, Dj, transpose_b=True)     # (G, W, 4, 6)
    Dc = sm.matmul(Dj, ccov)                         # (G, W, 6, 9)
    Dblk = sm.matmul(Dc, Dj, transpose_b=True)       # (G, W, 6, 6)

    # plane weight: L_gj carries 2 coe_g / NN_g overall
    wplane = 2.0 * coe * inv_NN                      # (G,)
    n6 = 6 * W

    # P_gp = wplane [A_gp | a_gp] (G, W, 6, 4)
    P = jnp.concatenate([A, a[..., None]], axis=-1)
    P = P * wplane[:, None, None, None]
    Ncross = Ncross * wplane[:, None, None, None]

    # flatten block layouts: rows indexed (g, i<4), cols (p, e<6)
    Pcols = jnp.transpose(P, (0, 3, 1, 2)).reshape(G * 4, n6)
    Ncols = jnp.transpose(Ncross, (0, 2, 1, 3)).reshape(G * 4, n6)

    # main: sum_g P_g^T S_g P_g as one matmul (S applied per-g first)
    Pmat = jnp.transpose(P, (0, 3, 1, 2)).reshape(G, 4, n6)
    SP = jnp.matmul(S, Pmat)                         # (G, 4, 6W)
    main = Pcols.T @ SP.reshape(G * 4, n6)

    # cross: sum_g P_gp N_gq over all block pairs
    cross = Pcols.T @ Ncols

    rhs = main + cross + cross.T

    # block-diagonal D c D^T with weight wplane^2
    Dsum = jnp.sum((wplane**2)[:, None, None, None] * Dblk, axis=0)  # (W,6,6)
    rhs_r = rhs.reshape(W, 6, W, 6)
    iw = jnp.arange(W)
    rhs_r = rhs_r.at[iw, :, iw, :].add(Dsum)
    return rhs_r.reshape(n6, n6)


def pose_covariance(T, f: PlaneFactors, ccov, *, gap_eps: float = 1e-9):
    """Full first-order pose covariance H^{-1} rhs H^{-T}
    (BAs_left.hpp:1089-1096)."""
    rhs = scatter_jacobian_rhs(T, f, ccov, gap_eps=gap_eps)
    _, _, H = evaluate(T, f, gap_eps=gap_eps)
    X = jnp.linalg.solve(H, rhs)
    return jnp.linalg.solve(H, X.T).T
