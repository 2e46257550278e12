"""Fused Pallas TPU kernels for the full second-order plane-factor pass.

This is the production fast path replacing the XLA evaluator in
ops/factors.py for the hot LM loop (centered, body-recentered, l_set=(0,)
plane factors).  Two kernels over the packed layout (ops/packed.py):

  * `_csum_kernel`  — world plane-moment accumulation
        Csum[g] = sum_w T'_gw C_gw T'_gw^T   (channels, centered frame)
    used for both the trial-residual path and the evaluation prefix.

  * `_hess_kernel`  — the whole rank-row assembly: per-(plane, scan)
    6-vectors a, g_k (k=1,2), jvec, block-diagonal corrections, the
    centering adjoint maps, and the (6W x 3G)(3G x 6W) Hessian matmul,
    all without ever materializing a (G, W, ...) intermediate in HBM.

Semantics are IDENTICAL to factors.evaluate(T, f, centered=True): the
reference math is left_evaluate_acc2 (src/benchmark/bavoxel.hpp:304-426);
see ops/factors.py for the derivation.  Closed forms used in-kernel:

    TC       = [[R P, n t], [0, n]]            (recentered C: v = 0)
    X3       = R P R^T + n t d^T,  d = t - vbar        (X = TC temp^T)
    X4       = n d
    a        = [ (n t) x u0 ; n u0 ]                   (= Ul TC e3)
    g1_k     = [ (X3 u0) x u_k ; u_k (X4 . u0) ]
    g2_k     = [ (X3 u_k) x u0 ; u0 (X4 . u_k) ]
    g_k      = (g1_k + g2_k) / N ;   jvec = g_l (l = 0)
    Y        = X3 + (n t) vbar^T               (= R P R^T + n t t^T)
    Hb       = (2/N) [[hat(u0) Y hat(u0)^T? -- via crosses, see kernel],
                      [a_rot u0^T ; ...], [n u0 u0^T]]
    Ell+Ell^T= (1/N) (u0 y^T + y u0^T - 2 (y.u0) I),  y = X3 u0
               (using hat(y) hat(u) = u y^T - (y.u) I)

Layout choices (why this is fast on TPU):
  * plane axis on the 128-lane dimension; scan tiles of 8 on sublanes --
    every per-(g, w) product is a full (8, 128) VPU op.
  * the row matrix is built in VMEM in (j, w)-major order so all stores
    are aligned (8, 128) blocks (no in-kernel relayout); the XLA glue
    permutes the final (6W, 6W) Hessian once (~5 MB, negligible).
  * H accumulates across plane-tiles in the output VMEM window
    (grid is sequential on TPU; same out block index for every step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .eigh3 import eigh3, eigvals3
from .packed import PackedFactors, csum_to_cov, pad_poses

import os

LANES = 128
BG_CSUM = 512   # plane-block for the moment kernel (pure VPU, bigger=fewer programs)
# plane-block for the Hessian kernel (VMEM-bound; 128 or 256 both fit
# under the raised scoped-vmem limit — tunable for benchmarking)
BG_HESS = int(os.environ.get("BALM_BG_HESS", "128"))

_DOT_KW = dict(
    dimension_numbers=(((1,), (1,)), ((), ())),
    preferred_element_type=jnp.float32,
    precision=lax.Precision.HIGHEST,
)


def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _load_scan_tile(pose_ref, mom_ref, cen_ref, w0):
    """Per-scan-tile loads: rotation/translation (8,1), moments (8,BG)."""
    r = [pose_ref[pl.ds(w0, 8), k:k + 1] for k in range(9)]
    tw = [pose_ref[pl.ds(w0, 8), 9 + k:10 + k] for k in range(3)]
    pch = [mom_ref[pl.ds(w0, 8), k, :] for k in range(6)]
    b = [mom_ref[pl.ds(w0, 8), 6 + k, :] for k in range(3)]
    n = mom_ref[pl.ds(w0, 8), 9, :]
    c = [cen_ref[k:k + 1, :] for k in range(3)]
    # t = R b + t_w - c   (the shifted/composed translation, factors.py
    # _shifted_poses)
    t = [r[3 * i] * b[0] + r[3 * i + 1] * b[1] + r[3 * i + 2] * b[2]
         + tw[i] - c[i] for i in range(3)]
    return r, pch, n, t, c


def _sym3(pch):
    """6 channels -> full symmetric 3x3 (list of lists)."""
    return [[pch[0], pch[1], pch[2]],
            [pch[1], pch[3], pch[4]],
            [pch[2], pch[4], pch[5]]]


def _rprt(r, P):
    """R P R^T for scalar-channel R (8,1) and symmetric P (8,BG) lists."""
    A = [[r[3 * i + 0] * P[0][j] + r[3 * i + 1] * P[1][j]
          + r[3 * i + 2] * P[2][j] for j in range(3)] for i in range(3)]
    return [[A[i][0] * r[3 * j + 0] + A[i][1] * r[3 * j + 1]
             + A[i][2] * r[3 * j + 2] for j in range(3)] for i in range(3)]


# --------------------------------------------------------------------------
# Kernel A: moment accumulation
# --------------------------------------------------------------------------

def _csum_kernel(pose_ref, mom_ref, cen_ref, cfix_ref, out_ref):
    """Two-pass centered moments: out channels = [N*cov (6), vsum (3), N].

    Pass 1 forms vbar (linear, no cancellation), pass 2 accumulates
        R P R^T + n (t - vbar)(t - vbar)^T
    directly — the one-pass (sum T C T^T)/N - vbar vbar^T form cancels
    (|t|/spread)^2 of the f32 mantissa (see factors_windowed
    ._window_moment).  cfix channels: [P_recentered (6), b (3), n].
    """
    Wp = mom_ref.shape[0]
    shape = (8, mom_ref.shape[2])

    def pass1(wt, acc):
        w0 = pl.multiple_of(wt * 8, 8)
        _, _, n, t, _ = _load_scan_tile(pose_ref, mom_ref, cen_ref, w0)
        return (acc[0] + n * t[0], acc[1] + n * t[1], acc[2] + n * t[2],
                acc[3] + n)

    a1 = lax.fori_loop(
        0, Wp // 8, pass1,
        tuple(jnp.zeros(shape, jnp.float32) for _ in range(4)))
    nf = cfix_ref[9:10, :]
    bf = [cfix_ref[6 + k:7 + k, :] for k in range(3)]
    N = jnp.sum(a1[3], axis=0, keepdims=True) + nf              # (1, BG)
    vsum = [jnp.sum(a1[k], axis=0, keepdims=True) + nf * bf[k]
            for k in range(3)]
    Ns = jnp.where(N > 0.5, N, 1.0)
    vbar = [vs / Ns for vs in vsum]                              # (1, BG)

    def pass2(wt, acc):
        w0 = pl.multiple_of(wt * 8, 8)
        r, pch, n, t, _ = _load_scan_tile(pose_ref, mom_ref, cen_ref, w0)
        M = _rprt(r, _sym3(pch))
        d = [t[k] - vbar[k] for k in range(3)]
        nd = [n * d[k] for k in range(3)]
        upd = [M[0][0] + nd[0] * d[0], M[0][1] + nd[0] * d[1],
               M[0][2] + nd[0] * d[2], M[1][1] + nd[1] * d[1],
               M[1][2] + nd[1] * d[2], M[2][2] + nd[2] * d[2]]
        return tuple(a + u for a, u in zip(acc, upd))

    a2 = lax.fori_loop(
        0, Wp // 8, pass2,
        tuple(jnp.zeros(shape, jnp.float32) for _ in range(6)))
    df = [bf[k] - vbar[k] for k in range(3)]
    fixq = jnp.where(nf > 0.5, nf, 0.0)
    covN = [jnp.sum(a2[0], axis=0, keepdims=True)
            + cfix_ref[0:1, :] + fixq * df[0] * df[0],
            jnp.sum(a2[1], axis=0, keepdims=True)
            + cfix_ref[1:2, :] + fixq * df[0] * df[1],
            jnp.sum(a2[2], axis=0, keepdims=True)
            + cfix_ref[2:3, :] + fixq * df[0] * df[2],
            jnp.sum(a2[3], axis=0, keepdims=True)
            + cfix_ref[3:4, :] + fixq * df[1] * df[1],
            jnp.sum(a2[4], axis=0, keepdims=True)
            + cfix_ref[4:5, :] + fixq * df[1] * df[2],
            jnp.sum(a2[5], axis=0, keepdims=True)
            + cfix_ref[5:6, :] + fixq * df[2] * df[2]]
    for k in range(6):
        out_ref[k:k + 1, :] = covN[k]
    for k in range(3):
        out_ref[6 + k:7 + k, :] = vsum[k]
    out_ref[9:10, :] = N


@functools.partial(jax.jit, static_argnames=("interpret",))
def csum_packed(pose, mom, cen, cfix, *, interpret: bool = False):
    """pose (Wp,12), mom (Wp,10,Gp), cen (3,Gp), cfix (10,Gp) ->
    channels (10, Gp): [N*cov (6), vsum (3), N].

    Superseded by `csum_packed_xla` in the production paths: profiling on
    v5e showed this kernel ~24 ms/call (scalar-channel VPU code from the
    per-channel sliced loads) vs ~0.3 ms for the matmul formulation.
    Kept as an independent implementation for equality tests.
    """
    Wp, _, Gp = mom.shape
    assert Gp % BG_CSUM == 0 and Wp % 8 == 0
    return pl.pallas_call(
        _csum_kernel,
        grid=(Gp // BG_CSUM,),
        in_specs=[
            pl.BlockSpec((Wp, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, 10, BG_CSUM), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BG_CSUM), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, BG_CSUM), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((10, BG_CSUM), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, Gp), jnp.float32),
        interpret=interpret,
    )(pose, mom, cen, cfix)


_VECH = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))


def _sym_square_op(R):
    """(W,3,3) -> (W,6,6) S with vech(R P R^T) = S @ vech(P) in the
    (xx,xy,xz,yy,yz,zz) channel order: S[c,k] for c=(i,j), k=(k,l) is
    R_ik R_jl + [k != l] R_il R_jk."""
    rows = []
    for (i, j) in _VECH:
        row = []
        for (k, l) in _VECH:
            s = R[:, i, k] * R[:, j, l]
            if k != l:
                s = s + R[:, i, l] * R[:, j, k]
            row.append(s)
        rows.append(jnp.stack(row, axis=-1))
    return jnp.stack(rows, axis=-2)


def csum_packed_xla(pose, mom, cen, cfix):
    """Matmul formulation of `_csum_kernel` — bit-compatible semantics,
    pure XLA, ~80x faster on TPU than the Pallas kernel it replaces.

    The rotated-second-moment sum is LINEAR in the vech(P) channels:
    sum_w R_w P_wg R_w^T = einsum('wck,wkg->cg', S(R_w), P) — one MXU
    matmul over the (scan x channel) axis.  The centroid chain keeps the
    exact two-pass centered form (vbar first, then n(t-vbar)(t-vbar)^T;
    never the cancelling sum(n t t^T) - N vbar vbar^T), so the f32
    mantissa analysis of factors_windowed._window_moment carries over
    unchanged.  Padding scans/planes have zero moments -> contribute 0.
    """
    Wp, _, Gp = mom.shape
    R = pose[:, :9].reshape(Wp, 3, 3)
    tw = pose[:, 9:12]
    P6 = mom[:, :6, :]                              # (Wp, 6, Gp)
    b = mom[:, 6:9, :]                              # (Wp, 3, Gp)
    n = mom[:, 9, :]                                # (Wp, Gp)
    nf = cfix[9]                                    # (Gp,)
    bf = cfix[6:9]                                  # (3, Gp)

    # sum_w R P R^T: one (6, 6Wp) x (6Wp, Gp) matmul
    S = _sym_square_op(R)                           # (Wp, 6, 6)
    rpr = jnp.einsum("wck,wkg->cg", S, P6)

    # t_wg = R_w b_wg + t_w - c_g, unrolled (3-wide contractions lower
    # poorly through dot; as elementwise FMAs they fuse into the reduce)
    t = jnp.stack([
        R[:, i, 0, None] * b[:, 0] + R[:, i, 1, None] * b[:, 1]
        + R[:, i, 2, None] * b[:, 2] + tw[:, i, None] - cen[None, i]
        for i in range(3)], axis=1)                 # (Wp, 3, Gp)

    Nn = jnp.sum(n, axis=0) + nf                    # (Gp,)
    vsum = jnp.sum(n[:, None, :] * t, axis=0) + nf * bf
    Ns = jnp.where(Nn > 0.5, Nn, 1.0)
    vbar = vsum / Ns
    d = t - vbar[None]                              # (Wp, 3, Gp)
    nd = n[:, None, :] * d
    cN = jnp.stack([jnp.sum(nd[:, i] * d[:, j], axis=0)
                    for (i, j) in _VECH])           # (6, Gp)
    df = bf - vbar
    fixq = jnp.where(nf > 0.5, nf, 0.0)
    fixdd = jnp.stack([fixq * df[i] * df[j] for (i, j) in _VECH])
    covN = rpr + cN + cfix[:6] + fixdd
    return jnp.concatenate([covN, vsum, Nn[None]], axis=0)


# --------------------------------------------------------------------------
# Kernel B: rank rows + Hessian matmul
# --------------------------------------------------------------------------
# aux channels: 0-2 u0 | 3-5 u1 | 6-8 u2 | 9-11 vbar | 12 invN | 13 sqrt_wa
#               | 14 sqrt_w1 | 15 sqrt_w2 | 16 coe(masked)
AUX_CH = 17


def _hess_kernel(pose_ref, mom_ref, cen_ref, aux_ref, h_ref, j_ref, d_ref,
                 rows_ref):
    i = pl.program_id(0)
    Wp = mom_ref.shape[0]
    BG = mom_ref.shape[2]

    @pl.when(i == 0)
    def _():
        j_ref[...] = jnp.zeros_like(j_ref)
        d_ref[...] = jnp.zeros_like(d_ref)

    u = [[aux_ref[3 * k + m:3 * k + m + 1, :] for m in range(3)]
         for k in range(3)]                       # u[k][m]: (1, BG)
    vb = [aux_ref[9 + m:10 + m, :] for m in range(3)]
    invN = aux_ref[12:13, :]
    sqa = aux_ref[13:14, :]
    sqk = [aux_ref[14:15, :], aux_ref[15:16, :]]
    coew = aux_ref[16:17, :]
    u0 = u[0]

    def scan_tile(wt, _):
        w0 = pl.multiple_of(wt * 8, 8)
        r, pch, n, t, c = _load_scan_tile(pose_ref, mom_ref, cen_ref, w0)
        P = _sym3(pch)
        RPRt = _rprt(r, P)
        d3 = [t[m] - vb[m] for m in range(3)]
        nt = [n * t[m] for m in range(3)]
        X3 = [[RPRt[a][b] + nt[a] * d3[b] for b in range(3)]
              for a in range(3)]
        X4 = [n * d3[m] for m in range(3)]

        def x3_dot(v):
            return [X3[a][0] * v[0] + X3[a][1] * v[1] + X3[a][2] * v[2]
                    for a in range(3)]

        Xu = [x3_dot(u[k]) for k in range(3)]     # X3 @ u_k
        Xu3 = [_dot3(X4, u[k]) for k in range(3)]  # X4 . u_k

        # a = [ (n t) x u0 ; n u0 ]
        a_rot = _cross(nt, u0)
        a_tr = [n * u0[m] for m in range(3)]

        # jvec = 2/N [ (X3 u0) x u0 ; u0 (X4.u0) ]
        jrot = [2.0 * invN * v for v in _cross(Xu[0], u0)]
        jtr = [2.0 * invN * u0[m] * Xu3[0] for m in range(3)]

        # g_k = 1/N (g1_k + g2_k), k = 1, 2
        g_rot, g_tr = [], []
        for k in (1, 2):
            g1r = _cross(Xu[0], u[k])
            g2r = _cross(Xu[k], u0)
            g_rot.append([invN * (g1r[m] + g2r[m]) for m in range(3)])
            g_tr.append([invN * (u[k][m] * Xu3[0] + u0[m] * Xu3[k])
                         for m in range(3)])

        # --- block-diagonal correction Dl (6x6 SoA) ---
        # TL = 2/N * [-hat(u0) Y hat(u0)] rows via double cross;
        # Y = X3 + (n t) vbar^T
        Y = [[X3[a][b] + nt[a] * vb[b] for b in range(3)] for a in range(3)]
        # B1 columns: B1[:, j] = -u0 x Y[:, j]
        B1c = [[-v for v in _cross(u0, [Y[0][j], Y[1][j], Y[2][j]])]
               for j in range(3)]
        # TL rows: TL[i, :] = -u0 x B1[i, :]
        B1r = [[B1c[j][a] for j in range(3)] for a in range(3)]
        TL = [[-v for v in _cross(u0, B1r[a])] for a in range(3)]
        y = Xu[0]
        ydu = _dot3(y, u0)
        two_invN = 2.0 * invN
        # Dl[:3,:3] = (Ell + Ell^T) + 2/N TL
        Dtl = [[invN * (u0[a] * y[b] + y[a] * u0[b]) + two_invN * TL[a][b]
                for b in range(3)] for a in range(3)]
        for a in range(3):
            Dtl[a][a] = Dtl[a][a] - two_invN * ydu
        # Dl[:3,3:] = 2/N a_rot u0^T ; Dl[3:,3:] = 2/N n u0 u0^T
        Dtr = [[two_invN * a_rot[a] * u0[b] for b in range(3)]
               for a in range(3)]
        Dbr = [[two_invN * n * u0[a] * u0[b] for b in range(3)]
               for a in range(3)]
        Dbl = [[Dtr[b][a] for b in range(3)] for a in range(3)]

        # --- centering adjoints: map back through S = translate(-c) ---
        # covectors: (gw, gr) -> (gw + c x gr, gr)
        def adj_vec(rot, tr):
            cx = _cross(c, tr)
            return [rot[m] + cx[m] for m in range(3)], tr

        a_rot, a_tr = adj_vec(a_rot, a_tr)
        jrot, jtr = adj_vec(jrot, jtr)
        for k in range(2):
            g_rot[k], g_tr[k] = adj_vec(g_rot[k], g_tr[k])

        # matrices: J^T Dl J with J = [[I,0],[-hat(c),I]]
        #   A2 rows = A rows + c x (B rows); C2 rows = C rows + c x (D rows)
        #   TL' cols = A2 cols + c x (C2 cols); TR' cols = B cols + c x (D cols)
        def rows_pluscross(Mr, Nr):
            return [[Mr[a][b] + _cross(c, Nr[a])[b] for b in range(3)]
                    for a in range(3)]

        def cols_pluscross(Mc, Nc):
            out = [[None] * 3 for _ in range(3)]
            for b in range(3):
                colN = [Nc[0][b], Nc[1][b], Nc[2][b]]
                cx = _cross(c, colN)
                for a in range(3):
                    out[a][b] = Mc[a][b] + cx[a]
            return out

        A2 = rows_pluscross(Dtl, Dtr)
        C2 = rows_pluscross(Dbl, Dbr)
        Dtl = cols_pluscross(A2, C2)
        Dtr = cols_pluscross(Dtr, Dbr)
        Dbl = C2
        # + second-order chain term on the w-w block:
        # 0.5 (g c^T + c g^T) - (g.c) I, g = jtr
        gdc = _dot3(jtr, c)
        for a in range(3):
            for b in range(3):
                Dtl[a][b] = Dtl[a][b] + 0.5 * (jtr[a] * c[b] + c[a] * jtr[b])
            Dtl[a][a] = Dtl[a][a] - gdc

        # --- store scaled rank rows, (j, w)-major, aligned (8, BG) writes ---
        av = a_rot + a_tr
        jv = jrot + jtr
        g1v = g_rot[0] + g_tr[0]
        g2v = g_rot[1] + g_tr[1]
        for jj in range(6):
            rows_ref[pl.ds(jj * Wp + w0, 8), 0:BG] = sqa * av[jj]
            rows_ref[pl.ds(jj * Wp + w0, 8), BG:2 * BG] = sqk[0] * g1v[jj]
            rows_ref[pl.ds(jj * Wp + w0, 8), 2 * BG:3 * BG] = sqk[1] * g2v[jj]

        # --- gradient & diag accumulation (lane reductions) ---
        jsum = jnp.concatenate(
            [jnp.sum(coew * jv[jj], axis=1, keepdims=True) for jj in range(6)],
            axis=1,
        )                                                   # (8, 6)
        j_ref[pl.ds(w0, 8), 0:6] += jsum
        Dfull = [[Dtl, Dtr], [Dbl, Dbr]]
        dsum = jnp.concatenate(
            [jnp.sum(coew * Dfull[a // 3][b // 3][a % 3][b % 3],
                     axis=1, keepdims=True)
             for a in range(6) for b in range(6)],
            axis=1,
        )                                                   # (8, 36)
        d_ref[pl.ds(w0, 8), 0:36] += dsum
        return 0

    lax.fori_loop(0, Wp // 8, scan_tile, 0)

    h = lax.dot_general(rows_ref[...], rows_ref[...], **_DOT_KW)

    @pl.when(i == 0)
    def _():
        h_ref[...] = h

    @pl.when(i > 0)
    def _():
        h_ref[...] += h


@functools.partial(jax.jit, static_argnames=("interpret",))
def hess_packed(pose, mom, cen, aux, *, interpret: bool = False):
    """-> (Htilde (6Wp,6Wp) in (j,w)-major order, J (Wp,128), D (Wp,128))."""
    Wp, _, Gp = mom.shape
    assert Gp % BG_HESS == 0 and Wp % 8 == 0
    n6 = 6 * Wp
    return pl.pallas_call(
        _hess_kernel,
        grid=(Gp // BG_HESS,),
        in_specs=[
            pl.BlockSpec((Wp, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, 10, BG_HESS), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BG_HESS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((AUX_CH, BG_HESS), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n6, n6), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n6, n6), jnp.float32),
            jax.ShapeDtypeStruct((Wp, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Wp, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n6, 3 * BG_HESS), jnp.float32),
        ],
        # H window + dot intermediate + rows scratch exceed the default
        # 16 MB scoped-vmem budget at W=177; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(pose, mom, cen, aux)


# --------------------------------------------------------------------------
# Kernel B v2: full-array channels + in-VMEM rows + accumulated MXU dot
# --------------------------------------------------------------------------

BG_HESS2 = int(os.environ.get("BALM_BG_HESS2", "512"))


def _hess_kernel_v2(pose_ref, mom_ref, cen_ref, aux_ref, h_ref, j_ref, d_ref,
                    rows_ref, *, split: str):
    """Fused rank-row assembly + Hessian dot, one plane tile per step.

    v1 (`_hess_kernel`) looped 8-scan tiles and sliced every channel into
    (8, BG) ops — ~150 tiny VPU ops x Wp/8 trips made it slower than the
    XLA formulation.  v2 loads whole (Wp, BG) blocks and reuses the SAME
    channel code as the XLA path (`_rows_channels_xla`), so the per-tile
    body is a few hundred full-height VPU ops; rows never leave VMEM and
    the (6Wp, 3BG) x (3BG, 6Wp) dot accumulates across the plane grid.

    split: 'f32' (exact-f32 6-pass dot) or 'bf16x3' (hi/lo bf16 split,
    3 single-pass dots — the same error model as lax HIGH precision).
    """
    i = pl.program_id(0)
    Wp = mom_ref.shape[0]
    BG = mom_ref.shape[2]

    rows, jv, D = _rows_channels_xla(
        pose_ref[...], mom_ref[...], cen_ref[...], aux_ref[...])
    for j in range(6):
        for k in range(3):
            rows_ref[pl.ds(j * Wp, Wp), k * BG:(k + 1) * BG] = rows[j][k]

    jsum = jnp.concatenate(
        [jnp.sum(jv[j], axis=1, keepdims=True) for j in range(6)], axis=1)
    dsum = jnp.concatenate(
        [jnp.sum(D[a][b], axis=1, keepdims=True)
         for a in range(6) for b in range(6)], axis=1)

    M = rows_ref[...]
    if split == "bf16x3":
        hi = M.astype(jnp.bfloat16)
        lo = (M - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        # precision must be DEFAULT explicitly: the callers wrap the loop
        # in default_matmul_precision('float32'), and Mosaic rejects an
        # f32-precision matmul over bf16 operands
        kw = dict(dimension_numbers=(((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32,
                  precision=lax.Precision.DEFAULT)
        h = (lax.dot_general(hi, hi, **kw)
             + lax.dot_general(hi, lo, **kw)
             + lax.dot_general(lo, hi, **kw))
    else:
        h = lax.dot_general(M, M, **_DOT_KW)

    @pl.when(i == 0)
    def _():
        h_ref[...] = h
        j_ref[...] = jnp.zeros_like(j_ref)
        d_ref[...] = jnp.zeros_like(d_ref)

    @pl.when(i > 0)
    def _():
        h_ref[...] += h

    j_ref[:, 0:6] += jsum
    d_ref[:, 0:36] += dsum


@functools.partial(jax.jit, static_argnames=("interpret", "split"))
def hess_packed_v2(pose, mom, cen, aux, *, interpret: bool = False,
                   split: str = "bf16x3"):
    """-> (Htilde (6Wp,6Wp), (j,w)-major; J (Wp,128); D (Wp,128))."""
    Wp, _, Gp = mom.shape
    bg = BG_HESS2 if Gp % BG_HESS2 == 0 else BG_HESS
    # the H window + dot accumulator (2 x 36 Wp^2 f32) dominate VMEM at
    # large Wp; shrink the plane tile so rows/moments/channels fit in the
    # remainder of the ~110 MB budget
    if Wp > 256 and bg > BG_HESS:
        bg = BG_HESS
    assert Gp % bg == 0 and Wp % 8 == 0
    n6 = 6 * Wp
    return pl.pallas_call(
        functools.partial(_hess_kernel_v2, split=split),
        grid=(Gp // bg,),
        in_specs=[
            pl.BlockSpec((Wp, 12), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, 10, bg), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bg), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((AUX_CH, bg), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n6, n6), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wp, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n6, n6), jnp.float32),
            jax.ShapeDtypeStruct((Wp, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Wp, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n6, 3 * bg), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(pose, mom, cen, aux)


# --------------------------------------------------------------------------
# Kernel B v3: 2-D pose-block grid — VMEM bounded at ANY window size
# --------------------------------------------------------------------------

BW_HESS3 = int(os.environ.get("BALM_BW_HESS3", "128"))   # pose rows / block
BG_HESS3 = int(os.environ.get("BALM_BG_HESS3", "256"))   # planes / tile


def _hess_kernel_v3(blk_ref, pose_i_ref, pose_j_ref, mom_i_ref, mom_j_ref,
                    cen_ref, aux_ref, h_ref, j_ref, d_ref,
                    rows_i_ref, rows_j_ref, *, split: str):
    """One (pose-block-pair, plane-tile) step of the blocked Hessian.

    v2 keeps the whole (6Wp, 6Wp) H and (6Wp, 3BG) rows in VMEM, which
    caps Wp at ~680 and loses MXU efficiency from VMEM pressure well
    before that.  v3 tiles the POSE axis too: grid step (p, g) computes
    the (6Bw, 6Bw) block H[I, J] (I = blk[p,0], J = blk[p,1], lower
    triangle only — the mirror is scattered in the XLA glue) restricted
    to plane tile g, accumulating over g in the output window.  Rank
    rows for the two pose blocks are rebuilt per step from the same
    channel code as the XLA path; that recompute is O(Wp·Gp·nB) VPU work
    vs the O(Wp²·Gp) MXU dot — negligible for nB ≪ 6Wp.

    VMEM per step is constant in Wp: H window 36·Bw² + two (6Bw, 3BG)
    rows + two (Bw, 10, BG) moment tiles ≈ 12 MB at (Bw, BG) = (128,
    256).  The gradient/diag sums accumulate only on diagonal pairs
    (their window is indexed by I and the diagonal pair is the last
    visit of that window).
    """
    g = pl.program_id(1)
    pidx = pl.program_id(0)
    Bw = mom_i_ref.shape[0]
    BG = mom_i_ref.shape[2]
    is_diag = blk_ref[pidx, 0] == blk_ref[pidx, 1]

    rows, jv, D = _rows_channels_xla(
        pose_i_ref[...], mom_i_ref[...], cen_ref[...], aux_ref[...])
    for j in range(6):
        for k in range(3):
            rows_i_ref[pl.ds(j * Bw, Bw), k * BG:(k + 1) * BG] = rows[j][k]

    @pl.when(~is_diag)
    def _():
        rows_j, _, _ = _rows_channels_xla(
            pose_j_ref[...], mom_j_ref[...], cen_ref[...], aux_ref[...])
        for j in range(6):
            for k in range(3):
                rows_j_ref[pl.ds(j * Bw, Bw),
                           k * BG:(k + 1) * BG] = rows_j[j][k]

    @pl.when(is_diag)
    def _():
        # the j block IS the i block on diagonal pairs (blk[p,0] ==
        # blk[p,1] aliases the same HBM tiles): a VMEM copy replaces the
        # second full channel assembly — diag pairs are the majority of
        # the grid at small block counts (2/3 at nB = 2)
        rows_j_ref[...] = rows_i_ref[...]

    Mi = rows_i_ref[...]
    Mj = rows_j_ref[...]
    if split == "bf16x3":
        hi_i = Mi.astype(jnp.bfloat16)
        lo_i = (Mi - hi_i.astype(jnp.float32)).astype(jnp.bfloat16)
        hi_j = Mj.astype(jnp.bfloat16)
        lo_j = (Mj - hi_j.astype(jnp.float32)).astype(jnp.bfloat16)
        kw = dict(dimension_numbers=(((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32,
                  precision=lax.Precision.DEFAULT)
        h = (lax.dot_general(hi_i, hi_j, **kw)
             + lax.dot_general(hi_i, lo_j, **kw)
             + lax.dot_general(lo_i, hi_j, **kw))
    else:
        h = lax.dot_general(Mi, Mj, **_DOT_KW)

    @pl.when(g == 0)
    def _():
        h_ref[...] = h

    @pl.when(g > 0)
    def _():
        h_ref[...] += h

    @pl.when(is_diag & (g == 0))
    def _():
        j_ref[...] = jnp.zeros_like(j_ref)
        d_ref[...] = jnp.zeros_like(d_ref)

    @pl.when(is_diag)
    def _():
        jsum = jnp.concatenate(
            [jnp.sum(jv[j], axis=1, keepdims=True) for j in range(6)],
            axis=1)
        dsum = jnp.concatenate(
            [jnp.sum(D[a][b], axis=1, keepdims=True)
             for a in range(6) for b in range(6)], axis=1)
        j_ref[:, 0:6] += jsum
        d_ref[:, 0:36] += dsum


@functools.partial(jax.jit,
                   static_argnames=("interpret", "split", "bw", "bg"))
def hess_packed_v3(pose, mom, cen, aux, *, interpret: bool = False,
                   split: str = "bf16x3", bw: int | None = None,
                   bg: int | None = None):
    """-> (Htilde (6Wp, 6Wp) in (w, j)-major order — same layout as
    `hess_packed_xla` — J (Wp, LANES), D (Wp, LANES)).

    Pose-block-pair grid with scalar-prefetched block indices; VMEM use
    is independent of Wp, so this form scales to arbitrarily large dense
    windows (v2 hits the scoped-VMEM wall at Wp ~ 680).  The lower
    triangle of pose-block pairs saves ~2x MXU work vs a full 2-D grid;
    the mirror blocks are one scatter + transpose in XLA.
    """
    import numpy as np

    Wp, _, Gp = mom.shape
    Bw = min(bw or BW_HESS3, Wp)
    nB = -(-Wp // Bw)
    WpB = nB * Bw
    if WpB != Wp:
        # zero-moment padding rows contribute exactly zero everywhere
        pose = jnp.pad(pose, ((0, WpB - Wp), (0, 0)))
        mom = jnp.pad(mom, ((0, WpB - Wp), (0, 0), (0, 0)))
    if bg is None:
        bg = BG_HESS3 if Gp % BG_HESS3 == 0 else BG_HESS
    assert Gp % bg == 0 and Bw % 8 == 0
    pairs = np.asarray(
        [(i, j) for i in range(nB) for j in range(i + 1)], np.int32)
    n_pairs = len(pairs)
    blk = jnp.asarray(pairs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pairs, Gp // bg),
        in_specs=[
            pl.BlockSpec((Bw, 12), lambda p, g, blk: (blk[p, 0], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bw, 12), lambda p, g, blk: (blk[p, 1], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bw, 10, bg), lambda p, g, blk: (blk[p, 0], 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bw, 10, bg), lambda p, g, blk: (blk[p, 1], 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bg), lambda p, g, blk: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((AUX_CH, bg), lambda p, g, blk: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((6 * Bw, 6 * Bw), lambda p, g, blk: (p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bw, LANES), lambda p, g, blk: (blk[p, 0], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bw, LANES), lambda p, g, blk: (blk[p, 0], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((6 * Bw, 3 * bg), jnp.float32),
            pltpu.VMEM((6 * Bw, 3 * bg), jnp.float32),
        ],
    )
    Hblk, Jt, Dt = pl.pallas_call(
        functools.partial(_hess_kernel_v3, split=split),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pairs * 6 * Bw, 6 * Bw), jnp.float32),
            jax.ShapeDtypeStruct((WpB, LANES), jnp.float32),
            jax.ShapeDtypeStruct((WpB, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(blk, pose, pose, mom, mom, cen, aux)

    # scatter pair blocks (and their mirrors) into the full matrix.
    # Block content is (j, w)-major on both axes (aligned VMEM stores);
    # the global transpose below lands everything (w, j)-major.
    Hp = Hblk.reshape(n_pairs, 6, Bw, 6, Bw)
    I, J = blk[:, 0], blk[:, 1]
    Hb = jnp.zeros((nB, nB, 6, Bw, 6, Bw), jnp.float32)
    Hb = Hb.at[I, J].set(Hp).at[J, I].set(Hp.transpose(0, 3, 4, 1, 2))
    Hfull = Hb.transpose(0, 3, 2, 1, 5, 4).reshape(6 * WpB, 6 * WpB)
    if WpB != Wp:
        Hfull = Hfull.reshape(WpB, 6, WpB, 6)[:Wp, :, :Wp, :].reshape(
            6 * Wp, 6 * Wp)
        Jt, Dt = Jt[:Wp], Dt[:Wp]
    return Hfull, Jt, Dt


# --------------------------------------------------------------------------
# XLA formulation of kernel B over the packed layout
# --------------------------------------------------------------------------

def _rows_channels_xla(pose, mom, cen, aux):
    """Per-(w, g) rank-row / gradient / diag-block channels, vectorized.

    Same math as `_hess_kernel`'s scan_tile body, but on whole (Wp, Gp)
    channel arrays (scan on sublanes, plane on lanes) so XLA fuses the
    ~100 elementwise steps into a handful of passes.  Profiling showed
    the Pallas kernel's scalar-channel (8, 128) ops run ~27 ms at
    realworld scale; this formulation + 3 MXU matmuls runs the same
    semantics in ~2 ms.  Returns (rows[j][k] (Wp,Gp) scaled, jv[j],
    Dfull[a][b]).
    """
    Wp = mom.shape[0]
    r = [pose[:, k:k + 1] for k in range(9)]        # (Wp, 1) each
    tw = [pose[:, 9 + k:10 + k] for k in range(3)]
    pch = [mom[:, k, :] for k in range(6)]          # (Wp, Gp)
    b = [mom[:, 6 + k, :] for k in range(3)]
    n = mom[:, 9, :]
    c = [cen[k][None, :] for k in range(3)]         # (1, Gp)

    u = [[aux[3 * k + m][None, :] for m in range(3)] for k in range(3)]
    vb = [aux[9 + m][None, :] for m in range(3)]
    invN = aux[12][None, :]
    sqa = aux[13][None, :]
    sqk = [aux[14][None, :], aux[15][None, :]]
    coew = aux[16][None, :]
    u0 = u[0]

    t = [r[3 * i] * b[0] + r[3 * i + 1] * b[1] + r[3 * i + 2] * b[2]
         + tw[i] - c[i] for i in range(3)]
    P = _sym3(pch)
    RPRt = _rprt(r, P)
    d3 = [t[m] - vb[m] for m in range(3)]
    nt = [n * t[m] for m in range(3)]
    X3 = [[RPRt[a][bb] + nt[a] * d3[bb] for bb in range(3)]
          for a in range(3)]
    X4 = [n * d3[m] for m in range(3)]

    def x3_dot(v):
        return [X3[a][0] * v[0] + X3[a][1] * v[1] + X3[a][2] * v[2]
                for a in range(3)]

    Xu = [x3_dot(u[k]) for k in range(3)]
    Xu3 = [_dot3(X4, u[k]) for k in range(3)]

    a_rot = _cross(nt, u0)
    a_tr = [n * u0[m] for m in range(3)]

    jrot = [2.0 * invN * v for v in _cross(Xu[0], u0)]
    jtr = [2.0 * invN * u0[m] * Xu3[0] for m in range(3)]

    g_rot, g_tr = [], []
    for k in (1, 2):
        g1r = _cross(Xu[0], u[k])
        g2r = _cross(Xu[k], u0)
        g_rot.append([invN * (g1r[m] + g2r[m]) for m in range(3)])
        g_tr.append([invN * (u[k][m] * Xu3[0] + u0[m] * Xu3[k])
                     for m in range(3)])

    # block-diagonal correction (see _hess_kernel for the derivation)
    Y = [[X3[a][bb] + nt[a] * vb[bb] for bb in range(3)] for a in range(3)]
    B1c = [[-v for v in _cross(u0, [Y[0][j], Y[1][j], Y[2][j]])]
           for j in range(3)]
    B1r = [[B1c[j][a] for j in range(3)] for a in range(3)]
    TL = [[-v for v in _cross(u0, B1r[a])] for a in range(3)]
    y = Xu[0]
    ydu = _dot3(y, u0)
    two_invN = 2.0 * invN
    Dtl = [[invN * (u0[a] * y[bb] + y[a] * u0[bb]) + two_invN * TL[a][bb]
            for bb in range(3)] for a in range(3)]
    for a in range(3):
        Dtl[a][a] = Dtl[a][a] - two_invN * ydu
    Dtr = [[two_invN * a_rot[a] * u0[bb] for bb in range(3)]
           for a in range(3)]
    Dbr = [[two_invN * n * u0[a] * u0[bb] for bb in range(3)]
           for a in range(3)]
    Dbl = [[Dtr[bb][a] for bb in range(3)] for a in range(3)]

    def adj_vec(rot, tr):
        cx = _cross(c, tr)
        return [rot[m] + cx[m] for m in range(3)], tr

    a_rot, a_tr = adj_vec(a_rot, a_tr)
    jrot, jtr = adj_vec(jrot, jtr)
    for k in range(2):
        g_rot[k], g_tr[k] = adj_vec(g_rot[k], g_tr[k])

    def rows_pluscross(Mr, Nr):
        return [[Mr[a][bb] + _cross(c, Nr[a])[bb] for bb in range(3)]
                for a in range(3)]

    def cols_pluscross(Mc, Nc):
        out = [[None] * 3 for _ in range(3)]
        for bb in range(3):
            colN = [Nc[0][bb], Nc[1][bb], Nc[2][bb]]
            cx = _cross(c, colN)
            for a in range(3):
                out[a][bb] = Mc[a][bb] + cx[a]
        return out

    A2 = rows_pluscross(Dtl, Dtr)
    C2 = rows_pluscross(Dbl, Dbr)
    Dtl = cols_pluscross(A2, C2)
    Dtr = cols_pluscross(Dtr, Dbr)
    Dbl = C2
    gdc = _dot3(jtr, c)
    for a in range(3):
        for bb in range(3):
            Dtl[a][bb] = Dtl[a][bb] + 0.5 * (jtr[a] * c[bb] + c[a] * jtr[bb])
        Dtl[a][a] = Dtl[a][a] - gdc

    av = a_rot + a_tr
    jv = [jrot[m] for m in range(3)] + [jtr[m] for m in range(3)]
    g1v = g_rot[0] + g_tr[0]
    g2v = g_rot[1] + g_tr[1]
    rows = [[sqa * av[j], sqk[0] * g1v[j], sqk[1] * g2v[j]]
            for j in range(6)]
    jv = [coew * jv[j] for j in range(6)]
    Dfull = [[Dtl, Dtr], [Dbl, Dbr]]
    D = [[coew * Dfull[a // 3][bb // 3][a % 3][bb % 3] for bb in range(6)]
         for a in range(6)]
    return rows, jv, D


def hess_packed_xla(pose, mom, cen, aux, *, hess_precision=None):
    """XLA equivalent of `hess_packed`: -> (Htilde (6Wp, 6Wp) in
    (w, j)-major order, J (Wp, 6), D (Wp, 36)).

    NOTE the layout difference from the Pallas kernel: Htilde comes back
    (w, j)-major (ready to use, no post-transpose) because the matmul
    operands are assembled that way for free here.

    hess_precision: lax.Precision for the rank-row matmul only (None =
    HIGHEST, the 6-pass exact-f32 form).  HIGH (3-pass bf16x3) halves
    the matmul passes at ~1.5e-5 relative H error — H only steers the
    Newton step (J stays exact-f32 channel sums), so LM convergence is
    unchanged; see tests/test_pallas_evaluate.py.
    """
    Wp, _, Gp = mom.shape
    rows, jv, D = _rows_channels_xla(pose, mom, cen, aux)
    kw = (_DOT_KW if hess_precision is None
          else {**_DOT_KW, "precision": hess_precision})
    # three (6Wp, Gp) operands (one per rank row), (w, j)-major
    H = None
    for k in range(3):
        Mk = jnp.stack([rows[j][k] for j in range(6)],
                       axis=1).reshape(6 * Wp, Gp)
        Hk = lax.dot_general(Mk, Mk, **kw)
        H = Hk if H is None else H + Hk
    J = jnp.stack([jnp.sum(jv[j], axis=1) for j in range(6)], axis=1)
    Dm = jnp.stack([jnp.sum(D[a][bb], axis=1)
                    for a in range(6) for bb in range(6)], axis=1)
    return H, J, Dm


# --------------------------------------------------------------------------
# Glue: full evaluate / residual with semantics of factors.evaluate
# --------------------------------------------------------------------------

def _aux_from_csum(csum, pk: PackedFactors, gap_eps):
    """Eigendecomposition + per-plane weights -> (res, valid stats, aux)."""
    N, Ns, valid, vbar, cov = csum_to_cov(csum, pk.coe)
    lam, U = eigh3(cov)                                   # (Gp,3), (Gp,3,3)
    coew = jnp.where(valid, pk.coe[0], 0.0)
    res = jnp.sum(coew * lam[:, 0])
    invN = 1.0 / Ns
    sqa = jnp.sqrt(2.0 * coew) * invN
    scale = jnp.maximum(lam[:, 2], 1e-30)
    gap = lam[:, 1:] - lam[:, 0:1]
    wk = jnp.where(
        gap > gap_eps * scale[:, None],
        2.0 * coew[:, None] / jnp.maximum(gap, 1e-30), 0.0)
    sqw = jnp.sqrt(wk)                                    # (Gp, 2)
    aux = jnp.concatenate([
        U[:, :, 0].T, U[:, :, 1].T, U[:, :, 2].T,         # u0 u1 u2 rows
        vbar,
        invN[None], sqa[None], sqw[:, 0][None], sqw[:, 1][None],
        coew[None],
    ], axis=0).astype(jnp.float32)                        # (17, Gp)
    return res, aux


def evaluate_packed(R, p, pk: PackedFactors, *, gap_eps: float = 1e-9,
                    interpret: bool = False, impl: str = "xla",
                    hess_precision=None):
    """Residual, gradient (6W,), Newton Hessian (6W,6W) — fused TPU path.

    Drop-in equal to factors.evaluate(pose_matrix(R,p), f, centered=True)
    for body-recentered factors (tests/test_pallas_evaluate.py asserts
    equality and the jax.hessian oracle).

    impl: 'xla' (production — the packed-channel formulation, ~13x the
    Pallas kernel's throughput at realworld scale), 'pallas2' (fused
    full-VMEM kernel, fastest device-side up to Wp ~ 256), 'pallas3'
    (pose-block-pair grid — VMEM bounded at any Wp), or 'pallas' (the
    original fused kernel, kept as an independent implementation).
    hess_precision: see hess_packed_xla (xla/pallas3 impls).
    """
    W = R.shape[0]
    Wp = pk.wp
    if impl == "pallas2" and 2 * 36 * Wp * Wp * 4 > 100 * 1024 * 1024:
        # the v2 kernel's H window + dot accumulator alone would exceed
        # the scoped-VMEM budget (Wp ~ 680+); the blocked v3 grid is
        # VMEM-bounded at any window size
        impl = "pallas3"
    pose = pad_poses(R, p, Wp).astype(jnp.float32)
    with jax.default_matmul_precision("float32"):
        csum = csum_packed_xla(pose, pk.mom, pk.cen, pk.cfix)
        res, aux = _aux_from_csum(csum, pk, gap_eps)
        iw = jnp.arange(W)
        if impl in ("xla", "pallas3"):
            if impl == "pallas3":
                split = ("f32" if hess_precision in
                         (None, lax.Precision.HIGHEST) else "bf16x3")
                Ht, Jt, Dt = hess_packed_v3(pose, pk.mom, pk.cen, aux,
                                            interpret=interpret, split=split)
            else:
                Ht, Jt, Dt = hess_packed_xla(pose, pk.mom, pk.cen, aux,
                                             hess_precision=hess_precision)
            # already (w,j)-major; crop padding, negate rank part
            H = -Ht.reshape(Wp, 6, Wp, 6)[:W, :, :W, :]
        else:
            if impl == "hybrid":
                Ht, Jt, Dt = hess_packed_hybrid(
                    pose, pk.mom, pk.cen, aux,
                    hess_precision=hess_precision, interpret=interpret)
            elif impl == "pallas2":
                split = ("f32" if hess_precision in
                         (None, lax.Precision.HIGHEST) else "bf16x3")
                Ht, Jt, Dt = hess_packed_v2(pose, pk.mom, pk.cen, aux,
                                            interpret=interpret, split=split)
            else:
                Ht, Jt, Dt = hess_packed(pose, pk.mom, pk.cen, aux,
                                         interpret=interpret)
            # (j,w)-major -> (w,j)-major, crop padding, negate rank part
            H = -Ht.reshape(6, Wp, 6, Wp).transpose(1, 0, 3, 2)[:W, :, :W, :]
        D = Dt[:W, :36].reshape(W, 6, 6)
        H = H.at[iw, :, iw, :].add(D).reshape(6 * W, 6 * W)
        J = Jt[:W, :6].reshape(6 * W)
    return res, J, H


def residual_only_packed(R, p, pk: PackedFactors, *, interpret: bool = False):
    """Total cost sum_g coe_g lambda_0(g) — fused moment kernel + eigvals."""
    W = R.shape[0]
    pose = pad_poses(R, p, pk.wp).astype(jnp.float32)
    with jax.default_matmul_precision("float32"):
        csum = csum_packed_xla(pose, pk.mom, pk.cen, pk.cfix)
        N, Ns, valid, vbar, cov = csum_to_cov(csum, pk.coe)
        lam = eigvals3(cov)
        coew = jnp.where(valid, pk.coe[0], 0.0)
        return jnp.sum(coew * lam[:, 0])


def _chunk_pk(pk: PackedFactors, n_chunks: int):
    """Split the plane (lane) axis into (K, ..., Gc) scan operands."""
    Wp, _, Gp = pk.mom.shape
    assert Gp % n_chunks == 0, (Gp, n_chunks)
    Gc = Gp // n_chunks
    mom = jnp.moveaxis(pk.mom.reshape(Wp, 10, n_chunks, Gc), 2, 0)
    cen = jnp.moveaxis(pk.cen.reshape(3, n_chunks, Gc), 1, 0)
    coe = jnp.moveaxis(pk.coe.reshape(1, n_chunks, Gc), 1, 0)
    cfix = jnp.moveaxis(pk.cfix.reshape(10, n_chunks, Gc), 1, 0)
    return mom, cen, coe, cfix


def evaluate_packed_chunked(R, p, pk: PackedFactors, *, n_chunks: int,
                            gap_eps: float = 1e-9, hess_precision=None):
    """evaluate_packed as a lax.scan over plane chunks.

    The round-3 finding: the ONE-program dense evaluate stops compiling
    at W = 2048 (a fused op exceeds scoped VMEM — the remote compiler's
    documented ceiling, artifacts/roofline.json).  Chunking the PLANE
    axis shrinks every per-plane buffer by n_chunks while H/J/res
    accumulate linearly across chunks — the compiled body is the W=2048
    evaluate at Gc planes, reused K times by the scan.  This is the
    'split the evaluate into factor-sharded sub-programs' workaround,
    same math, same totals (chunk reduction order changes f32 roundoff
    at the usual ~1e-7 level).
    """
    W = R.shape[0]
    Wp = pk.wp
    pose = pad_poses(R, p, Wp).astype(jnp.float32)
    chunks = _chunk_pk(pk, n_chunks)

    with jax.default_matmul_precision("float32"):

        def body(carry, chunk):
            mom, cen, coe, cfix = chunk
            pc = PackedFactors(mom=mom, cen=cen, coe=coe, cfix=cfix)
            csum = csum_packed_xla(pose, mom, cen, cfix)
            res_c, aux = _aux_from_csum(csum, pc, gap_eps)
            Ht, Jt, Dt = hess_packed_xla(pose, mom, cen, aux,
                                         hess_precision=hess_precision)
            res, H, J, D = carry
            return (res + res_c, H + Ht, J + Jt, D + Dt), None

        n6 = 6 * Wp
        init = (jnp.asarray(0.0, jnp.float32),
                jnp.zeros((n6, n6), jnp.float32),
                jnp.zeros((Wp, 6), jnp.float32),
                jnp.zeros((Wp, 36), jnp.float32))
        (res, Ht, Jt, Dt), _ = jax.lax.scan(body, init, chunks)

        iw = jnp.arange(W)
        H = -Ht.reshape(Wp, 6, Wp, 6)[:W, :, :W, :]
        D = Dt[:W, :36].reshape(W, 6, 6)
        H = H.at[iw, :, iw, :].add(D).reshape(6 * W, 6 * W)
        J = Jt[:W, :6].reshape(6 * W)
    return res, J, H


def residual_only_packed_chunked(R, p, pk: PackedFactors, *,
                                 n_chunks: int):
    """residual_only_packed as a lax.scan over plane chunks."""
    W = R.shape[0]
    pose = pad_poses(R, p, pk.wp).astype(jnp.float32)
    chunks = _chunk_pk(pk, n_chunks)

    with jax.default_matmul_precision("float32"):

        def body(carry, chunk):
            mom, cen, coe, cfix = chunk
            csum = csum_packed_xla(pose, mom, cen, cfix)
            N, Ns, valid, vbar, cov = csum_to_cov(csum, coe)
            lam = eigvals3(cov)
            coew = jnp.where(valid, coe[0], 0.0)
            return carry + jnp.sum(coew * lam[:, 0]), None

        res, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32),
                              chunks)
    return res


# --------------------------------------------------------------------------
# Hybrid: Pallas rows assembly + XLA dot (round-4 MFU experiment)
# --------------------------------------------------------------------------

def _rows_only_kernel(pose_ref, mom_ref, cen_ref, aux_ref,
                      r0_ref, r1_ref, r2_ref, j_ref, d_ref):
    ig = pl.program_id(0)
    rows, jv, D = _rows_channels_xla(
        pose_ref[...], mom_ref[...], cen_ref[...], aux_ref[...])
    for k, rref in enumerate((r0_ref, r1_ref, r2_ref)):
        # output is (6, Wp, Gp): j-major after a layout-free reshape to
        # (6Wp, Gp).  (An in-VMEM (w, j) interleave was tried and costs
        # MORE than the downstream transpose it saves: 117 vs 99 ms
        # evaluate at W=1024; the solver instead consumes the
        # (j, w)-major H directly via evaluate_packed_jw.)
        for j in range(6):
            rref[j, :, :] = rows[j][k]
    jsum = jnp.concatenate(
        [jnp.sum(jv[j], axis=1, keepdims=True) for j in range(6)], axis=1)
    dsum = jnp.concatenate(
        [jnp.sum(D[a][b], axis=1, keepdims=True)
         for a in range(6) for b in range(6)], axis=1)

    @pl.when(ig == 0)
    def _():
        j_ref[...] = jnp.zeros_like(j_ref)
        d_ref[...] = jnp.zeros_like(d_ref)

    j_ref[:, 0:6] += jsum
    d_ref[:, 0:36] += dsum


@functools.partial(jax.jit, static_argnames=("interpret", "bg", "bw"))
def rows_packed_pallas(pose, mom, cen, aux, *, interpret: bool = False,
                      bg: int = 0, bw: int = 0):
    """Rank-row operands (3 x (6, Wp, Gp), j-major after reshape) + J +
    D via ONE Pallas kernel — no XLA channel materialization.  The
    matmul stays on XLA's dot (hess_packed_hybrid): the fully-fused
    kernels' dots lose to XLA's at W >= 512 while their VPU assembly is
    cheap, so the hybrid takes each side's winner.  The 2-D grid blocks
    BOTH axes (the channel temps are ~100 x (bw, bg) floats in VMEM),
    so the kernel compiles at any Wp — including past the one-program
    XLA evaluate's superlinear-temp ceiling."""
    Wp, _, Gp = mom.shape
    if bg == 0:
        bg = BG_HESS       # lane rule: bg must be a multiple of 128
    if bw == 0:
        # largest multiple-of-8 DIVISOR of Wp up to 512 (the ~100
        # channel temps stay under ~30 MB).  Wp is only guaranteed to
        # be a multiple of 8 (WPAD), so min(Wp, 512) is not always a
        # divisor — e.g. Wp=520 (advisor round-4 high finding).
        bw = Wp if Wp <= 512 else next(
            d for d in range(512, 7, -8) if Wp % d == 0)
    assert Gp % bg == 0 and Wp % bw == 0 and bw % 8 == 0
    return pl.pallas_call(
        _rows_only_kernel,
        grid=(Gp // bg, Wp // bw),
        in_specs=[
            pl.BlockSpec((bw, 12), lambda ig, iw: (iw, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bw, 10, bg), lambda ig, iw: (iw, 0, ig),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bg), lambda ig, iw: (0, ig),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((AUX_CH, bg), lambda ig, iw: (0, ig),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((6, bw, bg), lambda ig, iw: (0, iw, ig),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, bw, bg), lambda ig, iw: (0, iw, ig),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, bw, bg), lambda ig, iw: (0, iw, ig),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bw, LANES), lambda ig, iw: (iw, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bw, LANES), lambda ig, iw: (iw, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, Wp, Gp), jnp.float32),
            jax.ShapeDtypeStruct((6, Wp, Gp), jnp.float32),
            jax.ShapeDtypeStruct((6, Wp, Gp), jnp.float32),
            jax.ShapeDtypeStruct((Wp, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Wp, LANES), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(pose, mom, cen, aux)


def hess_packed_hybrid(pose, mom, cen, aux, *, hess_precision=None,
                       interpret: bool = False):
    """-> (Htilde (6Wp, 6Wp) in (j, w)-major order, J (Wp, 6),
    D (Wp, 36)): Pallas rows + XLA dot."""
    r0, r1, r2, Jt, Dt = rows_packed_pallas(pose, mom, cen, aux,
                                            interpret=interpret)
    Wp = pose.shape[0]
    Gp = mom.shape[2]
    kw = (_DOT_KW if hess_precision is None
          else {**_DOT_KW, "precision": hess_precision})
    H = None
    for rk in (r0, r1, r2):
        M = rk.reshape(6 * Wp, Gp)      # layout-free (j-major)
        Hk = lax.dot_general(M, M, **kw)
        H = Hk if H is None else H + Hk
    return H, Jt[:, :6], Dt[:, :36]


def evaluate_packed_jw(R, p, pk: PackedFactors, *, gap_eps: float = 1e-9,
                       interpret: bool = False, hess_precision=None):
    """evaluate_packed with impl='hybrid' and the (j, w)-MAJOR layout
    kept all the way out: returns (res, J_jw (6W,), H_jw (6W, 6W)) where
    index = j * W + w.  The (6, Wp, 6, Wp) transpose back to (w, j)-major
    costs ~27 ms at W=1024 — more than the rows assembly itself — and the
    LM solver is layout-agnostic except for two cheap vector reshapes
    (solver/lm.py handles them); external consumers should use
    evaluate_packed, which returns the standard (w, j)-major order.
    """
    W = R.shape[0]
    Wp = pk.wp
    pose = pad_poses(R, p, Wp).astype(jnp.float32)
    with jax.default_matmul_precision("float32"):
        csum = csum_packed_xla(pose, pk.mom, pk.cen, pk.cfix)
        res, aux = _aux_from_csum(csum, pk, gap_eps)
        Ht, Jt, Dt = hess_packed_hybrid(
            pose, pk.mom, pk.cen, aux, hess_precision=hess_precision,
            interpret=interpret)
        iw = jnp.arange(W)
        H = -Ht.reshape(6, Wp, 6, Wp)[:, :W, :, :W]
        D = Dt[:W, :36].reshape(W, 6, 6)
        # advanced indexing on axes (1, 3) batches over w first: the
        # update operand is exactly D's (W, 6, 6) layout
        H = H.at[:, iw, :, iw].add(D).reshape(6 * W, 6 * W)
        J = Jt[:W, :6].T.reshape(6 * W)
    return res, J, H
