"""PA (Plane Adjustment) baseline — the reference's actual algorithm.

Faithful re-implementation of the comparison method in
src/compare_test/PA_test.cpp:104-304: joint optimization over poses AND
explicit plane parameters pi (3-vector, n = pi/|pi|, d = |pi|), with the
whitened 4-dim point-to-plane residual per (plane, scan)

    r = Gmat_gw [R_w^T n_g ; p_w . n_g + d_g],   Gmat^T Gmat = M_gw

where M_gw = sum_points [x;1][x;1]^T is the raw homogeneous body moment
(PA_test.cpp:215-231 takes Gmat = (U sqrt(Lambda))^T of M).  Squaring,
|r|^2 = rt^T M rt — we evaluate that quadratic form directly instead of
factoring M (identical cost, and a TPU-native moment contraction instead
of per-point residuals).

Plane initialization matches PA_test.cpp:244-249 (aggregate world
covariance: n = smallest eigenvector, d = -n.center, pi = d n); the
solve is a damped Newton over the joint parameter vector with autodiff
derivatives (the reference uses Ceres LM with dense Schur + inner
iterations; at benchmark scale the joint dense system is small).  The
final gauge re-anchors pose 0 (PA_test.cpp:296-303).

This is the comparison-reproduction module; balm_tpu/baselines/pa.py is
our own (stronger) cluster-form alternation variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import factors as Fmod
from ..ops import lie
from ..ops import smallmat as sm


def init_planes(T, f: Fmod.PlaneFactors):
    """pi = d*n from the aggregate world covariance (PA_test.cpp:244-249)."""
    TC = sm.matmul(T[None], f.C)
    Q = f.Cfix + jnp.sum(sm.matmul(TC, T[None], transpose_b=True), axis=1)
    N = jnp.maximum(Q[..., 3, 3], 1.0)
    center = Q[..., :3, 3] / N[..., None]
    cov = (Q[..., :3, :3] / N[..., None, None]
           - center[..., :, None] * center[..., None, :])
    _, U = jnp.linalg.eigh(cov)
    n = U[..., :, 0]
    d = -jnp.sum(n * center, axis=-1)
    # the reference parameterizes pi = d n with d = |pi| > 0
    sign = jnp.where(d < 0, -1.0, 1.0)
    return (d * sign)[:, None] * (n * sign[:, None])


def _cost(theta, M, W, G):
    """theta = [rot_vecs (3W), pos (3W), pis (3G)]; M (G, W, 4, 4)."""
    rv = theta[: 3 * W].reshape(W, 3)
    pos = theta[3 * W: 6 * W].reshape(W, 3)
    pis = theta[6 * W:].reshape(G, 3)
    R = lie.so3_exp(rv)                                  # (W, 3, 3)
    d = jnp.linalg.norm(pis, axis=-1)
    ds = jnp.maximum(d, 1e-12)
    n = pis / ds[:, None]
    Rtn = jnp.einsum("wab,ga->gwb", R, n)                # R^T n, (G, W, 3)
    pn = jnp.einsum("wa,ga->gw", pos, n) + d[:, None]    # (G, W)
    rt = jnp.concatenate([Rtn, pn[..., None]], axis=-1)  # (G, W, 4)
    return jnp.sum(jnp.einsum("gwa,gwab,gwb->gw", rt, M, rt))


def solve(R0, p0, f: Fmod.PlaneFactors, *, max_iters: int = 100,
          u_init: float = 1e-4, ftol: float = 1e-10, trace=None):
    """Joint damped-Newton PA. Returns (R, p, cost, iters).

    f must hold RAW (uncentered) body moments — f.C IS the M matrix.
    trace: optional list — (perf_counter timestamp, theta) appended on
    each accepted iteration; theta[:3W]/[3W:6W] recover (rot vecs, pos)
    outside the timed region (Supplementary convergence-curve protocol).
    """
    import time as _time

    import numpy as _np
    W = R0.shape[0]
    G = f.num_planes
    M = f.C
    T0 = lie.pose_matrix(jnp.asarray(R0), jnp.asarray(p0))
    pis = init_planes(T0, f)

    rv = lie.so3_log(jnp.asarray(R0))
    theta = jnp.concatenate(
        [rv.reshape(-1), jnp.asarray(p0).reshape(-1), pis.reshape(-1)])

    cost_fn = jax.jit(lambda th: _cost(th, M, W, G))
    grad_fn = jax.jit(jax.grad(lambda th: _cost(th, M, W, G)))
    hess_fn = jax.jit(jax.hessian(lambda th: _cost(th, M, W, G)))

    u = u_init
    v = 2.0
    c0 = float(cost_fn(theta))
    it = 0
    for it in range(1, max_iters + 1):
        g = grad_fn(theta)
        H = hess_fn(theta)
        D = jnp.diag(H)
        step = jnp.linalg.solve(H + u * jnp.diag(D), -g)
        trial = theta + step
        c1 = float(cost_fn(trial))
        if jnp.isfinite(c1) and c1 < c0:
            rel = abs(c0 - c1) / max(c0, 1e-30)
            theta = trial
            c0 = c1
            if trace is not None:
                trace.append((_time.perf_counter(), _np.asarray(theta)))
            u = max(u / 3.0, 1e-12)
            v = 2.0
            if rel < ftol:
                break
        else:
            u *= v
            v *= 2.0
            if u > 1e12:
                break

    rv = theta[: 3 * W].reshape(W, 3)
    pos = theta[3 * W: 6 * W].reshape(W, 3)
    R = lie.so3_exp(rv)
    R, pos = lie.gauge_fix(R, pos)                       # PA_test.cpp:296-303
    return R, pos, c0, it


def _rt(delta, dpi, R, p, pi):
    """Whitened residual direction [Exp(d)R)^T n ; (p+dp).n + d] for one
    (plane, scan) pair, as a function of the local perturbation — the
    jacobian source for the Gauss-Newton Schur solve."""
    Rw = lie.so3_exp(delta[None, :3])[0] @ R
    pw = p + delta[3:]
    piw = pi + dpi
    d = jnp.linalg.norm(piw)
    ds = jnp.maximum(d, 1e-12)
    n = piw / ds
    return jnp.concatenate([Rw.T @ n, (pw @ n + d)[None]])


def solve_schur(R0, p0, f: Fmod.PlaneFactors, *, max_iters: int = 100,
                u_init: float = 1e-4, ftol: float = 1e-10, trace=None):
    """PA at full problem scale: Gauss-Newton LM with the planes
    eliminated by a dense Schur complement — the reference's Ceres
    DENSE_SCHUR configuration (PA_test.cpp:278-283: Options
    linear_solver_type = DENSE_SCHUR, use_inner_iterations) expressed as
    batched jacobians + one (6W, 6W) reduced solve per iteration.

    Identical cost/residual model to `solve` (which materializes the
    joint dense Hessian via autodiff and is the faithful small-problem
    form); this variant scales to G in the thousands where the joint
    (6W+3G)^2 system is out of reach for any dense backend.
    """
    import time as _time

    import numpy as _np

    W = R0.shape[0]
    G = f.num_planes
    M = jnp.asarray(f.C)                                  # (G, W, 4, 4)
    T0 = lie.pose_matrix(jnp.asarray(R0), jnp.asarray(p0))
    pis = init_planes(T0, f)
    R = jnp.asarray(R0)
    p = jnp.asarray(p0)

    obs = M[..., 3, 3] > 0.5                              # (G, W)

    def cost(R, p, pis):
        d = jnp.linalg.norm(pis, axis=-1)
        ds = jnp.maximum(d, 1e-12)
        n = pis / ds[:, None]
        Rtn = jnp.einsum("wab,ga->gwb", R, n)
        pn = jnp.einsum("wa,ga->gw", p, n) + d[:, None]
        rt = jnp.concatenate([Rtn, pn[..., None]], axis=-1)
        return jnp.sum(jnp.einsum("gwa,gwab,gwb->gw", rt, M, rt))

    cost_j = jax.jit(cost)

    z6 = jnp.zeros(6)
    z3 = jnp.zeros(3)
    rt_and_jac = jax.jit(jax.vmap(jax.vmap(
        lambda R, p, pi: (
            _rt(z6, z3, R, p, pi),
            jax.jacfwd(lambda dl: _rt(dl[:6], dl[6:], R, p, pi))(
                jnp.zeros(9))),
        in_axes=(0, 0, None)), in_axes=(None, None, 0)))

    @jax.jit
    def build(R, p, pis, u):
        rt, J = rt_and_jac(R, p, pis)                     # (G,W,4),(G,W,4,9)
        m = obs[..., None, None]
        MJ = jnp.einsum("gwab,gwbj->gwaj", M, J) * m      # (G, W, 4, 9)
        # cost = rt^T M rt -> grad = 2 J^T M rt, GN Hessian = 2 J^T M J
        A = 2.0 * jnp.einsum("gwai,gwaj->gwij", J, MJ)    # (G, W, 9, 9)
        g_all = 2.0 * jnp.einsum(
            "gwa,gwaj->gwj", rt, MJ)                      # (G, W, 9)
        Hpp = jnp.sum(A[..., :6, :6], axis=0)             # (W, 6, 6)
        Hgg = jnp.sum(A[..., 6:, 6:], axis=1)             # (G, 3, 3)
        U = A[..., :6, 6:]                                # (G, W, 6, 3)
        gp = jnp.sum(g_all[..., :6], axis=0)              # (W, 6)
        gg = jnp.sum(g_all[..., 6:], axis=1)              # (G, 3)

        eye3 = jnp.eye(3, dtype=M.dtype)
        Hgg_d = Hgg + u * eye3 * jnp.maximum(
            jnp.diagonal(Hgg, axis1=-2, axis2=-1), 1e-12)[..., None, :]
        K = jnp.linalg.inv(Hgg_d)                         # (G, 3, 3)

        # reduced system S = blockdiag(Hpp + uD) - sum_g U K U^T
        S = jnp.zeros((6 * W, 6 * W), M.dtype)
        iw = jnp.arange(W)
        Dpp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
        Hpp_d = Hpp + u * Dpp[..., None, :] * jnp.eye(6, dtype=M.dtype)
        S = S.reshape(W, 6, W, 6).at[iw, :, iw, :].add(Hpp_d).reshape(
            6 * W, 6 * W)
        UK = jnp.einsum("gwac,gcd->gwad", U, K)           # (G, W, 6, 3)
        S = S - jnp.einsum("gwad,gvbd->wavb", UK, U).reshape(
            6 * W, 6 * W)
        rhs = -gp.reshape(-1) + jnp.einsum(
            "gwad,gd->wa", UK, gg).reshape(-1)
        dx = jnp.linalg.solve(S, rhs)                     # (6W,)
        dxw = dx.reshape(W, 6)
        dpi = -jnp.einsum(
            "gcd,gd->gc", K,
            gg + jnp.einsum("gwdc,wd->gc", U, dxw))       # (G, 3)
        return dxw, dpi

    u = u_init
    v = 2.0
    c0 = float(cost_j(R, p, pis))
    it = 0
    for it in range(1, max_iters + 1):
        dxw, dpi = build(R, p, pis, u)
        Rt = lie.so3_exp(dxw[:, :3]) @ R
        pt = p + dxw[:, 3:]
        pit = pis + dpi
        c1 = float(cost_j(Rt, pt, pit))
        if jnp.isfinite(c1) and c1 < c0:
            rel = abs(c0 - c1) / max(c0, 1e-30)
            R, p, pis = Rt, pt, pit
            c0 = c1
            if trace is not None:
                trace.append((_time.perf_counter(), _np.asarray(R),
                              _np.asarray(p)))
            u = max(u / 3.0, 1e-12)
            v = 2.0
            if rel < ftol:
                break
        else:
            u *= v
            v *= 2.0
            if u > 1e12:
                break

    R, p = lie.gauge_fix(R, p)                            # PA_test.cpp:296-303
    return R, p, c0, it
