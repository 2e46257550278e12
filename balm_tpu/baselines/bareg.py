"""BAREG baseline — the reference's actual algorithm.

Faithful re-implementation of src/compare_test/BAREG_test.cpp:129-295 +
factors_pr.h:8-101: alternate a closed-form plane refit with a pose-only
LM over two scalar factor families per (plane g, scan w):

  translation factor (EigenFactorTrans2, factors_pr.h:8-60):
      sqrt(N_gw) * n_g . (R_w mu_gw + t_w - mu_g)
  rotation-axis factors (EigenFactorRotAxis, factors_pr.h:62-101), k=1,2:
      sqrt(N_gw lambda_k(g,w)) * n_g . (R_w e_k(g,w))

with per-cluster body statistics (centroid mu_gw, covariance eigenpairs
lambda_k / e_k scaled by the count, BAREG_test.cpp:186-192) computed ONCE
before the outer loop, and the plane normal n_g / aggregate centroid mu_g
refit from the CURRENT poses each outer cycle (refine_normal,
BAREG_test.cpp:138-160).  Outer loop runs to a 1e-6 pose-delta stop or
100 cycles (BAREG_test.cpp:211-274); final gauge re-anchors pose 0.

The inner pose solve here is a damped Newton with autodiff derivatives
over (rot_vec, t) per pose (the reference uses Ceres SPARSE_SCHUR LM —
at benchmark scale the dense 6W system is tiny).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import factors as Fmod
from ..ops import lie
from ..ops import smallmat as sm


def cluster_stats(f: Fmod.PlaneFactors):
    """Per-(g,w) body centroid, sqrt-weights, principal axes.

    BAREG_test.cpp:186-192: eigendecompose each body cluster covariance;
    keep mu, sqrt(N*lambda_k) and axes e_k (k = 1, 2).
    """
    N = f.C[..., 3, 3]
    Ns = jnp.maximum(N, 1.0)
    mu = f.C[..., :3, 3] / Ns[..., None]
    cov = f.C[..., :3, :3] / Ns[..., None, None] - (
        mu[..., :, None] * mu[..., None, :])
    lam, U = jnp.linalg.eigh(cov)
    lamN = jnp.maximum(lam * N[..., None], 0.0)
    sw_t = jnp.sqrt(N)                                   # (G, W)
    sw_r = jnp.sqrt(lamN[..., 1:])                       # (G, W, 2)
    axes = U[..., :, 1:]                                 # (G, W, 3, 2)
    return mu, sw_t, sw_r, axes, N


def refit(R, p, f: Fmod.PlaneFactors):
    """refine_normal (BAREG_test.cpp:138-160): aggregate world moment ->
    plane normal + centroid per factor."""
    T = lie.pose_matrix(R, p)
    TC = sm.matmul(T[None], f.C)
    Q = f.Cfix + jnp.sum(sm.matmul(TC, T[None], transpose_b=True), axis=1)
    Nt = jnp.maximum(Q[..., 3, 3], 1.0)
    mu_g = Q[..., :3, 3] / Nt[..., None]
    cov = (Q[..., :3, :3] / Nt[..., None, None]
           - mu_g[..., :, None] * mu_g[..., None, :])
    _, U = jnp.linalg.eigh(cov)
    return U[..., :, 0], mu_g


def _pose_cost(theta, n_g, mu_g, mu, sw_t, sw_r, axes, W):
    rv = theta[: 3 * W].reshape(W, 3)
    pos = theta[3 * W:].reshape(W, 3)
    R = lie.so3_exp(rv)
    Rmu = jnp.einsum("wab,gwb->gwa", R, mu)
    rt = sw_t * jnp.einsum(
        "ga,gwa->gw", n_g, Rmu + pos[None] - mu_g[:, None])
    Rax = jnp.einsum("wab,gwbk->gwak", R, axes)
    rr = sw_r * jnp.einsum("ga,gwak->gwk", n_g, Rax)
    return jnp.sum(rt * rt) + jnp.sum(rr * rr)


def solve(R0, p0, f: Fmod.PlaneFactors, *, outer_iters: int = 100,
          inner_iters: int = 100, u_init: float = 1e-4,
          dx_tol: float = 1e-6, trace=None):
    """BAREG alternation. Returns (R, p, cost, total_inner_iters).

    f must hold RAW (uncentered) body moments.
    trace: optional list — (perf_counter timestamp, theta) appended on
    each accepted inner iteration; theta[:3W]/[3W:] recover (rot vecs,
    pos) outside the timed region (Supplementary curve protocol).
    """
    import time as _time
    W = R0.shape[0]
    mu, sw_t, sw_r, axes, N = cluster_stats(f)
    # zero clusters contribute nothing
    sw_t = jnp.where(N > 0.5, sw_t, 0.0)
    sw_r = jnp.where(N[..., None] > 0.5, sw_r, 0.0)

    R = jnp.asarray(R0)
    p = jnp.asarray(p0)
    theta = jnp.concatenate([lie.so3_log(R).reshape(-1), p.reshape(-1)])

    cost_fn = jax.jit(
        lambda th, n_g, mu_g: _pose_cost(th, n_g, mu_g, mu, sw_t, sw_r,
                                         axes, W))
    grad_fn = jax.jit(jax.grad(
        lambda th, n_g, mu_g: _pose_cost(th, n_g, mu_g, mu, sw_t, sw_r,
                                         axes, W)))
    hess_fn = jax.jit(jax.hessian(
        lambda th, n_g, mu_g: _pose_cost(th, n_g, mu_g, mu, sw_t, sw_r,
                                         axes, W)))

    total_it = 0
    c0 = np.inf
    for _cycle in range(outer_iters):
        rv = theta[: 3 * W].reshape(W, 3)
        pos = theta[3 * W:].reshape(W, 3)
        n_g, mu_g = refit(lie.so3_exp(rv), pos, f)

        last = theta
        u = u_init
        v = 2.0
        c0 = float(cost_fn(theta, n_g, mu_g))
        for _ in range(inner_iters):
            g = grad_fn(theta, n_g, mu_g)
            H = hess_fn(theta, n_g, mu_g)
            D = jnp.diag(H)
            step = jnp.linalg.solve(H + u * jnp.diag(D), -g)
            trial = theta + step
            c1 = float(cost_fn(trial, n_g, mu_g))
            total_it += 1
            if np.isfinite(c1) and c1 < c0:
                rel = abs(c0 - c1) / max(c0, 1e-30)
                theta = trial
                c0 = c1
                if trace is not None:
                    trace.append((_time.perf_counter(), np.asarray(theta)))
                u = max(u / 3.0, 1e-12)
                v = 2.0
                if rel < 1e-10:
                    break
            else:
                u *= v
                v *= 2.0
                if u > 1e12:
                    break
        # outer stop: pose delta (iter_stop, BAREG_test.cpp:262-268)
        if float(jnp.max(jnp.abs(theta - last))) < dx_tol:
            break

    rv = theta[: 3 * W].reshape(W, 3)
    pos = theta[3 * W:].reshape(W, 3)
    R = lie.so3_exp(rv)
    R, pos = lie.gauge_fix(R, pos)                 # BAREG_test.cpp:281-288
    return R, pos, c0, total_it


def _res_gw(delta, Rw, pw, n, mu_g, mu, swt, swr, axes):
    """(3,) residual stack [trans, rot1, rot2] for one (plane, scan) as a
    function of the local pose perturbation — GN jacobian source."""
    Rn = lie.so3_exp(delta[None, :3])[0] @ Rw
    pn = pw + delta[3:]
    rt = swt * (n @ (Rn @ mu + pn - mu_g))
    rr = swr * (n @ (Rn @ axes))
    return jnp.concatenate([rt[None], rr])


def solve_gn(R0, p0, f: Fmod.PlaneFactors, *, outer_iters: int = 100,
             inner_iters: int = 100, u_init: float = 1e-4,
             dx_tol: float = 1e-6, trace=None):
    """BAREG at full problem scale: the same alternation as `solve`, with
    the inner pose solve as Gauss-Newton LM on per-(plane, scan)
    jacobians — the reference's actual Ceres configuration
    (BAREG_test.cpp:211-274: Ceres LM = GN + damping, SPARSE_SCHUR; the
    BAREG Hessian is block-diagonal per pose since every residual touches
    exactly one pose, so the 'sparse solve' is W independent 6x6 blocks).

    `solve` (autodiff exact Newton over the joint theta) stays the
    small-problem reference form; this one scales to G in the thousands.
    """
    import time as _time

    W = R0.shape[0]
    mu, sw_t, sw_r, axes, N = cluster_stats(f)
    sw_t = jnp.where(N > 0.5, sw_t, 0.0)
    sw_r = jnp.where(N[..., None] > 0.5, sw_r, 0.0)

    R = jnp.asarray(R0)
    p = jnp.asarray(p0)

    cost_fn = jax.jit(
        lambda R, p, n_g, mu_g: _pose_cost(
            jnp.concatenate([lie.so3_log(R).reshape(-1), p.reshape(-1)]),
            n_g, mu_g, mu, sw_t, sw_r, axes, W))

    z6 = jnp.zeros(6)
    rj = jax.vmap(jax.vmap(
        lambda Rw, pw, n, mu_g, mu, swt, swr, axes: (
            _res_gw(z6, Rw, pw, n, mu_g, mu, swt, swr, axes),
            jax.jacfwd(lambda d: _res_gw(d, Rw, pw, n, mu_g, mu, swt,
                                         swr, axes))(z6)),
        in_axes=(0, 0, None, None, 0, 0, 0, 0)),   # over w
        in_axes=(None, None, 0, 0, 0, 0, 0, 0))    # over g

    @jax.jit
    def gn_step(R, p, n_g, mu_g, u):
        r, J = rj(R, p, n_g, mu_g, mu, sw_t, sw_r, axes)
        H = jnp.einsum("gwri,gwrj->wij", J, J)          # (W, 6, 6)
        g = jnp.einsum("gwri,gwr->wi", J, r)            # (W, 6)
        D = jnp.diagonal(H, axis1=-2, axis2=-1)
        A = H + u * D[..., None, :] * jnp.eye(6, dtype=H.dtype)
        dx = jnp.linalg.solve(A, -g[..., None])[..., 0]  # (W, 6)
        Rn = lie.so3_exp(dx[:, :3]) @ R
        pn = p + dx[:, 3:]
        return Rn, pn

    total_it = 0
    c0 = np.inf
    for _cycle in range(outer_iters):
        n_g, mu_g = refit(R, p, f)
        R_last, p_last = R, p
        u = u_init
        v = 2.0
        c0 = float(cost_fn(R, p, n_g, mu_g))
        for _ in range(inner_iters):
            Rt, pt = gn_step(R, p, n_g, mu_g, u)
            c1 = float(cost_fn(Rt, pt, n_g, mu_g))
            total_it += 1
            if np.isfinite(c1) and c1 < c0:
                rel = abs(c0 - c1) / max(c0, 1e-30)
                R, p = Rt, pt
                c0 = c1
                if trace is not None:
                    trace.append((_time.perf_counter(), np.asarray(R),
                                  np.asarray(p)))
                u = max(u / 3.0, 1e-12)
                v = 2.0
                if rel < 1e-10:
                    break
            else:
                u *= v
                v *= 2.0
                if u > 1e12:
                    break
        dmax = max(float(jnp.max(jnp.abs(R - R_last))),
                   float(jnp.max(jnp.abs(p - p_last))))
        if dmax < dx_tol:
            break

    R, p = lie.gauge_fix(R, p)                   # BAREG_test.cpp:281-288
    return R, p, c0, total_it
