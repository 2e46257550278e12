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
