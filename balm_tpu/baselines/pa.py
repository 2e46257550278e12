"""Plane-Adjustment / BAREG-style baseline: explicit plane parameters.

The reference implements two Ceres-based comparison methods
(src/compare_test/PA_test.cpp:104-304 "Plane Adjustment",
src/compare_test/BAREG_test.cpp:129-295 "BA-REG"): both keep explicit
plane parameters pi = (n, d) and minimize point-to-plane distances,
alternating/joint with the poses.  BALM2 beats them 3-10x because it
eliminates the planes analytically (SURVEY.md section 6).

Cluster-form identity that makes the whole method moment-based (no Ceres,
no per-point residuals): for pi = [n; d] with |n| = 1,

    sum_points (n . x + d)^2  =  pi^T (T C T^T) pi

so the alternation is:
  (a) plane refit: minimize pi^T Q pi s.t. |n|=1 with Q = sum_i T C T^T —
      eliminate d = -(q . n)/N in closed form, then a 3x3 eigenproblem
      (BAREG's closed-form refit, BAREG_test.cpp "ceres_init")
  (b) pose solve: per pose, Gauss-Newton on the quadratic
      sum_g pi_g^T (M(eps) A_gi M(eps)^T) pi_g
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import factors as Fmod
from ..ops import lie
from ..ops import smallmat as sm


@jax.jit
def refit_planes(T, f: Fmod.PlaneFactors):
    """Closed-form optimal planes per factor: (n (G,3), d (G,))."""
    TC = sm.matmul(T[None], f.C)
    Q = f.Cfix + jnp.sum(sm.matmul(TC, T[None], transpose_b=True), axis=1)
    N = jnp.maximum(Q[..., 3, 3], 1.0)
    q = Q[..., :3, 3]
    P = Q[..., :3, :3]
    # eliminate d: cost(n) = n^T (P - q q^T / N) n  -> smallest eigvec
    S = P - q[..., :, None] * q[..., None, :] / N[..., None, None]
    from ..ops.eigh3 import eigh3

    lam, U = eigh3(S)
    n = U[..., :, 0]
    d = -jnp.sum(q * n, axis=-1) / N
    return n, d


def _pose_cost(eps, R, p, f, n, d):
    with jax.default_matmul_precision("float32"):
        return _pose_cost_impl(eps, R, p, f, n, d)


def _pose_cost_impl(eps, R, p, f, n, d):
    W = R.shape[0]
    Rn, pn = lie.se3_left_update(R, p, eps.reshape(W, 6))
    T = lie.pose_matrix(Rn, pn)
    TC = sm.matmul(T[None], f.C)
    A = sm.matmul(TC, T[None], transpose_b=True)        # (G, W, 4, 4)
    pi = jnp.concatenate([n, d[..., None]], axis=-1)    # (G, 4)
    cost_gi = jnp.einsum("ga,gwab,gb->gw", pi, A, pi)
    valid = (f.coe > 0)[:, None]
    return jnp.sum(jnp.where(valid, cost_gi, 0.0))


def alternate(R, p, f: Fmod.PlaneFactors, *, outer_iters=20, gn_iters=3,
              rel_tol=1e-7):
    """Alternating plane-refit / pose-GN. Returns (R, p, cost, iters)."""
    R = jnp.asarray(R)
    p = jnp.asarray(p)
    W = R.shape[0]
    grad = jax.jit(jax.grad(_pose_cost))
    hess = jax.jit(jax.hessian(_pose_cost))
    cost_fn = jax.jit(_pose_cost)

    prev = None
    it = 0
    for it in range(outer_iters):
        T = lie.pose_matrix(R, p)
        n, d = refit_planes(T, f)
        for _ in range(gn_iters):
            eps0 = jnp.zeros(6 * W)
            g = grad(eps0, R, p, f, n, d)
            H = hess(eps0, R, p, f, n, d)
            dx = jnp.linalg.solve(
                H + 1e-9 * jnp.trace(H) / (6 * W) * jnp.eye(6 * W), -g
            )
            R, p = lie.se3_left_update(R, p, dx.reshape(W, 6))
        c = float(cost_fn(jnp.zeros(6 * W), R, p, f, n, d))
        if prev is not None and abs(prev - c) < rel_tol * max(prev, 1e-30):
            prev = c
            break
        prev = c
    Rf, pf = lie.gauge_fix(R, p)
    return Rf, pf, prev, it + 1
