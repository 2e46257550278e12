"""Eigen-Factor-style gradient descent (comparison baseline).

The reference re-implements the Eigen-Factor method for paper comparisons
(src/compare_test/EF_test.cpp:105-330): gradient-only descent of
lambda_min of the homogeneous plane moments with a step-halving line
search — the slowest method in the reference's tables (SURVEY.md sec. 6).

Here the gradient comes from the production analytic evaluator; only the
update rule differs (first-order + halving line search, EF_test.cpp's
step = -alpha/N J with <= max_iters iterations).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import factors as Fmod
from ..ops import lie

_eval = jax.jit(lambda T, f: Fmod.evaluate(T, f))
_res = jax.jit(lambda T, f: Fmod.residual_only(T, f))


def _grad_only(R, p, f):
    """Left-perturbation gradient without the (unused-by-EF) Hessian:
    jax.grad through residual_only matches the analytic J to ~1e-13 and
    costs ~2 residual evaluations — the full-scale (G in the thousands)
    configuration, where evaluate()'s Hessian would dominate EF's loop."""
    def cost(dx):
        Rt, pt = lie.se3_left_update(R, p, dx.reshape(-1, 6))
        return Fmod.residual_only(lie.pose_matrix(Rt, pt), f)

    W = R.shape[0]
    res, g = jax.value_and_grad(cost)(jnp.zeros(6 * W, R.dtype))
    return res, g


_grad_only_j = jax.jit(_grad_only)


def descend(R, p, f: Fmod.PlaneFactors, *, max_iters=200, alpha=1.0,
            halvings=12, rel_tol=1e-8, trace=None, grad_only=False):
    """Gradient descent with backtracking. Returns (R, p, residual, iters).

    trace: optional list — on each ACCEPTED iteration, (perf_counter
    timestamp, R, p) is appended (the Supplementary 'time cost'
    convergence-curve protocol, Supplementary/data/readme.txt).
    grad_only: compute the gradient via autodiff of the residual instead
    of the analytic second-order evaluator (same values; scales to
    thousands of planes)."""
    import time as _time
    import numpy as _np

    T = lie.pose_matrix(R, p)
    if grad_only:
        res1, J = _grad_only_j(R, p, f)
    else:
        res1, J, _ = _eval(T, f)
    npts = jnp.maximum(jnp.sum(f.C[..., 3, 3]), 1.0)
    it = 0
    for it in range(max_iters):
        step = alpha / float(npts)
        accepted = False
        for _ in range(halvings):
            dx = (-step * J).reshape(-1, 6)
            Rt, pt = lie.se3_left_update(R, p, dx)
            res2 = float(_res(lie.pose_matrix(Rt, pt), f))
            if res2 < float(res1):
                accepted = True
                break
            step *= 0.5
        if not accepted:
            break
        R, p = Rt, pt
        if trace is not None:
            trace.append((_time.perf_counter(), _np.asarray(R),
                          _np.asarray(p)))
        if (float(res1) - res2) / max(float(res1), 1e-30) < rel_tol:
            res1 = res2
            break
        res1 = res2
        T = lie.pose_matrix(R, p)
        if grad_only:
            _, J = _grad_only_j(R, p, f)
        else:
            _, J, _ = _eval(T, f)
    return R, p, float(res1), it + 1
