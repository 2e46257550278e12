"""BALM 1.0-style per-point second-order method (comparison baseline).

The reference re-implements BALM1 for its paper comparisons
(src/compare_test/BALM1_test.cpp:103-468): the same lambda_0 cost but with
per-POINT Jacobian/Hessian accumulation — O(points^2) Hessian fill, which
is why BALM2's point clusters beat it 5-25x (SURVEY.md section 6).

The TPU-idiomatic equivalent needs no hand-derived per-point calculus:
the cost is a closed composition of jnp ops over the raw points, so
jax.grad / jax.hessian deliver the exact per-point derivatives.  This
doubles as an independent oracle for the cluster kernels: same cost, a
completely different evaluation path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.eigh3 import eigvals3


class PointPlanes(NamedTuple):
    """Raw-point plane factors: points (G, W, K, 3) body frame, mask
    (G, W, K) valid flags, coe (G,)."""

    points: jnp.ndarray
    mask: jnp.ndarray
    coe: jnp.ndarray


def residual(R, p, f: PointPlanes):
    """sum_g coe_g lambda_0(cov of world points of plane g)."""
    with jax.default_matmul_precision("float32"):
        return _residual_impl(R, p, f)


def _residual_impl(R, p, f: PointPlanes):
    world = jnp.einsum("wab,gwkb->gwka", R, f.points) + p[None, :, None, :]
    m = f.mask[..., None]
    n = jnp.maximum(jnp.sum(f.mask, axis=(1, 2)), 1.0)
    mean = jnp.sum(world * m, axis=(1, 2)) / n[:, None]
    d = (world - mean[:, None, None, :]) * m
    cov = jnp.einsum("gwka,gwkb->gab", d, d) / n[:, None, None]
    lam0 = eigvals3(cov)[..., 0]
    return jnp.sum(f.coe * lam0)


def _residual_eps(eps, R, p, f):
    W = R.shape[0]
    Rn, pn = lie.se3_left_update(R, p, eps.reshape(W, 6))
    return residual(Rn, pn, f)


@jax.jit
def evaluate(R, p, f: PointPlanes):
    """(residual, gradient, Hessian) by autodiff over the raw points."""
    W = R.shape[0]
    eps0 = jnp.zeros(6 * W, R.dtype)
    res = _residual_eps(eps0, R, p, f)
    J = jax.grad(_residual_eps)(eps0, R, p, f)
    H = jax.hessian(_residual_eps)(eps0, R, p, f)
    return res, J, H


_residual_jit = jax.jit(residual)


def damping_iter(R, p, f: PointPlanes, max_iters=20, u=0.1, rel_tol=1e-6,
                 trace=None):
    """Plain (host-loop) LM on the per-point cost — the baseline solver.
    Deliberately unoptimized: it exists to measure the cluster kernels
    against, like the reference's compare_test drivers.

    trace: optional list — (perf_counter timestamp, R, p) appended on
    each accepted iteration (Supplementary convergence-curve protocol)."""
    import time as _time

    import numpy as np

    v = 2.0
    res1, J, H = evaluate(R, p, f)
    it = 0
    for it in range(max_iters):
        D = jnp.diag(jnp.diag(H))
        dx = jnp.linalg.solve(H + u * D, -J)
        Rt, pt = lie.se3_left_update(R, p, dx.reshape(-1, 6))
        res2 = _residual_jit(Rt, pt, f)
        gain = float(res1 - res2)
        if gain > 0:
            R, p = Rt, pt
            if trace is not None:
                trace.append((_time.perf_counter(), np.asarray(R),
                              np.asarray(p)))
            q1 = 0.5 * float(jnp.dot(dx, u * jnp.diag(H) * dx - J))
            rho = gain / q1
            u *= max(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
            v = 2.0
            if abs(gain) / max(float(res1), 1e-30) < rel_tol:
                res1 = float(res2)
                break
            res1, J, H = evaluate(R, p, f)
        else:
            u *= v
            v *= 2.0
            if abs(gain) / max(float(res1), 1e-30) < rel_tol:
                break
    return R, p, float(res1 if np.isscalar(res1) else res1), it + 1
