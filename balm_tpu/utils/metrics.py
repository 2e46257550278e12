"""Accuracy metrics: pose RSME and ATE.

Reference: the `rsme` helper of the virtual benchmark
(src/benchmark/benchmark_virtual.cpp:48-62).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import lie


def pose_rsme(R_est, p_est, R_gt, p_gt):
    """RSME over a window: (rot [rad], trans [m]).

    rot = sqrt(mean ||Log(R_gt^T R_est)||^2)
    trans = sqrt(mean ||p_est - p_gt||^2)
    (benchmark_virtual.cpp:48-62)
    """
    dR = jnp.einsum("nji,njk->nik", R_gt, R_est)
    w = lie.so3_log(dR)
    rot = jnp.sqrt(jnp.mean(jnp.sum(w * w, axis=-1)))
    dt = p_est - p_gt
    trans = jnp.sqrt(jnp.mean(jnp.sum(dt * dt, axis=-1)))
    return rot, trans


def ate_rmse(p_est, p_gt):
    """Absolute trajectory error RMSE on translations."""
    d = p_est - p_gt
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1)))
