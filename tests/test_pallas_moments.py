"""Pallas fused moment kernel: interpreter-mode equality vs the XLA path
(on CPU; the compiled kernel runs on real TPU in bench)."""

import jax.numpy as jnp
import numpy as np
import pytest

from balm_tpu.ops import factors, lie
from tests.test_factors import make_problem


def _pad_to_128(f):
    from balm_tpu.parallel.sharded import pad_planes

    return pad_planes(f, 128)


def test_pallas_moments_match_xla():
    R, p, f, centers = make_problem(G=7, W=5, seed=61, sparse_obs=True,
                                    with_fix=True)
    f = factors.recenter_bodies(f._replace(centers=centers))
    f = _pad_to_128(f)
    T = lie.pose_matrix(R, p)

    from balm_tpu.ops import pallas_moments

    Csum = pallas_moments.residual_moments(T, f, interpret=True)
    # reference: centered moment path without the fix cluster
    Tg, TC, TCT, _, _, _, _ = factors._plane_moment(T, f, centered=True)
    Cref = jnp.sum(TCT, axis=1)
    assert np.allclose(np.asarray(Csum), np.asarray(Cref), atol=1e-9), (
        float(jnp.max(jnp.abs(Csum - Cref)))
    )


def test_pallas_residual_matches():
    R, p, f, centers = make_problem(G=6, W=4, seed=62, with_fix=True)
    f = factors.recenter_bodies(f._replace(centers=centers))
    f = _pad_to_128(f)
    T = lie.pose_matrix(R, p)
    r0 = factors.residual_only(T, f, centered=True)
    r1 = factors.residual_only(T, f, centered=True, use_pallas=True,
                               pallas_interpret=True)
    assert np.allclose(float(r0), float(r1), rtol=1e-10)
