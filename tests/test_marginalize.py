"""Sliding-window marginalization unit tests (beyond the consistency
pipeline's integration coverage)."""

import numpy as np
import jax.numpy as jnp

from balm_tpu.ops import clusters, factors, lie
from balm_tpu.voxel import marginalize
from tests.test_factors import make_problem


def test_absorb_matches_direct_sum():
    R, p, f, _ = make_problem(G=4, W=5, seed=71)
    T = np.asarray(lie.pose_matrix(R, p))
    mg = 2
    f2 = marginalize.marginalize(f, T[:mg], mg)
    assert f2.C.shape[1] == 5 - mg
    # fixed cluster = old fix + world-transformed absorbed scans
    for g in range(4):
        expect = np.asarray(f.Cfix[g]).copy()
        for i in range(mg):
            expect += T[i] @ np.asarray(f.C[g, i]) @ T[i].T
        assert np.allclose(np.asarray(f2.Cfix[g]), expect, atol=1e-9)
        assert np.allclose(np.asarray(f2.C[g]), np.asarray(f.C[g, mg:]))


def test_fix_cap_stops_absorption():
    R, p, f, _ = make_problem(G=3, W=4, seed=72, with_fix=True)
    T = np.asarray(lie.pose_matrix(R, p))
    # make plane 0's fix cluster huge so it exceeds the cap
    big = np.asarray(f.Cfix).copy()
    big[0, 3, 3] = 100.0
    f = f._replace(Cfix=jnp.asarray(big))
    f2 = marginalize.marginalize(f, T[:1], 1, fix_cap=50.0)
    # plane 0: fix unchanged (cap); others absorbed
    assert np.allclose(np.asarray(f2.Cfix[0]), big[0])
    assert np.asarray(f2.Cfix[1])[3, 3] > np.asarray(f.Cfix[1])[3, 3]


def test_marginalized_problem_still_solves():
    """Cost at the optimum of the reduced problem stays finite and the
    fixed prior anchors the gauge (H invertible)."""
    from balm_tpu.config import SolverConfig
    from balm_tpu.solver import lm

    R, p, f, _ = make_problem(G=8, W=5, seed=73)
    T = np.asarray(lie.pose_matrix(R, p))
    f2 = marginalize.marginalize(f, T[:1], 1)
    fj = factors.PlaneFactors(*[jnp.asarray(x) for x in f2])
    res = lm.damping_iter(
        R[1:], p[1:], fj,
        SolverConfig(max_iters=10, u_init=0.1, min_planes_per_pose=1,
                     gauge_fix=False),
    )
    assert np.isfinite(float(res.residual))
    # the anchored problem has full-rank H: solution should stay close to
    # the generating poses
    assert float(jnp.max(jnp.abs(res.p - p[1:]))) < 0.05
