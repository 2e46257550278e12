"""Pose-axis-partitioned solver == replicated solver (any mesh).

The halo exchange (one ppermute of S poses each way per evaluation)
reproduces the replicated solver's normal equations up to floating-point
reassociation of the pose-axis reductions (~1e-13 relative in f64).
For the FULL damping loop that equivalence is only observable when the
solve itself is determinate: the test problem uses dense x-facing pillar
tiles (pillar_spacing=2 < 2*vis) so no pose has a cost-flat in-plane
sliding mode, and CG is run to convergence (tol 1e-12, generous cap) so
dx is not an arbitrary truncation point.  Under those conditions both
engines take identical accept/reject trajectories and the poses agree to
~1e-13; with an ill-posed problem or truncated CG the same comparison
diverges chaotically at branch margins (accept flips), which is
sensitivity of LM itself, not a sharding defect.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from balm_tpu.config import SolverConfig
from balm_tpu.parallel import pose_sharded as PS
from balm_tpu.pipelines import corridor
from balm_tpu.solver import large


def _problem(W, seed=1, vis=1.6, pillar_spacing=2.0):
    cfg = corridor.CorridorConfig(
        W=W, pts=8, vis=vis, pillar_spacing=pillar_spacing,
        dtype="float64", seed=seed)
    R_gt, p_gt, wf = corridor.make_corridor(cfg)
    R0, p0 = corridor.corrupt_poses(R_gt, p_gt, cfg)
    return jnp.asarray(R0), jnp.asarray(p0), wf


@pytest.mark.parametrize("W", [80, 78])   # even / ragged pose blocks
def test_pose_sharded_matches_replicated(W):
    R0, p0, wf = _problem(W)
    cfg = SolverConfig(max_iters=8)
    ref = large.damping_iter_large(R0, p0, wf, cfg, cg_iters=2000,
                                   cg_tol=1e-12, linear_solver="pcg")

    n = 8
    prob = PS.prepare(R0, p0, wf, n)
    assert prob.Wb >= wf.span
    mesh = PS.make_pose_mesh(n)
    res = PS.damping_iter_pose_sharded(prob, mesh, cfg, cg_iters=2000,
                                       cg_tol=1e-12)

    np.testing.assert_allclose(np.asarray(res.R), np.asarray(ref.R),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.p), np.asarray(ref.p),
                               atol=1e-9)
    np.testing.assert_allclose(float(res.residual), float(ref.residual),
                               rtol=1e-9)
    # same accept/reject trajectory through the damping schedule
    np.testing.assert_allclose(np.asarray(res.trace_accept),
                               np.asarray(ref.trace_accept))
    np.testing.assert_allclose(np.asarray(res.trace_res1),
                               np.asarray(ref.trace_res1), rtol=1e-8)


def test_engine_equality_at_arbitrary_poses():
    """evaluate / residual / matvec / precond agree between engines at
    the (corrupted, non-optimal) initial poses — deterministic, no loop."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    import jax

    R0, p0, wf = _problem(80, vis=1.6, pillar_spacing=6.0)  # incl. weak modes
    W, n = 80, 8
    ops_ref = large.windowed_ops(wf, W)
    res_r, J_r, dH_r, parts_r = ops_ref.evaluate(R0, p0)
    A_r = ops_ref.precond(parts_r, 0.01, dH_r)
    v = jnp.asarray(np.random.default_rng(0).normal(size=(W * 6,)))
    mv_r = ops_ref.matvec(parts_r, dH_r, 0.01, v)

    prob = PS.prepare(R0, p0, wf, n)
    mesh = PS.make_pose_mesh(n)
    Wb = prob.Wb

    def run(Rl, pl, wfl, vl):
        ops = PS._pose_sharded_ops(wfl, Wb, n)
        res, J, dH, state = ops.evaluate(Rl, pl)
        A = ops.precond(state, 0.01, dH)
        mv = ops.matvec(state, dH, 0.01, vl.reshape(-1))
        return res, J, dH, A, mv.reshape(Wb, 6)

    spec_wf = jax.tree.map(lambda _: P(PS.POSE_AXIS), prob.wf)
    fn = jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(P(PS.POSE_AXIS), P(PS.POSE_AXIS), spec_wf, P(PS.POSE_AXIS)),
        out_specs=(P(), P(PS.POSE_AXIS), P(PS.POSE_AXIS), P(PS.POSE_AXIS),
                   P(PS.POSE_AXIS)),
        check_vma=False))
    vpad = jnp.zeros((n * Wb, 6)).at[:W].set(v.reshape(W, 6))
    res_s, J_s, dH_s, A_s, mv_s = fn(prob.R, prob.p, prob.wf, vpad)

    assert abs(float(res_r) - float(res_s)) < 1e-10
    np.testing.assert_allclose(np.asarray(J_s).reshape(-1, 6)[:W],
                               np.asarray(J_r).reshape(W, 6), atol=1e-10)
    np.testing.assert_allclose(np.asarray(dH_s).reshape(-1, 6)[:W],
                               np.asarray(dH_r).reshape(W, 6), atol=1e-9)
    np.testing.assert_allclose(np.asarray(A_s)[:W], np.asarray(A_r),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(mv_s)[:W],
                               np.asarray(mv_r).reshape(W, 6), atol=1e-9)


def test_single_device_mesh():
    R0, p0, wf = _problem(40)
    cfg = SolverConfig(max_iters=3)
    ref = large.damping_iter_large(R0, p0, wf, cfg, cg_iters=500,
                                   cg_tol=1e-12, linear_solver="pcg")
    prob = PS.prepare(R0, p0, wf, 1)
    res = PS.damping_iter_pose_sharded(prob, PS.make_pose_mesh(1), cfg,
                                       cg_iters=500, cg_tol=1e-12)
    np.testing.assert_allclose(np.asarray(res.p), np.asarray(ref.p),
                               atol=1e-9)


def test_span_exceeding_block_raises():
    R0, p0, wf = _problem(40, vis=4.0)   # long spans
    with pytest.raises(ValueError):
        PS.prepare(R0, p0, wf, 8)
