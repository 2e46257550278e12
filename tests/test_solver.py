"""End-to-end solver oracle: the synthetic virtual benchmark
(reference protocol src/benchmark/benchmark_virtual.cpp) must converge from
~2 deg / 0.1 m perturbation to far below it."""

import jax.numpy as jnp
import numpy as np
import pytest

from balm_tpu.config import SolverConfig
from balm_tpu.pipelines import virtual


@pytest.mark.parametrize("seed", [0, 1])
def test_virtual_benchmark_converges(seed):
    cfg = virtual.VirtualConfig(
        win_size=10, surf_size=20, pts_size=50, seed=seed
    )
    out = virtual.run(cfg)
    assert not out["degenerate"]
    # initial error is ~2 deg / 0.1 m; solver must reduce it by >10x
    assert out["rsme_rot_deg_initial"] > 0.5
    assert out["rsme_rot_deg"] < 0.1 * out["rsme_rot_deg_initial"]
    assert out["rsme_trans_m"] < 0.1 * out["rsme_trans_m_initial"]
    # and reach sub-0.1deg / sub-cm like the reference
    assert out["rsme_rot_deg"] < 0.1
    assert out["rsme_trans_m"] < 0.01


def test_virtual_benchmark_reference_size():
    """Exact reference configuration: 20 poses x 20 planes x 40 points."""
    cfg = virtual.VirtualConfig(win_size=20, surf_size=20, pts_size=40, seed=3)
    out = virtual.run(cfg)
    assert out["rsme_rot_deg"] < 0.1
    assert out["rsme_trans_m"] < 0.01
    assert out["iters"] <= 20


def test_residual_monotone_on_accept():
    cfg = virtual.VirtualConfig(win_size=8, surf_size=12, pts_size=25, seed=5)
    out = virtual.run(cfg)
    res = out["result"]
    n = int(res.iters)
    r1 = np.array(res.trace_res1)[:n]
    acc = np.array(res.trace_accept)[:n] > 0.5
    r2 = np.array(res.trace_res2)[:n]
    # accepted steps must strictly reduce the cost
    assert np.all(r2[acc] < r1[acc])


def test_gauge_fixed_output():
    cfg = virtual.VirtualConfig(win_size=6, surf_size=10, pts_size=25, seed=6)
    out = virtual.run(cfg)
    res = out["result"]
    assert np.allclose(np.array(res.R[0]), np.eye(3), atol=1e-10)
    assert np.allclose(np.array(res.p[0]), 0.0, atol=1e-10)


def test_degenerate_status():
    """Too few planes per pose -> degenerate flag, no crash
    (reference exits the process, bavoxel.hpp:1079-1085)."""
    cfg = virtual.VirtualConfig(win_size=6, surf_size=4, pts_size=10, seed=7)
    out = virtual.run(cfg, SolverConfig(max_iters=20, u_init=0.1,
                                        min_planes_per_pose=20))
    assert out["degenerate"]
    assert out["iters"] == 0


def test_centered_mode_converges():
    cfg = virtual.VirtualConfig(win_size=10, surf_size=15, pts_size=30, seed=8)
    out = virtual.run(cfg, centered=True)
    assert out["rsme_rot_deg"] < 0.1
    assert out["rsme_trans_m"] < 0.01


def test_timed_stepper_matches_fused_loop():
    """damping_iter_timed runs the identical body host-stepped; results
    must equal the fused while_loop solver exactly, and its timestamps
    must be real (positive, increasing)."""
    import numpy as np

    from tests.test_factors import make_problem
    from balm_tpu.ops import lie as _lie
    from balm_tpu.solver import lm

    R, p, f, _ = make_problem(G=8, W=4, seed=33)
    rng = np.random.default_rng(2)
    dx = jnp.asarray(rng.normal(size=(4, 6)) * 0.01)
    R0, p0 = _lie.se3_left_update(R, p, dx)
    cfg = SolverConfig(max_iters=6, rel_tol=0.0, min_planes_per_pose=1)
    ra = lm.damping_iter(R0, p0, f, cfg)
    rb, times = lm.damping_iter_timed(R0, p0, f, cfg)
    assert int(ra.iters) == int(rb.iters)
    # separately-jitted step vs fused while_loop: same math, different
    # fusion decisions -> tiny FP divergence accumulates over iterations
    assert float(jnp.max(jnp.abs(ra.p - rb.p))) < 1e-6
    assert abs(float(ra.residual) - float(rb.residual)) < 1e-6 * abs(
        float(ra.residual)) + 1e-9
    assert len(times) == int(rb.iters)
    assert np.all(np.diff(times) > 0) and times[0] > 0


def test_resumable_chunks_match_full_solve(tmp_path):
    """damping_iter_resumable chained in 2-iteration chunks — with the
    mid-solve state round-tripped through an npz checkpoint between
    chunks — reproduces damping_iter exactly (same poses, residual,
    trace).  The chunk boundary must be invisible to the damping
    schedule (SURVEY section-5 checkpoint/resume requirement)."""
    from balm_tpu.ops import factors as Fmod
    from balm_tpu.solver import lm
    from balm_tpu.utils import checkpoint as ckpt

    cfg = virtual.VirtualConfig(win_size=8, surf_size=14, pts_size=30,
                                seed=11)
    R_gt, p_gt, body = virtual.generate(cfg)
    R0, p0 = virtual.perturb(R_gt, p_gt, cfg)
    f = virtual.build_factors(body, jnp.float64)
    R0 = jnp.asarray(R0)
    p0 = jnp.asarray(p0)
    scfg = SolverConfig(max_iters=10, u_init=0.01)

    ref = lm.damping_iter(R0, p0, f, scfg)

    state = None
    res = None
    for k in range(5):
        res, state = lm.damping_iter_resumable(
            R0, p0, f, scfg, state=state, chunk_iters=2)
        # round-trip the state through the on-disk checkpoint format
        path = tmp_path / f"lm_{k}.npz"
        ckpt.save(path, res.R, res.p, f, **ckpt.pack_lm_state(state))
        loaded = ckpt.load(path)
        state = ckpt.unpack_lm_state(loaded)
        assert state is not None

    np.testing.assert_array_equal(np.asarray(res.R), np.asarray(ref.R))
    np.testing.assert_array_equal(np.asarray(res.p), np.asarray(ref.p))
    assert float(res.residual) == float(ref.residual)
    assert int(res.iters) == int(ref.iters)
    n = int(ref.iters)
    np.testing.assert_array_equal(
        np.asarray(res.trace_res1)[:n], np.asarray(ref.trace_res1)[:n])
