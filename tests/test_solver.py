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


def test_negative_diag_accepts_steps_nofallback():
    """Negative-diagonal stall oracle (round-4 regression, W=1536-class).

    Far from the optimum with near-degenerate coarse clusters the EXACT
    Newton H carries negative diagonal entries.  With
    linear_solver='cholesky_nofallback' (the large-W production choice:
    the LU branch stops compiling at 6W=12288) a failed factorization
    yields a zero step -> reject -> u *= v.  Under the raw reference
    damping (H + uD, D_i < 0) that NEVER becomes PD and LM rejects
    forever; the tau-shift damping (lm.py body) must make A eventually
    PD so steps get accepted and the cost drops.
    """
    import jax.numpy as jnp

    from balm_tpu.ops import factors as F
    from balm_tpu.ops import lie
    from balm_tpu.solver import lm
    from balm_tpu.voxel import grid
    from balm_tpu.config import VoxelConfig
    from tests.test_voxelize import make_scene
    from tests.test_coarse_to_fine import big_perturb

    R_gt, p_gt, scans = make_scene(seed=7, W=6, n_planes=10, pts_per=300,
                                   extent=6.0)
    R0, p0 = big_perturb(R_gt, p_gt, seed=8)
    vres = grid.voxelize(scans, R0, p0,
                         VoxelConfig(voxel_size=4.0,
                                     eigen_ratio=(1 / 6, 1 / 6, 1 / 6)),
                         dtype=np.float64)
    f = F.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    T = lie.pose_matrix(jnp.asarray(R0), jnp.asarray(p0))
    _, _, H = F.evaluate(T, f)
    D = np.diag(np.asarray(H))
    # the scenario must actually exercise the indefinite-diagonal branch
    assert D.min() < 0, "scene no longer produces a negative Hessian diag"

    cfg = SolverConfig(max_iters=30, u_init=0.1, min_planes_per_pose=1)
    res = lm.damping_iter(jnp.asarray(R0), jnp.asarray(p0), f, cfg,
                          linear_solver="cholesky_nofallback")
    acc = np.asarray(res.trace_accept)[: int(res.iters)]
    assert np.nansum(acc) >= 3            # steps DO get accepted
    assert float(res.residual) < 0.5 * float(res.trace_res1[0])


def test_positive_diag_damping_matches_reference_semantics():
    """For an all-positive Hessian diagonal the tau-shift is exactly zero:
    the damping schedule is bit-identical to the reference's H + u*diag(H)
    (bavoxel.hpp:1113).  Pinned by comparing against a manual first step."""
    import jax
    import jax.numpy as jnp

    from balm_tpu.ops import factors as F
    from balm_tpu.ops import lie
    from balm_tpu.solver import lm
    from balm_tpu.pipelines import virtual

    cfg = virtual.VirtualConfig(win_size=6, surf_size=10, pts_size=30, seed=2)
    R_gt, p_gt, body_points = virtual.generate(cfg)
    R0, p0 = virtual.perturb(R_gt, p_gt, cfg)
    f = virtual.build_factors(body_points, jnp.float64)
    R0 = jnp.asarray(R0)
    p0 = jnp.asarray(p0)
    T = lie.pose_matrix(R0, p0)
    res1, J, H = F.evaluate(T, f)
    D = jnp.diag(H)
    assert float(jnp.min(D)) > 0
    for u in (0.01, 0.1, 1.0, 10.0, 100.0):
        A = H + u * jnp.diag(D)      # raw reference damping, no clamp
        dx = jnp.linalg.solve(A, -J)
        Rt, pt = lie.se3_left_update(R0, p0, dx.reshape(-1, 6))
        res2 = F.residual_only(lie.pose_matrix(Rt, pt), f)
        if float(res2) < float(res1):
            break
    assert float(res2) < float(res1)  # the manual step is accepted

    scfg = SolverConfig(max_iters=1, u_init=u, min_planes_per_pose=1,
                        gauge_fix=False)
    out = lm.damping_iter(R0, p0, f, scfg, linear_solver="lu")
    # the solver's single step must equal the manual reference step
    np.testing.assert_allclose(np.asarray(out.R), np.asarray(Rt),
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(pt),
                               rtol=0, atol=1e-9)


def test_f32_ulp_floor_terminates_solver():
    """With rel_tol=0 / abs_tol=0 an f32 solve must still terminate well
    below the iteration cap: the ULP-scaled stop floor (SolverConfig.
    ulp_tol) catches reduction-order dither between the full and
    residual-only evaluators (round-4: 2/10 consistency seeds burned a
    1000-iteration cap), and the damping-overflow stop catches the
    reject-forever tail (u doubling to inf)."""
    import jax
    import jax.numpy as jnp

    from balm_tpu.ops import factors as Fmod
    from balm_tpu.pipelines import virtual
    from balm_tpu.solver import lm

    cfg = virtual.VirtualConfig(win_size=8, surf_size=12, pts_size=30,
                                seed=6)
    R_gt, p_gt, body_points = virtual.generate(cfg)
    R0, p0 = virtual.perturb(R_gt, p_gt, cfg)
    f = virtual.build_factors(body_points, jnp.float64)
    fr = Fmod.recenter_bodies(f).astype(jnp.float32)
    fr = jax.tree_util.tree_map(jnp.asarray, fr)
    scfg = SolverConfig(max_iters=300, u_init=0.01, rel_tol=0.0,
                        abs_tol=0.0, min_planes_per_pose=1)
    res = lm.damping_iter(jnp.asarray(R0, jnp.float32),
                          jnp.asarray(p0, jnp.float32), fr, scfg,
                          centered=True, backend="packed")
    assert int(res.iters) < 60, int(res.iters)
    assert np.isfinite(float(res.residual))
    # and it actually converged (cost well below the initial)
    assert float(res.residual) < 0.5 * float(res.trace_res1[0])
