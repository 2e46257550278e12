"""The one-call API must pick a working path on any backend and refine."""

import numpy as np
import jax.numpy as jnp

import balm_tpu
from balm_tpu.config import SolverConfig
from balm_tpu.ops import lie
from balm_tpu.utils import metrics
from tests.test_hierarchical import make_long_scene, perturb_drift


def test_optimize_poses_auto():
    R_gt, p_gt, scans = make_long_scene(W=12, seed=41)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=42)
    R1, p1, info = balm_tpu.optimize_poses(
        scans, R0, p0,
        solver=SolverConfig(max_iters=15, min_planes_per_pose=1))
    assert info["status"] == "ok"
    assert info["iters"] > 0
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    rot0, tra0 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg)
    rot1, tra1 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R1), jnp.asarray(p1)), Rg, pg)
    assert float(tra1) < 0.3 * float(tra0)


def test_optimize_poses_large_backend():
    R_gt, p_gt, scans = make_long_scene(W=12, seed=43)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=44)
    R1, p1, info = balm_tpu.optimize_poses(
        scans, R0, p0, backend="large",
        solver=SolverConfig(max_iters=15, min_planes_per_pose=0))
    assert info["status"] == "ok"
    assert info["backend"] == "large"
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    _, tra0 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg)
    _, tra1 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R1), jnp.asarray(p1)), Rg, pg)
    assert float(tra1) < 0.5 * float(tra0)


def test_api_edge_inputs():
    """User-surface robustness: clear errors for empty/invalid input,
    graceful degenerate status (finite reporting) for starved windows."""
    import numpy as np
    import pytest

    import balm_tpu

    rng = np.random.default_rng(0)
    plane = np.concatenate(
        [rng.uniform(-1, 1, (200, 2)), rng.normal(0, 0.003, (200, 1))], -1)

    with pytest.raises(ValueError, match="at least one scan"):
        balm_tpu.optimize_poses([], np.zeros((0, 3, 3)), np.zeros((0, 3)))

    bad = plane.copy()
    bad[0, 0] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        balm_tpu.optimize_poses([bad, plane], np.stack([np.eye(3)] * 2),
                                np.zeros((2, 3)))

    # a window starved of planes reports degenerate with finite numbers
    R, p, info = balm_tpu.optimize_poses(
        [plane, np.zeros((0, 3)), plane + 0.01],
        np.stack([np.eye(3)] * 3), np.zeros((3, 3)))
    assert info["status"] in ("degenerate", "ok", "no_planes")
    if "residual_initial" in info:
        assert np.isfinite(info["residual_initial"])


def test_optimize_poses_loop_closure():
    """loop_closure=True runs detect -> PGO -> BA end-to-end: on the
    square-revisit scene the corrected trajectory lands far inside the
    cumulative-drift init, and info reports the accepted edges."""
    from balm_tpu.config import VoxelConfig
    from balm_tpu.pipelines import loopclose as LC
    from tests.test_loopclose import make_loop_scene, _perturb_cumulative

    R_gt, p_gt, scans = make_loop_scene()
    R0, p0 = _perturb_cumulative(R_gt, p_gt, seed=3)
    R1, p1, info = balm_tpu.optimize_poses(
        scans, R0, p0, loop_closure=True,
        loop_config=LC.LoopConfig(max_dist=5.0, query_every=2),
        voxel=VoxelConfig(voxel_size=1.0),
        solver=SolverConfig(max_iters=30, u_init=0.01,
                            min_planes_per_pose=1))
    assert info["status"] == "ok"
    assert info["loop_closure"]["n_edges"] > 0

    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    _, t_init = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg)
    _, t_ba = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R1), jnp.asarray(p1)), Rg, pg)
    assert float(t_ba) < 0.2 * float(t_init)
