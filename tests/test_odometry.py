"""Streaming odometry + window BA: on a synthetic planar scene the
front-end must track the trajectory from scratch (no initial poses)."""

import numpy as np
import jax.numpy as jnp
import pytest

from balm_tpu.ops import lie
from balm_tpu.pipelines import odometry
from balm_tpu.utils import metrics
from tests.test_hierarchical import make_long_scene


def test_odometry_tracks_synthetic_trajectory():
    R_gt, p_gt, scans = make_long_scene(W=20, n_planes=40, pts_per=150,
                                        seed=20)
    R, p, info = odometry.run(scans)
    # scan-to-map must have actually engaged
    assert np.median(info["reg_points"]) > 100
    assert info["ba_runs"] >= 1

    # both trajectories start at identity; compare directly
    rot, tra = metrics.pose_rsme(
        jnp.asarray(R), jnp.asarray(p), jnp.asarray(R_gt), jnp.asarray(p_gt)
    )
    # trajectory spans ~3 m; odometry must track well
    assert float(tra) < 0.05, float(tra)
    assert float(rot) * 57.3 < 1.0


def test_odometry_without_ba_is_worse_or_equal():
    R_gt, p_gt, scans = make_long_scene(W=16, n_planes=40, pts_per=150,
                                        seed=21)
    cfg_ba = odometry.OdometryConfig()
    cfg_no = odometry.OdometryConfig(ba_every=0)
    R1, p1, _ = odometry.run(scans, cfg_ba)
    R0, p0, _ = odometry.run(scans, cfg_no)
    _, tra1 = metrics.pose_rsme(
        jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(R_gt), jnp.asarray(p_gt)
    )
    _, tra0 = metrics.pose_rsme(
        jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(R_gt), jnp.asarray(p_gt)
    )
    assert float(tra1) <= float(tra0) * 1.5  # BA never catastrophically hurts
    assert float(tra1) < 0.08


def test_incremental_map_equals_batch_rebuild():
    """The incrementally maintained map (freeze + contribution swaps)
    must equal a from-scratch rebuild at the final poses."""
    R_gt, p_gt, scans = make_long_scene(W=18, n_planes=40, pts_per=120,
                                        seed=22)
    cfg = odometry.OdometryConfig()
    R, p, info = odometry.run(scans, cfg)
    assert info["ba_runs"] >= 2  # contribution swaps actually exercised

    # replay: fresh map built at the final poses
    ref = odometry.VoxelPlaneMap(cfg.voxel_size, cfg.plane_ratio,
                                 cfg.min_plane_points)
    inc = odometry.VoxelPlaneMap(cfg.voxel_size, cfg.plane_ratio,
                                 cfg.min_plane_points)
    contribs = {}
    for i in range(len(scans)):
        world = scans[i] @ R[i].T + p[i]
        ref.insert(world)
        contribs[i] = inc.insert(scans[i] @ R_gt[i].T + p_gt[i])  # wrong pose
    # now swap every scan to the right pose incrementally
    for i in range(len(scans)):
        inc.remove(contribs[i])
        inc.insert(scans[i] @ R[i].T + p[i])

    refN = ref.C[:, 3, 3]
    incN = inc.C[:, 3, 3]
    assert set(ref.keys[refN > 0.5].tolist()) == set(
        inc.keys[incN > 0.5].tolist())
    live = np.nonzero(refN > 0.5)[0]
    pos = np.searchsorted(inc.keys, ref.keys[live])
    for i, j in zip(live, pos):
        assert np.allclose(ref.C[i], inc.C[j],
                           atol=1e-6 * max(ref.C[i, 3, 3], 1.0))

    k0, c0, n0 = ref.plane_table()
    k1, c1, n1 = inc.plane_table()
    # drop voxels that cancelled to zero in the incremental map
    keep = inc.C[np.searchsorted(inc.keys, k1), 3, 3] > 0.5
    assert np.array_equal(k0, k1[keep])
    assert np.allclose(c0, c1[keep], atol=1e-8)


def test_map_lookup_vectorized_matches_table():
    rng = np.random.default_rng(3)
    vm = odometry.VoxelPlaneMap(1.0, 1.0 / 4.0, 10)
    pts = np.concatenate([
        rng.uniform(0, 1, (200, 2)) @ np.diag([1.0, 1.0]).repeat(1, 0),
        np.full((200, 1), 0.5) + rng.normal(0, 0.002, (200, 1)),
    ], axis=1)  # one planar voxel at z~0.5
    vm.insert(pts)
    keys, cents, norms = vm.plane_table()
    assert len(keys) == 1
    rows = vm.lookup(pts)
    assert np.all(rows == 0)
    rows2 = vm.lookup(pts + 50.0)  # far away: no hit
    assert np.all(rows2 == -1)


def test_point_to_line_registration():
    """A pole (line landmark) plus a floor constrains the pose; the mixed
    plane+line GN must recover a perturbed pose (balmclass.hpp:1069-1231
    handles both correspondence types)."""
    import jax.numpy as jnp
    from balm_tpu.ops import lie as _lie

    rng = np.random.default_rng(8)
    # floor plane voxel points + two vertical pole voxels
    floor = np.stack([rng.uniform(0, 3, 400), rng.uniform(0, 3, 400),
                      rng.normal(0, 0.004, 400)], -1)
    pole1 = np.stack([np.full(360, 0.5) + rng.normal(0, 0.004, 360),
                      np.full(360, 0.5) + rng.normal(0, 0.004, 360),
                      rng.uniform(0.1, 2.9, 360)], -1)
    pole2 = np.stack([np.full(360, 2.5) + rng.normal(0, 0.004, 360),
                      np.full(360, 1.5) + rng.normal(0, 0.004, 360),
                      rng.uniform(0.1, 2.9, 360)], -1)
    scan = np.concatenate([floor, pole1, pole2])

    cfg = odometry.OdometryConfig(downsample=0.0, reg_iters=10,
                                  reg_reassociate=3)
    vm = odometry.VoxelPlaneMap(cfg.voxel_size, cfg.plane_ratio,
                                cfg.min_plane_points,
                                line_ratio=cfg.line_ratio)
    vm.insert(scan)
    assert len(vm.line_table()[0]) >= 1, "poles must form line landmarks"
    assert len(vm.plane_table()[0]) >= 4

    dR = np.asarray(_lie.so3_exp(jnp.asarray([0.01, -0.02, 0.03])))
    dp = np.array([0.05, -0.04, 0.03])
    # scan seen from a perturbed pose: body = dR^T (world - dp)
    body = (scan - dp) @ dR
    R1, p1, used = odometry.register_scan(
        body, np.eye(3), np.zeros(3), vm, cfg)
    assert used > 100
    assert np.max(np.abs(R1 - dR)) < 5e-3
    assert np.max(np.abs(p1 - dp)) < 5e-3


def test_checkpoint_resume(tmp_path):
    """Kill/resume: a run stopped mid-stream (preemption stand-in) and
    resumed from its checkpoint reproduces the uninterrupted trajectory
    exactly — the checkpoint captures the FULL loop state (map moments,
    contribution ledger, trajectory)."""
    R_gt, p_gt, scans = make_long_scene(W=18, n_planes=40, pts_per=150,
                                        seed=22)
    Ra, pa, info_a = odometry.run(scans)

    path = tmp_path / "odo.npz"
    Rb1, pb1, info_b1 = odometry.run(
        scans, checkpoint_path=path, checkpoint_every=4,
        stop_after_scan=9)
    assert info_b1.get("stopped_at") == 9
    assert path.exists()

    Rb, pb, info_b = odometry.run(
        scans, checkpoint_path=path, checkpoint_every=4, resume=True)
    assert info_b.get("resumed_at") == 10

    np.testing.assert_allclose(Rb, Ra, atol=1e-12)
    np.testing.assert_allclose(pb, pa, atol=1e-12)
    assert info_b["ba_runs"] == info_a["ba_runs"]
    assert info_b["reg_points"] == info_a["reg_points"]


def test_async_ba_tracks_trajectory():
    """The detached window-BA mode (balm_front_back.cpp:673-677
    equivalent) must track the trajectory about as well as the
    synchronous mode — the deferred landing may differ slightly, but
    both must stay accurate on a healthy scene."""
    from balm_tpu.utils import metrics

    R_gt, p_gt, scans = make_long_scene(W=20, n_planes=40, pts_per=150,
                                        seed=21)
    outs = {}
    for mode in (False, True):
        cfg = odometry.OdometryConfig(async_ba=mode)
        R, p, info = odometry.run(scans, cfg)
        rot, tra = metrics.pose_rsme(
            jnp.asarray(R), jnp.asarray(p),
            jnp.asarray(R_gt), jnp.asarray(p_gt))
        outs[mode] = (float(rot) * 57.3, float(tra), info["ba_runs"])
    assert outs[True][2] >= 2                       # BAs actually ran
    assert outs[True][0] < 2.0 * max(outs[False][0], 0.05), outs
    assert outs[True][1] < 2.0 * max(outs[False][1], 0.005), outs
