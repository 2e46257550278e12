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
