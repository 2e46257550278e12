"""loamscan2map-equivalent front-end: corner+surf two-map tracking."""

import numpy as np
import jax.numpy as jnp

from balm_tpu.ops import lie
from balm_tpu.pipelines import loam_front
from balm_tpu.utils import metrics


def make_room_sweeps(W=8, seed=0, noise=0.002):
    """Room-corner scene: two walls meeting in a vertical edge at the
    origin plus a floor — scanlines bend at the corner (edge features)
    and cover all three planes (full 6-DoF constraint)."""
    rng = np.random.default_rng(seed)
    # world scanlines
    lines_w = []
    for z in np.linspace(0.3, 2.5, 17):
        t = np.linspace(-1, 1, 160)
        pts = np.where(
            t[:, None] < 0,
            np.stack([np.zeros_like(t), -t * 4.0, np.full_like(t, z)], -1),
            np.stack([t * 4.0, np.zeros_like(t), np.full_like(t, z)], -1))
        lines_w.append(pts)
    for x in np.linspace(0.4, 3.6, 7):
        y = np.linspace(0.2, 4.0, 120)
        lines_w.append(np.stack([np.full_like(y, x), y,
                                 np.zeros_like(y)], -1))

    # smooth trajectory
    R_gt = [np.eye(3)]
    p_gt = [np.array([2.0, 2.0, 1.2])]
    for i in range(1, W):
        w = np.deg2rad(1.2) * rng.standard_normal(3)
        R_gt.append(R_gt[-1] @ np.asarray(lie.so3_exp(jnp.asarray(w))))
        p_gt.append(p_gt[-1] + 0.05 * rng.standard_normal(3))
    R_gt = np.stack(R_gt)
    p_gt = np.stack(p_gt)

    sweeps = []
    for i in range(W):
        sw = []
        for ln in lines_w:
            q = ln + rng.normal(0, noise, ln.shape)
            sw.append((q - p_gt[i]) @ R_gt[i])
        sweeps.append(sw)
    return R_gt, p_gt, sweeps


def test_loam_front_tracks_room():
    R_gt, p_gt, sweeps = make_room_sweeps()
    R, p, info = loam_front.run(sweeps)
    # edge features must actually participate (the corner-map stage)
    late = info["edge_used"][len(info["edge_used"]) // 2:]
    assert np.median(late) >= 3, info["edge_used"]
    assert np.median(info["surf_used"]) > 200

    # compare in the first pose's frame (both trajectories start there)
    Rr = np.einsum("ba,nbc->nac", R_gt[0], R_gt)
    pr = (p_gt - p_gt[0]) @ R_gt[0]
    rot, tra = metrics.pose_rsme(
        jnp.asarray(R), jnp.asarray(p), jnp.asarray(Rr), jnp.asarray(pr))
    assert float(tra) < 0.03, float(tra)
    assert float(rot) * 57.3 < 0.5, float(rot) * 57.3


def test_loam_front_edge_constrains_sliding():
    """With the corner map disabled the solution can slide along the
    wall planes; the line factors must not be useless on this scene."""
    R_gt, p_gt, sweeps = make_room_sweeps(seed=3)
    R1, p1, info = loam_front.run(sweeps)
    late = info["edge_used"][len(info["edge_used"]) // 2:]
    assert np.median(late) >= 3
