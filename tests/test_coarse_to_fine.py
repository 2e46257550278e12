"""Coarse-to-fine oracle: with a LARGE initial pose error the single-stage
fine association fails to find planes (or diverges), while the
coarse-to-fine schedule recovers the trajectory."""

import numpy as np
import jax.numpy as jnp
import pytest

from balm_tpu.config import SolverConfig, VoxelConfig
from balm_tpu.ops import lie
from balm_tpu.pipelines import coarse_to_fine
from balm_tpu.utils import metrics
from tests.test_voxelize import make_scene


def big_perturb(R, p, seed, rot_deg=6.0, trans=0.5):
    rng = np.random.default_rng(seed)
    W = len(R)
    drot = rng.normal(0, rot_deg / 57.3 / np.sqrt(3), size=(W, 3))
    dtra = rng.normal(0, trans / np.sqrt(3), size=(W, 3))
    Rn = np.einsum("wab,wbc->wac", R, np.array(lie.so3_exp(jnp.asarray(drot))))
    return Rn, p + dtra


def test_coarse_to_fine_recovers_large_error():
    R_gt, p_gt, scans = make_scene(seed=7, W=6, n_planes=10, pts_per=300,
                                   extent=6.0)
    R0, p0 = big_perturb(R_gt, p_gt, seed=8)

    rot0, tra0 = metrics.pose_rsme(
        jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(R_gt), jnp.asarray(p_gt)
    )

    stages = [
        VoxelConfig(voxel_size=4.0, eigen_ratio=(1 / 6, 1 / 6, 1 / 6)),
        VoxelConfig(voxel_size=2.0, eigen_ratio=(1 / 9, 1 / 9, 1 / 9)),
        VoxelConfig(voxel_size=1.0, eigen_ratio=(1 / 16, 1 / 16, 1 / 16)),
    ]
    cfg = SolverConfig(max_iters=15, u_init=0.1, min_planes_per_pose=1)
    R1, p1, hist = coarse_to_fine.run(
        scans, R0, p0, stages, cfg, verbose=False
    )
    assert len(hist) == 3
    assert not any(h["degenerate"] for h in hist)

    # align gauge before compare (solver anchors to pose 0)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    rot1, tra1 = metrics.pose_rsme(jnp.asarray(R1), jnp.asarray(p1), Rg, pg)
    # large initial error must shrink by an order of magnitude
    assert float(rot1) < 0.15 * float(rot0)
    assert float(tra1) < 0.15 * float(tra0)
    # later stages find at least as much structure
    assert hist[-1]["num_planes"] >= hist[0]["num_planes"]
