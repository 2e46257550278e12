"""Coplanar merging: leaves of one large wall collapse into one factor
whose clusters equal the sums; unrelated planes stay separate."""

import numpy as np
import jax.numpy as jnp

from balm_tpu.config import VoxelConfig
from balm_tpu.ops import clusters, lie
from balm_tpu.voxel import grid, merge


def test_merge_single_big_wall():
    rng = np.random.default_rng(0)
    W = 3
    R = np.tile(np.eye(3), (W, 1, 1))
    p = np.zeros((W, 3))
    # one 4x4 m wall at z = 0.5: splits into ~16 root voxels of 1 m
    scans = []
    for w in range(W):
        uv = rng.uniform(0, 4, size=(4000, 2))
        pts = np.stack([uv[:, 0], uv[:, 1], np.full(4000, 0.5)], -1)
        scans.append(pts + rng.normal(0, 0.002, size=pts.shape))
    res = grid.voxelize(scans, R, p, VoxelConfig(voxel_size=1.0), pad_to=8,
                        backend="numpy")
    assert res.num_planes >= 10

    fm, n_groups, group_of = merge.merge_coplanar(res.factors, res.num_planes)
    assert n_groups == 1
    # merged cluster = sum of all leaf clusters
    Cm = np.asarray(fm.C[0])
    Cs = np.asarray(res.factors.C[: res.num_planes]).sum(axis=0)
    assert np.allclose(Cm, Cs, atol=1e-9)
    assert float(fm.coe[0]) == Cs[:, 3, 3].sum()


def test_merge_keeps_distinct_planes_apart():
    rng = np.random.default_rng(1)
    W = 2
    R = np.tile(np.eye(3), (W, 1, 1))
    p = np.zeros((W, 3))
    scans = []
    for w in range(W):
        uv = rng.uniform(0.05, 0.95, size=(500, 2))
        a = np.stack([uv[:, 0], uv[:, 1], np.full(500, 0.5)], -1)   # z plane
        uv2 = rng.uniform(0.05, 0.95, size=(500, 2))
        b = np.stack([np.full(500, 3.5), uv2[:, 0], uv2[:, 1]], -1)  # x plane
        pts = np.concatenate([a, b]) + rng.normal(0, 0.002, (1000, 3))
        scans.append(pts)
    res = grid.voxelize(scans, R, p, VoxelConfig(voxel_size=1.0), pad_to=8,
                        backend="numpy")
    fm, n_groups, _ = merge.merge_coplanar(res.factors, res.num_planes)
    assert n_groups == 2


def test_merged_solution_still_converges():
    from balm_tpu.config import SolverConfig
    from balm_tpu.solver import lm
    from balm_tpu.utils import metrics
    from tests.test_voxelize import make_scene
    from tests.test_coarse_to_fine import big_perturb

    R_gt, p_gt, scans = make_scene(seed=3, W=5, n_planes=8, pts_per=300)
    # small perturbation: association at 1 m voxels must stay valid
    R0, p0 = big_perturb(R_gt, p_gt, seed=4, rot_deg=0.4, trans=0.02)
    res = grid.voxelize(scans, R0, p0, VoxelConfig(voxel_size=1.0), pad_to=8)
    fm, n_groups, _ = merge.merge_coplanar(res.factors, res.num_planes)
    assert n_groups <= res.num_planes

    fj = type(res.factors)(*[jnp.asarray(x) for x in fm])
    out = lm.damping_iter(
        jnp.asarray(R0), jnp.asarray(p0), fj,
        SolverConfig(max_iters=15, u_init=0.1, min_planes_per_pose=1),
    )
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    rot, tra = metrics.pose_rsme(out.R, out.p, Rg, pg)
    assert float(rot) * 57.3 < 0.2
    assert float(tra) < 0.01
