"""Voxelization oracle: a synthetic scene with known planes must produce
factors whose cluster sums equal direct per-(plane, scan) point sums and
whose count matches the constructed geometry."""

import numpy as np
import jax.numpy as jnp

from balm_tpu.config import VoxelConfig
from balm_tpu.ops import clusters, lie
from balm_tpu.voxel import grid


def make_scene(seed=0, W=5, n_planes=6, pts_per=200, extent=4.0):
    """Axis-aligned-ish square patches, each fitting inside root voxels."""
    rng = np.random.default_rng(seed)
    R = np.array(lie.so3_exp(jnp.asarray(rng.normal(size=(W, 3)) * 0.05)))
    p = rng.normal(size=(W, 3)) * 0.2

    scans = [[] for _ in range(W)]
    for g in range(n_planes):
        n = np.zeros(3)
        n[g % 3] = 1.0
        basis = np.roll(np.eye(3), g % 3, axis=1)  # cols: u, v, n? build simple
        # place plane center away from voxel borders
        center = rng.integers(-3, 3, size=3) + 0.5
        center = center.astype(float) * extent / 2
        for w in range(W):
            uv = rng.uniform(-0.4, 0.4, size=(pts_per, 2))
            th = rng.normal(0, 0.002, size=(pts_per, 1))
            local = np.concatenate([uv, th], -1)
            # rotate so that plane normal = axis (g % 3)
            perm = np.roll(np.arange(3), g % 3 + 1)
            world = local[:, perm] + center
            body = (world - p[w]) @ R[w]
            scans[w].append(body)
    return R, p, [np.concatenate(s) for s in scans]


def test_finds_planes_and_cluster_sums():
    R, p, scans = make_scene()
    cfg = VoxelConfig(voxel_size=1.0, min_observers=2)
    res = grid.voxelize(scans, R, p, cfg, pad_to=16)
    assert res.num_planes >= 6  # at least one leaf per constructed plane

    f = res.factors
    G = res.num_planes
    W = len(scans)

    # cluster moments must equal direct sums over the associated points
    body = np.concatenate(scans)
    scan_id = res.point_scan
    for g in range(min(G, 8)):
        for w in range(W):
            mask = (res.point_leaf == g) & (scan_id == w)
            pts = body[mask]
            C_direct = np.zeros((4, 4))
            if len(pts):
                q = np.concatenate([pts, np.ones((len(pts), 1))], -1)
                C_direct = q.T @ q
            assert np.allclose(np.array(f.C[g, w]), C_direct, atol=1e-9)

    # padding zeroed
    assert np.all(np.array(f.coe[G:]) == 0)
    assert np.all(np.array(f.C[G:]) == 0)
    # weights = total point count (bavoxel.hpp:41-44)
    assert np.allclose(
        np.array(f.coe[:G]), np.array(f.C[:G, :, 3, 3].sum(1))
    )


def test_non_planar_clutter_is_rejected_or_split():
    rng = np.random.default_rng(1)
    W = 3
    R = np.tile(np.eye(3), (W, 1, 1))
    p = np.zeros((W, 3))
    # volumetric noise in one voxel: never passes the plane test
    scans = [rng.uniform(0, 1, size=(400, 3)) for _ in range(W)]
    cfg = VoxelConfig(voxel_size=1.0, layer_limit=2)
    res = grid.voxelize(scans, R, p, cfg, pad_to=8)
    assert res.num_planes == 0


def test_min_points_drop():
    W = 2
    R = np.tile(np.eye(3), (W, 1, 1))
    p = np.zeros((W, 3))
    # only 5 points per scan in the voxel -> 10 total < min_points=15
    rng = np.random.default_rng(2)
    uv = rng.uniform(0.1, 0.9, size=(5, 2))
    pts = np.concatenate([uv, np.full((5, 1), 0.5)], -1)
    scans = [pts.copy() for _ in range(W)]
    res = grid.voxelize(scans, R, p, VoxelConfig(voxel_size=1.0), pad_to=8)
    assert res.num_planes == 0


def test_min_observers_gate():
    W = 3
    R = np.tile(np.eye(3), (W, 1, 1))
    p = np.zeros((W, 3))
    rng = np.random.default_rng(3)
    uv = rng.uniform(0.05, 0.95, size=(100, 2))
    pts = np.concatenate([uv, np.full((100, 1), 0.5) + rng.normal(0, 0.002, (100, 1))], -1)
    # plane seen only by scan 0
    scans = [pts, np.zeros((0, 3)), np.zeros((0, 3))]
    res = grid.voxelize(scans, R, p, VoxelConfig(voxel_size=1.0, min_observers=2), pad_to=8)
    assert res.num_planes == 0
    res1 = grid.voxelize(scans, R, p, VoxelConfig(voxel_size=1.0, min_observers=1), pad_to=8)
    assert res1.num_planes == 1


def test_subdivision_finds_small_planes():
    """Two perpendicular small planes inside ONE root voxel: the root fails
    the plane test but octant children pass (recut adaptive subdivision)."""
    rng = np.random.default_rng(4)
    W = 2
    R = np.tile(np.eye(3), (W, 1, 1))
    p = np.zeros((W, 3))
    scans = []
    for w in range(W):
        # plane A: z = 0.25 patch in lower octants; plane B: x = 0.75 patch
        uvA = rng.uniform(0.02, 0.48, size=(300, 2))
        A = np.stack([uvA[:, 0], uvA[:, 1], np.full(300, 0.25)], -1)
        uvB = rng.uniform(0.52, 0.98, size=(300, 2))
        B = np.stack([np.full(300, 0.75), uvB[:, 0], uvB[:, 1]], -1)
        noise = rng.normal(0, 0.001, size=(600, 3))
        scans.append(np.concatenate([A, B]) + noise)
    res = grid.voxelize(scans, R, p, VoxelConfig(voxel_size=1.0), pad_to=8)
    assert res.num_planes >= 2
    assert np.all(res.leaf_layer >= 1)


def test_native_backend_matches_numpy():
    from balm_tpu import native

    if not native.available():
        import pytest

        pytest.skip("no g++ toolchain")
    R, p, scans = make_scene(seed=11, W=4, n_planes=8, pts_per=250)
    cfg = VoxelConfig(voxel_size=1.0, min_observers=2)
    a = grid.voxelize(scans, R, p, cfg, pad_to=16, backend="numpy")
    b = grid.voxelize(scans, R, p, cfg, pad_to=16, backend="native")
    assert a.num_planes == b.num_planes
    # leaf ordering may differ: match by center
    oa = np.lexsort(np.round(a.leaf_center, 6).T)
    ob = np.lexsort(np.round(b.leaf_center, 6).T)
    assert np.allclose(a.leaf_center[oa], b.leaf_center[ob], atol=1e-9)
    Ca = np.asarray(a.factors.C[: a.num_planes])[oa]
    Cb = np.asarray(b.factors.C[: b.num_planes])[ob]
    assert np.allclose(Ca, Cb, atol=1e-8)
    assert np.array_equal(a.leaf_layer[oa], b.leaf_layer[ob])
    # point->leaf association agrees up to the leaf permutation
    pa = a.point_leaf
    pb = b.point_leaf
    assert np.array_equal(pa >= 0, pb >= 0)
    inv_a = np.empty_like(oa)
    inv_a[oa] = np.arange(len(oa))
    inv_b = np.empty_like(ob)
    inv_b[ob] = np.arange(len(ob))
    assert np.array_equal(inv_a[pa[pa >= 0]], inv_b[pb[pb >= 0]])


def test_down_sample_voxel():
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 4, size=(5000, 3))
    out = grid.down_sample_voxel(pts, 1.0)
    assert len(out) <= 64
    assert len(out) > 0
    # centroids stay inside their voxel
    assert np.all(np.floor(out) == np.floor(out))


def test_streaming_voxelizer_equals_batch():
    """Per-scan cut_voxel into a persistent map, recut+harvest once when
    the window fills (consistency.cpp:127-136) — final factors must
    equal the one-shot batch voxelization."""
    R, p, scans = make_scene(seed=23, W=5, n_planes=10, pts_per=300)
    cfg = VoxelConfig(voxel_size=1.0, min_observers=2)
    batch = grid.voxelize(scans, R, p, cfg, pad_to=16, backend="numpy",
                          weighting="unit")

    sv = grid.StreamingVoxelizer(len(scans), cfg)
    for i, s in enumerate(scans):
        sv.insert(i, s, R[i], p[i])
    stream = sv.finalize(pad_to=16, weighting="unit")

    assert stream.num_planes == batch.num_planes
    ob = np.lexsort(np.round(batch.leaf_center, 6).T)
    os_ = np.lexsort(np.round(stream.leaf_center, 6).T)
    np.testing.assert_allclose(batch.leaf_center[ob],
                               stream.leaf_center[os_], atol=1e-9)
    assert np.array_equal(batch.leaf_layer[ob], stream.leaf_layer[os_])
    np.testing.assert_allclose(
        np.asarray(batch.factors.C[:batch.num_planes])[ob],
        np.asarray(stream.factors.C[:stream.num_planes])[os_], atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(batch.factors.coe[:batch.num_planes])[ob],
        np.asarray(stream.factors.coe[:stream.num_planes])[os_], atol=0)
