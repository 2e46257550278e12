"""Device (on-chip, jit) voxelization backend vs the numpy reference.

Under the test conftest (CPU, x64) the device path runs in f64, so its
results must match the host backends almost exactly — the only legitimate
deviations are floating-point quantization at dyadic cell boundaries
(documented in voxel/device.py) and leaf ordering.
"""

import numpy as np
import jax
import jax.numpy as jnp

from balm_tpu.config import VoxelConfig
from balm_tpu.ops import factors as Fmod, lie
from balm_tpu.voxel import device, grid

from tests.test_voxelize import make_scene


def _unpad_point_leaf(res, scans):
    pl = np.asarray(res.point_leaf)
    return np.concatenate([pl[i, : len(s)] for i, s in enumerate(scans)])


def _match(a_res, b_fac, b_np, b_centers, b_layers):
    """Order both backends' leaves by rounded center; return index arrays."""
    oa = np.lexsort(np.round(a_res.leaf_center, 6).T)
    ob = np.lexsort(np.round(b_centers[:b_np], 6).T)
    return oa, ob


def test_device_matches_numpy_flat_scene():
    R, p, scans = make_scene(seed=11, W=4, n_planes=8, pts_per=250)
    cfg = VoxelConfig(voxel_size=1.0, min_observers=2)
    a = grid.voxelize(scans, R, p, cfg, pad_to=16, backend="numpy")
    b = device.voxelize_device(scans, R, p, cfg, Gcap=128)
    nb = int(b.num_planes)
    assert not bool(b.overflow)
    assert a.num_planes == nb

    bc = np.asarray(b.factors.centers)
    oa, ob = _match(a, b.factors, nb, bc, None)
    assert np.allclose(a.leaf_center[oa], bc[:nb][ob], atol=1e-9)
    assert np.array_equal(a.leaf_layer[oa], np.asarray(b.leaf_layer)[:nb][ob])
    np.testing.assert_allclose(
        a.leaf_decision[oa], np.asarray(b.leaf_decision)[:nb][ob],
        rtol=1e-6, atol=1e-12)

    # factor moments: the device emits RECENTERED factors; recenter the
    # numpy ones to compare (recenter_bodies is idempotent, so this is
    # also the form every production caller feeds the solver)
    ar = Fmod.recenter_bodies(a.factors)
    Ca = np.asarray(ar.C[: a.num_planes])[oa]
    Cb = np.asarray(b.factors.C)[:nb][ob]
    np.testing.assert_allclose(Ca, Cb, atol=1e-9)
    Ba = np.asarray(ar.body_centers[: a.num_planes])[oa]
    Bb = np.asarray(b.factors.body_centers)[:nb][ob]
    np.testing.assert_allclose(Ba, Bb, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(a.factors.coe[: a.num_planes])[oa],
        np.asarray(b.factors.coe)[:nb][ob], atol=0)

    # padding rows exactly zero (the tested framework invariant)
    assert np.all(np.asarray(b.factors.C)[nb:] == 0)
    assert np.all(np.asarray(b.factors.coe)[nb:] == 0)
    assert np.all(np.asarray(b.factors.body_centers)[nb:] == 0)

    # point -> leaf association identical up to the leaf permutation
    pa = a.point_leaf
    pb = _unpad_point_leaf(b, scans)
    assert np.array_equal(pa >= 0, pb >= 0)
    inv_a = np.empty(a.num_planes, np.int64)
    inv_a[oa] = np.arange(a.num_planes)
    inv_b = np.empty(nb, np.int64)
    inv_b[ob] = np.arange(nb)
    assert np.array_equal(inv_a[pa[pa >= 0]], inv_b[pb[pb >= 0]])


def test_device_subdivision_and_observer_gate():
    """Octant subdivision (two sub-voxel planes in one root) and the
    min_observers admission both behave like the host backend."""
    rng = np.random.default_rng(4)
    W = 3
    R = np.tile(np.eye(3), (W, 1, 1))
    p = np.zeros((W, 3))
    scans = []
    for w in range(W):
        uvA = rng.uniform(0.02, 0.48, size=(300, 2))
        A = np.stack([uvA[:, 0], uvA[:, 1], np.full(300, 0.25)], -1)
        uvB = rng.uniform(0.52, 0.98, size=(300, 2))
        B = np.stack([np.full(300, 0.75), uvB[:, 0], uvB[:, 1]], -1)
        noise = rng.normal(0, 0.001, size=(600, 3))
        scans.append(np.concatenate([A, B]) + noise)
    # a plane seen by ONE scan only: admitted iff min_observers == 1
    solo = np.stack([rng.uniform(8.05, 8.95, 120),
                     rng.uniform(0.05, 0.95, 120),
                     np.full(120, 0.5) + rng.normal(0, 0.002, 120)], -1)
    scans[0] = np.concatenate([scans[0], solo])

    cfg = VoxelConfig(voxel_size=1.0, min_observers=2)
    a = grid.voxelize(scans, R, p, cfg, backend="numpy")
    b = device.voxelize_device(scans, R, p, cfg, Gcap=128)
    assert a.num_planes == int(b.num_planes) >= 2
    assert np.all(np.asarray(b.leaf_layer)[: int(b.num_planes)] >= 1)

    cfg1 = VoxelConfig(voxel_size=1.0, min_observers=1)
    a1 = grid.voxelize(scans, R, p, cfg1, backend="numpy")
    b1 = device.voxelize_device(scans, R, p, cfg1, Gcap=128)
    assert a1.num_planes == int(b1.num_planes) == a.num_planes + 1


def test_device_factors_solve_equivalently():
    """The full contract: factors from the device backend drive the LM
    solver to the same optimum as the host backend's."""
    from balm_tpu.config import SolverConfig
    from balm_tpu.solver import lm

    R, p, scans = make_scene(seed=7, W=5, n_planes=8, pts_per=220)
    rng = np.random.default_rng(8)
    Rn = np.asarray(jax.vmap(lie.so3_exp)(
        jnp.asarray(rng.normal(0, 0.01, (5, 3))))) @ R
    pn = p + rng.normal(0, 0.01, (5, 3))

    cfg = VoxelConfig(voxel_size=1.0, min_observers=2)
    scfg = SolverConfig(max_iters=10, u_init=0.01, min_planes_per_pose=1)

    a = grid.voxelize(scans, Rn, pn, cfg, pad_to=16, backend="numpy")
    fa = Fmod.PlaneFactors(*[jnp.asarray(x) for x in
                             Fmod.recenter_bodies(a.factors)])
    ra = lm.damping_iter(jnp.asarray(Rn), jnp.asarray(pn), fa, scfg,
                         centered=True)

    b = device.voxelize_device(scans, Rn, pn, cfg, Gcap=128)
    rb = lm.damping_iter(jnp.asarray(Rn), jnp.asarray(pn), b.factors, scfg,
                         centered=True)

    np.testing.assert_allclose(float(ra.residual), float(rb.residual),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(ra.R), np.asarray(rb.R),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(ra.p), np.asarray(rb.p),
                               atol=1e-8)


def test_device_prepadded_input_and_unit_weighting():
    """The production entry: points already on device as a padded batch;
    also the 'unit' weighting variant (BAs_left.hpp:43-45)."""
    R, p, scans = make_scene(seed=3, W=3, n_planes=5, pts_per=150)
    cfg = VoxelConfig(voxel_size=1.0, min_observers=2)
    body, mask = device.pad_scans(scans, np.float64, multiple=256)
    b = device.voxelize_device(
        (jnp.asarray(body), jnp.asarray(mask)), R, p, cfg, Gcap=64,
        weighting="unit")
    a = grid.voxelize(scans, R, p, cfg, backend="numpy", weighting="unit")
    nb = int(b.num_planes)
    assert a.num_planes == nb
    coe = np.asarray(b.factors.coe)
    assert np.all(coe[:nb] == 1.0)
    assert np.all(coe[nb:] == 0.0)


def test_overflow_retry_recovers():
    """Deliberately undersized capacities must set the overflow flag and
    the wrapper's retry-with-bigger-caps must then reproduce the
    correctly-sized run's factors."""
    R, p, scans = make_scene(seed=7, W=4, n_planes=8, pts_per=250)
    cfg = VoxelConfig(voxel_size=1.0, min_observers=2)
    good = device.voxelize_device(scans, R, p, cfg, Gcap=128)
    assert not bool(good.overflow)

    # tiny caps: first attempt overflows, retry escalates x4
    tiny = device.voxelize_device(
        scans, R, p, cfg, cell_caps=(8, 16, 32), Gcap=8, cs_cap=1 << 10,
        pair_cap=16, max_retries=3)
    assert not bool(tiny.overflow)
    assert int(tiny.num_planes) == int(good.num_planes)
    ca = np.sort(np.asarray(good.factors.coe))
    cb = np.sort(np.asarray(tiny.factors.coe))
    np.testing.assert_allclose(ca[-int(good.num_planes):],
                               cb[-int(tiny.num_planes):], rtol=1e-12)


def test_too_many_scans_raises():
    """W beyond the packed-key budget must fail loudly, not corrupt."""
    import pytest as _pytest

    body = jnp.zeros((2048, 8, 3))
    mask = jnp.ones((2048, 8), bool)
    R = jnp.tile(jnp.eye(3), (2048, 1, 1))
    p = jnp.zeros((2048, 3))
    with _pytest.raises(ValueError, match="key bits"):
        device._voxelize_core(
            body, mask, R, p, voxel_size=1.0, layer_limit=2,
            eigen_ratio=(1 / 16,), min_points=5, min_observers=1,
            unit_coe=False, cell_caps=(64, 128, 256), Gcap=64,
            cs_cap=1 << 10)
