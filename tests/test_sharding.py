"""Multi-device correctness: factor-sharded evaluation must equal
single-device results (the collective reduction replaces the reference's
4-thread join + matrix add, bavoxel.hpp:1025-1059)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balm_tpu.config import SolverConfig
from balm_tpu.ops import factors, lie
from balm_tpu.parallel import sharded
from balm_tpu.solver import lm
from tests.test_factors import make_problem


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return sharded.make_mesh(8)


def test_sharded_evaluate_matches(mesh8):
    R, p, f, _ = make_problem(G=13, W=3, K=15, seed=11)
    T = lie.pose_matrix(R, p)
    res0, J0, H0 = factors.evaluate(T, f)

    fs = sharded.shard_factors(f, mesh8)
    assert fs.num_planes % 8 == 0
    with mesh8:
        res1, J1, H1 = jax.jit(
            lambda T, f: factors.evaluate(T, f)
        )(sharded.replicate(T, mesh8), fs)
    assert jnp.allclose(res0, res1, rtol=1e-12)
    assert jnp.allclose(J0, J1, atol=1e-10 * float(jnp.max(jnp.abs(J0))))
    assert jnp.allclose(H0, H1, atol=1e-10 * float(jnp.max(jnp.abs(H0))))


def test_sharded_lm_matches(mesh8):
    R, p, f, _ = make_problem(G=16, W=3, K=15, seed=12)
    cfg = SolverConfig(max_iters=2, u_init=0.1, min_planes_per_pose=1)
    res0 = lm.damping_iter(R, p, f, cfg)

    fs = sharded.shard_factors(f, mesh8)
    with mesh8:
        res1 = lm.damping_iter(
            sharded.replicate(R, mesh8), sharded.replicate(p, mesh8), fs, cfg
        )
    assert int(res0.iters) == int(res1.iters)
    assert np.allclose(np.array(res0.R), np.array(res1.R), atol=1e-9)
    assert np.allclose(np.array(res0.p), np.array(res1.p), atol=1e-9)


def test_shard_map_evaluate_matches(mesh8):
    R, p, f, _ = make_problem(G=16, W=3, K=15, seed=13)
    T = lie.pose_matrix(R, p)
    res0, J0, H0 = factors.evaluate(T, f)
    fs = sharded.shard_factors(f, mesh8)
    res1, J1, H1 = sharded.evaluate_shard_map(
        sharded.replicate(T, mesh8), fs, mesh8
    )
    assert jnp.allclose(res0, res1, rtol=1e-12)
    assert jnp.allclose(J0, J1, atol=1e-10 * float(jnp.max(jnp.abs(J0))))
    assert jnp.allclose(H0, H1, atol=1e-10 * float(jnp.max(jnp.abs(H0))))


def test_scaling_harness_runs(mesh8):
    from balm_tpu.utils import scaling

    R, p, f, _ = make_problem(G=16, W=3, K=15, seed=14)
    out = scaling.measure(
        R, p, f, device_counts=[1, 8], repeats=1,
        solver_cfg=SolverConfig(max_iters=2, u_init=0.1, rel_tol=0.0,
                                min_planes_per_pose=1),
    )
    assert len(out) == 2
    assert out[0]["devices"] == 1 and out[1]["devices"] == 8
    # same optimum on any mesh
    assert abs(out[0]["residual"] - out[1]["residual"]) < 1e-9 * abs(
        out[0]["residual"]
    )


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert all(bool(jnp.all(jnp.isfinite(o))) for o in out)


def test_sharded_realworld_scale(mesh8):
    """Round-4 verdict item 5: the realworld problem factor-sharded on the
    8-device mesh must match the replicated solve (full plane count;
    points voxel-downsampled to keep CPU association time bounded)."""
    import pathlib

    data = pathlib.Path("/root/reference/datas/benchmark_realworld")
    if not data.exists():
        pytest.skip("reference dataset not mounted")
    from balm_tpu.pipelines import realworld

    cfg = realworld.RealworldConfig(downsample=0.35)
    R, p, scans = realworld.load(cfg)
    from balm_tpu.voxel import grid

    vres = grid.voxelize(scans, R, p, cfg.voxel, dtype=np.float64)
    W = len(scans)
    assert vres.num_planes > 3000, vres.num_planes   # realworld-class G
    f = factors.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])

    scfg = SolverConfig(max_iters=3, u_init=0.01, rel_tol=0.0)
    res0 = lm.damping_iter(jnp.asarray(R), jnp.asarray(p), f, scfg)

    fs = sharded.shard_factors(f, mesh8)
    with mesh8:
        res1 = lm.damping_iter(
            sharded.replicate(jnp.asarray(R), mesh8),
            sharded.replicate(jnp.asarray(p), mesh8), fs, scfg)
    assert int(res0.iters) == int(res1.iters)
    assert abs(float(res0.residual) - float(res1.residual)) < 1e-6 * abs(
        float(res0.residual))
    assert np.allclose(np.asarray(res0.R), np.asarray(res1.R), atol=1e-8)
    assert np.allclose(np.asarray(res0.p), np.asarray(res1.p), atol=1e-7)


def test_cli_mesh_flag_runs():
    """--mesh N wires mesh_devices through the realworld pipeline."""
    import pathlib

    data = pathlib.Path("/root/reference/datas/benchmark_realworld")
    if not data.exists():
        pytest.skip("reference dataset not mounted")
    from balm_tpu.pipelines import realworld

    cfg = realworld.RealworldConfig(max_scans=12, downsample=0.4,
                                    mesh_devices=8)
    cfg0 = realworld.RealworldConfig(max_scans=12, downsample=0.4)
    out = realworld.run(cfg)
    out0 = realworld.run(cfg0)
    assert out["status"] == "ok"
    assert out["mesh_devices"] == 8
    assert abs(out["residual_final"] - out0["residual_final"]) < 1e-6 * abs(
        out0["residual_final"])
