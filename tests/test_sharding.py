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
