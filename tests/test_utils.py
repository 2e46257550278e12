import numpy as np
import jax.numpy as jnp

from balm_tpu.ops import factors, lie
from balm_tpu.utils import checkpoint, tracing


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    R = np.array(lie.so3_exp(jnp.asarray(rng.normal(size=(4, 3)))))
    p = rng.normal(size=(4, 3))
    f = factors.PlaneFactors.create(jnp.asarray(rng.normal(size=(3, 4, 4, 4))))

    path = tmp_path / "ckpt.npz"
    checkpoint.save(path, R, p, f, iteration=np.int64(7))
    z = checkpoint.load(path)
    assert np.allclose(z["R"], R)
    assert np.allclose(z["p"], p)
    assert np.allclose(np.asarray(z["factors"].C), np.asarray(f.C))
    assert int(z["iteration"]) == 7


def test_pose_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    R = np.array(lie.so3_exp(jnp.asarray(rng.normal(size=(5, 3)))))
    p = rng.normal(size=(5, 3))
    t = rng.uniform(0, 100, size=5)
    path = tmp_path / "pose.csv"
    checkpoint.write_pose_csv(path, R, p, t)
    R2, p2, t2 = checkpoint.read_pose_csv(path)
    assert np.allclose(R2, R, atol=1e-8)
    assert np.allclose(p2, p, atol=1e-8)
    assert np.allclose(t2, t, atol=1e-6)


def test_reference_pose_format_compatible(tmp_path):
    """Round-trip through our writer must parse like the reference CSV."""
    from balm_tpu.io import poses

    src = "/root/reference/datas/benchmark_realworld/alidarPose.csv"
    import pathlib

    if not pathlib.Path(src).exists():
        import pytest

        pytest.skip("dataset not mounted")
    R, p, t = poses.read_pose_csv(src, max_poses=3)
    path = tmp_path / "pose.csv"
    checkpoint.write_pose_csv(path, R, p, t)
    R2, p2, t2 = poses.read_pose_csv(path)
    assert np.allclose(R2, R, atol=1e-8)
    assert np.allclose(p2, p, atol=1e-8)


def test_phase_timers():
    t = tracing.PhaseTimers()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["b"]["count"] == 1
    assert "a" in t.report()
