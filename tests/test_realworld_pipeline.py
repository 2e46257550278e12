"""Reduced real-world pipeline regression on the shipped 177-scan dataset
(reference benchmark_realworld, src/benchmark/benchmark_realworld.cpp)."""

import pathlib

import numpy as np
import pytest

from balm_tpu.pipelines import realworld

DATA = pathlib.Path("/root/reference/datas/benchmark_realworld")


@pytest.mark.skipif(not DATA.exists(), reason="reference dataset not mounted")
def test_realworld_reduced_converges():
    cfg = realworld.RealworldConfig(max_scans=15)
    out = realworld.run(cfg)
    assert out["status"] == "ok"
    assert out["num_planes"] >= 3 * out["num_scans"]
    assert out["residual_final"] < out["residual_initial"]
    res = out["result"]
    n = int(res.iters)
    acc = np.array(res.trace_accept)[:n]
    assert acc[0] > 0.5  # first step must be an improvement


@pytest.mark.skipif(not DATA.exists(), reason="reference dataset not mounted")
def test_realworld_f32_centered_matches_f64():
    c64 = realworld.RealworldConfig(max_scans=10, dtype="float64")
    c32 = realworld.RealworldConfig(max_scans=10, dtype="float32",
                                    centered=True)
    o64 = realworld.run(c64)
    o32 = realworld.run(c32)
    # same association; the f32 fast path must track f64 cost to ~0.1%
    # (the reference's float build parity, Supplementary col 5)
    assert abs(o32["residual_initial"] - o64["residual_initial"]) < 1e-3 * o64["residual_initial"]
    assert abs(o32["residual_final"] - o64["residual_final"]) < 5e-3 * o64["residual_final"]


def test_export_honest_curve_and_plane_cloud(tmp_path):
    from balm_tpu.pipelines import realworld

    cfg = realworld.RealworldConfig(max_scans=12, export_dir=str(tmp_path))
    out = realworld.run(cfg)
    assert out["status"] == "ok"
    # convergence.txt: strictly increasing REAL timestamps, decreasing cost
    lines = (tmp_path / "convergence.txt").read_text().strip().splitlines()
    assert len(lines) >= 2
    ts = [float(l.split()[0]) for l in lines]
    cs = [float(l.split()[1]) for l in lines]
    assert all(b > a for a, b in zip(ts, ts[1:]))
    assert cs[-1] < cs[0]
    # plane cloud artifacts exist and parse
    ply = (tmp_path / "plane_cloud.ply").read_text().splitlines()
    assert ply[0] == "ply"
    nvert = int([l for l in ply if l.startswith("element vertex")][0].split()[-1])
    assert nvert > 1000
    import numpy as _np

    npz = _np.load(tmp_path / "plane_cloud.npz")
    assert npz["world"].shape[0] == nvert
    assert npz["leaf"].min() >= 0


def test_merge_planes_option():
    from balm_tpu.pipelines import realworld

    cfg = realworld.RealworldConfig(max_scans=12, merge_planes=True)
    out = realworld.run(cfg)
    assert out["status"] == "ok"
    assert 0 < out["merged_planes"] <= out["num_planes"]
    # merging must not break convergence
    assert out["residual_final"] < out["residual_initial"]
