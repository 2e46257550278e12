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
