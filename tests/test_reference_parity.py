"""Direct numerical parity against the REFERENCE BALM2 solver.

The reference's own C++ (mounted read-only) is compiled against minimal
PCL/ROS stand-ins (tests/parity/) and run on identical inputs.  This is
the strongest possible parity oracle: same association counts, same LM
residual trace, same refined trajectory (the BASELINE "ATE parity"
criterion measured directly)."""

import pathlib
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from balm_tpu.config import SolverConfig, VoxelConfig
from balm_tpu.ops import factors as Fmod
from balm_tpu.pipelines import realworld
from balm_tpu.solver import lm
from balm_tpu.utils import metrics
from balm_tpu.voxel import grid
from tests.parity import run_reference as ref

DATA = pathlib.Path("/root/reference/datas/benchmark_realworld")


@pytest.mark.skipif(not DATA.exists(), reason="reference dataset not mounted")
def test_trajectory_matches_reference_solver():
    if not ref.build():
        pytest.skip("no toolchain/Eigen for the reference harness")

    cfg = realworld.RealworldConfig(max_scans=12, downsample=0.3)
    R, p, scans = realworld.load(cfg)

    with tempfile.TemporaryDirectory() as td:
        td = pathlib.Path(td)
        ref.write_input(td / "in.bin", R, p, scans)
        Rr, pr, trace, planes_ref, _ = ref.run(td / "in.bin", td / "out.bin")

    vres = grid.voxelize(
        scans, R, p,
        VoxelConfig(voxel_size=1.0, eigen_ratio=(1 / 16, 1 / 16, 1 / 9)),
        dtype=np.float64,
    )
    assert vres.num_planes == planes_ref  # identical association

    fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    out = lm.damping_iter(
        jnp.asarray(R), jnp.asarray(p), fj,
        SolverConfig(max_iters=10, u_init=0.01),
    )

    # residual trace parity (the reference prints res1/res2 per iter)
    ours1 = np.array(out.trace_res1)
    for (i, r1, r2) in trace:
        assert abs(ours1[i] - r1) < 1e-4 * abs(r1), (i, ours1[i], r1)

    # trajectory parity
    rot, tra = metrics.pose_rsme(out.R, out.p, jnp.asarray(Rr),
                                 jnp.asarray(pr))
    assert float(rot) * 57.3 < 1e-4   # degrees
    assert float(tra) < 1e-6          # meters
