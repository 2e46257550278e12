"""CLI surface (`python -m balm_tpu ...`) — the executable equivalent of
the reference's roslaunch entry points (MIGRATION.md maps them 1:1)."""

import dataclasses
import json

import pytest

from balm_tpu import __main__ as cli
from balm_tpu.config import SolverConfig, VoxelConfig


def test_set_override_dotted_paths():
    from balm_tpu.pipelines import realworld

    cfg = cli._apply_sets(
        realworld.RealworldConfig(),
        ["voxel.voxel_size=2.5", "solver.max_iters=3", "max_scans=7",
         "merge_planes=true", "dtype=float32",
         "voxel.eigen_ratio=0.1,0.2,0.3"])
    assert cfg.voxel.voxel_size == 2.5
    assert cfg.solver.max_iters == 3
    assert cfg.max_scans == 7
    assert cfg.merge_planes is True
    assert cfg.dtype == "float32"
    assert cfg.voxel.eigen_ratio == (0.1, 0.2, 0.3)
    # the shared class-level default instances must NOT be mutated
    assert realworld.RealworldConfig().voxel.voxel_size == 1.0
    assert realworld.RealworldConfig().solver.max_iters == 10


def test_set_override_rejects_unknown_field():
    from balm_tpu.pipelines import virtual

    with pytest.raises(SystemExit):
        cli._apply_sets(virtual.VirtualConfig(), ["no_such_field=1"])


def test_coerce_none_and_bool():
    assert cli._coerce(5, "none") is None
    assert cli._coerce(True, "off") is False
    assert cli._coerce(None, "12") == 12          # Optional[int] field
    assert cli._coerce(None, "/some/path") == "/some/path"


def test_virtual_command_end_to_end(capsys, tmp_path):
    out_json = tmp_path / "virtual.json"
    rc = cli.main([
        "virtual", "--set", "win_size=6", "--set", "surf_size=8",
        "--set", "pts_size=15", "--json", str(out_json),
    ])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(line)
    # converged well below the initial error and the bulky LMResult
    # payload is kept out of the machine-readable line
    assert summary["rsme_rot_deg"] < summary["rsme_rot_deg_initial"]
    assert "result" not in summary
    assert json.loads(out_json.read_text()) == summary


def test_jsonable_handles_device_arrays():
    import jax.numpy as jnp
    import numpy as np

    small = cli._jsonable(jnp.arange(4.0))
    assert small == [0.0, 1.0, 2.0, 3.0]
    big = cli._jsonable(np.zeros((20, 20)))
    assert isinstance(big, str) and "(20, 20)" in big
    assert cli._jsonable(jnp.float32(1.5)) == 1.5
