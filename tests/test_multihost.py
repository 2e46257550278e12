"""Multi-process (multi-"host") distributed-backend validation.

Runs scripts/multihost_demo.py: 2 OS processes x 2 virtual CPU devices,
jax.distributed over gloo — the same code paths a real pod uses
(per-process device addressing, global mesh, cross-process device_put of
globally-sharded factors, collectives spanning processes), minus the
ICI/DCN fabric.  Reference parallelism being replaced: the 4-thread
join + matrix add of bavoxel.hpp:989-1059."""

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_multihost_two_process_equals_single(tmp_path):
    art = tmp_path / "multihost_cpu_test.json"
    code = (
        "import sys;"
        f"sys.path.insert(0, {str(REPO / 'scripts')!r});"
        "from multihost_demo import main;"
        f"main(2, 2, win=10, surf=16, pts=20, artifact={str(art)!r})"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=str(REPO),
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rec = json.loads(art.read_text())
    assert rec["ok"], rec
    assert rec["processes"] == 2
    assert rec["global_devices"] == 4
