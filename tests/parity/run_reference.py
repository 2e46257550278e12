"""Driver for the reference-solver parity oracle (balm_ref_harness.cpp)."""

from __future__ import annotations

import pathlib
import re
import struct
import subprocess

import numpy as np

DIR = pathlib.Path(__file__).resolve().parent
HARNESS = DIR / "balm_ref_harness"
EIGEN = "/opt/venv/lib/python3.12/site-packages/tensorflow/include"
REF = "/root/reference"


def build(force=False):
    if HARNESS.exists() and not force:
        return True
    src = DIR / "balm_ref_harness.cpp"
    cmd = [
        "g++", "-O2", "-std=c++14", "-pthread",
        "-I", str(DIR / "stubs"), "-I", EIGEN,
        "-I", f"{REF}/include", "-I", f"{REF}/src/benchmark",
        str(src), "-o", str(HARNESS),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return False
    return True


def write_input(path, R, p, scans, voxel_size=1.0, layer_limit=2,
                eigen_ratio=(1 / 16, 1 / 16, 1 / 9), min_ps=15,
                max_iters=10):
    W = len(R)
    with open(path, "wb") as fh:
        fh.write(struct.pack("<q", W))
        fh.write(struct.pack("<d", voxel_size))
        fh.write(struct.pack("<q", layer_limit))
        fh.write(struct.pack("<3d", *eigen_ratio))
        fh.write(struct.pack("<q", min_ps))
        fh.write(struct.pack("<q", max_iters))
        for i in range(W):
            fh.write(np.asarray(R[i], "<f8").tobytes())
            fh.write(np.asarray(p[i], "<f8").tobytes())
        for i in range(W):
            pts = np.asarray(scans[i], "<f8")
            fh.write(struct.pack("<q", len(pts)))
            fh.write(pts.tobytes())


def run(inp, out, timeout=600):
    res = subprocess.run(
        [str(HARNESS), str(inp), str(out)],
        capture_output=True, text=True, timeout=timeout,
    )
    trace = []
    for line in res.stdout.splitlines():
        m = re.match(r"iter(\d+): \(([-\d.el+]+) ([-\d.el+]+)\)", line)
        if m:
            trace.append((int(m.group(1)), float(m.group(2)),
                          float(m.group(3))))
    planes = None
    m = re.search(r"planes: (\d+)", res.stderr)
    if m:
        planes = int(m.group(1))
    timings = {}
    for key in ("t_assoc", "t_solve"):
        m = re.search(key + r": ([\d.]+)", res.stderr)
        if m:
            timings[key] = float(m.group(1))
    data = np.fromfile(out, "<f8")
    W = len(data) // 12
    data = data.reshape(W, 12)
    Rr = data[:, :9].reshape(W, 3, 3)
    pr = data[:, 9:]
    res.timings = timings
    return Rr, pr, trace, planes, res
