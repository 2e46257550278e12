"""Checkpoint / resume for long BA runs (SURVEY.md section 5: the reference
has none — state lives in RAM and is re-read from PCD/CSV each run.  For
multi-hour pod runs we persist poses + factor tensors + solver state).

Format: a single .npz (portable, no framework lock-in).  Also writes the
reference's alidarPose.csv trajectory format for interop with its tooling.
"""

from __future__ import annotations

import pathlib

import numpy as np

from ..ops.factors import PlaneFactors

_FIELDS = ("C", "Cfix", "coe", "centers", "body_centers")


def save(path, R, p, factors: PlaneFactors = None, **extra):
    """Save trajectory (+ optional factor batch and metadata arrays)."""
    data = {"R": np.asarray(R), "p": np.asarray(p)}
    if factors is not None:
        for name in _FIELDS:
            data[f"factors_{name}"] = np.asarray(getattr(factors, name))
    for k, v in extra.items():
        data[k] = np.asarray(v)
    np.savez_compressed(path, **data)


def load(path):
    """-> dict with R, p, optional 'factors' (PlaneFactors of numpy
    arrays) and any extra arrays."""
    z = np.load(path, allow_pickle=False)
    out = {k: z[k] for k in z.files if not k.startswith("factors_")}
    if "factors_C" in z.files:
        out["factors"] = PlaneFactors(
            *[z[f"factors_{name}"] for name in _FIELDS]
        )
    return out


def write_pose_csv(path, R, p, t=None):
    """Write the reference's 4-lines-per-pose CSV trajectory format
    (datas/benchmark_realworld/alidarPose.csv; see io/poses.py)."""
    R = np.asarray(R)
    p = np.asarray(p)
    W = len(R)
    t = np.zeros(W) if t is None else np.asarray(t)
    with open(path, "w") as fh:
        for i in range(W):
            M = np.eye(4)
            M[:3, :3] = R[i]
            M[:3, 3] = p[i]
            M[3, 3] = t[i]
            for row in M:
                fh.write(",".join(f"{x:.9f}" for x in row) + ",\n")


def read_pose_csv(path):
    from ..io.poses import read_pose_csv as _read

    return _read(path)
