"""Pose CSV readers for the reference dataset formats.

Format (datas/benchmark_realworld/alidarPose.csv, datas/consistency/
lidarPose.csv): each pose is 4 lines of 4 comma-separated values forming the
4x4 matrix [R | t; 0 0 0 timestamp] as written row-wise in the file.

(The reference reads the 16 values into a column-major Eigen matrix and then
transposes — net effect: the matrix exactly as printed in the file.
src/benchmark/benchmark_realworld.cpp:48-65, src/simulation/consistency.cpp:
69-89.)
"""

from __future__ import annotations

import numpy as np


def read_pose_csv(path, max_poses=None):
    """-> (R (W,3,3), p (W,3), t (W,)) float64 arrays."""
    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip().rstrip(",")
            if not line:
                continue
            rows.append([float(x) for x in line.split(",")])
    M = np.asarray(rows, dtype=np.float64)
    if M.shape[0] % 4 != 0:
        raise ValueError(f"{path}: expected multiple of 4 lines, got {M.shape[0]}")
    M = M.reshape(-1, 4, 4)
    if max_poses is not None:
        M = M[:max_poses]
    R = M[:, :3, :3].copy()
    p = M[:, :3, 3].copy()
    t = M[:, 3, 3].copy()
    return R, p, t
