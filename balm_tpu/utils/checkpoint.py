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


def pack_lm_state(state: dict) -> dict:
    """Flatten a solver/lm.damping_iter_resumable mid-solve state into
    npz-safe prefixed arrays (pass as **extra to `save`)."""
    return {f"lm_{k}": np.asarray(v) for k, v in state.items()}


def unpack_lm_state(data: dict) -> dict | None:
    """Inverse of pack_lm_state over a dict loaded by `load`; None when
    the checkpoint holds no mid-solve state."""
    out = {k[3:]: np.asarray(v) for k, v in data.items()
           if k.startswith("lm_")}
    return out or None


def save_odometry(path, i_next: int, R, p, vmap_state: dict,
                  contribs: dict, info: dict):
    """Persist the FULL streaming-odometry loop state after scan
    `i_next - 1` (pipelines/odometry.run): trajectory so far, the
    incremental VoxelPlaneMap, and the per-scan map contributions still
    inside the BA window (needed for the contribution swaps).  Atomic:
    written to a temp file and renamed, so a kill mid-write never leaves
    a truncated checkpoint."""
    path = pathlib.Path(path)
    data = {"odo_i_next": np.asarray(i_next),
            "R": np.asarray(R), "p": np.asarray(p),
            "odo_reg_points": np.asarray(info.get("reg_points", []),
                                         np.int64),
            "odo_ba_runs": np.asarray(info.get("ba_runs", 0))}
    for k, v in vmap_state.items():
        data[f"vmap_{k}"] = np.asarray(v)
    data["contrib_idx"] = np.asarray(sorted(contribs), np.int64)
    for j, (keys, sums) in contribs.items():
        data[f"contrib_{j}_k"] = np.asarray(keys)
        data[f"contrib_{j}_s"] = np.asarray(sums)
    # keep the .npz suffix on the temp file (savez appends it otherwise)
    tmp = path.with_name(path.stem + ".tmp.npz")
    np.savez_compressed(tmp, **data)
    tmp.replace(path)


def load_odometry(path):
    """-> (i_next, R, p, vmap_state, contribs, info) saved by
    save_odometry."""
    z = np.load(path, allow_pickle=False)
    vmap_state = {k[5:]: z[k] for k in z.files if k.startswith("vmap_")}
    contribs = {int(j): (z[f"contrib_{j}_k"], z[f"contrib_{j}_s"])
                for j in z["contrib_idx"]}
    info = {"reg_points": list(z["odo_reg_points"]),
            "ba_runs": int(z["odo_ba_runs"])}
    return (int(z["odo_i_next"]), z["R"], z["p"], vmap_state, contribs,
            info)


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
