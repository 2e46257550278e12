"""In-envelope streaming benchmark: a synthetic 10 Hz stream from the
realworld keyframes (VERDICT r2 #5).

The 177-scan realworld set is BA keyframes with median 7.6 deg / max
42.8 deg rotation BETWEEN scans — far outside any constant-motion
front-end's envelope (the reference's balm_front_back consumed 10 Hz
rosbags, ~1 deg/scan).  This synthesizes the in-envelope equivalent:
SE(3)-interpolate the reference trajectory between keyframes at
`substeps` frames per interval and re-express the bracketing keyframe's
points in each interpolated body frame (correct parallax from real
geometry; occlusion ignored).  The front-end must track it.

Run: python scripts/odometry_10hz.py [n_keyframes] [substeps]
Writes artifacts/odometry_10hz.json.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"))

import jax.numpy as jnp  # noqa: E402

from balm_tpu.ops import lie  # noqa: E402
from balm_tpu.pipelines import odometry, realworld  # noqa: E402
from balm_tpu.utils import metrics  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402


def interp_stream(R, p, scans, substeps, downsample):
    """SE(3)-interpolated frames + re-expressed keyframe geometry."""
    out_scans, out_R, out_p = [], [], []
    for i in range(len(scans) - 1):
        dR = R[i].T @ R[i + 1]
        w = np.asarray(lie.so3_log(jnp.asarray(dR)))
        pts = scans[i]
        if downsample > 0:
            pts = grid.down_sample_voxel(pts, downsample)
        world = pts @ R[i].T + p[i]
        for k in range(substeps):
            a = k / substeps
            Rk = R[i] @ np.asarray(lie.so3_exp(jnp.asarray(a * w)))
            pk = (1 - a) * p[i] + a * p[i + 1]
            out_R.append(Rk)
            out_p.append(pk)
            out_scans.append((world - pk) @ Rk)
    out_R.append(R[len(scans) - 1])
    out_p.append(p[len(scans) - 1])
    pts = scans[len(scans) - 1]
    if downsample > 0:
        pts = grid.down_sample_voxel(pts, downsample)
    out_scans.append(pts)
    return np.stack(out_R), np.stack(out_p), out_scans


def main(n_key=60, substeps=6):
    cfg = realworld.RealworldConfig(max_scans=n_key)
    R_ref, p_ref, scans = realworld.load(cfg)
    # per-interval rotation magnitude of the KEYFRAME set, for context
    dang = [float(np.degrees(np.linalg.norm(np.asarray(lie.so3_log(
        jnp.asarray(R_ref[i].T @ R_ref[i + 1]))))))
        for i in range(len(scans) - 1)]

    Rg, pg, stream = interp_stream(R_ref, p_ref, scans, substeps,
                                   downsample=0.10)
    W = len(stream)
    print(f"stream: {W} frames from {n_key} keyframes "
          f"(keyframe rot median {np.median(dang):.1f} max "
          f"{np.max(dang):.1f} deg -> per-frame "
          f"{np.median(dang)/substeps:.1f} deg)", flush=True)

    ocfg = odometry.OdometryConfig()
    t0 = time.perf_counter()
    R, p, info = odometry.run(stream, ocfg, R_init=Rg[0], p_init=pg[0])
    t = time.perf_counter() - t0

    rot, tra = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R), jnp.asarray(p)),
        *lie.gauge_fix(jnp.asarray(Rg), jnp.asarray(pg)))
    out = {
        "keyframes": n_key,
        "substeps": substeps,
        "frames": W,
        "keyframe_rot_median_max_deg": [float(np.median(dang)),
                                        float(np.max(dang))],
        "scans_per_sec": round(W / t, 2),
        "total_s": round(t, 1),
        "drift_deg_m": [float(rot) * 57.2958, float(tra)],
        "ba_runs": info.get("ba_runs", 0),
        "yaw_rescues": info.get("yaw_rescues", 0),
        "median_reg_points": float(np.median(info["reg_points"])),
    }
    print(json.dumps(out, indent=2), flush=True)
    with open("artifacts/odometry_10hz.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60,
         int(sys.argv[2]) if len(sys.argv) > 2 else 6)
