"""Streaming front-end throughput: scans/sec on the realworld 177-scan
data (BASELINE.md metric list: ATE, LM iter/s, scans/sec).

The BALM-old reference front-end targets real-time LiDAR rates (10 Hz);
this measures the full streaming loop — constant-motion predict,
scan-to-map GN registration, incremental voxel map insert/swap, periodic
window BA — end to end on CPU (the loop is host-driven; its kernels are
small enough that tunneled-TPU dispatch overhead would dominate).

Produces artifacts/odometry_throughput.json.
Run: python scripts/bench_odometry.py [max_scans]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.ops import lie  # noqa: E402
from balm_tpu.pipelines import odometry, realworld  # noqa: E402
from balm_tpu.utils import metrics  # noqa: E402


def main(max_scans=100):
    cfg = realworld.RealworldConfig(max_scans=max_scans)
    R_ref, p_ref, scans = realworld.load(cfg)
    # the reference front-end consumes sparse FEATURE clouds (a few
    # thousand surf points per scan, livox_feature.cpp), not raw 80k-point
    # scans — voxel-downsample to a comparable working set
    from balm_tpu.voxel import grid as _grid
    scans = [_grid.down_sample_voxel(s, 0.4) for s in scans]
    n_pts = int(sum(len(s) for s in scans))
    print(f"scans={len(scans)} points={n_pts} "
          f"(~{n_pts//len(scans)}/scan after 0.4 m downsample)", flush=True)

    ocfg = odometry.OdometryConfig()
    # warm the jitted kernels on a prefix so compile time is not charged
    # to the steady-state throughput figure.  The prefix must reach past
    # the first window BA (scan index window-1) or the LM solver's
    # multi-second compile lands INSIDE the timed region (profiled: 28 s
    # of the 37 s "throughput" run was jit compile/trace before this fix)
    odometry.run(scans[:ocfg.window + ocfg.ba_every + 2], ocfg)
    # ... and the window-BA solver's OTHER plane bucket (the voxelizer
    # pads plane counts to 512-multiples; a window crossing 512 planes
    # mid-run would otherwise charge a ~2 s jit trace to the throughput)
    from balm_tpu.ops import factors as Fmod
    for Gb in (512, 1024):
        C = jnp.zeros((Gb, ocfg.window, 4, 4)).at[:, :, 3, 3].set(5.0)
        C = C.at[:, :, 0, 0].set(1.0).at[:, :, 1, 1].set(1.0)
        fj = Fmod.PlaneFactors.create(C)
        odometry.lm.damping_iter(
            jnp.tile(jnp.eye(3), (ocfg.window, 1, 1)),
            jnp.zeros((ocfg.window, 3)), fj, ocfg.ba_solver)

    t0 = time.perf_counter()
    R, p, info = odometry.run(scans, ocfg)
    dt = time.perf_counter() - t0
    sps = len(scans) / dt

    # healthy-prefix figure: tracking diverges past ~35 scans on this
    # keyframe dataset (see note below) and degenerate windows are
    # artificially cheap — report the tracked-regime throughput too
    nh = min(35, len(scans))
    t0 = time.perf_counter()
    odometry.run(scans[:nh], ocfg)
    sps_healthy = nh / (time.perf_counter() - t0)

    # drift vs the dataset's reference trajectory (odometry alone, no
    # global BA: expect meter-level tail drift, NOT parity)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_ref), jnp.asarray(p_ref))
    Ro, po = lie.gauge_fix(jnp.asarray(R), jnp.asarray(p))
    rot, tra = metrics.pose_rsme(Ro, po, Rg, pg)

    # detached-refine mode (balm_front_back.cpp:673-677 equivalent):
    # window BA overlaps registration; drift measured separately since
    # the deferred landing makes the trajectory differ slightly
    import dataclasses as _dc
    acfg = _dc.replace(ocfg, async_ba=True)
    odometry.run(scans[:ocfg.window + ocfg.ba_every + 2], acfg)  # warm
    t0 = time.perf_counter()
    Ra, pa, info_a = odometry.run(scans, acfg)
    dt_a = time.perf_counter() - t0
    sps_a = len(scans) / dt_a
    Ro2, po2 = lie.gauge_fix(jnp.asarray(Ra), jnp.asarray(pa))
    rot_a, tra_a = metrics.pose_rsme(Ro2, po2, Rg, pg)

    result = {
        "metric": "streaming_scans_per_sec_realworld",
        "scans": len(scans),
        "points": n_pts,
        "total_s": round(dt, 2),
        "scans_per_sec": round(sps, 2),
        "scans_per_sec_healthy35": round(sps_healthy, 2),
        "points_per_sec": round(n_pts / dt, 0),
        "window_ba_runs": info["ba_runs"],
        "drift_vs_ref_deg_m": [float(rot) * 57.3, float(tra)],
        "async_ba": {
            "scans_per_sec": round(sps_a, 2),
            "speedup_vs_sync": round(sps_a / sps, 3),
            "window_ba_runs": info_a["ba_runs"],
            "drift_vs_ref_deg_m": [float(rot_a) * 57.3, float(tra_a)],
        },
        "yaw_rescues": info.get("yaw_rescues", 0),
        "rot_searches": info.get("rot_searches", 0),
        "note": ("host CPU streaming loop; 10 Hz is the sensor real-time "
                 "bar (reference front-end design point).  This dataset "
                 "is BA keyframes with median 7.6 deg / max 42.8 deg "
                 "rotation BETWEEN scans — far outside a constant-motion "
                 "predictor's envelope (a 10 Hz stream moves ~1 deg/"
                 "scan); the rescue ladder (scan-context yaw init + "
                 "coarse pitch/roll search + tight-inlier candidate "
                 "ranking, OdometryConfig.yaw_rescue/rot_search) tracks "
                 "it anyway.  artifacts/odometry_10hz.json is the "
                 "in-envelope synthesized-stream benchmark."),
    }
    outp = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    outp.mkdir(exist_ok=True)
    with open(outp / "odometry_throughput.json", "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
