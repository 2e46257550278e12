"""Streaming odometry with the TPU in the loop (round-5 verdict item 6).

The streaming front-end (`pipelines/odometry.py`) is host-driven; its
two heavy kernels — the fused IRLS registration GN and the window-BA LM
solve — are jitted JAX and run on whatever backend the process selects.
bench_odometry.py pins CPU; this script runs the IDENTICAL protocol with
the kernels on the real (tunneled) TPU in f32 and records

  * scans/sec with the TPU in the loop (sync and async-BA),
  * drift vs the reference trajectory (quality must not regress), and
  * a measured per-kernel breakdown: device compute time (slope
    protocol, utils/sync.py) vs host round-trip time (dispatch + fetch)
    for the registration GN at its production bucket size, plus the
    window-BA solve — the numbers that decide whether host-CPU or TPU
    is the right placement for a 10 Hz sensor loop on THIS link.

The loop fetches poses after every association pass (register_scan
np.asarray), so each scan pays ~2 TPU round trips; through the tunnel
the round trip is the dominant term, which is exactly what the
breakdown quantifies (reference design point: balm_front_back.cpp's
real-time front end).

Run: python scripts/odometry_tpu_loop.py [max_scans]
Merges a "tpu_in_loop" section into artifacts/odometry_throughput.json.
"""

import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.ops import lie  # noqa: E402
from balm_tpu.pipelines import odometry, realworld  # noqa: E402
from balm_tpu.utils import metrics, sync  # noqa: E402
from balm_tpu.voxel import grid as _grid  # noqa: E402


def kernel_breakdown(scans, ocfg):
    """Registration GN at the production bucket: device time vs round
    trip, TPU backend."""
    m = 4096                       # the realworld median bucket
    rng = np.random.default_rng(0)
    P = jnp.asarray(rng.normal(0, 5, (m, 3)).astype(np.float32))
    Nn = jnp.asarray(rng.normal(0, 1, (m, 3)).astype(np.float32))
    Cc = jnp.asarray(rng.normal(0, 5, (m, 3)).astype(np.float32))
    mask = jnp.ones((m,), jnp.float32)
    R0 = jnp.eye(3, dtype=jnp.float32)
    p0 = jnp.zeros((3,), jnp.float32)

    def run(c):
        R, p, cost = odometry._gn_plane_fused(
            R0 + 0 * c, p0, P, Nn, Cc, mask,
            jnp.float32(ocfg.huber), iters=ocfg.reg_iters)
        return cost

    dev = sync.time_per_run(run, jnp.zeros((), jnp.float32), k=8, reps=3)

    # host round trip: dispatch + np.asarray fetch, as the loop does it
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        R, p, cost = odometry._gn_plane_fused(
            R0, p0, P, Nn, Cc, mask, jnp.float32(ocfg.huber),
            iters=ocfg.reg_iters)
        np.asarray(R), np.asarray(p)
        ts.append(time.perf_counter() - t0)
    return {"bucket": m, "reg_iters": ocfg.reg_iters,
            "device_per_run_s": round(dev["per_run_s"], 5),
            "roundtrip_best_s": round(min(ts), 5),
            "roundtrip_med_s": round(sorted(ts)[len(ts) // 2], 5)}


def main(max_scans=100):
    cfg = realworld.RealworldConfig(max_scans=max_scans)
    R_ref, p_ref, scans = realworld.load(cfg)
    scans = [_grid.down_sample_voxel(s, 0.4) for s in scans]
    n_pts = int(sum(len(s) for s in scans))
    dev = jax.devices()[0]
    print(f"device={dev} scans={len(scans)} points={n_pts}", flush=True)

    ocfg = odometry.OdometryConfig()
    # warm every jitted kernel (registration buckets + both BA plane
    # buckets) so remote-compile time is not charged to throughput
    odometry.run(scans[:ocfg.window + ocfg.ba_every + 2], ocfg)
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

    Rg, pg = lie.gauge_fix(jnp.asarray(R_ref), jnp.asarray(p_ref))
    Ro, po = lie.gauge_fix(jnp.asarray(R), jnp.asarray(p))
    rot, tra = metrics.pose_rsme(Ro, po, Rg, pg)

    acfg = dataclasses.replace(ocfg, async_ba=True)
    odometry.run(scans[:ocfg.window + ocfg.ba_every + 2], acfg)
    t0 = time.perf_counter()
    Ra, pa, info_a = odometry.run(scans, acfg)
    dt_a = time.perf_counter() - t0
    sps_a = len(scans) / dt_a
    Ro2, po2 = lie.gauge_fix(jnp.asarray(Ra), jnp.asarray(pa))
    rot_a, tra_a = metrics.pose_rsme(Ro2, po2, Rg, pg)

    bd = kernel_breakdown(scans, ocfg)
    print("breakdown:", bd, flush=True)

    tpu = {
        "device": str(dev),
        "dtype": "float32",
        "scans": len(scans),
        "scans_per_sec": round(sps, 2),
        "total_s": round(dt, 2),
        "drift_vs_ref_deg_m": [float(rot) * 57.3, float(tra)],
        "window_ba_runs": info["ba_runs"],
        "async_ba_scans_per_sec": round(sps_a, 2),
        "async_drift_vs_ref_deg_m": [float(rot_a) * 57.3, float(tra_a)],
        "registration_kernel": bd,
    }

    path = ROOT / "artifacts" / "odometry_throughput.json"
    out = json.loads(path.read_text()) if path.exists() else {}
    out["tpu_in_loop"] = tpu
    rt, dv = bd["roundtrip_med_s"], bd["device_per_run_s"]
    cpu_sps = out.get("scans_per_sec", 9.04)
    tpu["analysis"] = (
        f"TPU-in-loop {sps:.1f} scans/s vs host-CPU {cpu_sps} on the "
        f"same protocol.  Per registration pass the TPU spends "
        f"{dv * 1e3:.2f} ms computing but {rt * 1e3:.1f} ms on the "
        f"dispatch+fetch round trip through the tunnel, and each scan "
        f"pays ~{ocfg.reg_reassociate} passes plus the window-BA "
        f"landing fetch — the link, not the math, sets the rate.  "
        "Placement rule: at these kernel sizes (<=16k points, 6-dof "
        "state) the host CPU is the right home for a 10 Hz sensor loop "
        "unless the accelerator is local (PCIe/ICI), where the round "
        "trip is ~100x smaller than this tunnel's.")
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(tpu, indent=2), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
