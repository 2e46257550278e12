"""Time the device-side (TPU) voxelization at realworld scale.

Measures the full association cost a user pays from host scans to
device-resident PlaneFactors:

  pad (host memcpy) + host->device transfer + _voxelize_core compute

against the native C++ host engine (the round-2 production path) and the
reference octree's recorded 7.57 s (artifacts/parity_realworld.json).

Timing through the axon tunnel uses the slope protocol (utils/sync.py);
the transfer is synced by fetching one element of the transferred buffer.

Run: python scripts/time_assoc_tpu.py [max_scans]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

_CACHE = str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.pipelines import realworld  # noqa: E402
from balm_tpu.utils import sync  # noqa: E402
from balm_tpu.voxel import device as vdev  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402


def main(max_scans=None):
    cfg = realworld.RealworldConfig(max_scans=max_scans)
    R, p, scans = realworld.load(cfg)
    n_pts = int(sum(len(s) for s in scans))
    W = len(scans)
    print(f"scans {W}, points {n_pts}, backend {jax.default_backend()}",
          flush=True)

    # --- native host engine (production comparison point) ---
    t0 = time.perf_counter()
    vres_host = grid.voxelize(scans, R, p, cfg.voxel, dtype=np.float64,
                              backend="native")
    t_native = time.perf_counter() - t0
    print(f"native host engine: {t_native:.2f}s, "
          f"{vres_host.num_planes} planes", flush=True)

    # --- device path ---
    scans32 = [s.astype(np.float32) for s in scans]
    t0 = time.perf_counter()
    body, mask = vdev.pad_scans(scans32, np.float32)
    t_pad = time.perf_counter() - t0

    t0 = time.perf_counter()
    bd = jax.device_put(body)
    md = jax.device_put(mask)
    Rd = jax.device_put(R.astype(np.float32))
    pd = jax.device_put(p.astype(np.float32))
    # sync: one element of the last buffer forces the copies to finish
    float(bd[-1, -1, 0])
    t_xfer = time.perf_counter() - t0

    kw = dict(
        voxel_size=float(cfg.voxel.voxel_size),
        layer_limit=int(cfg.voxel.layer_limit),
        eigen_ratio=tuple(float(r) for r in cfg.voxel.eigen_ratio),
        min_points=int(cfg.voxel.min_points),
        min_observers=int(cfg.voxel.min_observers),
        unit_coe=False,
    )
    N = int(np.prod(body.shape[:2]))
    # realworld-tuned capacities (actual: 5836/24.7k/99.5k cells, 1.85M
    # (cell,scan) pairs) with >= 1.3x headroom; the voxelize_device
    # wrapper would discover these via retry-on-overflow
    cell_caps = (1 << 14, 1 << 16, 1 << 17)
    Gcap = 1 << 13

    def run(b):
        return vdev._voxelize_core(
            b, md, Rd, pd, cell_caps=cell_caps, Gcap=Gcap,
            cs_cap=2_200_000, pair_cap=1 << 18,
            want_point_leaf=False, **kw)

    t0 = time.perf_counter()
    out = run(bd)
    n_planes = int(out.num_planes)  # fetch = sync
    t_first = time.perf_counter() - t0
    print(f"device first run (incl. compile): {t_first:.2f}s, "
          f"{n_planes} planes, overflow={bool(out.overflow)}", flush=True)

    def perturb(c, r):
        return c + (r.factors.coe[0] * 0).astype(c.dtype)

    t1 = min(sync.timed_chain(run, bd, 1, perturb) for _ in range(3))
    tk = min(sync.timed_chain(run, bd, 4, perturb) for _ in range(3))
    per = (tk - t1) / 3
    res = {
        "scans": W,
        "points": n_pts,
        "padded_slots": N,
        "native_host_s": round(t_native, 3),
        "device": {
            "pad_s": round(t_pad, 3),
            "transfer_s": round(t_xfer, 3),
            "compute_per_run_s": round(per, 4),
            "t1_s": round(t1, 3),
            "tk_s": round(tk, 3),
            "first_run_s": round(t_first, 2),
            "total_assoc_s": round(t_pad + t_xfer + per, 3),
            "planes": n_planes,
        },
        "host_planes": int(vres_host.num_planes),
        "reference_assoc_s": 7.5657,
        "device_backend": jax.default_backend(),
    }
    print(json.dumps(res, indent=2), flush=True)
    outp = pathlib.Path("artifacts")
    outp.mkdir(exist_ok=True)
    with open(outp / "assoc_tpu.json", "w") as fh:
        json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else None)
