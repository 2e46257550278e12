"""Per-stage cost of the v3 device voxelizer on realworld data (TPU).

Uses the `_stage` early-return hooks in `_voxelize_core` with the slope
protocol: stage k's incremental cost = t(stage k) - t(stage k-1).

Run: python scripts/profile_v3_stages.py
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


def main():
    cfg = realworld.RealworldConfig()
    R, p, scans = realworld.load(cfg)
    scans32 = [s.astype(np.float32) for s in scans]
    body, mask = vdev.pad_scans(scans32, np.float32)
    bd = jax.device_put(body)
    md = jax.device_put(mask)
    Rd = jax.device_put(R.astype(np.float32))
    pd = jax.device_put(p.astype(np.float32))
    float(bd[-1, -1, 0])

    kw = dict(
        voxel_size=float(cfg.voxel.voxel_size),
        layer_limit=int(cfg.voxel.layer_limit),
        eigen_ratio=tuple(float(r) for r in cfg.voxel.eigen_ratio),
        min_points=int(cfg.voxel.min_points),
        min_observers=int(cfg.voxel.min_observers),
        unit_coe=False,
        cell_caps=(1 << 14, 1 << 16, 1 << 17),
        Gcap=1 << 13,
        cs_cap=2_200_000,
        want_point_leaf=False,
    )

    def perturb(c, r):
        leaf = jax.tree_util.tree_leaves(r)[0]
        return c + (leaf.ravel()[0] * 0).astype(c.dtype)

    out = {}
    prev = 0.0
    for stage in (1, 2, 3, 4, 99):
        def run(b, _s=stage):
            return vdev._voxelize_core(b, md, Rd, pd, _stage=_s, **kw)

        t0 = time.perf_counter()
        r = run(bd)
        sync.fetch_scalar(jax.tree_util.tree_leaves(r)[0].ravel()[0])
        t_first = time.perf_counter() - t0
        t1 = min(sync.timed_chain(run, bd, 1, perturb) for _ in range(2))
        tk = min(sync.timed_chain(run, bd, 4, perturb) for _ in range(2))
        per = (tk - t1) / 3
        out[f"stage{stage}"] = {
            "cum_s": round(per, 4),
            "incr_s": round(per - prev, 4),
            "first_s": round(t_first, 2),
        }
        prev = per
        print(stage, out[f"stage{stage}"], flush=True)

    with open("artifacts/profile_v3_stages.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
