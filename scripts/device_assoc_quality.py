"""Does f32 device association change the SOLVE quality? (realworld 177)

The device voxelizer in its f32 production regime admits ~10% fewer
planes than the f64 host backends (borderline lambda0/lambda1 gate
decisions shift with the one-pass cell-local f32 moments).  This
measures what that does to the thing that matters: solve both factor
sets on the TPU and compare the refined trajectories and their costs
under a COMMON metric (the f64 host factor set).

Run: python scripts/device_assoc_quality.py
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

_CACHE = str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.config import SolverConfig  # noqa: E402
from balm_tpu.ops import factors as Fmod  # noqa: E402
from balm_tpu.ops import lie  # noqa: E402
from balm_tpu.pipelines import realworld  # noqa: E402
from balm_tpu.solver import lm  # noqa: E402
from balm_tpu.utils import metrics, sync  # noqa: E402
from balm_tpu.voxel import device as vdev  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402


def main():
    cfg = realworld.RealworldConfig()
    R, p, scans = realworld.load(cfg)
    scfg = SolverConfig(max_iters=10, u_init=0.01)

    vres = grid.voxelize(scans, R, p, cfg.voxel, dtype=np.float64)
    f_host = Fmod.recenter_bodies(vres.factors).astype(jnp.float32)

    dres = vdev.voxelize_device([s.astype(np.float32) for s in scans],
                                R.astype(np.float32), p.astype(np.float32),
                                cfg.voxel)
    f_dev = dres.factors

    Rj = jnp.asarray(R, jnp.float32)
    pj = jnp.asarray(p, jnp.float32)
    out_h = lm.damping_iter(Rj, pj, f_host, scfg, centered=True)
    out_d = lm.damping_iter(Rj, pj, f_dev, scfg, centered=True)
    sync.fetch_scalar(out_h.residual)
    sync.fetch_scalar(out_d.residual)

    # common metric: the f64-host factor cost at both solutions
    def host_cost(Rx, px):
        T = lie.pose_matrix(Rx, px)
        return float(Fmod.residual_only(T, f_host, centered=True))

    rot, tra = metrics.pose_rsme(
        out_h.R.astype(jnp.float64), out_h.p.astype(jnp.float64),
        out_d.R.astype(jnp.float64), out_d.p.astype(jnp.float64))
    res = {
        "host_planes": int(vres.num_planes),
        "device_planes": int(dres.num_planes),
        "host_iters": int(out_h.iters),
        "device_iters": int(out_d.iters),
        "host_cost_at_host_solution": host_cost(out_h.R, out_h.p),
        "host_cost_at_device_solution": host_cost(out_d.R, out_d.p),
        "ate_host_vs_device_rot_deg": float(rot) * 57.2958,
        "ate_host_vs_device_trans_m": float(tra),
    }
    res["cost_ratio"] = (res["host_cost_at_device_solution"]
                         / res["host_cost_at_host_solution"])
    print(json.dumps(res, indent=2))
    with open("artifacts/device_assoc_quality.json", "w") as fh:
        json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
