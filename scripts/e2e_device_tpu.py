"""Fully on-device realworld pipeline: points -> factors -> poses.

The TPU-native thesis end-to-end: once the padded scans live in HBM,
association (`voxel/device._voxelize_core`) feeds the damped-Newton
solve (`solver/lm.damping_iter`, packed backend) with ZERO host
round-trips — `num_planes` stays a device scalar, the factor tree never
leaves the chip, and the refined trajectory is the only thing fetched.

Reports, via the fetch-synced slope protocol:
  - assoc+solve fused per-run device time (the co-located-chip number)
  - the one-time host->device transfer this tunneled setup pays
  - solution quality vs the host-association optimum

Run: python scripts/e2e_device_tpu.py  ->  artifacts/e2e_device.json
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

    body, mask = vdev.pad_scans([s.astype(np.float32) for s in scans],
                                np.float32)
    t0 = time.perf_counter()
    bd = jax.device_put(body)
    md = jax.device_put(mask)
    Rd = jax.device_put(R.astype(np.float32))
    pd = jax.device_put(p.astype(np.float32))
    float(bd[-1, -1, 0])
    t_xfer = time.perf_counter() - t0

    # realworld-tuned capacities (gather/scatter cost scales with the
    # TABLE size — artifacts/microbench_pass_pieces.json)
    kw = dict(
        voxel_size=float(cfg.voxel.voxel_size),
        layer_limit=int(cfg.voxel.layer_limit),
        eigen_ratio=tuple(float(r) for r in cfg.voxel.eigen_ratio),
        min_points=int(cfg.voxel.min_points),
        min_observers=int(cfg.voxel.min_observers),
        unit_coe=False, cell_caps=(1 << 14, 1 << 16, 1 << 17),
        Gcap=1 << 13, cs_cap=2_200_000, pair_cap=1 << 18,
        want_point_leaf=False,
    )

    @jax.jit
    def pipeline(b, Rin, pin):
        out = vdev._voxelize_core(b, md, Rin, pin, **kw)
        res = lm.damping_iter(Rin, pin, out.factors, scfg, centered=True,
                              backend="packed")
        return res

    t0 = time.perf_counter()
    res = pipeline(bd, Rd, pd)
    sync.fetch_scalar(res.residual)
    t_first = time.perf_counter() - t0

    def run(b):
        return pipeline(b, Rd, pd)

    def perturb(c, r):
        return c + (r.residual * 0).astype(c.dtype)

    t1 = min(sync.timed_chain(run, bd, 1, perturb) for _ in range(3))
    tk = min(sync.timed_chain(run, bd, 4, perturb) for _ in range(3))
    per = max((tk - t1) / 3, 1e-9)

    res = pipeline(bd, Rd, pd)
    # quality vs the host-association f64 optimum
    vres = grid.voxelize(scans, R, p, cfg.voxel, dtype=np.float64)
    f_host = Fmod.recenter_bodies(vres.factors).astype(jnp.float32)
    f_host = jax.tree_util.tree_map(jnp.asarray, f_host)
    ref = lm.damping_iter(jnp.asarray(R, jnp.float32),
                          jnp.asarray(p, jnp.float32), f_host, scfg,
                          centered=True, backend="packed")
    rot, tra = metrics.pose_rsme(
        res.R.astype(jnp.float64), res.p.astype(jnp.float64),
        ref.R.astype(jnp.float64), ref.p.astype(jnp.float64))

    def host_cost(Rx, px):
        T = lie.pose_matrix(Rx, px)
        return float(Fmod.residual_only(T, f_host, centered=True))

    out = {
        "scans": len(scans),
        "points": int(sum(len(s) for s in scans)),
        "transfer_s": round(t_xfer, 2),
        "first_run_s": round(t_first, 1),
        "assoc_plus_solve_per_run_s": round(per, 3),
        "iters": int(res.iters),
        "residual_final_device_assoc": float(res.residual),
        "host_cost_at_device_solution": host_cost(res.R, res.p),
        "host_cost_at_host_solution": host_cost(ref.R, ref.p),
        "ate_vs_host_pipeline_rot_deg": float(rot) * 57.2958,
        "ate_vs_host_pipeline_trans_m": float(tra),
        "note": ("ONE jitted program: on-chip association feeding the "
                 "packed damped-Newton solve; num_planes stays a device "
                 "scalar, the factor tree never leaves HBM.  The "
                 "transfer is a one-time cost this tunneled setup pays "
                 "at ~2.5 MB/s; co-located PCIe pays ~0.05 s."),
    }
    print(json.dumps(out, indent=2))
    with open("artifacts/e2e_device.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
