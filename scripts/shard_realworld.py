"""Factor-shard the FULL realworld problem on the 8-device virtual mesh.

Round-4 verdict item 5: equality vs the replicated solve at full scale
(177 scans, all 5529 planes, full point set), with the communication and
work accounting: psum payload per iteration, per-shard FLOPs, plane
distribution.

Run: python scripts/shard_realworld.py   (forces CPU + 8 virtual devices)
"""

import json
import os
import pathlib
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.config import SolverConfig  # noqa: E402
from balm_tpu.ops import factors as Fmod  # noqa: E402
from balm_tpu.parallel import sharded  # noqa: E402
from balm_tpu.pipelines import realworld  # noqa: E402
from balm_tpu.solver import lm  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402


def main():
    assert len(jax.devices()) >= 8, jax.devices()
    cfg = realworld.RealworldConfig()
    R, p, scans = realworld.load(cfg)
    W = len(scans)
    vres = grid.voxelize(scans, R, p, cfg.voxel, dtype=np.float64)
    G = int(vres.num_planes)
    f = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    scfg = SolverConfig(max_iters=10, u_init=0.01, rel_tol=0.0)

    res0 = lm.damping_iter(jnp.asarray(R), jnp.asarray(p), f, scfg)
    r0 = float(res0.residual)

    mesh = sharded.make_mesh(8)
    fs = sharded.shard_factors(f, mesh)
    with mesh:
        res1 = lm.damping_iter(
            sharded.replicate(jnp.asarray(R), mesh),
            sharded.replicate(jnp.asarray(p), mesh), fs, scfg)
    r1 = float(res1.residual)

    dR = float(np.max(np.abs(np.asarray(res0.R) - np.asarray(res1.R))))
    dp = float(np.max(np.abs(np.asarray(res0.p) - np.asarray(res1.p))))

    # communication model: per accepted iteration the factor-axis
    # reduction moves H (6W)^2 + J (6W) + res (1); ring all-reduce over n
    # devices transfers 2(n-1)/n of the payload per link
    n6 = 6 * W
    itemsize = np.dtype(np.float64).itemsize
    payload = (n6 * n6 + n6 + 1) * itemsize
    n = 8
    ring = 2 * (n - 1) / n
    # per-shard Hessian work: rank-row matmul 2*(6W)^2*(3G/n)
    Gp = int(fs.C.shape[0])
    flops_shard = 2.0 * n6 * n6 * 3 * (Gp // n)
    out = {
        "scans": W,
        "planes": G,
        "planes_padded": Gp,
        "planes_per_shard": Gp // n,
        "mesh_devices": n,
        "iters_replicated": int(res0.iters),
        "iters_sharded": int(res1.iters),
        "residual_replicated": r0,
        "residual_sharded": r1,
        "residual_rel_diff": abs(r0 - r1) / abs(r0),
        "max_abs_dR": dR,
        "max_abs_dp": dp,
        "psum_payload_bytes_per_iter": payload,
        "ring_bytes_per_link_per_iter": int(payload * ring),
        "per_shard_hessian_flops_per_iter": flops_shard,
        "note": "virtual 8-device CPU mesh: validates the SPMD partition "
                "+ collective pattern and bitwise-level equality, not "
                "wall-clock (devices share 4 cores).",
    }
    print(json.dumps(out, indent=2))
    with open("artifacts/shard_realworld.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
