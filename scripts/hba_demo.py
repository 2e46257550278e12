"""Hierarchical-BA scale demo: 400-pose trajectory (2.3x the reference's
W=177 ceiling), hierarchical block BA vs flat dense BA.

Produces artifacts/hba_scale.json.  Run: python scripts/hba_demo.py [W]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

if __name__ == "__main__":
    # hierarchical runs many small host-driven solves; eager dispatch
    # through the tunneled TPU costs ~0.3 s per op (axon overrides
    # JAX_PLATFORMS, so force CPU here)
    jax.config.update("jax_platforms", "cpu")
    # the f64 solve path needs x64 — without it jnp.asarray silently
    # truncates the voxelizer's f64 moments to f32 (uncentered!), which
    # is exactly the catastrophic-cancellation mode the fast path guards
    # against; round-1's hierarchical numbers were taken in that mode
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.config import SolverConfig, VoxelConfig  # noqa: E402
from balm_tpu.ops import factors as Fmod, lie  # noqa: E402
from balm_tpu.pipelines import hierarchical  # noqa: E402
from balm_tpu.solver import lm  # noqa: E402
from balm_tpu.utils import metrics  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402


def make_corridor(W, seed=0, pts_per=80):
    """Trajectory down a long corridor of planes."""
    rng = np.random.default_rng(seed)
    R = np.zeros((W, 3, 3))
    p = np.zeros((W, 3))
    R[0] = np.eye(3)
    for i in range(1, W):
        dw = rng.normal(0, 0.008, 3)
        R[i] = R[i - 1] @ np.array(lie.so3_exp(jnp.asarray(dw)))
        p[i] = p[i - 1] + np.array([0.15, 0, 0]) + rng.normal(0, 0.01, 3)

    length = 0.15 * W + 4
    n_planes = int(length) * 2 + 20
    centers = np.stack([
        rng.uniform(-2, length, n_planes),
        rng.choice([-1.5, 1.5], n_planes) + rng.uniform(-0.2, 0.2, n_planes),
        rng.uniform(-1, 1, n_planes),
    ], -1)
    centers = np.floor(centers) + 0.5
    axes = rng.integers(0, 3, n_planes)

    scans = []
    for w in range(W):
        pts = []
        for g in range(n_planes):
            # visibility window: only nearby planes are observed
            if abs(centers[g, 0] - p[w, 0]) > 4.0:
                continue
            uv = rng.uniform(-0.45, 0.45, size=(pts_per, 2))
            th = rng.normal(0, 0.004, size=(pts_per, 1))
            local = np.concatenate([uv, th], -1)
            perm = np.roll(np.arange(3), axes[g] + 1)
            world = local[:, perm] + centers[g]
            pts.append((world - p[w]) @ R[w])
        scans.append(np.concatenate(pts) if pts else np.zeros((0, 3)))
    return R, p, scans


def main(W=400):
    from tests.test_hierarchical import perturb_drift

    R_gt, p_gt, scans = make_corridor(W, seed=1)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=2, rot_deg=0.5, trans=0.04)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    n_pts = int(sum(len(s) for s in scans))
    print(f"W={W}, points={n_pts}", flush=True)

    # flat dense solve
    vcfg = VoxelConfig(voxel_size=1.0)
    t0 = time.perf_counter()
    vres = grid.voxelize(list(scans), R0, p0, vcfg, dtype=np.float64)
    f32 = Fmod.recenter_bodies(vres.factors).astype("float32")
    scfg = SolverConfig(max_iters=10, u_init=0.01, min_planes_per_pose=1)
    out = lm.damping_iter(
        jnp.asarray(R0, "float32"), jnp.asarray(p0, "float32"), f32, scfg,
        centered=True,
    )
    out.R.block_until_ready()
    t_flat = time.perf_counter() - t0
    rot_f, tra_f = metrics.pose_rsme(
        out.R.astype(jnp.float64), out.p.astype(jnp.float64), Rg, pg
    )
    print(f"flat: {t_flat:.1f}s, {vres.num_planes} planes, "
          f"RSME {float(rot_f)*57.3:.4f} deg {float(tra_f):.4f} m", flush=True)

    # hierarchical (blocks + anchor solve only)
    hcfg = hierarchical.HierarchicalConfig(
        block=20, stride=16, polish=False,
        voxel=vcfg, top_voxel=VoxelConfig(voxel_size=1.0, min_observers=2),
    )  # library defaults: 3 cycles, overlap edges, 30 top iters
    t0 = time.perf_counter()
    Rh, ph, info = hierarchical.run(scans, R0, p0, hcfg)
    t_h = time.perf_counter() - t0
    rot_h, tra_h = metrics.pose_rsme(jnp.asarray(Rh), jnp.asarray(ph), Rg, pg)
    print(f"hier: {t_h:.1f}s, {info['n_blocks']} blocks, "
          f"RSME {float(rot_h)*57.3:.4f} deg {float(tra_h):.4f} m", flush=True)

    # hierarchical + short flat polish (the production HBA structure)
    hcfg_p = hierarchical.HierarchicalConfig(
        block=20, stride=16, polish=True,
        polish_solver=SolverConfig(max_iters=5, u_init=0.01,
                                   min_planes_per_pose=1),
        voxel=vcfg, top_voxel=VoxelConfig(voxel_size=1.0, min_observers=2),
    )
    t0 = time.perf_counter()
    Rhp, php, info_p = hierarchical.run(scans, R0, p0, hcfg_p)
    t_hp = time.perf_counter() - t0
    rot_hp, tra_hp = metrics.pose_rsme(
        jnp.asarray(Rhp), jnp.asarray(php), Rg, pg
    )
    print(f"hier+polish: {t_hp:.1f}s, "
          f"RSME {float(rot_hp)*57.3:.4f} deg {float(tra_hp):.4f} m",
          flush=True)

    rot_0, tra_0 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg
    )
    result = {
        "W": W,
        "points": n_pts,
        "initial_rsme": [float(rot_0) * 57.3, float(tra_0)],
        "flat": {
            "total_s": round(t_flat, 1),
            "planes": int(vres.num_planes),
            "rsme_deg_m": [float(rot_f) * 57.3, float(tra_f)],
        },
        "hierarchical": {
            "total_s": round(t_h, 1),
            "n_blocks": info["n_blocks"],
            "rsme_deg_m": [float(rot_h) * 57.3, float(tra_h)],
        },
        "hierarchical_polished": {
            "total_s": round(t_hp, 1),
            "rsme_deg_m": [float(rot_hp) * 57.3, float(tra_hp)],
        },
    }
    outp = pathlib.Path("artifacts")
    outp.mkdir(exist_ok=True)
    with open(outp / "hba_scale.json", "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
