"""Deep-recursion HBA demo: force a 3-level hierarchy (recurse_at far
below the anchor count) and measure what super-scan feature
re-extraction buys at the recursive levels.

Produces artifacts/hba_deep.json.  Run: python scripts/hba_deep.py [W]
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

import jax.numpy as jnp  # noqa: E402

from balm_tpu.config import VoxelConfig  # noqa: E402
from balm_tpu.ops import lie  # noqa: E402
from balm_tpu.pipelines import hierarchical  # noqa: E402
from balm_tpu.utils import metrics  # noqa: E402
from hba_demo import make_corridor  # noqa: E402


def main(W=800):
    from tests.test_hierarchical import perturb_drift

    R_gt, p_gt, scans = make_corridor(W, seed=1)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=2, rot_deg=0.5, trans=0.04)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    n_pts = int(sum(len(s) for s in scans))
    rot0, tra0 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg)
    print(f"W={W}, points={n_pts}, init {float(rot0)*57.3:.3f} deg "
          f"{float(tra0):.3f} m", flush=True)

    from balm_tpu.config import VoxelConfig as _VC
    from balm_tpu.ops import factors as _F
    from balm_tpu.voxel import grid as _grid

    def global_cost(Rc, pc):
        """Full-problem re-associated cost — the honest discriminator on
        this scene: the corridor has near-zero-cost bending modes, so
        equal-cost solutions scatter in pose RSME (see test_corridor)."""
        vres = _grid.voxelize(list(scans), Rc, pc, _VC(voxel_size=1.0),
                              dtype=np.float64)
        fj = _F.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
        T = lie.pose_matrix(jnp.asarray(Rc), jnp.asarray(pc))
        return float(_F.residual_only(T, fj))

    result = {"W": W, "points": n_pts,
              "initial_rsme": [float(rot0) * 57.3, float(tra0)],
              "cost_at_gt": round(global_cost(R_gt, p_gt), 3),
              "cost_at_init": round(global_cost(
                  np.asarray(R0), np.asarray(p0)), 3)}
    vcfg = VoxelConfig(voxel_size=1.0)
    for mode in ("off", "recursive"):
        cfg = hierarchical.HierarchicalConfig(
            block=20, stride=16, polish=False, cycles=1,
            recurse_at=12,        # anchors ~ W/16 >> 12: forces level 3
            refeature_supers=mode,
            voxel=vcfg,
            top_voxel=VoxelConfig(voxel_size=1.0, min_observers=2),
        )
        t0 = time.perf_counter()
        Rh, ph, info = hierarchical.run(scans, R0, p0, cfg)
        dt = time.perf_counter() - t0
        rot, tra = metrics.pose_rsme(jnp.asarray(Rh), jnp.asarray(ph),
                                     Rg, pg)
        levels = 1
        sub = info
        while "recursed" in sub:
            levels += 1
            sub = sub["recursed"]
        cost = global_cost(Rh, ph)
        result[f"refeature_{mode}"] = {
            # NOTE: modes share one process; the second mode benefits
            # from warm jit caches, so total_s is not mode-comparable
            "total_s": round(dt, 1),
            "levels": levels,
            "n_blocks": info["n_blocks"],
            "top_planes_leaf_level": info.get("top_planes", 0),
            "global_cost": round(cost, 3),
            "rsme_deg_m": [float(rot) * 57.3, float(tra)],
        }
        print(f"refeature={mode}: {dt:.1f}s, levels={levels}, "
              f"cost {cost:.3f}, RSME {float(rot)*57.3:.4f} deg "
              f"{float(tra):.4f} m", flush=True)

    outp = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    outp.mkdir(exist_ok=True)
    with open(outp / "hba_deep.json", "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 800)
