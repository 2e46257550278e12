"""Hierarchical BA on the REAL 177-scan dataset vs the flat solve.

The HBA demos elsewhere are synthetic (corridor / loop / city grid);
this grounds the hierarchy on the reference's own benchmark_realworld
data: same scans, same initial odometry poses, flat dense LM (the
parity-verified optimum, artifacts/parity_realworld.json) vs
`pipelines/hierarchical.run` with NO flat polish pass.  Comparison is
(a) the re-associated full-problem cluster cost at each solution and
(b) ATE between the two refined trajectories (gauge-aligned).

Run: python scripts/hba_realworld.py [max_scans]
Writes artifacts/hba_realworld.json.
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

from balm_tpu.config import SolverConfig  # noqa: E402
from balm_tpu.ops import factors as Fmod, lie  # noqa: E402
from balm_tpu.pipelines import hierarchical, realworld  # noqa: E402
from balm_tpu.solver import lm  # noqa: E402
from balm_tpu.utils import metrics  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402


def common_cost(scans, R, p, vcfg):
    """Full-problem cluster cost at the given poses (fresh association)."""
    vres = grid.voxelize(list(scans), np.asarray(R), np.asarray(p), vcfg,
                         dtype=np.float64)
    fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    T = lie.pose_matrix(jnp.asarray(R), jnp.asarray(p))
    return float(Fmod.residual_only(T, fj)), vres.num_planes


def main(max_scans=None):
    cfg = realworld.RealworldConfig(max_scans=max_scans)
    R0, p0, scans = realworld.load(cfg)
    W = len(scans)
    out = {"scans": W, "points": int(sum(len(s) for s in scans))}

    cost0, planes0 = common_cost(scans, R0, p0, cfg.voxel)
    out["initial"] = {"cost": cost0, "planes": planes0}
    print(f"W={W} initial cost {cost0:.3f} ({planes0} planes)", flush=True)

    # flat dense LM (the parity-verified reference-equivalent solve)
    t0 = time.perf_counter()
    vres = grid.voxelize(list(scans), R0, p0, cfg.voxel, dtype=np.float64)
    fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    flat = lm.damping_iter(jnp.asarray(R0), jnp.asarray(p0), fj, cfg.solver)
    flat.R.block_until_ready()
    t_flat = time.perf_counter() - t0
    cost_f, _ = common_cost(scans, flat.R, flat.p, cfg.voxel)
    out["flat"] = {"total_s": round(t_flat, 1), "cost": cost_f,
                   "iters": int(flat.iters)}
    print(f"flat: {t_flat:.1f}s cost {cost_f:.3f}", flush=True)

    # Hierarchy variants.  Expected shape of the result (and the honest
    # finding this artifact records): real keyframe data at W=177 is the
    # regime the FLAT solver exists for — the error lives in many-scan
    # co-observations that block decomposition discards, so hierarchy
    # alone plateaus above the flat optimum (unlike the drift-dominated
    # synthetic scenes where it wins).  polish=True (a short flat pass
    # from the hierarchy's output) recovers the optimum; larger blocks
    # close part of the gap at higher bottom-level cost.
    Rg, pg = lie.gauge_fix(flat.R, flat.p)
    variants = {
        "hierarchical": dict(block=20, stride=16, polish=False),
        "hierarchical_block40": dict(block=40, stride=32, polish=False),
        "hierarchical_polish": dict(block=20, stride=16, polish=True),
        # the alternating block/global-sweep design (VERDICT r2 #6): one
        # cycle of batched bottom blocks + anchor solve + a short guarded
        # GLOBAL sweep inside the cycle (scalable: span-compressed PCG
        # past W=512) — recovers the many-scan co-observation detail that
        # block decomposition discards, without the end-of-run polish
        "hierarchical_sweep": dict(block=32, stride=16, polish=False,
                                   cycles=1, batched_bottom=True,
                                   global_sweep=2, cycle_guard=False),
    }
    for name, kw in variants.items():
        hcfg = hierarchical.HierarchicalConfig(
            voxel=cfg.voxel, top_voxel=cfg.voxel,
            solver=SolverConfig(max_iters=10, u_init=0.01,
                                min_planes_per_pose=1), **kw)
        t0 = time.perf_counter()
        Rh, ph, info = hierarchical.run(scans, R0, p0, hcfg)
        t_h = time.perf_counter() - t0
        cost_h, _ = common_cost(scans, Rh, ph, cfg.voxel)
        rot, tra = metrics.pose_rsme(
            *lie.gauge_fix(jnp.asarray(Rh), jnp.asarray(ph)), Rg, pg)
        out[name] = {
            "total_s": round(t_h, 1), "cost": cost_h,
            "n_blocks": info["n_blocks"],
            "cycle_residuals": info.get("cycle_residuals"),
            "cycles_reverted": info.get("cycles_reverted", 0),
            "n_edges": info.get("n_edges"),
            "top_planes": info.get("top_planes"),
            "cost_vs_flat": cost_h / cost_f,
            "ate_vs_flat_deg_m": [float(rot) * 57.3, float(tra)]}
        print(f"{name}: {t_h:.1f}s cost {cost_h:.3f} "
              f"({cost_h/cost_f:.4f}x flat) ATE {float(rot)*57.3:.4f} deg "
              f"{float(tra):.5f} m", flush=True)

    path = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    with open(path / "hba_realworld.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote artifacts/hba_realworld.json", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else None)
