"""Loop closure on the W=1200 multi-loop city grid.

artifacts/hba_city.json documents the capability gap this closes: on a
city-grid route where every intersection is revisited, cumulative drift
exceeds the voxel size, voxel association never forms the revisit
constraints, and NO solver configuration (flat, re-associated flat,
hierarchy, recursive hierarchy, c2f top) recovers the initial 0.30 m
translation accuracy — the best reaches 0.73 m.

This demo runs pipelines/loopclose.py (scan-context retrieval ->
registration verification -> PCM) on the same scene and feeds the edges
to the same solvers.  Produces artifacts/loopclose_city.json.

Run: python scripts/loopclose_city_demo.py [W]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.config import SolverConfig, VoxelConfig  # noqa: E402
from balm_tpu.ops import factors as Fmod, lie  # noqa: E402
from balm_tpu.pipelines import hierarchical, loopclose as LC  # noqa: E402
from balm_tpu.solver import lm  # noqa: E402
from balm_tpu.utils import metrics  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402

from hba_city_demo import make_city, perturb_cumulative  # noqa: E402


def main(W=1200):
    R_gt, p_gt, scans = make_city(W, seed=1)
    R0, p0 = perturb_cumulative(R_gt, p_gt, seed=2)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))

    def rsme(R, p):
        r, t = metrics.pose_rsme(
            *lie.gauge_fix(jnp.asarray(R), jnp.asarray(p)), Rg, pg)
        return [float(r) * 57.3, float(t)]

    result = {"W": W, "initial_rsme": rsme(R0, p0)}
    print(f"init {result['initial_rsme']}", flush=True)

    t0 = time.perf_counter()
    edges, info = LC.detect(scans, R0, p0, LC.LoopConfig(), verbose=True)
    t_detect = time.perf_counter() - t0
    ne = 0 if edges is None else len(np.asarray(edges.i))
    # edge accuracy vs gt
    errs = []
    if edges is not None:
        for k in range(ne):
            a, b = int(edges.i[k]), int(edges.j[k])
            Zr_gt = R_gt[a].T @ R_gt[b]
            Zp_gt = R_gt[a].T @ (p_gt[b] - p_gt[a])
            ang = np.arccos(np.clip(
                (np.trace(Zr_gt.T @ np.asarray(edges.Zr)[k]) - 1) / 2,
                -1, 1))
            errs.append([float(np.rad2deg(ang)),
                         float(np.linalg.norm(
                             np.asarray(edges.Zp)[k] - Zp_gt))])
    result["detect"] = {
        "total_s": round(t_detect, 1), "n_edges": ne,
        "n_queries": info["n_queries"], "n_scored": info["n_scored"],
        "n_verified": info["n_verified"],
        "n_drift_rejected": info.get("n_drift_rejected", 0),
        "n_pcm_rejected": info.get("n_pcm_rejected", 0),
        "edge_err_deg_m": errs,
    }
    worst = max((e for e in errs), key=lambda e: e[1], default=[0, 0])
    print(f"detect: {ne} edges in {t_detect:.1f}s "
          f"(worst err {worst[0]:.2f} deg {worst[1]:.3f} m)", flush=True)

    out_path = (pathlib.Path(__file__).resolve().parents[1] / "artifacts"
                / "loopclose_city.json")

    def save():
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=2)

    save()
    if edges is None:
        return

    vcfg = VoxelConfig(voxel_size=1.0)

    # --- the recommended flow: detect -> pose-graph optimize -> BA ---
    # close_loops applies the production PGO treatment: loop edges at
    # x edge_weight strength under a Huber kernel sized to the
    # verification accuracy — the robust cap on the edge-error TAIL is
    # what keeps the chain kink-free (see the ablation in the artifact).
    # Detection already ran above (edge-accuracy stats); pass it through
    # so this block times the pose-graph stage alone.
    t0 = time.perf_counter()
    Rp, pp, _, cinfo = LC.close_loops(scans, R0, p0, LC.LoopConfig(),
                                      edges=edges, detect_info=info)
    result["pgo"] = {
        "total_s": round(time.perf_counter() - t0, 1),
        "rsme_deg_m": rsme(Rp, pp), **cinfo["pgo"],
    }
    print("pgo", result["pgo"], flush=True)
    save()

    # PGO -> flat dense BA (the reference-style solve, now in-basin)
    t0 = time.perf_counter()
    vres = grid.voxelize(list(scans), Rp, pp, vcfg, dtype=np.float64)
    f = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    scfg = SolverConfig(max_iters=30, u_init=0.01, min_planes_per_pose=1)
    res = lm.damping_iter(jnp.asarray(Rp), jnp.asarray(pp), f, scfg)
    result["pgo_flat"] = {
        "total_s": round(time.perf_counter() - t0, 1),
        "rsme_deg_m": rsme(np.asarray(res.R), np.asarray(res.p)),
        "planes": int(vres.num_planes),
    }
    print("pgo_flat", result["pgo_flat"], flush=True)
    save()

    # PGO -> hierarchical (the scalable path)
    t0 = time.perf_counter()
    hcfg = hierarchical.HierarchicalConfig(
        block=16, stride=12, cycles=3, polish=False,
        voxel=VoxelConfig(voxel_size=1.0),
        top_voxel=VoxelConfig(voxel_size=1.0),
    )
    R1, p1, hinfo = hierarchical.run(scans, Rp, pp, hcfg)
    result["pgo_hier"] = {
        "total_s": round(time.perf_counter() - t0, 1),
        "rsme_deg_m": rsme(R1, p1),
        "cycles_reverted": hinfo.get("cycles_reverted", 0),
    }
    print("pgo_hier", result["pgo_hier"], flush=True)
    save()

    # --- comparison: edges fed straight into the solvers (no PGO) ---
    # lift-based hierarchy (works when bottom blocks are locally
    # healthy; street-aligned blocks bake sliding error into the lift)
    t0 = time.perf_counter()
    hcfg = hierarchical.HierarchicalConfig(
        block=16, stride=12, cycles=3, polish=False,
        voxel=VoxelConfig(voxel_size=1.0),
        top_voxel=VoxelConfig(voxel_size=1.0),
    )
    R1, p1, hinfo = hierarchical.run(scans, R0, p0, hcfg, scan_edges=edges)
    result["hier_loop_lift"] = {
        "total_s": round(time.perf_counter() - t0, 1),
        "rsme_deg_m": rsme(R1, p1),
        "n_lifted_edges": hinfo.get("n_lifted_edges", 0),
        "cycles_reverted": hinfo.get("cycles_reverted", 0),
    }
    print("hier_loop_lift", result["hier_loop_lift"], flush=True)
    save()

    # flat dense + loop edges from the RAW init (documented failure: at
    # city-scale drift the edge-satisfying step leaves the plane basin)
    t0 = time.perf_counter()
    vres = grid.voxelize(list(scans), R0, p0, vcfg, dtype=np.float64)
    f = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    res = lm.damping_iter(jnp.asarray(R0), jnp.asarray(p0), f, scfg,
                          edges=edges)
    result["flat_loop_noPGO"] = {
        "total_s": round(time.perf_counter() - t0, 1),
        "rsme_deg_m": rsme(np.asarray(res.R), np.asarray(res.p)),
        "planes": int(vres.num_planes),
    }
    print("flat_loop_noPGO", result["flat_loop_noPGO"], flush=True)
    save()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1200)
