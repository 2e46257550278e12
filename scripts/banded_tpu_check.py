"""Smoke + quality check of the banded direct solver on the real TPU.

Corridor at W (default 512): association at init poses, banded windowed
LM, report cost trajectory vs the f64 host cost at ground truth, and
fetch-synced wall time.  Run: python scripts/banded_tpu_check.py [W]
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

import jax

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from balm_tpu.config import SolverConfig, VoxelConfig
from balm_tpu.ops import factors as Fmod
from balm_tpu.ops import factors_windowed as FW
from balm_tpu.solver import large as large_mod
from balm_tpu.utils import sync
from balm_tpu.voxel import grid
from hba_demo import make_corridor
from hba_tpu_large import host_cost, rsme, rpe
from tests.test_hierarchical import perturb_drift


def main(W=512, max_iters=40):
    print("device:", jax.devices()[0], flush=True)
    R_gt, p_gt, scans = make_corridor(W, seed=1, pts_per=60)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=2)
    vcfg = VoxelConfig(min_observers=2)
    t0 = time.perf_counter()
    vres = grid.voxelize(scans, R0, p0, vcfg, dtype=np.float64)
    t_assoc = time.perf_counter() - t0
    fr = Fmod.recenter_bodies(vres.factors).astype(jnp.float32)
    wf = jax.tree_util.tree_map(jnp.asarray, FW.from_dense(fr))
    print(f"planes {vres.num_planes} span {wf.span} assoc {t_assoc:.2f}s",
          flush=True)
    scfg = SolverConfig(max_iters=max_iters, u_init=0.01)
    Rj = jnp.asarray(R0, jnp.float32)
    pj = jnp.asarray(p0, jnp.float32)

    def run(Rin):
        return large_mod.damping_iter_large(Rin, pj, wf, scfg,
                                            linear_solver="banded")

    t0 = time.perf_counter()
    res = run(Rj)
    sync.fetch_scalar(res.residual)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = run(Rj)
    sync.fetch_scalar(res.residual)
    t_solve = time.perf_counter() - t0
    Rf = np.asarray(res.R, np.float64)
    pf = np.asarray(res.p, np.float64)
    n = int(res.iters)
    out = {
        "device": str(jax.devices()[0]), "W": W,
        "planes": int(vres.num_planes), "span": int(wf.span),
        "assoc_s": round(t_assoc, 2),
        "compile_s": round(t_compile, 1), "solve_s": round(t_solve, 3),
        "iters": n,
        "accepts": int(np.nansum(np.asarray(res.trace_accept)[:n])),
        "res_first": float(res.trace_res1[0]),
        "res_final": float(res.residual),
        "cost_init": host_cost(vres.factors, R0, p0),
        "cost_gt": host_cost(vres.factors, R_gt, p_gt),
        "cost_final": host_cost(vres.factors, Rf, pf),
        "init_rsme": rsme(R0, p0, R_gt, p_gt),
        "rsme": rsme(Rf, pf, R_gt, p_gt),
        "init_rpe10": rpe(R0, p0, R_gt, p_gt),
        "rpe10": rpe(Rf, pf, R_gt, p_gt),
    }
    out["cost_over_gt"] = out["cost_final"] / out["cost_gt"]
    print(json.dumps(out, indent=1), flush=True)
    with open(ROOT / "artifacts" / f"banded_check_w{W}.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512,
         int(sys.argv[2]) if len(sys.argv) > 2 else 40)
