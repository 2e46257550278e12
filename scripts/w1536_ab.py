"""W=1536 flat-solver A/B: dense hybrid vs banded, from the same init.

Questions (round-5):
  A. Does the dense (packed hybrid) flat solve converge at W=1536 now
     that the LM false-convergence bug is fixed (commit 88a9014)?  The
     round-4 'stall at 338' artifact predates the fix.
  B. Is the banded flat solve's 214 (1.62x gt) a converged bent minimum
     or an iteration-starved state?  (chunks=6 -> up to 240 iters)

Run: python scripts/w1536_ab.py [mode: ab|dense|banded] [W]
Appends results to artifacts/w1536_flat_ab.json.
"""

import json
import pathlib
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.config import SolverConfig, VoxelConfig  # noqa: E402
from balm_tpu.ops import factors as Fmod  # noqa: E402
from balm_tpu.ops import factors_windowed as FW  # noqa: E402
from balm_tpu.solver import large as large_mod  # noqa: E402
from balm_tpu.solver import lm  # noqa: E402
from balm_tpu.utils import sync  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402

from hba_demo import make_corridor  # noqa: E402
from hba_tpu_large import host_cost, rpe, rsme  # noqa: E402


def main(mode="ab", W=1536):
    from tests.test_hierarchical import perturb_drift

    R_gt, p_gt, scans = make_corridor(W, seed=1, pts_per=60)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=2)
    vcfg = VoxelConfig(min_observers=2)
    vres0 = grid.voxelize(scans, R0, p0, vcfg, dtype=np.float64)
    cost_gt = host_cost(vres0.factors, R_gt, p_gt)
    out = {"W": W, "cost_init": host_cost(vres0.factors, R0, p0),
           "cost_gt": cost_gt, "runs": []}
    print(f"W={W} cost_gt {cost_gt:.2f}", flush=True)

    fr = Fmod.recenter_bodies(vres0.factors).astype(jnp.float32)
    frj = jax.tree_util.tree_map(jnp.asarray, fr)

    if mode in ("ab", "dense"):
        Rc, pc = jnp.asarray(R0, jnp.float32), jnp.asarray(p0, jnp.float32)
        t0 = time.perf_counter()
        tot = 0
        costs = []
        for _ in range(3):
            res = lm.damping_iter(
                Rc, pc, frj,
                SolverConfig(max_iters=40, u_init=0.01,
                             min_planes_per_pose=0),
                centered=True, backend="packed",
                linear_solver="cholesky_nofallback")
            sync.fetch_scalar(res.residual)
            tot += int(res.iters)
            Rc, pc = res.R, res.p
            Rn, pn = np.asarray(Rc, np.float64), np.asarray(pc, np.float64)
            costs.append(round(host_cost(vres0.factors, Rn, pn), 2))
            print("dense chunk:", costs[-1], flush=True)
            if int(res.iters) < 40:
                break
        r = {"kind": "dense_hybrid", "iters": tot,
             "wall_s": round(time.perf_counter() - t0, 1),
             "chunk_costs": costs, "cost": costs[-1],
             "over_gt": round(costs[-1] / cost_gt, 4),
             "rsme": rsme(Rn, pn, R_gt, p_gt),
             "rpe10": rpe(Rn, pn, R_gt, p_gt)}
        out["runs"].append(r)
        print(r, flush=True)

    if mode in ("ab", "banded"):
        wf = jax.tree_util.tree_map(jnp.asarray, FW.from_dense(fr))
        Rc, pc = jnp.asarray(R0, jnp.float32), jnp.asarray(p0, jnp.float32)
        t0 = time.perf_counter()
        tot = 0
        costs = []
        for _ in range(6):
            res = large_mod.damping_iter_large(
                Rc, pc, wf, SolverConfig(max_iters=40, u_init=0.01),
                linear_solver="banded")
            sync.fetch_scalar(res.residual)
            tot += int(res.iters)
            Rc, pc = res.R, res.p
            Rn, pn = np.asarray(Rc, np.float64), np.asarray(pc, np.float64)
            costs.append(round(host_cost(vres0.factors, Rn, pn), 2))
            print("banded chunk:", costs[-1], flush=True)
            if int(res.iters) < 40:
                break
        r = {"kind": "banded", "iters": tot,
             "wall_s": round(time.perf_counter() - t0, 1),
             "chunk_costs": costs, "cost": costs[-1],
             "over_gt": round(costs[-1] / cost_gt, 4),
             "rsme": rsme(Rn, pn, R_gt, p_gt),
             "rpe10": rpe(Rn, pn, R_gt, p_gt)}
        out["runs"].append(r)
        print(r, flush=True)

    path = ROOT / "artifacts" / "w1536_flat_ab.json"
    prev = json.loads(path.read_text())["runs"] if path.exists() else []
    out["runs"] = prev + out["runs"]
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ab",
         int(sys.argv[2]) if len(sys.argv) > 2 else 1536)
