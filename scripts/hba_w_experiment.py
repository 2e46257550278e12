"""Large-W corridor refinement-schedule experiment (round-5).

At W=1536 the two one-shot strategies both miss the <=1.1x gt-cost bar:
flat banded bends into a 1.62x local minimum (exact steps, wrong basin)
and the consensus hierarchy lands globally right but locally jittery
(common cost 9x: a 0.1-0.2 deg relative rotation across a 9 m plane
span costs 20x the noise floor).  This experiment measures the obvious
iterative schedule:

  hier consensus (cycles=C) -> repeat: re-associate at current poses,
  banded solve with ANNEALED consensus edges (weights x a, a descending)

recording the common init-pose f64 cost, RSME, RPE after every stage.

Run: python scripts/hba_w_experiment.py [W] [cycles]
Writes artifacts/hba_w{W}_schedule.json.
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
from balm_tpu.pipelines import hierarchical  # noqa: E402
from balm_tpu.solver import large as large_mod  # noqa: E402
from balm_tpu.utils import sync  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402

from hba_demo import make_corridor  # noqa: E402
from hba_tpu_large import host_cost, rsme, rpe  # noqa: E402


def main(W=1536, cycles=2):
    from tests.test_hierarchical import perturb_drift

    R_gt, p_gt, scans = make_corridor(W, seed=1, pts_per=60)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=2)
    vcfg = VoxelConfig(min_observers=2)
    vres0 = grid.voxelize(scans, R0, p0, vcfg, dtype=np.float64)
    cost_init = host_cost(vres0.factors, R0, p0)
    cost_gt = host_cost(vres0.factors, R_gt, p_gt)
    out = {"W": W, "cycles": cycles, "cost_init": cost_init,
           "cost_gt": cost_gt, "stages": []}
    print(f"W={W} cost_init {cost_init:.1f} cost_gt {cost_gt:.1f}",
          flush=True)

    t0 = time.perf_counter()
    Rh, ph, hinfo = hierarchical.run_batched_consensus(
        scans, np.array(R0), np.array(p0), block=16, cycles=cycles,
        voxel=vcfg, edge_weight_scale=1e-3,
        block_caps=(1 << 9, 1 << 11, 1 << 13), Gcap_block=256,
        cs_cap_block=1 << 15,
        polish_solver=SolverConfig(max_iters=30, u_init=0.01))
    edges0 = hinfo.pop("edges", None)
    stage = {"name": f"hier_consensus_c{cycles}",
             "wall_s": round(time.perf_counter() - t0, 1),
             "cost": host_cost(vres0.factors, Rh, ph),
             "rsme": rsme(Rh, ph, R_gt, p_gt),
             "rpe10": rpe(Rh, ph, R_gt, p_gt)}
    out["stages"].append(stage)
    print(stage, flush=True)

    Rc, pc = Rh, ph
    for anneal, iters in ((1.0, 40), (0.3, 40), (0.1, 40), (0.0, 40)):
        t0 = time.perf_counter()
        ed = None
        if edges0 is not None and anneal > 0:
            ed = edges0._replace(w_rot=edges0.w_rot * anneal,
                                 w_tr=edges0.w_tr * anneal)
            ed = jax.tree_util.tree_map(
                lambda x: (jnp.asarray(x, jnp.float32)
                           if np.asarray(x).dtype.kind == "f" else x), ed)
        vres = grid.voxelize(scans, Rc, pc, vcfg, dtype=np.float64)
        fr = Fmod.recenter_bodies(vres.factors).astype(jnp.float32)
        wf = jax.tree_util.tree_map(jnp.asarray, FW.from_dense(fr))
        res = large_mod.damping_iter_large(
            jnp.asarray(Rc, jnp.float32), jnp.asarray(pc, jnp.float32),
            wf, SolverConfig(max_iters=iters, u_init=0.01),
            linear_solver="banded", edges=ed)
        sync.fetch_scalar(res.residual)
        Rc = np.asarray(res.R, np.float64)
        pc = np.asarray(res.p, np.float64)
        stage = {"name": f"refine_a{anneal}",
                 "wall_s": round(time.perf_counter() - t0, 1),
                 "iters": int(res.iters),
                 "cost": host_cost(vres0.factors, Rc, pc),
                 "cost_own": host_cost(vres.factors, Rc, pc),
                 "cost_gt_own": host_cost(vres.factors, R_gt, p_gt),
                 "rsme": rsme(Rc, pc, R_gt, p_gt),
                 "rpe10": rpe(Rc, pc, R_gt, p_gt)}
        out["stages"].append(stage)
        print(stage, flush=True)

    # final: exact banded LM on the COMMON init-pose factor set (the
    # scoring set) from the schedule's basin — at W=1024 this set solved
    # to 1.0065x gt from the init directly; from the corrected basin it
    # should do the same at any W
    t0 = time.perf_counter()
    fr0 = Fmod.recenter_bodies(vres0.factors).astype(jnp.float32)
    wf0 = jax.tree_util.tree_map(jnp.asarray, FW.from_dense(fr0))
    res = large_mod.damping_iter_large(
        jnp.asarray(Rc, jnp.float32), jnp.asarray(pc, jnp.float32),
        wf0, SolverConfig(max_iters=40, u_init=0.01),
        linear_solver="banded")
    sync.fetch_scalar(res.residual)
    Rc2 = np.asarray(res.R, np.float64)
    pc2 = np.asarray(res.p, np.float64)
    stage = {"name": "final_common_set",
             "wall_s": round(time.perf_counter() - t0, 1),
             "iters": int(res.iters),
             "cost": host_cost(vres0.factors, Rc2, pc2),
             "rsme": rsme(Rc2, pc2, R_gt, p_gt),
             "rpe10": rpe(Rc2, pc2, R_gt, p_gt)}
    out["stages"].append(stage)
    print(stage, flush=True)

    np.savez(ROOT / "artifacts" / f"hba_w{W}_schedule_poses.npz",
             R=Rc, p=pc, R_common=Rc2, p_common=pc2)
    out["final_over_gt_cost"] = out["stages"][-1]["cost"] / cost_gt
    with open(ROOT / "artifacts" / f"hba_w{W}_schedule.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1536,
         int(sys.argv[2]) if len(sys.argv) > 2 else 2)
