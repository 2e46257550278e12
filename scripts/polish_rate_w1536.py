"""Descent-rate probe: chunked banded polish with consensus edges at
W=1536, common cost tracked per 40-iteration chunk (round-5: is the
polish iteration-starved by the ~60 s tunnel dispatch ceiling, or is
the LM crawling?).

Run: python scripts/polish_rate_w1536.py [W] [chunks]
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
from hba_tpu_large import host_cost, rpe, rsme  # noqa: E402
from block_quality_probe import consec_err  # noqa: E402


def main(W=1536, chunks=8):
    from tests.test_hierarchical import perturb_drift

    R_gt, p_gt, scans = make_corridor(W, seed=1, pts_per=60)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=2)
    vcfg = VoxelConfig(min_observers=2)
    vres0 = grid.voxelize(scans, R0, p0, vcfg, dtype=np.float64)
    cgt = host_cost(vres0.factors, R_gt, p_gt)
    out = {"W": W, "cost_gt": cgt,
           "cost_init": host_cost(vres0.factors, R0, p0), "chunks": []}
    print(f"W={W} gt {cgt:.1f} init {out['cost_init']:.1f}", flush=True)

    Rh, ph, info = hierarchical.run_device_batched(
        scans, np.array(R0), np.array(p0), block=16, stride=8, cycles=1,
        voxel=vcfg, block_caps=(1 << 9, 1 << 11, 1 << 13), Gcap_block=256,
        cs_cap_block=1 << 15, top=False)
    idxb, Rrel, prel = info.pop("block_rel")
    edges = hierarchical.consensus_scan_edges(
        idxb, Rrel, prel, weight_scale=1e-3)
    ew = {"w_tr_med": float(np.median(edges.w_tr)),
          "w_rot_med": float(np.median(edges.w_rot))}
    out["edge_weights"] = ew
    out["composed"] = {"cost": host_cost(vres0.factors, Rh, ph),
                       "rsme": rsme(Rh, ph, R_gt, p_gt),
                       "consec": consec_err(Rh, ph, R_gt, p_gt)}
    print("composed:", out["composed"], ew, flush=True)

    edges = jax.tree_util.tree_map(
        lambda x: (jnp.asarray(x, jnp.float32)
                   if np.asarray(x).dtype.kind == "f" else x), edges)
    vres = grid.voxelize(scans, Rh, ph, vcfg, dtype=np.float64)
    fr = Fmod.recenter_bodies(vres.factors).astype(jnp.float32)
    wf = jax.tree_util.tree_map(jnp.asarray, FW.from_dense(fr))
    Rc = jnp.asarray(Rh, jnp.float32)
    pc = jnp.asarray(ph, jnp.float32)
    for ch in range(chunks):
        t0 = time.perf_counter()
        res = large_mod.damping_iter_large(
            Rc, pc, wf, SolverConfig(max_iters=40, u_init=0.01),
            linear_solver="banded", edges=edges)
        sync.fetch_scalar(res.residual)
        Rc, pc = res.R, res.p
        Rn = np.asarray(Rc, np.float64)
        pn = np.asarray(pc, np.float64)
        rec = {"chunk": ch, "iters": int(res.iters),
               "wall_s": round(time.perf_counter() - t0, 1),
               "residual": float(res.residual),
               "cost": host_cost(vres0.factors, Rn, pn),
               "rsme": rsme(Rn, pn, R_gt, p_gt),
               "rpe10": rpe(Rn, pn, R_gt, p_gt)}
        out["chunks"].append(rec)
        print(rec, flush=True)
        if rec["iters"] < 40:
            break

    with open(ROOT / "artifacts" / f"polish_rate_w{W}.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1536,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
