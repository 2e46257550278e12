"""Probe: is the device-batched block stage accurate enough to source
consensus edges?  (round-5 large-W investigation)

The consensus edges inherit the intra-block relative-pose accuracy of
the batched block solves; the W=1536 runs show ~1 deg / 0.2-0.4 m of
consecutive-scan error surviving every downstream stage, which is what
keeps the common-set cost ~9x ground truth.  This measures, at W given:

  1. consecutive relpose error (rot deg / trans m RMS) of the INIT;
  2. ... of the device-batched block-composed trajectory
     (run_device_batched top=False, the consensus-edge source);
  3. ... of a HOST-solved control: the same 16-scan blocks associated
     with grid.voxelize + solved with lm.damping_iter per block;
  4. ... of ground truth re-measured from noisy block solves composed
     the same way, to separate block-solve error from composition error.

Run: python scripts/block_quality_probe.py [W]
"""

import json
import pathlib
import sys

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
from balm_tpu.pipelines import hierarchical  # noqa: E402
from balm_tpu.solver import lm  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402

from hba_demo import make_corridor  # noqa: E402


def consec_err(R, p, Rg, pg):
    """RMS consecutive relative-pose error [rot deg, trans m]."""
    R = np.asarray(R, np.float64)
    p = np.asarray(p, np.float64)
    rots, trs = [], []
    for i in range(len(R) - 1):
        Re = R[i].T @ R[i + 1]
        Rr = Rg[i].T @ Rg[i + 1]
        ang = np.arccos(np.clip((np.trace(Re.T @ Rr) - 1) / 2, -1, 1))
        pe = R[i].T @ (p[i + 1] - p[i])
        pr = Rg[i].T @ (pg[i + 1] - pg[i])
        rots.append(ang)
        trs.append(np.linalg.norm(pe - pr))
    return [float(np.sqrt(np.mean(np.square(rots)))) * 57.2958,
            float(np.sqrt(np.mean(np.square(trs))))]


def main(W=256):
    from tests.test_hierarchical import perturb_drift

    R_gt, p_gt, scans = make_corridor(W, seed=1, pts_per=60)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=2)
    vcfg = VoxelConfig(min_observers=2)
    out = {"W": W, "consec_init": consec_err(R0, p0, R_gt, p_gt)}
    print("init:", out["consec_init"], flush=True)

    Rh, ph, info = hierarchical.run_device_batched(
        scans, np.array(R0), np.array(p0), block=16, stride=8, cycles=1,
        voxel=vcfg, block_caps=(1 << 9, 1 << 11, 1 << 13),
        Gcap_block=256, cs_cap_block=1 << 15, top=False)
    out["consec_device_blocks"] = consec_err(Rh, ph, R_gt, p_gt)
    out["overflow"] = bool(np.any(info.get("overflow", False)))
    print("device blocks:", out["consec_device_blocks"],
          "overflow:", out["overflow"], flush=True)

    # host control: same blocks, host association + host packed solve
    blk, stride = 16, 8
    starts = list(range(0, max(W - blk, 0) + 1, stride))
    if starts[-1] != W - blk:
        starts.append(W - blk)
    errs = []
    for s in starts[: min(len(starts), 24)]:
        idx = np.arange(s, s + blk)
        sub = [scans[i] for i in idx]
        Rb, pb = R0[idx], p0[idx]
        vres = grid.voxelize(sub, Rb, pb, vcfg, dtype=np.float64)
        if vres.num_planes < 3:
            continue
        fr = Fmod.recenter_bodies(vres.factors).astype(jnp.float32)
        fr = jax.tree_util.tree_map(jnp.asarray, fr)
        res = lm.damping_iter(
            jnp.asarray(Rb, jnp.float32), jnp.asarray(pb, jnp.float32),
            fr, SolverConfig(max_iters=12, u_init=0.01,
                             min_planes_per_pose=0, gauge_fix=False),
            centered=True)
        errs.append(consec_err(np.asarray(res.R), np.asarray(res.p),
                               R_gt[idx], p_gt[idx]))
    errs = np.array(errs)
    out["consec_host_blocks"] = [float(np.sqrt(np.mean(errs[:, 0] ** 2))),
                                 float(np.sqrt(np.mean(errs[:, 1] ** 2)))]
    out["host_blocks_measured"] = int(len(errs))
    print("host blocks:", out["consec_host_blocks"], flush=True)

    with open(ROOT / "artifacts" / f"block_quality_w{W}.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
