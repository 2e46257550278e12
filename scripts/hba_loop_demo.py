"""Loop-closure HBA demo: a rectangular corridor circuit with CUMULATIVE
odometry-style drift.

Unlike the straight corridor (whose bending modes are cost-free, so
equal-cost solutions scatter in RSME), a closed circuit pins the long-
wavelength modes: when the trajectory revisits the start, voxel
association ties the two ends and pose RSME becomes a meaningful metric
again.  This is the scene where hierarchical BA + overlap edges +
super-scan re-extraction must prove themselves.

Produces artifacts/hba_loop.json.  Run: python scripts/hba_loop_demo.py [W]
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

from balm_tpu.config import SolverConfig, VoxelConfig  # noqa: E402
from balm_tpu.ops import factors as Fmod, lie  # noqa: E402
from balm_tpu.pipelines import hierarchical  # noqa: E402
from balm_tpu.solver import lm  # noqa: E402
from balm_tpu.utils import metrics  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402


def make_loop(W, side=18.0, seed=0, pts_per=70):
    """Square circuit of corridors; scans every ~4*side/W m."""
    rng = np.random.default_rng(seed)
    # trajectory: perimeter of a square, slight jitter
    per = 4 * side
    s = np.arange(W) / W * per
    p = np.zeros((W, 3))
    yaw = np.zeros(W)
    for i, si in enumerate(s):
        leg, t = int(si // side), si % side
        if leg == 0:
            p[i] = [t, 0, 0]; yaw[i] = 0
        elif leg == 1:
            p[i] = [side, t, 0]; yaw[i] = np.pi / 2
        elif leg == 2:
            p[i] = [side - t, side, 0]; yaw[i] = np.pi
        else:
            p[i] = [0, side - t, 0]; yaw[i] = -np.pi / 2
    p += rng.normal(0, 0.01, (W, 3))
    R = np.zeros((W, 3, 3))
    for i in range(W):
        c, sn = np.cos(yaw[i]), np.sin(yaw[i])
        R[i] = np.array([[c, -sn, 0], [sn, c, 0], [0, 0, 1]])

    # planes: walls flanking the perimeter (inner + outer) + floor tiles
    centers, axes = [], []
    step = 1.0
    for leg in range(4):
        for t in np.arange(0.5, side, step):
            for off in (-1.5, 1.5):
                if leg == 0:
                    centers.append([t, off, 0.5]); axes.append(1)
                elif leg == 1:
                    centers.append([side + off, t, 0.5]); axes.append(0)
                elif leg == 2:
                    centers.append([side - t, side + off, 0.5]); axes.append(1)
                else:
                    centers.append([off, side - t, 0.5]); axes.append(0)
            # floor tile on the path
            if leg == 0:
                centers.append([t, 0, -0.5]); axes.append(2)
            elif leg == 1:
                centers.append([side, t, -0.5]); axes.append(2)
            elif leg == 2:
                centers.append([side - t, side, -0.5]); axes.append(2)
            else:
                centers.append([0, side - t, -0.5]); axes.append(2)
            # cross-oriented patches (doorframes/pillars) every 3 m: the
            # wall tiles alone are coplanar along each leg, leaving
            # in-plane sliding cost-free (the corridor's flat valley);
            # along-leg normals pin that mode so RSME is meaningful
            if int(t) % 3 == 0:
                off = 1.2 if (int(t) // 3) % 2 == 0 else -1.2
                if leg == 0:
                    centers.append([t + 0.5, off, 0.5]); axes.append(0)
                elif leg == 1:
                    centers.append([side + off, t + 0.5, 0.5]); axes.append(1)
                elif leg == 2:
                    centers.append([side - t - 0.5, side + off, 0.5])
                    axes.append(0)
                else:
                    centers.append([off, side - t - 0.5, 0.5]); axes.append(1)
    centers = np.asarray(centers, float)
    axes = np.asarray(axes)

    scans = []
    for w in range(W):
        pts = []
        for g in range(len(centers)):
            if np.linalg.norm(centers[g][:2] - p[w][:2]) > 4.0:
                continue
            uv = rng.uniform(-0.45, 0.45, size=(pts_per, 2))
            th = rng.normal(0, 0.004, size=(pts_per, 1))
            local = np.concatenate([uv, th], -1)
            perm = np.roll(np.arange(3), axes[g] + 1)
            world = local[:, perm] + centers[g]
            pts.append((world - p[w]) @ R[w])
        scans.append(np.concatenate(pts) if pts else np.zeros((0, 3)))
    return R, p, scans


def perturb_cumulative(R, p, seed, rot_step_deg=0.06, trans_step=0.008):
    """Odometry-style drift: random-walk perturbation (grows with index,
    realistic loop-closure gap at the end)."""
    rng = np.random.default_rng(seed)
    W = len(R)
    dw = np.cumsum(rng.normal(0, rot_step_deg / 57.3, (W, 3)), axis=0)
    dt = np.cumsum(rng.normal(0, trans_step, (W, 3)), axis=0)
    Rn = np.einsum("wab,wbc->wac", np.array(lie.so3_exp(jnp.asarray(dw))), R)
    return Rn, p + dt


def main(W=400):
    R_gt, p_gt, scans = make_loop(W, seed=1)
    R0, p0 = perturb_cumulative(R_gt, p_gt, seed=2)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    n_pts = int(sum(len(s) for s in scans))
    rot0, tra0 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg)
    gap = float(np.linalg.norm(p0[-1] - p0[0] - (p_gt[-1] - p_gt[0])))
    print(f"W={W} pts={n_pts} init {float(rot0)*57.3:.3f} deg "
          f"{float(tra0):.3f} m, loop gap {gap:.3f} m", flush=True)

    vcfg = VoxelConfig(voxel_size=1.0)
    result = {"W": W, "points": n_pts, "loop_gap_m": round(gap, 4),
              "initial_rsme": [float(rot0) * 57.3, float(tra0)]}

    # flat dense f64
    t0 = time.perf_counter()
    vres = grid.voxelize(list(scans), R0, p0, vcfg, dtype=np.float64)
    fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    out = lm.damping_iter(
        jnp.asarray(R0), jnp.asarray(p0), fj,
        SolverConfig(max_iters=15, u_init=0.01, min_planes_per_pose=1))
    out.R.block_until_ready()
    t_flat = time.perf_counter() - t0
    rot_f, tra_f = metrics.pose_rsme(out.R, out.p, Rg, pg)
    result["flat"] = {"total_s": round(t_flat, 1),
                      "planes": int(vres.num_planes),
                      "rsme_deg_m": [float(rot_f) * 57.3, float(tra_f)]}
    print(f"flat: {t_flat:.1f}s RSME {float(rot_f)*57.3:.4f} deg "
          f"{float(tra_f):.4f} m", flush=True)

    # flat with re-association cycles (the single-resolution limit of
    # pipelines/coarse_to_fine): fair comparison — the hierarchy also
    # re-associates every cycle
    t0 = time.perf_counter()
    Rc, pc = np.asarray(R0), np.asarray(p0)
    for _ in range(3):
        vr = grid.voxelize(list(scans), Rc, pc, vcfg, dtype=np.float64)
        fr = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vr.factors])
        o = lm.damping_iter(
            jnp.asarray(Rc), jnp.asarray(pc), fr,
            SolverConfig(max_iters=10, u_init=0.01, min_planes_per_pose=1))
        Rc, pc = np.asarray(o.R), np.asarray(o.p)
    t_fr = time.perf_counter() - t0
    rot_fr, tra_fr = metrics.pose_rsme(jnp.asarray(Rc), jnp.asarray(pc),
                                       Rg, pg)
    result["flat_reassoc3"] = {
        "total_s": round(t_fr, 1),
        "rsme_deg_m": [float(rot_fr) * 57.3, float(tra_fr)]}
    print(f"flat+reassoc x3: {t_fr:.1f}s RSME {float(rot_fr)*57.3:.4f} deg "
          f"{float(tra_fr):.4f} m", flush=True)

    for mode in ("off", "always"):
        cfg = hierarchical.HierarchicalConfig(
            block=20, stride=16, polish=False,
            refeature_supers=mode, voxel=vcfg,
            top_voxel=VoxelConfig(voxel_size=1.0, min_observers=2))
        t0 = time.perf_counter()
        Rh, ph, info = hierarchical.run(scans, R0, p0, cfg)
        dt = time.perf_counter() - t0
        rot, tra = metrics.pose_rsme(jnp.asarray(Rh), jnp.asarray(ph),
                                     Rg, pg)
        result[f"hier_refeature_{mode}"] = {
            "total_s": round(dt, 1), "n_blocks": info["n_blocks"],
            "rsme_deg_m": [float(rot) * 57.3, float(tra)]}
        print(f"hier refeature={mode}: {dt:.1f}s RSME "
              f"{float(rot)*57.3:.4f} deg {float(tra):.4f} m", flush=True)

    outp = pathlib.Path(__file__).resolve().parents[1] / "artifacts"
    with open(outp / "hba_loop.json", "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
