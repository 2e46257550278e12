"""Multi-loop "city grid" HBA demo: recursion at W >~ 10^3.

A trajectory that snakes over every street of an (nx x ny)-block city
grid revisits each intersection from two different legs, creating MANY
loop closures between temporally distant scans — the regime the
hierarchical pipeline (bottom blocks -> overlap-consensus anchor graph
-> recursive top level) exists for, and where a single flat dense solve
must fight drifted association at (6W)^2 scale.

Compared (same scans, same cumulative odometry-drift start):
  * flat dense f64 LM (one association), the reference-style solve —
    bavoxel.hpp is capped at W=177; this is its natural extension
  * flat + 3 re-association cycles (the single-level fair baseline)
  * hierarchical, recursion OFF (single anchor level)
  * hierarchical, recursion ON (recurse_at=64: anchors themselves are
    re-blocked, super-super-scans re-extracted)

Produces artifacts/hba_city.json.  Run: python scripts/hba_city_demo.py [W]
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


def make_city(W, nx=2, ny=2, side=16.0, seed=0, pts_per=55, vis=4.0):
    """Streets on the grid lines of an nx x ny block city; the route
    walks every horizontal street west->east (alternating direction),
    then every vertical street — every intersection is visited twice."""
    rng = np.random.default_rng(seed)
    Lx, Ly = nx * side, ny * side

    # waypoint route over all streets
    way = []
    for j in range(ny + 1):
        y = j * side
        xs = [0.0, Lx] if j % 2 == 0 else [Lx, 0.0]
        way.append(([xs[0], y], [xs[1], y]))
    for i in range(nx + 1):
        x = i * side if ny % 2 == 0 else (nx - i) * side
        ys = [Ly, 0.0] if i % 2 == 0 else [0.0, Ly]
        way.append(([x, ys[0]], [x, ys[1]]))
    segs = [(np.asarray(a, float), np.asarray(b, float)) for a, b in way]
    lens = [np.linalg.norm(b - a) for a, b in segs]
    total = sum(lens)

    # W poses spread along the route, heading along the segment
    p = np.zeros((W, 3))
    yaw = np.zeros(W)
    s_all = np.arange(W) / W * total
    acc = np.cumsum([0.0] + lens)
    for w, s in enumerate(s_all):
        k = min(np.searchsorted(acc, s, side="right") - 1, len(segs) - 1)
        a, b = segs[k]
        t = (s - acc[k]) / max(lens[k], 1e-9)
        xy = a + t * (b - a)
        d = (b - a) / max(lens[k], 1e-9)
        p[w, :2] = xy
        yaw[w] = np.arctan2(d[1], d[0])
    p += rng.normal(0, 0.01, (W, 3))
    R = np.zeros((W, 3, 3))
    for w in range(W):
        c, sn = np.cos(yaw[w]), np.sin(yaw[w])
        R[w] = np.array([[c, -sn, 0], [sn, c, 0], [0, 0, 1]])

    # geometry: wall patches flanking every street, floor tiles on it,
    # cross-oriented patches every 3 m (pin the along-street mode)
    centers, axes = [], []

    def street(a, b):
        d = (b - a) / np.linalg.norm(b - a)
        n = np.array([-d[1], d[0]])
        for t in np.arange(0.5, np.linalg.norm(b - a), 1.0):
            xy = a + t * d
            for off in (-1.5, 1.5):
                q = xy + off * n
                centers.append([q[0], q[1], 0.5])
                axes.append(1 if abs(n[1]) > 0.5 else 0)
            centers.append([xy[0], xy[1], -0.5])
            axes.append(2)
            if int(t) % 3 == 0:
                off = 1.2 if (int(t) // 3) % 2 == 0 else -1.2
                q = xy + off * n
                centers.append([q[0] + 0.5 * d[0], q[1] + 0.5 * d[1], 0.5])
                axes.append(0 if abs(n[1]) > 0.5 else 1)

    # streets defined once per grid line (shared between route passes)
    for j in range(ny + 1):
        street(np.array([0.0, j * side]), np.array([Lx, j * side]))
    for i in range(nx + 1):
        street(np.array([i * side, 0.0]), np.array([i * side, Ly]))
    centers = np.asarray(centers, float)
    axes = np.asarray(axes)

    scans = []
    for w in range(W):
        pts = []
        near = np.linalg.norm(centers[:, :2] - p[w][:2], axis=1) < vis
        for g in np.nonzero(near)[0]:
            uv = rng.uniform(-0.45, 0.45, size=(pts_per, 2))
            th = rng.normal(0, 0.004, size=(pts_per, 1))
            local = np.concatenate([uv, th], -1)
            perm = np.roll(np.arange(3), axes[g] + 1)
            world = local[:, perm] + centers[g]
            pts.append((world - p[w]) @ R[w])
        scans.append(np.concatenate(pts) if pts else np.zeros((0, 3)))
    return R, p, scans


def perturb_cumulative(R, p, seed, rot_step_deg=0.05, trans_step=0.007):
    rng = np.random.default_rng(seed)
    W = len(R)
    dw = np.cumsum(rng.normal(0, rot_step_deg / 57.3, (W, 3)), axis=0)
    dt = np.cumsum(rng.normal(0, trans_step, (W, 3)), axis=0)
    Rn = np.einsum("wab,wbc->wac", np.array(lie.so3_exp(jnp.asarray(dw))), R)
    return Rn, p + dt


def main(W=1200, hier_only=False):
    R_gt, p_gt, scans = make_city(W, seed=1)
    R0, p0 = perturb_cumulative(R_gt, p_gt, seed=2)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    n_pts = int(sum(len(s) for s in scans))
    rot0, tra0 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg)
    print(f"W={W} pts={n_pts} init {float(rot0)*57.3:.3f} deg "
          f"{float(tra0):.3f} m", flush=True)

    vcfg = VoxelConfig(voxel_size=1.0)
    result = {"W": W, "points": n_pts,
              "initial_rsme": [float(rot0) * 57.3, float(tra0)]}
    out_path = (pathlib.Path(__file__).resolve().parents[1] / "artifacts"
                / "hba_city.json")
    if hier_only and out_path.exists():
        # keep the already-captured flat baselines, redo the hierarchy
        prev = json.loads(out_path.read_text())
        for k in ("flat", "flat_reassoc3"):
            if k in prev:
                result[k] = prev[k]

    def save():
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=2)

    if hier_only and "flat" in result:
        return _run_hier(scans, R0, p0, vcfg, Rg, pg, result, out_path)

    # flat dense f64 (single association)
    t0 = time.perf_counter()
    vres = grid.voxelize(list(scans), R0, p0, vcfg, dtype=np.float64)
    fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    out = lm.damping_iter(
        jnp.asarray(R0), jnp.asarray(p0), fj,
        SolverConfig(max_iters=12, u_init=0.01, min_planes_per_pose=1))
    out.R.block_until_ready()
    t_flat = time.perf_counter() - t0
    rot_f, tra_f = metrics.pose_rsme(out.R, out.p, Rg, pg)
    result["flat"] = {"total_s": round(t_flat, 1),
                      "planes": int(vres.num_planes),
                      "rsme_deg_m": [float(rot_f) * 57.3, float(tra_f)]}
    print(f"flat: {t_flat:.1f}s RSME {float(rot_f)*57.3:.4f} deg "
          f"{float(tra_f):.4f} m", flush=True)
    save()

    # flat + re-association cycles
    t0 = time.perf_counter()
    Rc, pc = np.asarray(R0), np.asarray(p0)
    for _ in range(3):
        vr = grid.voxelize(list(scans), Rc, pc, vcfg, dtype=np.float64)
        fr = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vr.factors])
        o = lm.damping_iter(
            jnp.asarray(Rc), jnp.asarray(pc), fr,
            SolverConfig(max_iters=8, u_init=0.01, min_planes_per_pose=1))
        Rc, pc = np.asarray(o.R), np.asarray(o.p)
    t_fr = time.perf_counter() - t0
    rot_fr, tra_fr = metrics.pose_rsme(jnp.asarray(Rc), jnp.asarray(pc),
                                       Rg, pg)
    result["flat_reassoc3"] = {
        "total_s": round(t_fr, 1),
        "rsme_deg_m": [float(rot_fr) * 57.3, float(tra_fr)]}
    print(f"flat+reassoc x3: {t_fr:.1f}s RSME {float(rot_fr)*57.3:.4f} deg "
          f"{float(tra_fr):.4f} m", flush=True)
    save()

    _run_hier(scans, R0, p0, vcfg, Rg, pg, result, out_path)


def _run_hier(scans, R0, p0, vcfg, Rg, pg, result, out_path):
    def save():
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=2)

    # hierarchical: recursion OFF vs ON (anchors = W/stride = 75 at the
    # defaults below; recurse_at=64 forces a second anchor level)
    def one_cycle(Rc, pc, recurse_at, top_stages=None):
        cfg = hierarchical.HierarchicalConfig(
            block=20, stride=16, polish=False,
            refeature_supers="recursive", voxel=vcfg,
            top_voxel=VoxelConfig(voxel_size=1.0, min_observers=2),
            top_stages=top_stages, recurse_at=recurse_at)
        return hierarchical.run(scans, Rc, pc, cfg)

    Rh_on = ph_on = None
    for label, recurse_at in (("off", 100000), ("on", 64)):
        t0 = time.perf_counter()
        Rh, ph, info = one_cycle(R0, p0, recurse_at)
        dt = time.perf_counter() - t0
        rot, tra = metrics.pose_rsme(jnp.asarray(Rh), jnp.asarray(ph),
                                     Rg, pg)
        result[f"hier_recurse_{label}"] = {
            "total_s": round(dt, 1), "n_blocks": info["n_blocks"],
            "recursed": "recursed" in info,
            "rsme_deg_m": [float(rot) * 57.3, float(tra)]}
        print(f"hier recurse={label}: {dt:.1f}s RSME "
              f"{float(rot)*57.3:.4f} deg {float(tra):.4f} m", flush=True)
        save()
        if label == "on":
            Rh_on, ph_on = np.asarray(Rh), np.asarray(ph)

    # second hierarchical cycle from the first pass's poses: every
    # association (bottom blocks AND anchor graph) regenerates from the
    # partially-corrected trajectory — the hierarchy's analogue of the
    # flat re-association cycles above
    t0 = time.perf_counter()
    Rh2, ph2, info2 = one_cycle(Rh_on, ph_on, 64)
    dt = time.perf_counter() - t0
    rot2, tra2 = metrics.pose_rsme(jnp.asarray(Rh2), jnp.asarray(ph2),
                                   Rg, pg)
    result["hier_recurse_on_x2"] = {
        "total_s": round(dt, 1), "n_blocks": info2["n_blocks"],
        "recursed": "recursed" in info2,
        "rsme_deg_m": [float(rot2) * 57.3, float(tra2)]}
    print(f"hier recurse=on x2: {dt:.1f}s RSME "
          f"{float(rot2)*57.3:.4f} deg {float(tra2):.4f} m", flush=True)
    save()

    # coarse-to-fine TOP level: coarse root voxels catch the cross-leg
    # revisit overlaps whose drift exceeds the fine voxel (the closure
    # constraints single-resolution association never forms)
    from balm_tpu.pipelines import coarse_to_fine

    t0 = time.perf_counter()
    Rh3, ph3, info3 = one_cycle(
        R0, p0, 100000, top_stages=coarse_to_fine.default_stages())
    dt = time.perf_counter() - t0
    rot3, tra3 = metrics.pose_rsme(jnp.asarray(Rh3), jnp.asarray(ph3),
                                   Rg, pg)
    result["hier_c2f_top"] = {
        "total_s": round(dt, 1), "n_blocks": info3["n_blocks"],
        "rsme_deg_m": [float(rot3) * 57.3, float(tra3)]}
    print(f"hier c2f-top: {dt:.1f}s RSME "
          f"{float(rot3)*57.3:.4f} deg {float(tra3):.4f} m", flush=True)
    save()
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1200,
         hier_only="--hier-only" in sys.argv)
