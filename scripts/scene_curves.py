"""Multi-scene Supplementary-format convergence curves (round-5).

The reference's Supplementary protocol records per-method convergence
curves across many sequences (Supplementary/data/readme.txt: one file of
"cumulative_time(s) cost" per method; 0=EF, 1=BALM1, 2=PA, 3=BAREG,
4=BALM2, 5=BALM2-f32).  Round 4 ran it at full scale on the one real
dataset shipped with the reference (artifacts/realworld_curves); this
script adds two more 177-scan-class scenes so the method ordering rests
on more than one dataset:

  * consistency_dense — the reference's OWN simulator dataset
    (datas/consistency: 101 scans x 28,800 pts = 2.9M points, 2.7x the
    realworld total) at FULL density, with the consistency protocol's
    N(0, 0.02) point corruption (consistency.launch pnoise) and a
    drift-perturbed initial trajectory.
  * city — the city-generator scene (scripts/hba_city_demo.make_city)
    at 177 scans tuned to realworld point counts (~1.1M points).

Method scopes match artifacts/realworld_curves/summary.json exactly
(full problem for EF/PA/BAREG/BALM2; BALM1 runs the recorded-subset
protocol — its per-point pairwise Hessian is O((W*K)^2) per plane).
Because the scenes are synthetic/simulated, ground truth is known: each
method also records its aligned ATE, which the realworld harness cannot.

Usage: python scripts/scene_curves.py {consistency_dense,city}
Writes artifacts/realworld_curves_<scene>/{0..5}.txt + summary.json.
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

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.baselines import balm1, bareg, ef, pa_whitened  # noqa: E402
from balm_tpu.config import SolverConfig, VoxelConfig  # noqa: E402
from balm_tpu.ops import factors as Fmod  # noqa: E402
from balm_tpu.ops import lie  # noqa: E402
from balm_tpu.solver import lm  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402


def aligned_ate(R, p, Rg, pg):
    """SE(3)-aligned ATE [rot deg, trans m] (Horn alignment — see
    scripts/hba_tpu_large.py:rsme for why pose-0 anchoring is wrong)."""
    R = np.asarray(R, np.float64)
    p = np.asarray(p, np.float64)
    Rg = np.asarray(Rg, np.float64)
    pg = np.asarray(pg, np.float64)
    mu_a, mu_b = p.mean(0), pg.mean(0)
    Hm = (p - mu_a).T @ (pg - mu_b)
    U, _, Vt = np.linalg.svd(Hm)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    Ra = Vt.T @ np.diag([1.0, 1.0, d]) @ U.T
    ta = mu_b - Ra @ mu_a
    p_al = p @ Ra.T + ta
    trans = float(np.sqrt(np.mean(np.sum((p_al - pg) ** 2, axis=1))))
    R_al = np.einsum("ab,wbc->wac", Ra, R)
    cosang = np.clip(
        (np.einsum("wab,wab->w", R_al, Rg) - 1.0) / 2.0, -1.0, 1.0)
    rot = float(np.sqrt(np.mean(np.arccos(cosang) ** 2))) * 57.2958
    return [rot, trans]


def perturb_drift(R, p, seed, rot_deg, trans):
    rng = np.random.default_rng(seed)
    W = len(R)
    drot = rng.normal(0, rot_deg / 57.3 / np.sqrt(3), size=(W, 3))
    dtra = rng.normal(0, trans / np.sqrt(3), size=(W, 3))
    Rn = np.einsum("wab,wbc->wac", R,
                   np.array(lie.so3_exp(jnp.asarray(drot))))
    return Rn, p + dtra


# ---------------------------------------------------------------- scenes

def scene_consistency_dense(seed=0, vis=5.0):
    """The reference simulator's TRAJECTORY (datas/consistency: 101
    poses over a 25x17 m sweep, consistency.cpp:96-123 data path)
    re-rendered against a DENSE environment at realworld point counts.
    The simulator's own 16-plane room yields G~100 planes — too sparse
    for a convergence benchmark (the drift-associated cost dips BELOW
    the gt cost: the problem is underdetermined, measured this round) —
    so the curve scene keeps the trajectory + the protocol's N(0, 0.02)
    point corruption (consistency.launch pnoise) and renders wall /
    floor / ceiling patches on a 2 m grid instead (~1.1M points,
    realworld-class)."""
    from balm_tpu.pipelines import consistency as cons

    cfg = cons.ConsistencyConfig()
    R_gt, p_gt, _ = cons.load(cfg)
    R_gt, p_gt = np.asarray(R_gt), np.asarray(p_gt)
    rng = np.random.default_rng(seed)

    lo = p_gt.min(0)[:2] - 2.0
    hi = p_gt.max(0)[:2] + 2.0
    centers, normals = [], []

    def add(c, axis):
        # TILTED normals (axis-biased, up to ~25 deg off): a first cut
        # with purely axis-aligned normals left metre-scale slide modes
        # — every method dove below the gt cost while ATE exploded
        # (measured this round); tilt couples all translation axes.
        n = np.eye(3)[axis] + rng.normal(0, 0.35, 3)
        centers.append(c)
        normals.append(n / np.linalg.norm(n))

    xs = np.arange(lo[0], hi[0], 2.0)
    ys = np.arange(lo[1], hi[1], 2.0)
    for x in xs:
        for y in ys:
            jx, jy = rng.uniform(-0.4, 0.4, 2)
            add([x + jx, y + jy, rng.uniform(0.4, 1.8)],
                int(rng.integers(0, 2)))
            add([x + jy, y + jx, 0.0], 2)
            if rng.uniform() < 0.3:
                add([x, y, 3.0], 2)
    centers = np.asarray(centers, float)
    normals = np.asarray(normals, float)
    # per-patch in-plane basis
    up = np.where(np.abs(normals[:, 2:3]) < 0.9,
                  np.array([[0.0, 0.0, 1.0]]), np.array([[1.0, 0.0, 0.0]]))
    e1 = np.cross(normals, up)
    e1 /= np.linalg.norm(e1, axis=1, keepdims=True)
    e2 = np.cross(normals, e1)

    pts_per = 260                       # -> ~1.1M points over W=101
    scans = []
    for w in range(len(p_gt)):
        near = np.linalg.norm(centers[:, :2] - p_gt[w][:2], axis=1) < vis
        pts = []
        for g in np.nonzero(near)[0]:
            uv = rng.uniform(-0.45, 0.45, size=(pts_per, 2))
            th = rng.normal(0, 0.004, size=(pts_per, 1))
            world = (centers[g] + uv[:, :1] * e1[g] + uv[:, 1:] * e2[g]
                     + th * normals[g])
            pts.append((world - p_gt[w]) @ R_gt[w])
        body = (np.concatenate(pts) if pts else np.zeros((0, 3)))
        scans.append(body + rng.normal(0.0, cfg.pnoise, size=body.shape))
    R0, p0 = perturb_drift(R_gt, p_gt, seed + 1, rot_deg=1.0, trans=0.08)
    vcfg = VoxelConfig(voxel_size=1.0, min_observers=2)
    return R0, p0, scans, vcfg, (R_gt, p_gt)


def scene_city(seed=0, W=177):
    """City-generator scene at realworld point counts (~6.2k pts/scan)."""
    from hba_city_demo import make_city

    R_gt, p_gt, scans = make_city(W, nx=2, ny=2, seed=seed, pts_per=60)
    n = sum(len(s) for s in scans)
    target = 6200 * W
    if n < target:                      # densify by repeating the render
        k = int(np.ceil(target / max(n, 1)))
        rng = np.random.default_rng(seed + 7)
        scans = [np.concatenate([s] * k)[: int(target / W)]
                 + rng.normal(0, 0.004, (min(len(s) * k, int(target / W)), 3))
                 for s in scans]
    R0, p0 = perturb_drift(R_gt, p_gt, seed + 1, rot_deg=1.0, trans=0.08)
    vcfg = VoxelConfig(voxel_size=1.0, min_observers=2)
    return R0, p0, scans, vcfg, (R_gt, p_gt)


SCENES = {"consistency_dense": scene_consistency_dense, "city": scene_city}

# per-scene budget for the two methods whose cost is dominated by
# protocol constants (EF: fixed gradient-iteration count ~7 s/iter at
# this scale; BALM1: recorded-subset per-point Hessian).  The ORDERING
# is decided long before these caps (city: EF moved 906->278 in its
# first 100 of 400 iters; BALM1's subset converges in <=16).
SCENE_BUDGET = {"consistency_dense": {"ef_iters": 120, "balm1_topg": 256}}


# ------------------------------------------------------------- problem

def build_factors(scans, R0, p0, vcfg):
    vres = grid.voxelize(scans, R0, p0, vcfg, dtype=np.float64)
    f = vres.factors
    G = vres.num_planes
    f_raw = Fmod.PlaneFactors(
        C=np.asarray(f.C)[:G], Cfix=np.asarray(f.Cfix)[:G],
        coe=np.asarray(f.coe)[:G], centers=np.asarray(f.centers)[:G],
        body_centers=np.asarray(f.body_centers)[:G])
    return f_raw, vres, G


def build_balm1_subset(scans, R0, p0, vcfg, max_scans=30, top_g=512,
                       k_cap=128):
    """The recorded-subset protocol (realworld_curves.run_balm1_subset):
    first `max_scans` scans, top `top_g` planes, `k_cap` pts/cluster."""
    sub = scans[:max_scans]
    Rs, ps = R0[:max_scans], p0[:max_scans]
    vres = grid.voxelize(sub, Rs, ps, vcfg, dtype=np.float64)
    f = vres.factors
    G = vres.num_planes
    top_g = min(top_g, G)
    order = np.argsort(-np.asarray(f.coe[:G]))[:top_g]
    f_sub = Fmod.PlaneFactors(
        C=np.asarray(f.C)[order], Cfix=np.asarray(f.Cfix)[order],
        coe=np.asarray(f.coe)[order], centers=np.asarray(f.centers)[order],
        body_centers=np.asarray(f.body_centers)[order])
    body = np.concatenate(sub)
    sel = np.isin(vres.point_leaf, order)
    leaf2row = np.full(G, -1, np.int64)
    leaf2row[order] = np.arange(top_g)
    rows = leaf2row[vres.point_leaf[sel]]
    sids = vres.point_scan[sel]
    pts = body[sel]
    W = len(sub)
    key = rows * W + sids
    ksort = np.argsort(key, kind="stable")
    key, rows, sids, pts = key[ksort], rows[ksort], sids[ksort], pts[ksort]
    uniq, start = np.unique(key, return_index=True)
    within = np.arange(len(key)) - np.repeat(
        start, np.diff(np.append(start, len(key))))
    keep = within < k_cap
    n_over = int((~keep).sum())
    pts_k = np.zeros((top_g, W, k_cap, 3))
    mask = np.zeros((top_g, W, k_cap))
    pts_k[rows[keep], sids[keep], within[keep]] = pts[keep]
    mask[rows[keep], sids[keep], within[keep]] = 1.0
    pf = balm1.PointPlanes(points=jnp.asarray(pts_k),
                           mask=jnp.asarray(mask),
                           coe=jnp.asarray(f_sub.coe))
    return Rs, ps, f_sub, pf, n_over, top_g, G


# ------------------------------------------------------------- protocol

def run_scene(name, seed=0, only=None):
    """`only`: optional set of method keys ('balm2', 'bareg', 'pa',
    'ef', 'balm1') to (re)run; others keep their recorded summary rows.
    The summary is merged + rewritten after EVERY method so a killed
    run never loses completed curves."""
    R0, p0, scans, vcfg, (R_gt, p_gt) = SCENES[name](seed)
    W = len(scans)
    n_pts = int(sum(len(s) for s in scans))
    f_raw, vres, Gfull = build_factors(scans, R0, p0, vcfg)
    f_cen = Fmod.recenter_bodies(f_raw)
    R0j, p0j = jnp.asarray(R0), jnp.asarray(p0)

    score = jax.jit(lambda R, p: Fmod.residual_only(
        lie.pose_matrix(R, p), f_cen, centered=True))
    c_init = float(score(R0j, p0j))
    c_gt = float(score(jnp.asarray(R_gt), jnp.asarray(p_gt)))
    print(f"[{name}] W={W} pts={n_pts} G={Gfull} "
          f"init cost {c_init:.3f} gt cost {c_gt:.3f} "
          f"init ATE {aligned_ate(R0, p0, R_gt, p_gt)}", flush=True)

    outdir = ROOT / "artifacts" / f"realworld_curves_{name}"
    outdir.mkdir(parents=True, exist_ok=True)

    def write_curve(idx, t0, entries, label):
        pts = [(0.0, c_init)]
        last_Rp = (R0, p0)
        for e in entries:
            t = e[0] - t0
            if len(e) == 3:
                Rr, pr = jnp.asarray(e[1]), jnp.asarray(e[2])
            else:
                th = e[1]
                Rr = lie.so3_exp(jnp.asarray(th[:3 * W].reshape(W, 3)))
                pr = jnp.asarray(th[3 * W:6 * W].reshape(W, 3))
            last_Rp = (np.asarray(Rr), np.asarray(pr))
            pts.append((t, float(score(Rr, pr))))
        with open(outdir / f"{idx}.txt", "w") as fh:
            for t, c in pts:
                fh.write(f"{t:.4f} {c:.6f}\n")
        ate = aligned_ate(*last_Rp, R_gt, p_gt)
        print(f"{label:12s} final {pts[-1][1]:10.3f} @ {pts[-1][0]:8.2f} s "
              f"({len(pts) - 1} it) ATE {ate}", flush=True)
        return {"label": label, "final_cost": pts[-1][1],
                "total_time_s": pts[-1][0],
                "accepted_iters": len(pts) - 1, "scope": "full",
                "ate_deg_m": ate}

    summary = {"scene": name, "W": W, "points": n_pts, "planes": Gfull,
               "initial_cost": c_init, "gt_cost": c_gt,
               "init_ate_deg_m": aligned_ate(R0, p0, R_gt, p_gt),
               "protocol": "full-scale Supplementary-format curves on a "
                           "second/third scene (round-5); method scopes "
                           "match artifacts/realworld_curves "
                           "(BALM1 = recorded-subset protocol); synthetic "
                           "ground truth known -> per-method aligned ATE "
                           "recorded",
               "methods": {}}
    spath = outdir / "summary.json"
    if spath.exists():                 # keep rows not being re-run
        summary["methods"].update(json.load(open(spath))["methods"])

    def flush_summary():
        with open(spath, "w") as fh:
            json.dump(summary, fh, indent=1)

    def want(m):
        return only is None or m in only

    # max_iters=100: the realworld problem converges in 4-5 accepted
    # iterations but the drift-perturbed synthetic scenes need ~60 (the
    # city run stalled at 30 with cost 56.6 vs the converged 42.9)
    # ulp_tol=8 (default 128): the f32 ULP stopping floor exists so NEES
    # seeds don't dither to the iteration cap, but at 128 it can end a
    # slowly-converging curve run on one small accepted step (measured
    # on consistency_dense: f32 stopped at 59.1 with 1.7 cost left);
    # curves are bounded by max_iters, so the floor can sit much lower.
    scfg = SolverConfig(max_iters=100, rel_tol=1e-10,
                        min_planes_per_pose=0, ulp_tol=8.0)
    for idx, key, lab, Rj, pj, fj in (
            (4, "4_balm2", "BALM2", R0j, p0j, f_cen),
            (5, "5_balm2_f32", "BALM2-f32", R0j.astype(jnp.float32),
             p0j.astype(jnp.float32), f_cen.astype(jnp.float32))):
        if not want("balm2"):
            continue
        res_t, t_iter = lm.damping_iter_timed(Rj, pj, fj, scfg,
                                              centered=True)
        n = int(res_t.iters)
        acc = np.array(res_t.trace_accept)[:n] > 0.5
        costs = np.array(res_t.trace_res2)[:n][acc]
        ts = np.asarray(t_iter)[:n][acc]
        with open(outdir / f"{idx}.txt", "w") as fh:
            fh.write(f"0.0 {c_init:.6f}\n")
            for tk, c in zip(ts, costs):
                fh.write(f"{tk:.4f} {c:.6f}\n")
        ate = aligned_ate(np.asarray(res_t.R), np.asarray(res_t.p),
                          R_gt, p_gt)
        summary["methods"][key] = {
            "label": lab, "final_cost": float(costs[-1]),
            "total_time_s": float(ts[-1]),
            "accepted_iters": int(acc.sum()), "scope": "full",
            "ate_deg_m": ate}
        print(f"{lab:12s} final {costs[-1]:10.3f} @ {ts[-1]:8.2f} s "
              f"ATE {ate}", flush=True)
        flush_summary()

    if want("bareg"):
        tr = []
        t0 = time.perf_counter()
        bareg.solve_gn(R0, p0, f_raw, outer_iters=40, trace=tr)
        summary["methods"]["3_bareg"] = write_curve(3, t0, tr, "BAREG")
        flush_summary()

    if want("pa"):
        tr = []
        t0 = time.perf_counter()
        pa_whitened.solve_schur(R0, p0, f_raw, max_iters=80, trace=tr)
        summary["methods"]["2_pa"] = write_curve(2, t0, tr, "PA")
        flush_summary()

    budget = SCENE_BUDGET.get(name, {})
    if want("ef"):
        tr = []
        t0 = time.perf_counter()
        ef.descend(R0j, p0j, f_raw,
                   max_iters=budget.get("ef_iters", 400), trace=tr,
                   grad_only=True)
        summary["methods"]["0_ef"] = write_curve(0, t0, tr, "EF")
        flush_summary()

    if not want("balm1"):
        flush_summary()
        print(f"wrote {outdir}", flush=True)
        return

    # BALM1: recorded-subset protocol (per-point pairwise Hessian is
    # O((W*K)^2)/plane; see realworld_curves.run_balm1_subset)
    Rs, ps, f_sub, pf, n_over, Gs, Gsub = build_balm1_subset(
        scans, R0, p0, vcfg, top_g=budget.get("balm1_topg", 512))
    f_sub_cen = Fmod.recenter_bodies(f_sub)
    sub_score = jax.jit(lambda R, p: Fmod.residual_only(
        lie.pose_matrix(R, p), f_sub_cen, centered=True))
    c_init_sub = float(sub_score(jnp.asarray(Rs), jnp.asarray(ps)))
    tr = []
    t0 = time.perf_counter()
    balm1.damping_iter(jnp.asarray(Rs), jnp.asarray(ps), pf,
                       max_iters=60, trace=tr)
    pts = [(0.0, c_init_sub)]
    for e in tr:
        pts.append((e[0] - t0,
                    float(sub_score(jnp.asarray(e[1]), jnp.asarray(e[2])))))
    with open(outdir / "1.txt", "w") as fh:
        for t, c in pts:
            fh.write(f"{t:.4f} {c:.6f}\n")
    summary["methods"]["1_balm1"] = {
        "label": "BALM1", "final_cost": pts[-1][1],
        "total_time_s": pts[-1][0], "accepted_iters": len(pts) - 1,
        "scope": (f"recorded-subset protocol: first 30 scans, top "
                  f"{Gs} of {Gsub} planes, k_cap=128 ({n_over} overflow "
                  f"pts dropped)"),
        "initial_cost": c_init_sub}
    print(f"{'BALM1':12s} final {pts[-1][1]:10.3f} @ {pts[-1][0]:8.2f} s",
          flush=True)

    flush_summary()
    print(f"wrote {outdir}", flush=True)


if __name__ == "__main__":
    _name = sys.argv[1] if len(sys.argv) > 1 else "city"
    _only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    run_scene(_name, only=_only)
