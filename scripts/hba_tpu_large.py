"""HBA at its regime on the real TPU (round-4 verdict item 4).

W = 1024: flat (host association + packed dense solve — the largest
window the remote compiler handles) vs the batched-device hierarchy
(hierarchical.run_device_batched: every level a vmapped on-device
program).  W = 2048: the flat dense evaluate exceeds the remote-compile
ceiling (artifacts/roofline.json — attempted here in a subprocess so the
crash is recorded, not fatal); the hierarchy runs fine because no
sub-program exceeds (block | n_blocks) poses.

Quality metric: RSME vs ground truth after gauge alignment + the common
f64 cluster cost (host-evaluated) at each solution.

Run: python scripts/hba_tpu_large.py [W]
"""

import json
import pathlib
import subprocess
import sys
import time

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.config import SolverConfig  # noqa: E402
from balm_tpu.ops import factors as Fmod  # noqa: E402
from balm_tpu.pipelines import hierarchical  # noqa: E402
from balm_tpu.solver import lm  # noqa: E402
from balm_tpu.utils import metrics, sync  # noqa: E402
from balm_tpu.ops import lie  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402

sys.path.insert(0, str(ROOT / "scripts"))
from hba_demo import make_corridor  # noqa: E402


def host_cost(f, R, p):
    """Common f64 cluster cost sum coe*lambda0 (numpy, any poses)."""
    C = np.asarray(f.C, np.float64)
    coe = np.asarray(f.coe, np.float64)
    G, W = C.shape[:2]
    T = np.zeros((W, 4, 4))
    T[:, :3, :3] = R
    T[:, :3, 3] = p
    T[:, 3, 3] = 1.0
    TC = np.einsum("wab,gwbc->gwac", T, C)
    Q = np.einsum("gwac,wdc->gad", TC, T)
    N = np.maximum(Q[:, 3, 3], 1.0)
    c = Q[:, :3, 3] / N[:, None]
    cov = Q[:, :3, :3] / N[:, None, None] - c[:, :, None] * c[:, None, :]
    lam = np.linalg.eigvalsh(cov)
    lam0 = np.where(coe > 0, lam[:, 0], 0.0)
    return float(np.sum(coe * lam0))


def rsme(R, p, Rg, pg):
    """SE(3)-aligned ATE (Horn): remove the global gauge by the
    best-fit similarity (scale fixed to 1) before comparing — pose-0
    anchoring would make the error scale with trajectory length (a 0.1
    deg tilt at the anchor moves a 150 m corridor's end by 0.26 m)."""
    R = np.asarray(R, np.float64)
    p = np.asarray(p, np.float64)
    Rg = np.asarray(Rg, np.float64)
    pg = np.asarray(pg, np.float64)
    mu_a = p.mean(0)
    mu_b = pg.mean(0)
    Hm = (p - mu_a).T @ (pg - mu_b)
    U, _, Vt = np.linalg.svd(Hm)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    Ra = Vt.T @ np.diag([1.0, 1.0, d]) @ U.T
    ta = mu_b - Ra @ mu_a
    p_al = p @ Ra.T + ta
    trans = float(np.sqrt(np.mean(np.sum((p_al - pg) ** 2, axis=1))))
    R_al = np.einsum("ab,wbc->wac", Ra, R)
    cosang = np.clip((np.einsum("wab,wab->w", R_al, Rg) - 1.0) / 2.0,
                     -1.0, 1.0)
    rot = float(np.sqrt(np.mean(np.arccos(cosang) ** 2)))
    return [rot * 57.2958, trans]


def rpe(R, p, Rg, pg, d=10):
    """Relative pose error over d-scan separations — the quality metric
    that actually discriminates on corridor scenes: the cluster cost has
    near-null smooth BENDING modes there (measured: a 59.7 deg ATE
    solution with cost 50.3 vs the 1.6 deg solution's 48.2 and the
    ground truth's 49.2), so global ATE between equal-cost solutions is
    null-space luck, while RPE measures the locally-observable part."""
    R = np.asarray(R, np.float64)
    p = np.asarray(p, np.float64)
    Rg = np.asarray(Rg, np.float64)
    pg = np.asarray(pg, np.float64)
    W = len(R)
    rots, trs = [], []
    for i in range(W - d):
        Re = R[i].T @ R[i + d]
        Rr = Rg[i].T @ Rg[i + d]
        dRm = Re.T @ Rr
        ang = np.arccos(np.clip((np.trace(dRm) - 1) / 2, -1, 1))
        pe = R[i].T @ (p[i + d] - p[i])
        pr = Rg[i].T @ (pg[i + d] - pg[i])
        rots.append(ang)
        trs.append(np.linalg.norm(pe - pr))
    return [float(np.sqrt(np.mean(np.square(rots)))) * 57.2958,
            float(np.sqrt(np.mean(np.square(trs))))]


def flat_tpu(scans, R0, p0, vcfg, W, chunk_planes=0):
    t0 = time.perf_counter()
    vres = grid.voxelize(scans, R0, p0, vcfg, dtype=np.float64)
    t_assoc = time.perf_counter() - t0
    fr = Fmod.recenter_bodies(vres.factors).astype(jnp.float32)
    fr = jax.tree_util.tree_map(jnp.asarray, fr)
    scfg = SolverConfig(max_iters=40, u_init=0.01,
                        min_planes_per_pose=0)
    Rj = jnp.asarray(R0, jnp.float32)
    pj = jnp.asarray(p0, jnp.float32)

    def run(Rin):
        return lm.damping_iter(
            Rin, pj, fr, scfg, centered=True, backend="packed",
            chunk_planes=chunk_planes,
            linear_solver=("cholesky_nofallback" if W > 1536
                           else "cholesky"))

    res = run(Rj)
    sync.fetch_scalar(res.residual)          # compile + warm
    t0 = time.perf_counter()
    res = run(Rj)
    sync.fetch_scalar(res.residual)
    t_solve = time.perf_counter() - t0
    return (np.asarray(res.R, np.float64), np.asarray(res.p, np.float64),
            {"assoc_s": round(t_assoc, 2), "solve_s": round(t_solve, 3),
             "planes": int(vres.num_planes),
             "wall_s": round(t_assoc + t_solve, 2)}, vres)


def main(W=1024):
    from tests.test_hierarchical import perturb_drift

    out = {"device": str(jax.devices()[0]), "W": W}
    print("generating corridor W =", W, flush=True)
    R_gt, p_gt, scans = make_corridor(W, seed=1, pts_per=60)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=2)
    n_pts = int(sum(len(s) for s in scans))
    out["points"] = n_pts
    out["init_rsme"] = rsme(R0, p0, R_gt, p_gt)
    out["init_rpe10"] = rpe(R0, p0, R_gt, p_gt)
    print(f"points {n_pts}, init rsme {out['init_rsme']}", flush=True)

    from balm_tpu.config import VoxelConfig

    vcfg = VoxelConfig(min_observers=2)

    # ---- hierarchy: device-batched blocks + span-compressed global ----
    # The vmapped block BAs (on-device association + packed solves, 2
    # dispatches for the whole trajectory) produce a locally-consistent
    # init; the span-compressed matrix-free flat solve couples it
    # globally.  The anchor-only top level is multi-modal on this scene
    # class (two near-equal-residual optima 0.6/2.7 deg from truth;
    # basin selection flips with f32 rounding) and is skipped — the
    # host hierarchy's consensus machinery (overlap edges, anchor PGO,
    # cycle guard) is the single-scene answer to that, not replicated
    # in the batched path.
    hkw = dict(
        block=16, cycles=1, top=False,
        block_caps=(1 << 9, 1 << 11, 1 << 13), Gcap_block=256,
        cs_cap_block=1 << 15,
        solver=SolverConfig(max_iters=12, u_init=0.01,
                            min_planes_per_pose=0, gauge_fix=False),
        voxel=vcfg)
    # warm (compile) then timed
    hierarchical.run_device_batched(scans, R0, p0, **hkw)
    t0 = time.perf_counter()
    Rh, ph, info = hierarchical.run_device_batched(scans, R0, p0, **hkw)
    t_hier = time.perf_counter() - t0

    # global coupling: dense packed polish — one program at W <= 1024,
    # factor-CHUNKED (lax.scan over plane chunks) past the one-program
    # compile ceiling.  (The span-compressed PCG solver was tried here
    # and stalls ~1.8x above the optimum on re-associated factors; the
    # chunked dense evaluate keeps exact Newton steps at any W.)
    t0 = time.perf_counter()
    vres_h = grid.voxelize(scans, Rh, ph, vcfg, dtype=np.float64)
    fr_h = Fmod.recenter_bodies(vres_h.factors).astype(jnp.float32)
    fr_h = jax.tree_util.tree_map(jnp.asarray, fr_h)
    if W <= 1536:
        pres = lm.damping_iter(
            jnp.asarray(Rh, jnp.float32), jnp.asarray(ph, jnp.float32),
            fr_h, SolverConfig(max_iters=25, u_init=0.01,
                               min_planes_per_pose=0),
            centered=True, backend="packed")
        chunk = 0
    else:
        # past the dense ceiling (superlinear temp growth, artifacts/
        # roofline_bytes.json): span-compressed matrix-free polish
        from balm_tpu.ops import factors_windowed as FW
        from balm_tpu.solver import large as large_mod

        wf_h = jax.tree_util.tree_map(jnp.asarray, FW.from_dense(fr_h))
        pres = large_mod.damping_iter_large(
            jnp.asarray(Rh, jnp.float32), jnp.asarray(ph, jnp.float32),
            wf_h, SolverConfig(max_iters=25, u_init=0.01),
            cg_iters=300, cg_tol=1e-6)
        chunk = -1
    sync.fetch_scalar(pres.residual)
    t_polish = time.perf_counter() - t0
    polish_kind = ("dense_packed" if chunk == 0
                   else "span_compressed")
    Rh2 = np.asarray(pres.R, np.float64)
    ph2 = np.asarray(pres.p, np.float64)

    out["hier"] = {"wall_s": round(t_hier, 2),
                   "polish_s": round(t_polish, 2),
                   "polish_kind": polish_kind,
                   "total_wall_s": round(t_hier + t_polish, 2),
                   "timings": info["timings"],
                   "overflow": info["overflow"],
                   "top_planes": info["top_planes"],
                   "rsme_before_polish": rsme(Rh, ph, R_gt, p_gt),
                   "rsme": rsme(Rh2, ph2, R_gt, p_gt),
                   "rpe10": rpe(Rh2, ph2, R_gt, p_gt)}
    Rh, ph = Rh2, ph2
    print("hier:", out["hier"], flush=True)

    # ---- flat (dense packed solve) ----
    if W <= 1536:
        Rf, pf, flat, vres = flat_tpu(scans, R0, p0, vcfg, W)
        flat["rsme"] = rsme(Rf, pf, R_gt, p_gt)
        flat["rpe10"] = rpe(Rf, pf, R_gt, p_gt)
        out["flat"] = flat
        print("flat:", flat, flush=True)
        # common cost (flat association's f64 factor set)
        out["cost_init"] = host_cost(vres.factors, R0, p0)
        out["cost_gt"] = host_cost(vres.factors, R_gt, p_gt)
        out["cost_flat"] = host_cost(vres.factors, Rf, pf)
        out["cost_hier"] = host_cost(vres.factors, Rh, ph)
        out["hier_over_flat_cost"] = out["cost_hier"] / out["cost_flat"]
    else:
        # record the dense ceiling: try the flat compile in a subprocess
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "import scripts.hba_tpu_large as m\n"
            "import numpy as np, jax\n"
            "from tests.test_hierarchical import perturb_drift\n"
            "from balm_tpu.config import VoxelConfig\n"
            "import sys as s2\n"
            "s2.path.insert(0, %r)\n"
            "from hba_demo import make_corridor\n"
            "R_gt, p_gt, scans = make_corridor(%d, seed=1, pts_per=60)\n"
            "R0, p0 = perturb_drift(R_gt, p_gt, seed=2)\n"
            "m.flat_tpu(scans, R0, p0, VoxelConfig(min_observers=2), %d)\n"
            "print('FLAT_OK')\n"
        ) % (str(ROOT), str(ROOT / "scripts"), W, W)
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=900)
            ok = b"FLAT_OK" in r.stdout
            out["flat"] = {
                "feasible": bool(ok),
                "note": ("dense evaluate compiled" if ok else
                         "remote compile failed/crashed (the documented "
                         "W=2048 dense ceiling, artifacts/roofline.json): "
                         + r.stderr.decode()[-300:])}
        except subprocess.TimeoutExpired:
            out["flat"] = {"feasible": False,
                           "note": "flat compile timed out (900 s)"}
        print("flat:", out["flat"], flush=True)
        # flat via the span-compressed matrix-free solver; the dense
        # one-program AND factor-chunked paths both hit the superlinear
        # temp-growth HBM ceiling at this W (measured 28.3-28.9 GB of
        # 15.75 GB; artifacts/roofline_bytes.json 'temp_scaling_finding')
        from balm_tpu.ops import factors_windowed as FW2
        from balm_tpu.solver import large as large_mod2

        t0 = time.perf_counter()
        vres = grid.voxelize(scans, R0, p0, vcfg, dtype=np.float64)
        fr0 = Fmod.recenter_bodies(vres.factors).astype(jnp.float32)
        wf0 = jax.tree_util.tree_map(jnp.asarray, FW2.from_dense(fr0))
        lres = large_mod2.damping_iter_large(
            jnp.asarray(R0, jnp.float32), jnp.asarray(p0, jnp.float32),
            wf0, SolverConfig(max_iters=40, u_init=0.01),
            cg_iters=300, cg_tol=1e-6)
        sync.fetch_scalar(lres.residual)
        Rf = np.asarray(lres.R, np.float64)
        pf = np.asarray(lres.p, np.float64)
        flatc = {"wall_s": round(time.perf_counter() - t0, 2),
                 "planes": int(vres.num_planes),
                 "span": int(wf0.C.shape[1]),
                 "kind": "span_compressed",
                 "rsme": rsme(Rf, pf, R_gt, p_gt),
                 "rpe10": rpe(Rf, pf, R_gt, p_gt)}
        out["flat_chunked"] = flatc
        print("flat_chunked:", out["flat_chunked"], flush=True)
        out["cost_init"] = host_cost(vres.factors, R0, p0)
        out["cost_gt"] = host_cost(vres.factors, R_gt, p_gt)
        out["cost_flat_span"] = host_cost(vres.factors, Rf, pf)
        out["cost_hier"] = host_cost(vres.factors, Rh, ph)
        out["hier_over_gt_cost"] = out["cost_hier"] / out["cost_gt"]
        out["hier_over_flat_span_cost"] = (
            out["cost_hier"] / out["cost_flat_span"])

    with open(ROOT / "artifacts" / f"hba_tpu_large_w{W}.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
