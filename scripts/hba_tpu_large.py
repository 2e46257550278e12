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
import os
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


def banded_solve(Rin, pin, wf, max_iters=40, chunks=2, edges=None):
    """Banded windowed LM with host-side warm-restart chunking: the
    tunneled TPU worker crashes on single dispatches past ~60 s (the
    100-iteration W=2048 loop died reproducibly; 40 iterations runs),
    so run `chunks` x `max_iters` as separate dispatches.  A restart
    resets the damping schedule to u_init — a second chunk from an
    almost-converged point just re-walks u down, costing a few
    rejected iterations."""
    from balm_tpu.solver import large as large_mod

    res = None
    total_iters = 0
    for _ in range(chunks):
        res = large_mod.damping_iter_large(
            Rin, pin, wf, SolverConfig(max_iters=max_iters, u_init=0.01),
            linear_solver="banded", edges=edges)
        total_iters += int(res.iters)
        Rin = res.R
        pin = res.p
        if int(res.iters) < max_iters:
            break
    return res, total_iters


def main(W=1024):
    from tests.test_hierarchical import perturb_drift

    from balm_tpu.ops import factors_windowed as FW
    from balm_tpu.pipelines import hierarchical

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

    # common cost reference: f64 factor set associated at the INIT poses
    vres0 = grid.voxelize(scans, R0, p0, vcfg, dtype=np.float64)
    out["cost_init"] = host_cost(vres0.factors, R0, p0)
    out["cost_gt"] = host_cost(vres0.factors, R_gt, p_gt)

    # ---- flat banded (exact dense-quality steps at ANY W) ----
    t0 = time.perf_counter()
    fr0 = Fmod.recenter_bodies(vres0.factors).astype(jnp.float32)
    wf0 = jax.tree_util.tree_map(jnp.asarray, FW.from_dense(fr0))
    fres, fit = banded_solve(jnp.asarray(R0, jnp.float32),
                             jnp.asarray(p0, jnp.float32), wf0)
    sync.fetch_scalar(fres.residual)
    t_flat = time.perf_counter() - t0
    Rf = np.asarray(fres.R, np.float64)
    pf = np.asarray(fres.p, np.float64)
    out["flat_banded"] = {
        "wall_s": round(t_flat, 2), "iters": fit,
        "planes": int(vres0.num_planes), "span": int(wf0.span),
        "rsme": rsme(Rf, pf, R_gt, p_gt),
        "rpe10": rpe(Rf, pf, R_gt, p_gt),
        "cost": host_cost(vres0.factors, Rf, pf)}
    out["cost_flat_banded"] = out["flat_banded"]["cost"]
    print("flat_banded:", out["flat_banded"], flush=True)

    # ---- hierarchy: batched blocks + consensus edges + banded polish,
    # then a re-associated banded refine that KEEPS the (annealed)
    # consensus edges.  An edge-FREE refine was measured to slide along
    # the corridor bending null mode (W=1024: 0.91 deg -> 3.57 deg RSME
    # at LOWER own-set cost) — the edges are real spread-weighted
    # measurements and stay in. ----
    t0 = time.perf_counter()
    Rh, ph, hinfo = hierarchical.run_batched_consensus(
        scans, np.array(R0), np.array(p0), block=16, cycles=1,
        voxel=vcfg, edge_weight_scale=1e-3,
        block_caps=(1 << 9, 1 << 11, 1 << 13), Gcap_block=256,
        cs_cap_block=1 << 15,
        polish_solver=SolverConfig(max_iters=40, u_init=0.01),
        polish_chunks=max(2, W // 128))
    t_cons = time.perf_counter() - t0
    edges_h = hinfo.pop("edges", None)
    anneal = 0.3
    if edges_h is not None:
        edges_h = edges_h._replace(w_rot=edges_h.w_rot * anneal,
                                   w_tr=edges_h.w_tr * anneal)
        edges_h = jax.tree_util.tree_map(
            lambda x: (jnp.asarray(x, jnp.float32)
                       if np.asarray(x).dtype.kind == "f" else x), edges_h)
    # Re-associate + refine ROUNDS (round-5: one round converges to its
    # own re-associated optimum but leaves association error — at
    # W=2048 a single round lands at 1.22x the init-set gt cost; the
    # 2nd round's better planes pull it further.  Edges stay in every
    # round (halving the anneal per round as trust in geometry grows).
    refine_rounds = int(os.environ.get("HBA_REFINE_ROUNDS", "2"))
    t0 = time.perf_counter()
    Rh2, ph2 = np.asarray(Rh, np.float64), np.asarray(ph, np.float64)
    rit = 0
    round_costs = []
    ann = anneal
    # best-state selection on the common init-set cost: a re-associated
    # refine round can slide along the corridor null mode (measured at
    # W=1536: polish 135.2 -> round0 137.2 -> round1 142.0) — keep the
    # best state seen and stop refining once a round degrades it.
    best_cost = host_cost(vres0.factors, Rh2, ph2)
    best_Rp = (Rh2, ph2)
    for rnd in range(refine_rounds):
        vres_h = grid.voxelize(scans, Rh2, ph2, vcfg, dtype=np.float64)
        fr_h = Fmod.recenter_bodies(vres_h.factors).astype(jnp.float32)
        wf_h = jax.tree_util.tree_map(jnp.asarray, FW.from_dense(fr_h))
        er = edges_h
        if er is not None and rnd > 0:
            er = er._replace(w_rot=er.w_rot * 0.5 ** rnd,
                             w_tr=er.w_tr * 0.5 ** rnd)
            ann = anneal * 0.5 ** rnd
        rres, it_r = banded_solve(jnp.asarray(Rh2, jnp.float32),
                                  jnp.asarray(ph2, jnp.float32), wf_h,
                                  max_iters=40, chunks=3, edges=er)
        sync.fetch_scalar(rres.residual)
        rit += it_r
        Rh2 = np.asarray(rres.R, np.float64)
        ph2 = np.asarray(rres.p, np.float64)
        round_costs.append(host_cost(vres0.factors, Rh2, ph2))
        print(f"refine round {rnd}: iters {it_r} "
              f"cost(init-set) {round_costs[-1]:.3f}", flush=True)
        if round_costs[-1] < best_cost:
            best_cost = round_costs[-1]
            best_Rp = (Rh2, ph2)
        else:
            break                       # null-mode slide — stop refining
    Rh2, ph2 = best_Rp
    t_refine = time.perf_counter() - t0
    out["hier_consensus"] = {
        "blocks_edges_polish_s": round(t_cons, 2),
        "refine_s": round(t_refine, 2),
        "total_wall_s": round(t_cons + t_refine, 2),
        "n_edges": hinfo.get("n_edges"),
        "timings": hinfo.get("timings"),
        "overflow": hinfo.get("overflow"),
        "refine_iters": rit,
        "refine_rounds": refine_rounds,
        "refine_round_costs": [round(c, 3) for c in round_costs],
        "refine_edge_anneal": anneal,
        "polish_iters": hinfo.get("polish_iters"),
        "n_gated_measurements": hinfo.get("n_gated_measurements"),
        "n_prior_pairs": hinfo.get("n_prior_pairs"),
        "cost_before_refine": host_cost(vres0.factors, Rh, ph),
        "rsme_before_refine": rsme(Rh, ph, R_gt, p_gt),
        "rsme": rsme(Rh2, ph2, R_gt, p_gt),
        "rpe10": rpe(Rh2, ph2, R_gt, p_gt),
        "cost": host_cost(vres0.factors, Rh2, ph2),
        "cost_own_assoc": host_cost(vres_h.factors, Rh2, ph2),
        "cost_gt_own_assoc": host_cost(vres_h.factors, R_gt, p_gt)}
    out["cost_hier"] = out["hier_consensus"]["cost"]
    print("hier_consensus:", out["hier_consensus"], flush=True)

    # ---- flat dense packed (the one-program path, W <= 1024) ----
    if W <= 1024:
        Rd, pd_, flat, _ = flat_tpu(scans, R0, p0, vcfg, W)
        flat["rsme"] = rsme(Rd, pd_, R_gt, p_gt)
        flat["rpe10"] = rpe(Rd, pd_, R_gt, p_gt)
        flat["cost"] = host_cost(vres0.factors, Rd, pd_)
        out["flat_dense"] = flat
        out["cost_flat_dense"] = flat["cost"]
        print("flat_dense:", flat, flush=True)

    out["hier_over_flat_cost"] = out["cost_hier"] / out["cost_flat_banded"]
    out["flat_banded_over_gt_cost"] = (
        out["cost_flat_banded"] / out["cost_gt"])
    out["hier_over_gt_cost"] = out["cost_hier"] / out["cost_gt"]
    out["analysis"] = (
        "Round-5 protocol.  The block-tridiagonal banded solver "
        "(solver/banded.py) gives exact dense-quality LM steps at any W "
        "(the W=2048 dense one-program compile ceiling no longer "
        "matters) — but the corridor's fixed-association cost is "
        "DEGENERATE at this scale: an f64 banded descent reaches "
        "0.98x the ground-truth cost with a collapsed trajectory "
        "(RSME 40 deg / 19 m, artifacts/w1536_flat_ab.json), so an "
        "edge-free flat solve ('flat_banded' above) is recorded for "
        "honesty, not recommended.  The production path is "
        "hier_consensus: vmapped device-batched 16-scan block BAs -> "
        "consecutive-scan consensus edges from the overlapping "
        "per-block solutions, gated against the init's drift envelope "
        "(degenerate-geometry blocks slide metres and are replaced by "
        "the odometry prior at prior weight) -> chunked banded polish "
        "from the init on the init-associated factors plus the edges.  "
        "Cost is evaluated on the common init-pose f64 factor set AND "
        "each method's own re-associated set; quality is judged by "
        "cost + RPE together (CLAUDE.md: never ATE alone, and past "
        "W~1024 never cost alone either).")

    np.savez_compressed(
        ROOT / "artifacts" / f"hba_tpu_large_w{W}_poses.npz",
        R_hier=Rh2, p_hier=ph2, R_gt=R_gt, p_gt=p_gt, R0=R0, p0=p0)
    with open(ROOT / "artifacts" / f"hba_tpu_large_w{W}.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
