"""Coarse-to-fine on the REAL 177-scan dataset (VERDICT r2 #7).

The reference README's flagship recipe ("Notes for real-world
experiments": large voxel + loose criteria first, then re-associate
smaller + stricter) demonstrated on the reference's own benchmark data,
wired as `realworld.run(stages=...)`:

  (a) shipped odometry init (good): c2f must MATCH single-resolution
  (b) degraded init (cumulative rot/trans noise past the 1 m voxel
      basin): single-resolution locks into drifted association; the
      coarse stage re-forms the constraints and c2f recovers

Comparison metric: fresh-association cluster cost at each solution +
ATE vs the good-init flat optimum.  Writes artifacts/c2f_realworld.json.

Run: python scripts/c2f_realworld.py [max_scans]
"""

import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache"))

import jax.numpy as jnp  # noqa: E402

from balm_tpu.config import SolverConfig, VoxelConfig  # noqa: E402
from balm_tpu.ops import factors as Fmod, lie  # noqa: E402
from balm_tpu.pipelines import coarse_to_fine as c2f  # noqa: E402
from balm_tpu.pipelines import realworld  # noqa: E402
from balm_tpu.solver import lm  # noqa: E402
from balm_tpu.utils import metrics  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402


def common_cost(scans, R, p, vcfg):
    """MEAN per-point cluster cost at fresh association (normalized by
    sum(coe) — raw sums are not comparable across trajectories that
    admit different plane sets; see hierarchical._global_residual)."""
    vres = grid.voxelize(list(scans), np.asarray(R), np.asarray(p), vcfg,
                         dtype=np.float64)
    fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    T = lie.pose_matrix(jnp.asarray(R), jnp.asarray(p))
    return (float(Fmod.residual_only(T, fj))
            / max(float(np.sum(np.asarray(fj.coe))), 1.0))


def degrade(R, p, seed=7, rot_step_deg=0.4, trans_step=0.04):
    """Cumulative random-walk perturbation (odometry-drift shaped)."""
    rng = np.random.default_rng(seed)
    W = len(R)
    Rn = R.copy()
    pn = p.copy()
    dR = np.eye(3)
    dp = np.zeros(3)
    for i in range(1, W):
        w = rng.standard_normal(3)
        w *= np.deg2rad(rot_step_deg) / max(np.linalg.norm(w), 1e-9)
        dR = dR @ np.asarray(lie.so3_exp(jnp.asarray(w)))
        dp = dp + rng.standard_normal(3) * trans_step
        Rn[i] = dR @ R[i]
        pn[i] = dR @ p[i] + dp
    return Rn, pn


def solve_single(scans, R, p, vcfg, scfg):
    t0 = time.perf_counter()
    vres = grid.voxelize(list(scans), R, p, vcfg, dtype=np.float64)
    fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    res = lm.damping_iter(jnp.asarray(R), jnp.asarray(p), fj, scfg)
    return (np.asarray(res.R), np.asarray(res.p),
            time.perf_counter() - t0, vres.num_planes)


def main(max_scans=None):
    cfg = realworld.RealworldConfig(max_scans=max_scans)
    R0, p0, scans = realworld.load(cfg)
    scfg = SolverConfig(max_iters=10, u_init=0.01, min_planes_per_pose=1)
    vfine = cfg.voxel
    out = {"scans": len(scans)}

    # the good-init flat optimum = the accuracy anchor
    Rf, pf, t_flat, planes = solve_single(scans, R0, p0, vfine, scfg)
    Rg, pg = lie.gauge_fix(jnp.asarray(Rf), jnp.asarray(pf))
    out["flat_good_init"] = {
        "total_s": round(t_flat, 1), "planes": planes,
        "cost": common_cost(scans, Rf, pf, vfine)}

    def ate(R, p):
        r, t = metrics.pose_rsme(
            *lie.gauge_fix(jnp.asarray(R), jnp.asarray(p)), Rg, pg)
        return [float(r) * 57.2958, float(t)]

    stages = c2f.default_stages()

    # (a) good init: c2f must not hurt
    t0 = time.perf_counter()
    R1, p1, hist = c2f.run(scans, R0, p0, stages, scfg)
    out["c2f_good_init"] = {
        "total_s": round(time.perf_counter() - t0, 1),
        "cost": common_cost(scans, R1, p1, vfine),
        "ate_vs_flat": ate(R1, p1),
        "stages": [{k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in h.items()} for h in hist]}
    print("c2f good:", out["c2f_good_init"]["cost"],
          out["c2f_good_init"]["ate_vs_flat"], flush=True)

    # (b) degraded init
    Rd, pd = degrade(R0, p0)
    out["degraded_init"] = {"cost": common_cost(scans, Rd, pd, vfine),
                            "ate_vs_flat": ate(Rd, pd)}
    print("degraded init:", out["degraded_init"], flush=True)

    R2, p2, t_s, planes2 = solve_single(scans, Rd, pd, vfine, scfg)
    out["flat_degraded_init"] = {
        "total_s": round(t_s, 1), "planes": planes2,
        "cost": common_cost(scans, R2, p2, vfine),
        "ate_vs_flat": ate(R2, p2)}
    print("flat from degraded:", out["flat_degraded_init"], flush=True)

    t0 = time.perf_counter()
    R3, p3, hist = c2f.run(scans, Rd, pd, stages, scfg)
    out["c2f_degraded_init"] = {
        "total_s": round(time.perf_counter() - t0, 1),
        "cost": common_cost(scans, R3, p3, vfine),
        "ate_vs_flat": ate(R3, p3),
        "stages": [{k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in h.items()} for h in hist]}
    print("c2f from degraded:", out["c2f_degraded_init"], flush=True)

    # wired API check: realworld.run(stages=...)
    rcfg = dataclasses.replace(cfg, stages=stages, max_scans=30)
    s = realworld.run(rcfg)
    out["api_stages_30scan"] = {
        "status": s["status"], "planes": int(s["num_planes"]),
        "residual": s["residual_final"],
        "n_stages": len(s["stage_history"])}

    with open("artifacts/c2f_realworld.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote artifacts/c2f_realworld.json", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else None)
