"""Hierarchical BA oracle: long synthetic trajectory, block solve + anchor
solve must approach the flat full-window solution."""

import numpy as np
import jax.numpy as jnp
import pytest

from balm_tpu.config import SolverConfig, VoxelConfig
from balm_tpu.ops import lie
from balm_tpu.pipelines import hierarchical
from balm_tpu.utils import metrics
from balm_tpu.voxel import grid
from balm_tpu.solver import lm
from balm_tpu.ops import factors as Fmod


def make_long_scene(W=32, n_planes=30, pts_per=120, seed=0):
    """Drifting trajectory through a field of axis-aligned patches."""
    rng = np.random.default_rng(seed)
    # smooth trajectory
    w_rates = rng.normal(0, 0.01, size=(W, 3))
    v_rates = rng.normal(0, 0.15, size=(W, 3))
    R = np.zeros((W, 3, 3))
    p = np.zeros((W, 3))
    R[0] = np.eye(3)
    for i in range(1, W):
        R[i] = R[i - 1] @ np.array(lie.so3_exp(jnp.asarray(w_rates[i])))
        p[i] = p[i - 1] + v_rates[i]

    centers = rng.uniform(-6, 6, size=(n_planes, 3))
    centers = np.floor(centers) + 0.5
    axes = rng.integers(0, 3, size=n_planes)
    scans = []
    for w in range(W):
        pts = []
        for g in range(n_planes):
            uv = rng.uniform(-0.45, 0.45, size=(pts_per, 2))
            th = rng.normal(0, 0.003, size=(pts_per, 1))
            local = np.concatenate([uv, th], -1)
            perm = np.roll(np.arange(3), axes[g] + 1)
            world = local[:, perm] + centers[g]
            body = (world - p[w]) @ R[w]
            pts.append(body)
        scans.append(np.concatenate(pts))
    return R, p, scans


def perturb_drift(R, p, seed, rot_deg=0.6, trans=0.05):
    rng = np.random.default_rng(seed)
    W = len(R)
    drot = rng.normal(0, rot_deg / 57.3 / np.sqrt(3), size=(W, 3))
    dtra = rng.normal(0, trans / np.sqrt(3), size=(W, 3))
    Rn = np.einsum("wab,wbc->wac", R, np.array(lie.so3_exp(jnp.asarray(drot))))
    return Rn, p + dtra


def test_hierarchical_matches_flat():
    R_gt, p_gt, scans = make_long_scene(seed=10)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=11)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))

    rot0, tra0 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg
    )

    cfg = hierarchical.HierarchicalConfig(
        block=8, stride=6, cycles=1,   # 1 cycle: mechanics, not peak quality
        voxel=VoxelConfig(voxel_size=1.0, min_observers=2),
        top_voxel=VoxelConfig(voxel_size=1.0, min_observers=2),
    )
    Rh, ph, info = hierarchical.run(scans, R0, p0, cfg)
    roth, trah = metrics.pose_rsme(jnp.asarray(Rh), jnp.asarray(ph), Rg, pg)

    # flat reference solve
    vres = grid.voxelize(list(scans), R0, p0,
                         VoxelConfig(voxel_size=1.0), dtype=np.float64)
    fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    flat = lm.damping_iter(
        jnp.asarray(R0), jnp.asarray(p0), fj,
        SolverConfig(max_iters=15, u_init=0.01, min_planes_per_pose=1),
    )
    rotf, traf = metrics.pose_rsme(flat.R, flat.p, Rg, pg)

    assert info["n_blocks"] >= 4
    # hierarchical must strongly reduce the initial error...
    assert float(roth) < 0.25 * float(rot0)
    assert float(trah) < 0.25 * float(tra0)
    # ...and come close to the flat solution (within 2x its error,
    # both being far below the initial error)
    assert float(trah) < max(2.0 * float(traf), 0.005)


def test_batched_bottom_matches_loop():
    """The vmap-batched block solver must give the same result as the
    per-block loop."""
    R_gt, p_gt, scans = make_long_scene(W=20, seed=14)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=15)
    from balm_tpu.config import SolverConfig as _SC

    # pinned short top solve + no edges: strict mechanism equality (a
    # 30-iteration top solve amplifies 1e-9 block-order noise past 1e-8)
    top = _SC(max_iters=10, u_init=0.01, min_planes_per_pose=1)
    base = hierarchical.HierarchicalConfig(block=8, stride=6, polish=False,
                                           cycles=1, top_solver=top,
                                           use_overlap_edges=False)
    batched = hierarchical.HierarchicalConfig(block=8, stride=6,
                                              polish=False, cycles=1,
                                              top_solver=top,
                                              use_overlap_edges=False,
                                              batched_bottom=True)
    R1, p1, _ = hierarchical.run(scans, R0, p0, base)
    R2, p2, _ = hierarchical.run(scans, R0, p0, batched)
    assert np.allclose(R1, R2, atol=1e-8)
    assert np.allclose(p1, p2, atol=1e-8)


def test_hierarchical_no_polish_still_good():
    R_gt, p_gt, scans = make_long_scene(W=24, seed=12)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=13)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    cfg = hierarchical.HierarchicalConfig(block=8, stride=6, polish=False,
                                          cycles=1)
    Rh, ph, info = hierarchical.run(scans, R0, p0, cfg)
    rot0, tra0 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg
    )
    roth, trah = metrics.pose_rsme(jnp.asarray(Rh), jnp.asarray(ph), Rg, pg)
    assert float(trah) < 0.4 * float(tra0)


def test_refeature_super_scan_keeps_planes_drops_clutter():
    """The planar-inlier filter must retain plane-patch points and drop
    scattered volumetric noise (the feature re-extraction that keeps
    recursive levels' association from thinning)."""
    rng = np.random.default_rng(5)
    n_pl = 400
    plane = np.stack([rng.uniform(0, 0.9, n_pl), rng.uniform(0, 0.9, n_pl),
                      0.5 + rng.normal(0, 0.002, n_pl)], -1)
    clutter = rng.uniform(2.05, 2.95, size=(60, 3))  # one sparse voxel
    sp = np.concatenate([plane, clutter])
    out = hierarchical.refeature_super_scan(
        sp, VoxelConfig(min_observers=1, min_points=15))
    # all plane points survive; the diffuse clutter voxel is rejected
    assert len(out) >= n_pl
    assert len(out) < len(sp)
    assert np.all(out[:, 2] < 1.0)


def test_recursive_refeature_no_worse():
    """Recursion with super-scan re-extraction must match the quality of
    recursion on raw super-scans on a well-conditioned scene (and runs
    the 'always' config path)."""
    R_gt, p_gt, scans = make_long_scene(W=24, seed=41)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=42)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    raw = hierarchical.HierarchicalConfig(block=8, stride=6, polish=False,
                                          cycles=1, recurse_at=2,
                                          refeature_supers="off")
    ref = hierarchical.HierarchicalConfig(block=8, stride=6, polish=False,
                                          cycles=1, recurse_at=2,
                                          refeature_supers="always")
    R1, p1, _ = hierarchical.run(scans, R0, p0, raw)
    R2, p2, i2 = hierarchical.run(scans, R0, p0, ref)
    _, t1 = metrics.pose_rsme(jnp.asarray(R1), jnp.asarray(p1), Rg, pg)
    _, t2 = metrics.pose_rsme(jnp.asarray(R2), jnp.asarray(p2), Rg, pg)
    assert "recursed" in i2
    assert float(t2) < 1.5 * float(t1) + 1e-4


def test_recursive_top_level_matches_direct():
    """Forcing recursion at a tiny anchor count must land at the same
    quality as the direct top solve (mechanism regression test; the
    production default reserves recursion for huge maps)."""
    R_gt, p_gt, scans = make_long_scene(W=24, seed=31)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=32)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))

    base = hierarchical.HierarchicalConfig(block=8, stride=6, polish=False,
                                           cycles=1)
    rec = hierarchical.HierarchicalConfig(block=8, stride=6, polish=False,
                                          cycles=1, recurse_at=2)
    R1, p1, i1 = hierarchical.run(scans, R0, p0, base)
    R2, p2, i2 = hierarchical.run(scans, R0, p0, rec)
    assert "recursed" in i2 and "recursed" not in i1
    _, t1 = metrics.pose_rsme(jnp.asarray(R1), jnp.asarray(p1), Rg, pg)
    _, t2 = metrics.pose_rsme(jnp.asarray(R2), jnp.asarray(p2), Rg, pg)
    assert float(t2) < 2.0 * float(t1) + 1e-4


def test_c2f_top_stages_no_worse():
    """A coarse-to-fine top-level schedule (top_stages) must plumb
    through and end no worse than the single-resolution top level (its
    last stage is the same fine voxel config).  The capability it adds —
    forming loop-closure constraints whose drift exceeds the fine voxel
    — is demonstrated at scale in scripts/hba_city_demo.py."""
    from balm_tpu.pipelines import coarse_to_fine

    R_gt, p_gt, scans = make_long_scene(W=24, seed=21)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=22)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    base = hierarchical.HierarchicalConfig(block=8, stride=6, polish=False,
                                           cycles=1)
    c2f = hierarchical.HierarchicalConfig(
        block=8, stride=6, polish=False, cycles=1,
        top_stages=coarse_to_fine.default_stages())
    R1, p1, _ = hierarchical.run(scans, R0, p0, base)
    R2, p2, info = hierarchical.run(scans, R0, p0, c2f)
    _, tra1 = metrics.pose_rsme(jnp.asarray(R1), jnp.asarray(p1), Rg, pg)
    _, tra2 = metrics.pose_rsme(jnp.asarray(R2), jnp.asarray(p2), Rg, pg)
    assert info["top_planes"] > 0
    assert float(tra2) < 1.2 * float(tra1) + 1e-3


def test_global_sweep_large_solver_path():
    """HierarchicalConfig.global_sweep with the span-compressed solver
    forced ('large'): the alternating block/global-sweep cycle must run
    and not degrade the solve (the scalable configuration for W past the
    dense comfort zone)."""
    import dataclasses as _dc

    from balm_tpu.config import VoxelConfig as _V

    R_gt, p_gt, scans = make_long_scene(W=24, n_planes=50, pts_per=120,
                                        seed=33)
    rng = np.random.default_rng(5)
    R0 = np.stack([
        np.asarray(lie.so3_exp(jnp.asarray(
            rng.standard_normal(3) * 0.01))) @ R_gt[i]
        for i in range(len(scans))])
    p0 = p_gt + rng.standard_normal(p_gt.shape) * 0.02

    cfg = hierarchical.HierarchicalConfig(
        block=8, stride=6, cycles=1, polish=False,
        voxel=_V(voxel_size=1.0), top_voxel=_V(voxel_size=1.0),
        global_sweep=3, global_sweep_solver="large", cycle_guard=False)
    R1, p1, info = hierarchical.run(scans, R0, p0, cfg)
    assert info.get("global_sweeps", 0) == 1
    rot1, tra1 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R1), jnp.asarray(p1)),
        *lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt)))
    rot0, tra0 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)),
        *lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt)))
    assert float(tra1) < 0.5 * float(tra0)
    assert float(rot1) < 0.5 * float(rot0)


def test_run_device_batched_refines():
    """The TPU-native batched hierarchy (vmapped on-device association +
    vmapped packed block solves + packed anchor solve) must recover a
    drift-perturbed trajectory."""
    from balm_tpu.ops import lie as _lie
    from balm_tpu.utils import metrics as _metrics

    R_gt, p_gt, scans = make_long_scene(W=24, n_planes=30, pts_per=100,
                                        seed=6)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=7)
    R1, p1, info = hierarchical.run_device_batched(
        scans, R0, p0, block=8, cycles=2,
        block_caps=(1 << 8, 1 << 10, 1 << 12), Gcap_block=512,
        cs_cap_block=1 << 13,
        top_caps=(1 << 8, 1 << 10, 1 << 12), Gcap_top=512,
        cs_cap_top=1 << 14)
    assert not info["overflow"]
    Rg, pg = _lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    r0, t0 = _metrics.pose_rsme(
        *_lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg)
    r1, t1 = _metrics.pose_rsme(
        *_lie.gauge_fix(jnp.asarray(R1), jnp.asarray(p1)), Rg, pg)
    assert float(r1) < 0.2 * float(r0), (float(r1), float(r0))
    assert float(t1) < 0.2 * float(t0), (float(t1), float(t0))


def test_consensus_edges_gate_degenerate_blocks():
    """Block measurements that violate the init's drift envelope are
    gated out and replaced by the init prior at prior weight (the
    degenerate-block failure: a corridor section with no along-axis
    planes lets per-pose axial translation slide metres — measured on
    44/191 W=1536 blocks, host and device alike)."""
    rng = np.random.default_rng(0)
    W, blk = 12, 4
    R_init = np.stack([np.eye(3)] * W)
    p_init = np.cumsum(rng.normal(0, 0.01, (W, 3)), axis=0)
    idx = np.stack([np.arange(s, s + blk) for s in (0, 2, 4, 6, 8)])
    B = len(idx)
    Rr = np.stack([R_init[i] for i in idx])
    pr = np.stack([p_init[i] - p_init[i[0]] for i in idx])
    # corrupt block 2 with a metre-scale slide (degenerate geometry)
    pr[2, 2:] += np.array([2.0, 0.0, 0.0])
    stats = {}
    edges = hierarchical.consensus_scan_edges(
        idx, Rr, pr, weight_scale=1e-3, init_R=R_init, init_p=p_init,
        stats=stats)
    assert stats["n_gated_measurements"] >= 1
    # every consecutive pair still has an edge (prior fallback)
    assert int(edges.i.shape[0]) == W - 1
    # no edge carries the corrupted 2 m measurement
    Zp = np.asarray(edges.Zp)
    Zp_init = np.stack([
        R_init[i].T @ (p_init[i + 1] - p_init[i]) for i in range(W - 1)])
    assert np.all(np.linalg.norm(Zp - Zp_init, axis=-1) < 0.5)
    # prior-fallback pairs are weighted as a prior, not a measurement
    w_tr = np.asarray(edges.w_tr)
    if stats["n_prior_pairs"]:
        assert w_tr.min() <= 1e-3 / (0.1 ** 2) * 1.001


def test_run_batched_consensus_recovers():
    """Blocks -> gated consensus edges -> banded polish from the init
    must recover a drift-perturbed trajectory (the round-5 large-W
    production path; the W=1536 TPU run lands at 1.07x the ground-truth
    cost with this machinery, artifacts/hba_tpu_large_w1536.json)."""
    R_gt, p_gt, scans = make_long_scene(W=24, n_planes=30, pts_per=100,
                                        seed=6)
    R0, p0 = perturb_drift(R_gt, p_gt, seed=7)
    R1, p1, info = hierarchical.run_batched_consensus(
        scans, R0, p0, block=8, cycles=1,
        block_caps=(1 << 8, 1 << 10, 1 << 12), Gcap_block=512,
        cs_cap_block=1 << 13,
        polish_solver=SolverConfig(max_iters=25, u_init=0.01),
        polish_chunks=2)
    assert info["n_edges"] == 23
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    r0, t0 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg)
    r1, t1 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R1), jnp.asarray(p1)), Rg, pg)
    assert float(r1) < 0.3 * float(r0), (float(r1), float(r0))
    assert float(t1) < 0.3 * float(t0), (float(t1), float(t0))
