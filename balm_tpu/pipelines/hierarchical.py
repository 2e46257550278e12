"""Hierarchical (HBA / Voxel-SLAM style) global bundle adjustment.

The reference caps its window at W = 177 poses with one dense (6W)^2 solve
(bavoxel.hpp:1104-1157); its README points to HBA as the application for
large maps.  This module is the from-scratch large-W design
(BASELINE.json configs[4]):

  1. BOTTOM: partition the trajectory into overlapping keyframe blocks.
     Every block is an independent small BA (voxelize + damped Newton in
     the block-anchor frame).  Blocks are embarrassingly parallel — on a
     pod slice they map onto the device mesh as data parallelism over the
     block axis, factor-sharding inside each block.
  2. TOP: freeze the refined intra-block geometry, merge each block's
     scans into one "super-scan" in its anchor frame, and run BA over the
     n_blocks anchor poses only.  The (6 n_blocks)^2 normal equations are
     a factor (W/stride)^2 smaller than the flat problem.
  3. COMPOSE: scan pose = refined anchor o refined intra-block relative
     pose; an optional flat polishing pass follows for moderate W.

Recursing step 2 gives O(log W) levels for arbitrarily long trajectories.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SolverConfig, VoxelConfig
from ..ops import factors as Fmod
from ..ops import lie
from ..solver import lm
from ..voxel import grid


@dataclasses.dataclass
class HierarchicalConfig:
    block: int = 10              # keyframes per block
    stride: int = 8              # block start spacing (block - stride overlap)
    voxel: VoxelConfig = VoxelConfig(min_observers=2)
    top_voxel: VoxelConfig = VoxelConfig(min_observers=2)
    solver: SolverConfig = SolverConfig(
        max_iters=10, u_init=0.01, min_planes_per_pose=1
    )
    top_solver: SolverConfig = SolverConfig(
        max_iters=30, u_init=0.01, min_planes_per_pose=1
    )
    # final flat refinement over all poses (skip for very large W)
    polish: bool = True
    polish_solver: SolverConfig = SolverConfig(
        max_iters=5, u_init=0.01, min_planes_per_pose=1
    )
    # downsample super-scans before the top-level association
    super_downsample: float = 0.0
    # solve all bottom-level blocks in ONE vmap-batched LM kernel
    batched_bottom: bool = False
    # repeat (bottom blocks -> anchor solve -> compose) this many times,
    # re-associating at the refined poses each cycle.  3 cycles beat the
    # flat solver at W=400 without any polish (artifacts/hba_scale.json);
    # 1 cycle leaves ~2x flat error at that scale.
    cycles: int = 3
    # inter-block constraints: overlap-consensus relative-pose factors
    # between consecutive anchors (ops/pose_graph.py).  Weight =
    # edge_weight * sigma_pt^2 / max(spread, edge_spread_floor)^2 —
    # sigma_pt^2 (median per-point plane variance from the bottom solves)
    # converts the edge into the plane cost's units (sum coe*lambda_0 is
    # points x m^2), spread is the shared scans' consensus disagreement
    # (~ the edge's own 1-sigma).  Without the sigma_pt^2 factor the
    # edges overpower the top-level planes and the hierarchy degenerates
    # to odometry chaining.
    use_overlap_edges: bool = True
    edge_weight: float = 1.0
    edge_spread_floor: float = 1e-3
    # recurse the top level when more than this many anchors remain.
    # A dense anchor solve is cheap well into the hundreds (6*512 = 3072
    # unknowns), and each recursion level widens the anchor spacing,
    # weakening the voxel association between super-scans — so recursion
    # is reserved for maps whose anchor count alone exceeds the dense
    # solver's comfort zone (W >> 10^4 raw scans).
    recurse_at: int = 512
    # super-scan feature re-extraction: before handing super-scans to the
    # next level, voxelize each SOLO and keep only points that fall in
    # admitted planar leaves.  Raw concatenated clouds associate worse at
    # every added level (wider anchor spacing -> scan-scale voxels see
    # disjoint slices of structure + accumulated non-planar clutter);
    # filtering to stable planar structure keeps level-k factors as
    # informative as level-1's.  'recursive' (default) applies it only
    # when this run will recurse; 'always' | 'off' force it.
    refeature_supers: str = "recursive"
    refeature_voxel: VoxelConfig = VoxelConfig(min_observers=1)
    # coarse-to-fine TOP level: when set, the anchor solve runs once per
    # stage (re-associating super-scans at the refined anchors between
    # stages).  Coarse root voxels catch loop-closure overlaps whose
    # accumulated drift exceeds the fine voxel size — the failure mode of
    # a single-resolution top level on multi-loop maps (a revisited
    # street drifted by > voxel_size never lands in the same fine leaf,
    # so the closure constraint is never even formed).  Same idea as
    # pipelines/coarse_to_fine.py, applied to the anchor problem.
    top_stages: Sequence[VoxelConfig] | None = None
    # alternating block/global sweeps: after each cycle's compose, run
    # this many LM iterations of a GLOBAL solve over all scans (fresh
    # association at the composed poses) before the cycle guard.  This
    # is how the hierarchy recovers the many-scan co-observation detail
    # that block decomposition discards (the recorded realworld finding:
    # hierarchy alone plateaus 1.19x above the flat optimum) while
    # keeping every stage scalable: the sweep uses the span-compressed
    # matrix-free solver (solver/large.py, O(G*S) memory, block-Jacobi
    # PCG) once the window exceeds the dense solver's comfort zone.
    # 0 = off (the polish flag remains the simple end-of-run variant).
    global_sweep: int = 0
    global_sweep_cg: int = 100
    # 'auto': dense Cholesky LM while 6W <= 3072, span-compressed PCG
    # past it; 'large' forces the scalable path
    global_sweep_solver: str = "auto"
    # full-problem re-association cost guard between cycles.  Worth its
    # two extra full voxelize+residual passes whenever a top solve can
    # diverge (multi-cycle, drifted scenes); safe to disable for the
    # single-cycle + global-sweep configuration, where the sweep's own
    # LM accept/reject already bounds the damage and the guard would be
    # ~40% of the wall.
    cycle_guard: bool = True
    # anchor-level pose-graph stage: when lifted loop edges exist, solve
    # the PURE anchor pose graph (consensus chain + lifted loops, Huber
    # on the loops) before the top plane solve.  This is the classic
    # detect -> PGO -> BA decomposition (pipelines/loopclose.close_loops)
    # applied at O(W/stride) cost: without it, the top plane solve starts
    # from drifted anchors whose super-scan association is locked out of
    # basin, and the loop edges lose the tug-of-war against the
    # mis-associated planes (city study: 4.6 deg final rotation vs 0.96
    # for scan-level PGO-first; with this stage the lift path matches).
    anchor_pgo: bool = True
    # keep the lifted loop edges OUT of the top plane solve (they are
    # consumed by the anchor PGO instead).  City study: stiff lifted
    # edges inside the plane solve destabilize it from [2.2 deg, 0.28 m]
    # (post-PGO) to [11.4 deg, 2.0 m] — the plane association at
    # residual-drift scale fights the pinned anchors and LM escapes
    # along the edge null space.
    anchor_pgo_only: bool = True
    # PGO engages only when the loop corrections actually exceed the
    # association basin: max over lifted edges of
    # (trans_correction + rot_correction * scene_radius) compared to
    # gate * voxel_size.  Below it the drift has NOT broken voxel
    # association, the plane solve handles the residual error better
    # than a graph warp through noisy (~2.5 cm) edge measurements, and
    # the lifted edges ride the top solve as before (benign in-basin).
    # City W=1200 (drift 2.7 deg * 50 m lever >> 1 voxel): PGO path wins
    # 1.09 vs 4.61 deg; healthy square fixture (0.4 m effective < gate):
    # skipped, identical-to-before behavior.
    anchor_pgo_gate: float = 0.5   # [voxels]
    # odometry-chain noise PER SCAN STEP for the anchor PGO (an anchor
    # gap of k scans gets sigma * k); same role as LoopConfig.chain_sigma*
    anchor_pgo_sigma_rot: float = 0.002   # [rad/step]
    anchor_pgo_sigma_trans: float = 0.01  # [m/step]
    # Huber points for the lifted loop edges (chi^2 sized from these),
    # mirroring LoopConfig.pgo_robust_*
    anchor_pgo_robust_rot: float = 0.02   # [rad]
    anchor_pgo_robust_trans: float = 0.05  # [m]


def _solve_window(scans, R, p, vcfg, scfg, edges=None):
    """-> (R, p, num_planes, sigma2) where sigma2 = plane residual /
    sum(coe) ~ the per-point out-of-plane noise variance (lambda_0 at the
    optimum is the plane's point-noise variance) — used to weight
    pose-graph edges consistently with the plane cost's units."""
    vres = grid.voxelize(list(scans), R, p, vcfg, dtype=np.float64)
    if vres.num_planes == 0:
        return R, p, 0, 0.0
    fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    res = lm.damping_iter(jnp.asarray(R), jnp.asarray(p), fj, scfg,
                          edges=edges)
    plane_res = float(res.residual)
    if edges is not None:
        # res.residual includes the pose-graph edge cost; sigma2 must be
        # the PLANE noise alone or recursion levels inflate the estimate
        # (and with it the next level's edge weights) with edge tension
        T = lie.pose_matrix(res.R, res.p)
        plane_res = float(Fmod.residual_only(T, fj))
    sum_coe = float(np.sum(np.asarray(fj.coe)))
    sigma2 = plane_res / max(sum_coe, 1.0)
    return np.asarray(res.R), np.asarray(res.p), vres.num_planes, sigma2


def solve_blocks_batched(block_factors, Rs, ps, scfg: SolverConfig):
    """Solve MANY equal-window blocks in ONE batched (vmap) LM kernel.

    block_factors: list of PlaneFactors with identical window size; plane
    axes are padded to the common maximum (padding contributes zero).
    Rs (B, Wb, 3, 3), ps (B, Wb, 3).  Returns ((B, Wb, 3, 3), (B, Wb, 3),
    sigma2 (B,)) where sigma2 is each block's residual / sum(coe) — the
    per-point noise estimate the overlap-edge weighting needs (the loop
    branch computes the same quantity in _solve_window).

    This is the TPU-native bottom level: the blocks' while_loops run in
    lockstep under vmap (finished blocks keep iterating on converged
    state, which is idempotent), so one kernel launch refines the whole
    trajectory's blocks — and under a device mesh the batch axis shards
    as data parallelism.
    """
    B = len(block_factors)
    Gmax = max(f.num_planes for f in block_factors)
    Gmax = -(-Gmax // 128) * 128

    def pad(f):
        G = f.num_planes
        return Fmod.PlaneFactors(*[
            jnp.zeros((Gmax,) + np.asarray(x).shape[1:],
                      np.asarray(x).dtype).at[:G].set(jnp.asarray(x))
            for x in f
        ])

    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[pad(f) for f in block_factors]
    )
    out = jax.vmap(lambda R, p, f: lm.damping_iter(R, p, f, cfg=scfg))(
        jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ps)), stacked
    )
    sum_coe = np.maximum(
        np.asarray([float(np.sum(np.asarray(f.coe))) for f in block_factors]),
        1.0)
    sigma2 = np.asarray(out.residual, np.float64) / sum_coe
    return np.asarray(out.R), np.asarray(out.p), sigma2


def refeature_super_scan(sp: np.ndarray, vcfg: VoxelConfig) -> np.ndarray:
    """Planar-inlier filter: keep only points of `sp` (one super-scan,
    anchor frame) that fall inside admitted planar leaves when the cloud
    is voxelized solo.  This is the hierarchy's feature re-extraction —
    the analogue of the front-end's surf extraction, but defined on the
    composed map geometry instead of raw scanlines."""
    if len(sp) < vcfg.min_points:
        return sp
    vres = grid.voxelize(
        [np.asarray(sp, np.float64)], np.eye(3)[None], np.zeros((1, 3)),
        dataclasses.replace(vcfg, min_observers=1), dtype=np.float64)
    keep = vres.point_leaf >= 0
    if not keep.any():
        return sp
    return np.asarray(sp)[keep]


def _edges_in_block(scan_edges, idx):
    """Subset of scan-level edges with both endpoints in `idx`, remapped
    to block-local indices (None if empty)."""
    if scan_edges is None:
        return None
    pos = {i: j for j, i in enumerate(idx)}
    ei = np.asarray(scan_edges.i)
    ej = np.asarray(scan_edges.j)
    keep = [k for k in range(len(ei)) if ei[k] in pos and ej[k] in pos]
    if not keep:
        return None
    from ..ops import pose_graph as PG

    return PG.RelPoseEdges(
        i=jnp.asarray([pos[int(ei[k])] for k in keep], jnp.int32),
        j=jnp.asarray([pos[int(ej[k])] for k in keep], jnp.int32),
        Zr=jnp.asarray(np.asarray(scan_edges.Zr)[keep]),
        Zp=jnp.asarray(np.asarray(scan_edges.Zp)[keep]),
        w_rot=jnp.asarray(np.asarray(scan_edges.w_rot)[keep]),
        w_tr=jnp.asarray(np.asarray(scan_edges.w_tr)[keep]),
    )


def run(
    scans: Sequence[np.ndarray],
    R: np.ndarray,
    p: np.ndarray,
    cfg: HierarchicalConfig = HierarchicalConfig(),
    *,
    verbose: bool = False,
    scan_edges=None,
):
    """Returns (R, p, info dict).

    scan_edges: optional RelPoseEdges between the input scan indices
    (used by the recursive top level to inherit the previous level's
    inter-block constraints; with chained anchors and overlapping blocks
    every edge lands fully inside at least one block).
    """
    W = len(scans)
    if cfg.stride > cfg.block:
        raise ValueError(
            f"stride ({cfg.stride}) > block ({cfg.block}) leaves scans in "
            "no block (unowned poses would compose against garbage)")
    R = np.asarray(R, np.float64).copy()
    p = np.asarray(p, np.float64).copy()
    info = {"blocks": [], "W": W}

    starts = list(range(0, max(W - cfg.block, 0) + 1, cfg.stride))
    if not starts or starts[-1] + cfg.block < W:
        starts.append(max(W - cfg.block, 0))
    starts = sorted(set(starts))
    nb = len(starts)

    def _global_residual(Rc, pc):
        """Full-problem MEAN per-point plane cost at the given poses
        (re-associated) — the cycle acceptance metric.  Normalized by
        sum(coe): the raw cost sum_g coe_g*lambda0_g grows when an
        IMPROVED trajectory admits more planes (new coe*lambda0 terms),
        so the unnormalized value is not monotone in map quality across
        different associations and would wrongly revert good cycles.
        Scan-level edges (verified loop closures) are added in the same
        normalization: a cycle that lowers plane cost by locking into
        drifted association while violating the loops must not be
        accepted."""
        vres = grid.voxelize(list(scans), Rc, pc, cfg.voxel,
                             dtype=np.float64)
        if vres.num_planes == 0:
            return np.inf
        fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
        T = lie.pose_matrix(jnp.asarray(Rc), jnp.asarray(pc))
        sum_coe = max(float(np.sum(np.asarray(fj.coe))), 1.0)
        cost = float(Fmod.residual_only(T, fj))
        if scan_edges is not None:
            from ..ops import pose_graph as PG

            cost += float(PG.relpose_cost(
                jnp.asarray(Rc), jnp.asarray(pc), scan_edges))
        return cost / sum_coe

    res_prev = _global_residual(R, p) if cfg.cycle_guard else np.inf
    for _cycle in range(max(cfg.cycles, 1)):
      R_snap, p_snap = R.copy(), p.copy()
      # --- bottom level: per-block BA in anchor frames ---
      rel_R = [None] * W   # refined pose of scan i relative to its anchor
      rel_p = [None] * W
      owner = np.empty(W, np.int64)
      anchors = np.zeros(nb, np.int64)

      block_local = []
      sigma2_blocks = []
      for k, s0 in enumerate(starts):
          idx = list(range(s0, min(s0 + cfg.block, W)))
          anchors[k] = idx[0]
          # block-local poses: anchor frame
          Ra = R[idx[0]]
          pa = p[idx[0]]
          Rb = np.einsum("ba,nbc->nac", Ra, R[idx])
          pb = np.einsum("ba,nb->na", Ra, p[idx] - pa)
          block_local.append((idx, Rb, pb))

      if (cfg.batched_bottom and scan_edges is None
              and len({len(b[0]) for b in block_local}) == 1):
          facs = []
          for (idx, Rb, pb) in block_local:
              vres = grid.voxelize(
                  [scans[i] for i in idx], Rb, pb, cfg.voxel, dtype=np.float64
              )
              facs.append(vres.factors)
              info["blocks"].append({"start": idx[0], "size": len(idx),
                                     "planes": vres.num_planes})
          Rall, pall, sig2_all = solve_blocks_batched(
              facs, [b[1] for b in block_local], [b[2] for b in block_local],
              cfg.solver,
          )
          sigma2_blocks.extend(float(s) for s in sig2_all)
          solved = [(block_local[k][0], Rall[k], pall[k]) for k in range(nb)]
      else:
          solved = []
          for (idx, Rb, pb) in block_local:
              Rb, pb, nplanes, sig2 = _solve_window(
                  [scans[i] for i in idx], Rb, pb, cfg.voxel, cfg.solver,
                  edges=_edges_in_block(scan_edges, idx),
              )
              sigma2_blocks.append(sig2)
              info["blocks"].append({"start": idx[0], "size": len(idx),
                                     "planes": nplanes})
              solved.append((idx, Rb, pb))

      for k, (idx, Rb, pb) in enumerate(solved):
          s0 = idx[0]
          for j, i in enumerate(idx):
              if rel_R[i] is None or (s0 <= i < s0 + cfg.stride) or k == nb - 1:
                  owner[i] = k
                  rel_R[i] = Rb[j]
                  rel_p[i] = pb[j]

      # --- inter-block constraints: overlap-consensus anchor edges ---
      # every scan shared by blocks k and k+1 was refined in BOTH anchor
      # frames; each gives a measurement of T_ak^-1 T_ak+1, and their
      # Lie-mean is a strong relative-pose factor that survives the
      # super-scan compression below (the round-1 top level lost exactly
      # this information and was 3.5x worse than flat)
      anchor_edges = None
      if cfg.use_overlap_edges and nb > 1:
          from ..ops import pose_graph as PG

          ei, ej, Zr_l, Zp_l, wr_l = [], [], [], [], []
          for k in range(nb - 1):
              ia, Ra_, pa_ = solved[k]
              ib, Rb_, pb_ = solved[k + 1]
              shared = sorted(set(ia) & set(ib))
              if not shared:
                  continue
              la = [ia.index(s) for s in shared]
              lb = [ib.index(s) for s in shared]
              Zr, Zp, spread = PG.consensus_edge(
                  [Ra_[x] for x in la], [pa_[x] for x in la],
                  [Rb_[x] for x in lb], [pb_[x] for x in lb])
              sigma2 = float(np.median(sigma2_blocks)) if sigma2_blocks else 1e-5
              w = (cfg.edge_weight * sigma2
                   / max(spread, cfg.edge_spread_floor) ** 2)
              ei.append(k)
              ej.append(k + 1)
              Zr_l.append(Zr)
              Zp_l.append(Zp)
              wr_l.append(w)
          if ei:
              anchor_edges = PG.RelPoseEdges(
                  i=jnp.asarray(ei, jnp.int32),
                  j=jnp.asarray(ej, jnp.int32),
                  Zr=jnp.asarray(np.stack(Zr_l)),
                  Zp=jnp.asarray(np.stack(Zp_l)),
                  w_rot=jnp.asarray(wr_l),
                  w_tr=jnp.asarray(wr_l),
              )
              info["n_edges"] = len(ei)

      # loop-closure (and any other long-range) scan edges span blocks by
      # construction — re-express them on the anchor graph so they
      # survive the super-scan compression (ops/pose_graph.lift_edges)
      anchor_pgo_poses = None
      if scan_edges is not None:
          from ..ops import pose_graph as PG

          consensus = anchor_edges
          lifted = PG.lift_edges(scan_edges, owner, rel_R, rel_p)
          if lifted is not None:
              info["n_lifted_edges"] = int(len(np.asarray(lifted.i)))
              # drift gate: effective displacement of revisited geometry
              li = np.asarray(lifted.i)
              lj = np.asarray(lifted.j)
              lZr = np.asarray(lifted.Zr)
              lZp = np.asarray(lifted.Zp)
              r_scene = float(np.max(np.linalg.norm(
                  p - p.mean(axis=0), axis=1)))
              eff = 0.0
              for k in range(len(li)):
                  a, b = int(li[k]), int(lj[k])
                  Ra_, pa_ = R[anchors[a]], p[anchors[a]]
                  Rb_, pb_ = R[anchors[b]], p[anchors[b]]
                  dR = Ra_.T @ Rb_
                  dp = Ra_.T @ (pb_ - pa_)
                  ang = np.arccos(np.clip(
                      (np.trace(lZr[k].T @ dR) - 1) / 2, -1, 1))
                  eff = max(eff, float(np.linalg.norm(dp - lZp[k])
                                       + ang * r_scene))
              info["loop_drift_effective_m"] = eff
              pgo_needed = (cfg.anchor_pgo and
                            eff > cfg.anchor_pgo_gate * cfg.voxel.voxel_size)
              if not (pgo_needed and cfg.anchor_pgo_only):
                  anchor_edges = PG.concat_edges(anchor_edges, lifted)
              if pgo_needed:
                  from . import loopclose as LCm

                  # chain measurements: overlap consensus when it covers
                  # every consecutive anchor pair (refined by the bottom
                  # solves), else the current anchor estimate
                  if (consensus is not None
                          and len(np.asarray(consensus.i)) == nb - 1):
                      chain = consensus
                  else:
                      chain = LCm.chain_edges(R[anchors], p[anchors],
                                              1.0, 1.0)
                  ci = np.asarray(chain.i)
                  cj = np.asarray(chain.j)
                  gaps = np.maximum(
                      anchors[cj] - anchors[ci], 1).astype(np.float64)
                  chain = chain._replace(
                      w_rot=jnp.asarray(
                          1.0 / (cfg.anchor_pgo_sigma_rot * gaps) ** 2),
                      w_tr=jnp.asarray(
                          1.0 / (cfg.anchor_pgo_sigma_trans * gaps) ** 2),
                  )
                  delta = jnp.concatenate([
                      jnp.full((len(ci),), 1e30, jnp.float64),
                      jnp.asarray(lifted.w_rot, jnp.float64)
                      * cfg.anchor_pgo_robust_rot ** 2
                      + jnp.asarray(lifted.w_tr, jnp.float64)
                      * cfg.anchor_pgo_robust_trans ** 2,
                  ])
                  Ra_pg, pa_pg, pinfo = LCm.pose_graph_optimize(
                      R[anchors], p[anchors],
                      PG.concat_edges(chain, lifted), delta=delta)
                  info["anchor_pgo"] = pinfo
                  anchor_pgo_poses = (Ra_pg, pa_pg)
                  if _cycle == 0:
                      # diagnostic: the PGO-composed trajectory before
                      # any top plane solve touches it
                      Rprov = np.stack([Ra_pg[owner[i]] @ rel_R[i]
                                        for i in range(W)])
                      pprov = np.stack([Ra_pg[owner[i]] @ rel_p[i]
                                        + pa_pg[owner[i]]
                                        for i in range(W)])
                      info["anchor_pgo_provisional"] = (Rprov, pprov)

      # --- top level: super-scans in anchor frames ---
      will_recurse = nb > cfg.recurse_at
      refeature = (cfg.refeature_supers == "always"
                   or (cfg.refeature_supers == "recursive" and will_recurse))
      super_scans = []
      for k, s0 in enumerate(starts):
          idx = [i for i in range(W) if owner[i] == k]
          pts = []
          for i in idx:
              pts.append(scans[i] @ np.asarray(rel_R[i]).T + rel_p[i])
          sp = np.concatenate(pts) if pts else np.zeros((0, 3))
          if refeature and len(sp):
              sp = refeature_super_scan(sp, cfg.refeature_voxel)
          if cfg.super_downsample > 0 and len(sp):
              sp = grid.down_sample_voxel(sp, cfg.super_downsample)
          super_scans.append(sp)

      Ra0 = R[anchors]
      pa0 = p[anchors]
      if anchor_pgo_poses is not None:
          # start the top solve from the pose-graph-corrected anchors:
          # their super-scan association is in-basin, so the plane
          # factors refine the loop-closed geometry instead of fighting
          # the lifted edges from drifted association
          Ra0, pa0 = anchor_pgo_poses
      if nb > cfg.recurse_at:
          # recurse: the anchors become the next level's scan poses
          sub = dataclasses.replace(cfg, polish=False, cycles=1)
          Ra1, pa1, sub_info = run(super_scans, Ra0, pa0, sub,
                                   verbose=verbose,
                                   scan_edges=anchor_edges)
          # re-anchor the recursive gauge to this level's first anchor
          Ra1 = np.einsum("ab,nbc->nac", R[anchors[0]], Ra1)
          pa1 = np.einsum("ab,nb->na", R[anchors[0]], pa1) + p[anchors[0]]
          top_planes = sub_info.get("top_planes", 0)
          info["recursed"] = sub_info
      elif cfg.top_stages:
          Ra1, pa1 = Ra0, pa0
          top_planes = 0
          for vcfg_stage in cfg.top_stages:
              Ra1, pa1, top_planes, _ = _solve_window(
                  super_scans, Ra1, pa1, vcfg_stage, cfg.top_solver,
                  edges=anchor_edges,
              )
      else:
          Ra1, pa1, top_planes, _ = _solve_window(
              super_scans, Ra0, pa0, cfg.top_voxel, cfg.top_solver,
              edges=anchor_edges,
          )
      info["top_planes"] = top_planes
      info["n_blocks"] = nb

      # --- compose ---
      for i in range(W):
          k = owner[i]
          R[i] = Ra1[k] @ rel_R[i]
          p[i] = Ra1[k] @ rel_p[i] + pa1[k]

      # --- alternating global sweep (see HierarchicalConfig) ---
      if cfg.global_sweep > 0:
          vres = grid.voxelize(list(scans), R, p, cfg.voxel,
                               dtype=np.float64)
          if vres.num_planes > 0:
              fj = Fmod.PlaneFactors(*[jnp.asarray(x)
                                       for x in vres.factors])
              scfg = dataclasses.replace(
                  cfg.polish_solver, max_iters=cfg.global_sweep)
              if (cfg.global_sweep_solver == "large"
                      or (cfg.global_sweep_solver == "auto" and W > 512)):
                  from ..ops import factors_windowed as FW
                  from ..solver import large as large_mod

                  res = large_mod.damping_iter_large(
                      jnp.asarray(R), jnp.asarray(p), FW.from_dense(fj),
                      scfg, cg_iters=cfg.global_sweep_cg)
              else:
                  res = lm.damping_iter(
                      jnp.asarray(R), jnp.asarray(p), fj, scfg,
                      edges=scan_edges)
              R = np.asarray(res.R)
              p = np.asarray(res.p)
              info["global_sweeps"] = info.get("global_sweeps", 0) + 1

      # --- cycle guard: accept only if the full-problem cost dropped ---
      # (a diverging top solve would otherwise poison the next cycle's
      # re-association and amplify across cycles)
      if cfg.cycle_guard:
          res_now = _global_residual(R, p)
          info.setdefault("cycle_residuals", []).append(res_now)
          if not np.isfinite(res_now) or res_now > res_prev:
              R, p = R_snap, p_snap
              info["cycles_reverted"] = info.get("cycles_reverted", 0) + 1
              break
          res_prev = res_now
      elif not np.all(np.isfinite(R)) or not np.all(np.isfinite(p)):
          R, p = R_snap, p_snap
          info["cycles_reverted"] = info.get("cycles_reverted", 0) + 1
          break


    # --- optional flat polish ---
    # scan-level edges are enforced here DIRECTLY (no lift): unlike the
    # anchor-level lift, this is immune to intra-block error baked into
    # the frozen rel poses
    if cfg.polish:
        R, p, nplanes, _ = _solve_window(
            list(scans), R, p, cfg.voxel, cfg.polish_solver,
            edges=scan_edges,
        )
        info["polish_planes"] = nplanes

    # gauge anchor
    Rj, pj = lie.gauge_fix(jnp.asarray(R), jnp.asarray(p))
    if verbose:
        print(f"hierarchical: {nb} blocks, top planes {top_planes}")
    return np.asarray(Rj), np.asarray(pj), info


def run_device_batched(
    scans,
    R0: np.ndarray,
    p0: np.ndarray,
    *,
    block: int = 16,
    stride: int | None = None,
    cycles: int = 2,
    voxel: VoxelConfig = VoxelConfig(min_observers=2),
    top_voxel: VoxelConfig | None = None,
    solver: SolverConfig = SolverConfig(
        max_iters=8, u_init=0.01, min_planes_per_pose=0, gauge_fix=False),
    top_solver: SolverConfig = SolverConfig(
        max_iters=10, u_init=0.01, min_planes_per_pose=0,
        gauge_fix=False),
    block_caps=(1 << 10, 1 << 12, 1 << 14),
    Gcap_block: int = 256,
    cs_cap_block: int = 1 << 15,
    top_caps=(1 << 14, 1 << 16, 1 << 18),
    Gcap_top: int = 1 << 13,
    cs_cap_top: int = 1 << 21,
    top: bool = True,
    verbose: bool = False,
):
    """Hierarchical BA where EVERY level is a single batched device
    program — the TPU-native large-W configuration (SURVEY §2.7: block
    axis = data parallelism; the reference's dense solver stops at
    W = 177, bavoxel.hpp:1113-1114).

    Per cycle:
      1. bottom: all blocks' association runs as ONE vmapped on-device
         voxelization (voxel/device.py) over the (B, Wb) block axis, in
         block-anchor frames; all blocks' window BAs run as ONE vmapped
         packed damped-Newton solve.
      2. top: every refined block becomes a super-scan (its points in
         the anchor frame at the refined relative poses — an elementwise
         device transform); the B anchor poses are associated (again
         on-device) and solved with the packed evaluator.
      3. compose scan poses = top anchor ∘ refined block-relative.

    Four device dispatches per cycle regardless of W — the W = 2048
    dense-evaluate remote-compile ceiling (artifacts/roofline.json)
    never applies because no sub-program exceeds (Wb | B) poses.

    Requires W % block == 0 (pad/crop the trajectory to a multiple).
    Returns (R, p, info).
    """
    import functools
    import time as _time

    from ..voxel import device as vdev

    W = len(scans)
    stride = stride or block
    if not (0 < stride <= block):
        raise ValueError("need 0 < stride <= block")
    # overlapping blocks (stride < block): adjacent super-scans SHARE
    # scans, which couples the anchor problem strongly enough to kill
    # its spurious optima (the host hierarchy's design; without overlap
    # the W=1024 corridor's top solve basin-hops across cycles)
    starts = list(range(0, max(W - block, 0) + 1, stride))
    if starts[-1] != W - block:
        starts.append(W - block)
    B = len(starts)
    top_voxel = top_voxel or voxel
    idx = np.stack([np.arange(s, s + block) for s in starts])

    body_h, mask_h = vdev.pad_scans(
        [s.astype(np.float32) for s in scans], np.float32)
    body = jnp.asarray(body_h)
    mask = jnp.asarray(mask_h)
    Nmax = body.shape[1]

    def core_kw(vcfg, caps, Gcap, cs_cap):
        return dict(
            voxel_size=float(vcfg.voxel_size),
            layer_limit=int(vcfg.layer_limit),
            eigen_ratio=tuple(float(r) for r in vcfg.eigen_ratio),
            min_points=int(vcfg.min_points),
            min_observers=int(vcfg.min_observers),
            unit_coe=False,
            cell_caps=tuple(int(c) for c in caps),
            Gcap=int(Gcap), cs_cap=int(cs_cap),
            want_point_leaf=False)

    bcore = functools.partial(
        vdev._voxelize_core, **core_kw(voxel, block_caps, Gcap_block,
                                       cs_cap_block))
    vcore = jax.vmap(lambda b, m, R, p: bcore(b, m, R, p))
    tcore = functools.partial(
        vdev._voxelize_core, **core_kw(top_voxel, top_caps, Gcap_top,
                                       cs_cap_top))

    vsolve = jax.vmap(lambda R, p, f: lm.damping_iter(
        R, p, f, solver, centered=True, backend="packed"))

    @jax.jit
    def super_scans(bb, mb, Rr, pr):
        sp = (Rr[:, :, None, :, 0] * bb[..., 0, None]
              + Rr[:, :, None, :, 1] * bb[..., 1, None]
              + Rr[:, :, None, :, 2] * bb[..., 2, None]) \
            + pr[:, :, None, :]
        return sp.reshape(B, block * Nmax, 3), mb.reshape(B, -1)

    def _proj(Rm):
        u, _, vt = np.linalg.svd(Rm)
        return u @ vt

    R = np.array(R0, np.float64)
    p = np.array(p0, np.float64)
    info = {"timings": [], "block_planes": None, "top_planes": None,
            "overflow": False}

    bb = body[idx.reshape(-1)].reshape(B, block, Nmax, 3)
    mb = mask[idx.reshape(-1)].reshape(B, block, Nmax)

    for cyc in range(cycles):
        t = {}
        t0 = _time.perf_counter()
        Ra = R[idx[:, 0]]
        pa = p[idx[:, 0]]
        R_rel = np.einsum("bca,bwcd->bwad", Ra, R[idx])
        p_rel = np.einsum("bca,bwc->bwa", Ra, p[idx] - pa[:, None])
        Rrj = jnp.asarray(R_rel, jnp.float32)
        prj = jnp.asarray(p_rel, jnp.float32)

        dres = vcore(bb, mb, Rrj, prj)
        info["overflow"] |= bool(jnp.any(dres.overflow))
        t["block_assoc_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        bres = vsolve(Rrj, prj, dres.factors)
        # re-anchor every block to its FIRST pose: the block BA has free
        # gauge (gauge_fix=False), and an un-pinned block tilts its whole
        # frame by an arbitrary rotation — the super-scans then land in
        # tilted frames and POISON the anchor association (measured: a
        # ~4 deg block tilt at 8 m levers breaks voxel association and
        # the top solve drives the composed trajectory to ~160 deg).
        # Same move as the host hierarchy / window-BA re-anchoring.
        R0b = jnp.swapaxes(bres.R[:, 0:1], -1, -2)       # (B, 1, 3, 3)
        from ..ops import smallmat as _sm

        Rr = _sm.matmul(R0b, bres.R)
        pr = _sm.matvec(R0b, bres.p - bres.p[:, 0:1])
        float(bres.residual[0])          # sync
        t["block_solve_s"] = _time.perf_counter() - t0
        info["block_planes"] = [int(x) for x in
                                np.asarray(dres.num_planes)[:4]]

        if not top:
            # blocks-only mode: keep anchors, land the re-anchored block
            # solutions (the global coupling is delegated to a caller-
            # side solve — e.g. the span-compressed flat polish; the
            # anchor-only plane problem is multi-modal on weakly-coupled
            # scenes and needs the host hierarchy's consensus machinery)
            Rrn = np.asarray(Rr, np.float64)
            prn = np.asarray(pr, np.float64)
            # keep the per-block solutions: overlapping blocks are
            # INDEPENDENT measurements of the shared scans' relative
            # poses (landing overwrites, last block wins) — the
            # consensus-edge machinery needs the pre-composition
            # versions or its spreads collapse to zero (measured: edges
            # recomputed from the landed trajectory pin its ~0.13 m/scan
            # composition error at w ~ ws/sigma^2 through every anneal)
            info["block_rel"] = (idx.copy(), Rrn.copy(), prn.copy())
            for b in range(B):
                for j, i in enumerate(idx[b]):
                    R[i] = _proj(Ra[b] @ Rrn[b, j])
                    p[i] = Ra[b] @ prn[b, j] + pa[b]
            t["cycle_s"] = sum(t.values())
            info["timings"].append(
                {k: round(v, 3) for k, v in t.items()})
            continue

        t0 = _time.perf_counter()
        sp, spm = super_scans(bb, mb, Rr, pr)
        tres = tcore(sp, spm, jnp.asarray(Ra, jnp.float32),
                     jnp.asarray(pa, jnp.float32))
        info["overflow"] |= bool(tres.overflow)
        info["top_planes"] = int(tres.num_planes)
        t["top_assoc_s"] = _time.perf_counter() - t0

        t0 = _time.perf_counter()
        # TOP solve on the XLA evaluator: the anchor problem is small
        # (W = B poses) and MULTI-MODAL on weakly-coupled scenes — on the
        # W=1024 corridor two near-equal-residual optima sit 0.6 and 2.7
        # deg from truth, and the packed path's f32 LM trajectory lands
        # in the wrong one while the XLA evaluator's lands in the right
        # one (same initial res/J/H to 1e-6; the damping paths bifurcate).
        # At B <= a few hundred anchors the XLA evaluator costs the same
        # few ms, so the robust path wins.
        topres = lm.damping_iter(
            jnp.asarray(Ra, jnp.float32), jnp.asarray(pa, jnp.float32),
            tres.factors, top_solver, centered=True, backend="xla")
        Ran = np.asarray(topres.R, np.float64)
        pan = np.asarray(topres.p, np.float64)
        t["top_solve_s"] = _time.perf_counter() - t0

        Rrn = np.asarray(Rr, np.float64)
        prn = np.asarray(pr, np.float64)
        info["block_rel"] = (idx.copy(), Rrn.copy(), prn.copy())
        for b in range(B):
            Ab = _proj(Ran[b])
            for j, i in enumerate(idx[b]):
                R[i] = _proj(Ab @ Rrn[b, j])
                p[i] = Ab @ prn[b, j] + pan[b]
        t["cycle_s"] = sum(t.values())
        info["timings"].append({k: round(v, 3) for k, v in t.items()})
        if verbose:
            print(f"cycle {cyc}: {info['timings'][-1]}", flush=True)

    return R, p, info


def consensus_scan_edges(idx: np.ndarray, Rr, pr, *,
                         sigma_rot: float = 2e-3, sigma_tr: float = 2e-3,
                         weight_scale: float = 1.0,
                         init_R=None, init_p=None,
                         gate_rot: float = 0.05, gate_tr: float = 0.3,
                         prior_sigma_rot: float = 0.03,
                         prior_sigma_tr: float = 0.1,
                         stats: dict | None = None):
    """Consecutive-scan relative-pose edges from batched block solutions.

    idx: (B, block) global scan indices per block; Rr/pr: (B, block)
    refined block-relative poses (re-anchored to each block's first
    scan).  For every consecutive global pair (i, i+1) the relative pose
    T_i^-1 T_{i+1} is measured inside EACH overlapping block that
    contains both scans; the edge takes the Lie-algebra consensus mean
    and a weight from the cross-block spread (the overlap-consensus
    machinery of the host hierarchy, ops/pose_graph.consensus_edge, at
    scan granularity):

        w = weight_scale / (sigma^2 + spread^2)

    These edges pin the corridor-class bending null modes of the plane
    cost (a 50-deg global bend is cost-flat but violates every
    consecutive-scan measurement) without fighting the plane factors at
    convergence — at the solution the edge residuals sit at the
    intra-block accuracy the measurements came from.

    When init_R/init_p (the global initial trajectory, an odometry-grade
    prior) are given, each block measurement is GATED against the init
    relative pose: blocks with locally-degenerate geometry (a corridor
    section with no along-axis-normal planes leaves per-pose axial
    translation unconstrained — measured: metre-scale slides on 44 of
    191 W=1536 blocks, host and device alike) produce measurements that
    disagree with the init by far more than the init's own drift
    envelope; those are dropped (gate_rot rad / gate_tr m).  A pair with
    NO surviving measurement falls back to the init relative pose
    weighted as a prior (prior_sigma_*) — the standard odometry-prior
    role, never stronger than the init's believed accuracy.

    Returns ops.pose_graph.RelPoseEdges over global scan indices
    (i, i+1: band-compatible with solver/large.damping_iter_large).
    """
    from ..ops import pose_graph as PG

    idx = np.asarray(idx)
    Rr = np.asarray(Rr, np.float64)
    pr = np.asarray(pr, np.float64)
    B, blk = idx.shape
    W = int(idx.max()) + 1
    n_gated = 0
    meas: dict[int, list] = {}
    for b in range(B):
        for j in range(blk - 1):
            i = int(idx[b, j])
            if int(idx[b, j + 1]) != i + 1:
                continue
            Zr = Rr[b, j].T @ Rr[b, j + 1]
            Zp = Rr[b, j].T @ (pr[b, j + 1] - pr[b, j])
            if init_R is not None:
                Zr0 = init_R[i].T @ init_R[i + 1]
                Zp0 = init_R[i].T @ (init_p[i + 1] - init_p[i])
                dr = np.linalg.norm(np.asarray(
                    lie.so3_log(jnp.asarray(Zr0.T @ Zr))))
                dt = np.linalg.norm(Zp - Zp0)
                if dr > gate_rot or dt > gate_tr:
                    n_gated += 1
                    continue
            meas.setdefault(i, []).append((Zr, Zp))
    n_prior = 0
    if init_R is not None:
        for i in range(W - 1):
            if i not in meas:
                n_prior += 1
                meas[i] = [(init_R[i].T @ init_R[i + 1],
                            init_R[i].T @ (init_p[i + 1] - init_p[i]),
                            "prior")]
    if stats is not None:
        stats["n_gated_measurements"] = n_gated
        stats["n_prior_pairs"] = n_prior
    if not meas:
        return None
    li, Zr_l, Zp_l, wr_l, wt_l = [], [], [], [], []
    for i in sorted(meas):
        Ts = meas[i]
        prior = len(Ts[0]) == 3
        R0, p0 = Ts[0][0], Ts[0][1]
        if len(Ts) == 1:
            Rm, pm, sp_r, sp_t = R0, p0, 0.0, 0.0
        else:
            ws = [np.asarray(lie.so3_log(jnp.asarray(R0.T @ Rk)))
                  for Rk, _ in Ts]
            vs = [pk - p0 for _, pk in Ts]
            wbar = np.mean(ws, axis=0)
            vbar = np.mean(vs, axis=0)
            sp_r = float(np.max(np.linalg.norm(
                np.asarray(ws) - wbar, axis=-1)))
            sp_t = float(np.max(np.linalg.norm(
                np.asarray(vs) - vbar, axis=-1)))
            Rm = R0 @ np.asarray(lie.so3_exp(jnp.asarray(wbar)))
            pm = p0 + vbar
        s_r = max(sigma_rot, prior_sigma_rot) if prior else sigma_rot
        s_t = max(sigma_tr, prior_sigma_tr) if prior else sigma_tr
        li.append(i)
        Zr_l.append(Rm)
        Zp_l.append(pm)
        wr_l.append(weight_scale / (s_r ** 2 + sp_r ** 2))
        wt_l.append(weight_scale / (s_t ** 2 + sp_t ** 2))
    li = np.asarray(li, np.int32)
    return PG.RelPoseEdges(
        i=jnp.asarray(li), j=jnp.asarray(li + 1),
        Zr=jnp.asarray(np.stack(Zr_l)), Zp=jnp.asarray(np.stack(Zp_l)),
        w_rot=jnp.asarray(np.asarray(wr_l)),
        w_tr=jnp.asarray(np.asarray(wt_l)))


def run_batched_consensus(
    scans,
    R0: np.ndarray,
    p0: np.ndarray,
    *,
    block: int = 16,
    stride: int | None = None,
    cycles: int = 1,
    voxel: VoxelConfig = VoxelConfig(min_observers=2),
    solver: SolverConfig = SolverConfig(
        max_iters=12, u_init=0.01, min_planes_per_pose=0,
        gauge_fix=False),
    polish_solver: SolverConfig = SolverConfig(max_iters=25, u_init=0.01),
    polish_chunks: int = 1,
    sigma_rot: float = 2e-3,
    sigma_tr: float = 2e-3,
    edge_weight_scale: float = 1.0,
    block_caps=(1 << 9, 1 << 11, 1 << 13),
    Gcap_block: int = 256,
    cs_cap_block: int = 1 << 15,
    verbose: bool = False,
):
    """The TPU-batched hierarchy WITH the host hierarchy's consensus
    machinery (round-4 verdict item 3):

      1. overlapping blocks, association + window BA fully vmapped
         on-device (run_device_batched top=False) — local geometry;
      2. consecutive-scan CONSENSUS edges from the overlapping PER-BLOCK
         solutions (consensus_scan_edges): agreement across blocks sets
         the weight, disagreement de-weights, and measurements that
         violate the init's drift envelope are gated out (degenerate
         block geometry — see consensus_scan_edges);
      3. ONE chunked global banded solve (solver/banded.py: exact
         dense-quality steps, linear in W) over the plane factors
         associated at the INIT poses, FROM the init poses, PLUS the
         edges.

    The blocks serve purely as edge-measurement generators: the landed
    block composition is NOT used (its overwrite-landing seams carry
    init-level error, and degenerate blocks corrupt whole sections —
    polishing from the clean init with the edges is strictly better,
    measured at W=1536: composed-state polish converged to 3.8x the
    ground-truth cost, init polish with gated edges goes below it).
    The edges make the anchor-stage multi-modality moot: there is no
    anchor-only solve to basin-hop — the global solve sees every scan,
    and the edges pin the bending null modes that made the corridor
    anchor problem multi-modal (ROUND_NOTES round-4 §9).

    Returns (R, p, info).
    """
    import time as _time

    from ..ops import factors_windowed as FW
    from ..solver import large as large_mod

    stride = stride if stride is not None else block // 2
    t0 = _time.perf_counter()
    _, _, info = run_device_batched(
        scans, R0, p0, block=block, stride=stride, cycles=cycles,
        voxel=voxel, solver=solver, block_caps=block_caps,
        Gcap_block=Gcap_block, cs_cap_block=cs_cap_block, top=False,
        verbose=verbose)
    info["blocks_s"] = round(_time.perf_counter() - t0, 2)

    # edges come from the PER-BLOCK solutions (info["block_rel"]), NOT
    # the landed trajectory: landing overwrites overlapping scans (last
    # block wins), so rel poses recomputed from the landed trajectory
    # are a single measurement repeated per block — consensus spread
    # collapses to ~0, weights blow up to ws/sigma^2, and the edges pin
    # the composition error (~0.13 m/scan at W=1536) instead of the
    # block accuracy.  The pre-composition block solutions are genuinely
    # independent measurements; the init trajectory gates them.
    idx, R_rel, p_rel = info.pop("block_rel")
    t0 = _time.perf_counter()
    gate_stats: dict = {}
    edges = consensus_scan_edges(
        idx, R_rel, p_rel, sigma_rot=sigma_rot, sigma_tr=sigma_tr,
        weight_scale=edge_weight_scale,
        init_R=np.asarray(R0, np.float64),
        init_p=np.asarray(p0, np.float64), stats=gate_stats)
    info["edges_s"] = round(_time.perf_counter() - t0, 2)
    info["n_edges"] = 0 if edges is None else int(edges.i.shape[0])
    info.update(gate_stats)
    # hand the edges back to the caller: they are real measurements
    # (intra-block relative accuracy, spread-weighted) and stay valid
    # for any later re-associated refine — dropping them there re-opens
    # the corridor bending null mode (measured at W=1024: an edge-free
    # refine slid a 0.91 deg solution to 3.6 deg at LOWER own-set cost)
    info["edges"] = edges

    t0 = _time.perf_counter()
    vres = grid.voxelize(scans, R0, p0, voxel, dtype=np.float64)
    fr = Fmod.recenter_bodies(vres.factors).astype(jnp.float32)
    wf = jax.tree_util.tree_map(jnp.asarray, FW.from_dense(fr))
    info["polish_assoc_s"] = round(_time.perf_counter() - t0, 2)
    info["polish_planes"] = int(vres.num_planes)
    info["polish_span"] = int(wf.span)
    Rh, ph = np.asarray(R0, np.float64), np.asarray(p0, np.float64)

    if edges is not None:
        edges = jax.tree_util.tree_map(
            lambda x: (x.astype(jnp.float32)
                       if x.dtype in (jnp.float64, jnp.float32) else x),
            edges)
    # chunked polish: the tunneled TPU worker dies on single dispatches
    # past ~60 s, which caps one banded LM call at ~30 iterations at
    # W=1536 — warm-restart `polish_chunks` calls instead (a restart
    # resets the damping walk; costs a few rejected iterations)
    t0 = _time.perf_counter()
    Rc = jnp.asarray(Rh, jnp.float32)
    pc = jnp.asarray(ph, jnp.float32)
    tot_iters = 0
    res = None
    for _ in range(max(1, polish_chunks)):
        res = large_mod.damping_iter_large(
            Rc, pc, wf, polish_solver, linear_solver="banded",
            edges=edges)
        tot_iters += int(res.iters)
        Rc, pc = res.R, res.p
        if int(res.iters) < polish_solver.max_iters:
            break
    Rf = np.asarray(Rc, np.float64)
    pf = np.asarray(pc, np.float64)
    info["polish_solve_s"] = round(_time.perf_counter() - t0, 2)
    info["polish_iters"] = tot_iters
    info["polish_residual"] = float(res.residual)
    return Rf, pf, info
