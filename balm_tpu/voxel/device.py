"""Device-side (TPU) adaptive voxelization: scans -> plane factors, on-chip.

The third association backend (after voxel/grid.py numpy and native/ C++),
and the one the SURVEY blueprint prescribes (§2.2 "TPU equivalents"): the
reference's pointer octree + unordered_map (cut_voxel bavoxel.hpp:1170-1223,
recut 737-776, hash tools.hpp:29-54) becomes a fixed-capacity, static-shape
pipeline of XLA-native primitives — no trees, no host round-trips, one
compiled computation from raw points to padded `PlaneFactors`:

  1. rigid transform of all scans — one batched (W, Nmax, 3) matmul (MXU)
  2. quantize to the FINEST octree resolution voxel/2^L and sort points by
     the packed fine cell key ONCE (TPU sort: ~460 Mpts/s measured; every
     coarser cell key is a PREFIX of the fine key)
  3. ONE per-point moment pass at the finest layer via the blocked
     scatter-free sorted-segment-sum (ops/segments.py — TPU scatter-add
     collapses 12x past ~128k segments, artifacts/microbench_segsum.txt),
     in FINE-CELL-LOCAL coordinates (see PRECISION below)
  4. every coarser layer aggregates the CELL TABLES with the
     parallel-axis theorem (a fine cell nests exactly in its parent);
     closed-form 3x3 eigenvalues (ops/eigh3) gate planarity
     lambda0/lambda1 < eigen_ratio[layer] (judge_eigen,
     bavoxel.hpp:654-699), and decisions cascade root->fine on tables —
     a cell is a leaf iff it passes and no ancestor did
  5. a second sort by (leaf, scan) groups emission segments; per-(leaf,
     scan) body moments come from ONE anchored single-pass reduction
     (coordinates relative to the segment's first point are bounded by
     the leaf extent, so the one-pass covariance is cancellation-free;
     exact centering via the table-level parallel-axis identity) — the
     factors come out already recentered (`recenter_bodies` is a no-op)
  6. admission (>= min_observers scans, bavoxel.hpp:33-37) + compaction to
     put admitted leaves first; padding rows are exactly zero (the tested
     invariant: zero planes contribute zero)

Everything is jit-compiled with STATIC shapes; dynamic quantities (cell
counts, leaf counts) are traced values bounded by static capacities, with
overflow flags returned for host-side retry-with-bigger-caps.

PRECISION (all-f32 regime, x64 off — the TPU production default):
  * classification moments are accumulated in coordinates local to each
    point's CURRENT cell center (|local| <= cell/2), so the one-pass
    covariance has no |position|^2 cancellation; the remaining error is
    O(sqrt(n_cell) * eps * cell^2), ~1e-8 absolute at 1 m voxels — small
    vs the lambda0 ~ noise^2 ~ 2.5e-5 decision scale.
  * factor moments are single-pass about a per-(leaf, scan) ANCHOR (the
    segment's first body point) — anchored coordinates are bounded by
    the leaf extent, so this meets the same no-cancellation invariant as
    two-pass centering (factors_windowed._window_moment) at half the
    reduction cost; exact centering follows at table level.
  * borderline planarity decisions can still differ from the f64 host
    backends; under x64 (CPU tests) this path runs f64 and matches them.

Extent limits: the fine grid must fit 16 bits per axis relative to the
cloud minimum (65536 fine cells/axis, e.g. 16 km at voxel 1 m, L = 2);
out-of-range input sets the `extent_overflow` flag.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import VoxelConfig
from ..ops import eigh3
from ..ops.factors import PlaneFactors

_I32MAX = np.iinfo(np.int32).max


@dataclasses.dataclass
class DeviceVoxelizeResult:
    """Device-array analogue of grid.VoxelizeResult.

    All fields are jax arrays ON DEVICE; `num_planes` is a traced/device
    scalar so the hot path never forces a device->host transfer (one
    fetch degrades every later tunneled dispatch ~16x,
    artifacts/transfer_poisoning.md).  `factors` is already recentered
    (body_centers set, per-(leaf,scan) first moments zero).
    """

    factors: PlaneFactors
    num_planes: jnp.ndarray        # () int32 — admitted leaf count
    point_leaf: jnp.ndarray        # (W, Nmax) int32 leaf id or -1
    leaf_layer: jnp.ndarray        # (Gcap,) int32 octree layer (admitted-first)
    leaf_decision: jnp.ndarray     # (Gcap,) lambda0/lambda1 at admission
    overflow: jnp.ndarray          # () bool — any capacity exceeded -> retry


def _pack_keys(qrel, L):
    """(N, 3) nonneg int32 fine coords -> COARSE-MAJOR (hi, lo) i32 pair.

    The key must group layer-l cells contiguously for EVERY l, so the
    root coordinates occupy the most significant bits and each deeper
    level appends its 3 octant bits below (an axis-major fine key would
    interleave different root cells' points and break run contiguity):

      hi = root_x << 15 | root_y            (root_x < 2^16, root_y < 2^15)
      lo = root_z << 3L | o_1 .. o_L        (root_z < 2^15, L <= 5)

    with o_l = the octant bits at layer l.  The layer-l key is then
    (hi, lo >> 3*(L-l)) — one sort serves all layers.  Both words stay
    nonnegative i32 (a sign flip would reorder runs).
    """
    qroot = qrel >> L
    hi = (qroot[:, 0] << 15) | qroot[:, 1]
    lo = qroot[:, 2]
    sub = qrel & ((1 << L) - 1)
    for l in range(L):
        bits = (sub >> (L - 1 - l)) & 1
        lo = (lo << 3) | (bits[:, 0] << 2) | (bits[:, 1] << 1) | bits[:, 2]
    return hi, lo


def _boundaries(hi, lo):
    """First-of-run flags for a SORTED (hi, lo) key sequence."""
    new = jnp.ones_like(hi, dtype=bool)
    new = new.at[1:].set((hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1]))
    return new


@functools.partial(
    jax.jit,
    static_argnames=(
        "voxel_size", "layer_limit", "eigen_ratio", "min_points",
        "min_observers", "unit_coe", "cell_caps", "Gcap", "_stage",
    ),
)
def _voxelize_core(
    body,            # (W, Nmax, 3) float
    mask,            # (W, Nmax) bool
    R,               # (W, 3, 3)
    p,               # (W, 3)
    *,
    voxel_size: float,
    layer_limit: int,
    eigen_ratio: tuple,
    min_points: int,
    min_observers: int,
    unit_coe: bool,
    cell_caps: tuple,    # static per-layer cell-count capacities
    Gcap: int,           # static leaf capacity (padded factor rows)
    _stage: int = 99,    # profiling: early-return after stage k (see
                         # scripts/profile_assoc_stages.py)
):
    """scans -> PlaneFactors, on-chip, SCATTER-FREE on the per-point path.

    v2 design (v1 spent ~10 of its 12 s in multi-channel scatter-adds at
    table sizes past on-chip memory — artifacts/assoc_stage_profile.json
    + scripts/microbench_segsum.py): per-point reductions go through
    ops/segments.sorted_segment_sum (blocked two-level, built from the
    primitives that stay fast at 16M points: sort 0.066 s, dense block
    cumsum, table-granularity gathers/scatters), and the octree layers
    are aggregated hierarchically — ONE per-point pass at the finest
    resolution, then parallel-axis moment shifts on the CELL TABLES for
    every coarser layer (a fine cell is entirely inside its parent, so
    Sum x'x'^T = Sum xx^T + v d^T + d v^T + n d d^T with d = fine center
    - parent center).  Decisions cascade root->fine on the tables.
    """
    from ..ops import segments

    W, Nmax = body.shape[:2]
    N = W * Nmax
    dtype = body.dtype
    L = layer_limit

    # --- 1. transform ---
    # Elementwise on purpose: an einsum here hits the MXU, whose f32
    # matmuls default to ONE bf16 pass on TPU (8 mantissa bits -> cm-scale
    # coordinate error at 100 m), silently flipping ~10% of the borderline
    # planarity gates (the round-3 5001-vs-5529 plane gap: the f32 CPU run
    # reproduces the host count exactly).  A 3-wide contraction can't tile
    # the MXU anyway; the VPU form is both exact-f32 and faster.
    world = (R[:, None, :, 0] * body[..., 0, None]
             + R[:, None, :, 1] * body[..., 1, None]
             + R[:, None, :, 2] * body[..., 2, None]) + p[:, None, :]
    world = world.reshape(N, 3)
    bodyf = body.reshape(N, 3)
    valid = mask.reshape(N)

    # --- 2. fine quantization + one global sort ---
    fine = voxel_size / (1 << L)
    qf = jnp.floor(world / fine).astype(jnp.int32)              # (N, 3)
    qmin = jnp.min(jnp.where(valid[:, None], qf, _I32MAX), axis=0)
    # align the shift base DOWN to a multiple of 2^L (two's-complement
    # low-bit clear = floor): (qrel >> s) then exactly reproduces the
    # WORLD-grid cell grouping (qf >> s) at every layer — an unaligned
    # base would group cells across true voxel boundaries
    qbase = qmin & ~jnp.int32((1 << L) - 1)
    qrel = qf - qbase
    # extent limits are on ROOT cells (qrel >> L): 2^16 x 2^15 x 2^15
    lim = jnp.asarray([1 << (16 + L), 1 << (15 + L), 1 << (15 + L)],
                      jnp.int32)
    extent_overflow = jnp.any(valid[:, None] & ((qrel < 0) | (qrel >= lim)))
    qrel = jnp.clip(qrel, 0, lim - 1)
    hi, lo = _pack_keys(qrel, L)
    # invalid points sort to the end (and never contribute: masked data)
    hi = jnp.where(valid, hi, _I32MAX)
    hi, lo, perm = jax.lax.sort(
        (hi, lo, jnp.arange(N, dtype=jnp.int32)), num_keys=2)
    # everything below runs in SORTED order.  Only world is GATHERED;
    # the rest is derived (gathers at 16M rows cost ~0.12 s each):
    # qrel recomputes bit-exactly from world_s, validity is encoded in
    # the sorted key, and the scan id is perm // Nmax (W-major layout).
    world_s = world[perm]
    valid_s = hi < _I32MAX
    qrel = jnp.clip(
        jnp.floor(world_s / fine).astype(jnp.int32) - qbase, 0, lim - 1)
    cap_overflow = extent_overflow
    if _stage == 1:          # sort + world gather + derived fields
        return world_s, qrel, valid_s

    ratios = tuple(eigen_ratio) + (eigen_ratio[-1],) * max(
        0, L + 1 - len(eigen_ratio))

    # --- 3a. ONE per-point moment pass at the finest layer ---
    capL = int(cell_caps[L])
    newf = _boundaries(hi, lo) & valid_s
    seg_f = jnp.cumsum(newf.astype(jnp.int32)) - 1
    n_cells_f = jnp.sum(newf.astype(jnp.int32))
    cap_overflow |= n_cells_f > capL
    seg_f = jnp.where(valid_s, jnp.minimum(seg_f, capL - 1), capL)

    # fine-cell-local coordinates: |local| <= fine/2 (PRECISION note)
    center_pt = ((qrel + qbase[None, :]).astype(dtype) + 0.5) * fine
    local = world_s - center_pt
    x, y, z = local[:, 0], local[:, 1], local[:, 2]
    one = jnp.where(valid_s, jnp.asarray(1.0, dtype), 0.0)
    data = jnp.stack([
        x * x, x * y, x * z, y * y, y * z, z * z, x, y, z, one,
    ], axis=-1) * one[:, None]
    bounds_f = segments.segment_bounds(seg_f, capL)
    M_f = segments.sorted_segment_sum(data, seg_f, num_segments=capL,
                                      bounds=bounds_f)
    qabs_f = segments.segment_first(
        qrel + qbase[None, :], seg_f, num_segments=capL,
        bounds=bounds_f)                                   # (capL, 3)
    if _stage == 2:          # + fine-cell moment pass
        return M_f, qabs_f

    # --- 3b. coarser layers: parallel-axis aggregation on cell tables ---
    # tables[l] = (M (cap_l, 10), qabs (cap_l, 3), n_cells, seg_child->l)
    tables = {L: (M_f, qabs_f, n_cells_f, None)}
    for l in range(L - 1, -1, -1):
        cap_c = int(cell_caps[l + 1])
        cap_l = int(cell_caps[l])
        M_c, qabs_c, n_c, _ = tables[l + 1]
        real_c = jnp.arange(cap_c) < n_c
        qp = qabs_c >> 1
        newp = jnp.ones(cap_c, bool).at[1:].set(
            jnp.any(qp[1:] != qp[:-1], axis=1)) & real_c
        seg_p = jnp.cumsum(newp.astype(jnp.int32)) - 1
        n_p = jnp.sum(newp.astype(jnp.int32))
        cap_overflow |= n_p > cap_l
        seg_p = jnp.where(real_c, jnp.minimum(seg_p, cap_l - 1), cap_l)

        # shift child moments from child-cell-local to parent-cell-local
        sz_c = voxel_size / (1 << (l + 1))
        d = ((qabs_c.astype(dtype) + 0.5) * sz_c
             - (qp.astype(dtype) + 0.5) * (2.0 * sz_c))       # (cap_c, 3)
        v = M_c[:, 6:9]
        n = M_c[:, 9:10]
        Ms = jnp.stack([
            M_c[:, 0] + 2 * v[:, 0] * d[:, 0] + n[:, 0] * d[:, 0] * d[:, 0],
            M_c[:, 1] + v[:, 0] * d[:, 1] + v[:, 1] * d[:, 0]
            + n[:, 0] * d[:, 0] * d[:, 1],
            M_c[:, 2] + v[:, 0] * d[:, 2] + v[:, 2] * d[:, 0]
            + n[:, 0] * d[:, 0] * d[:, 2],
            M_c[:, 3] + 2 * v[:, 1] * d[:, 1] + n[:, 0] * d[:, 1] * d[:, 1],
            M_c[:, 4] + v[:, 1] * d[:, 2] + v[:, 2] * d[:, 1]
            + n[:, 0] * d[:, 1] * d[:, 2],
            M_c[:, 5] + 2 * v[:, 2] * d[:, 2] + n[:, 0] * d[:, 2] * d[:, 2],
            v[:, 0] + n[:, 0] * d[:, 0],
            v[:, 1] + n[:, 0] * d[:, 1],
            v[:, 2] + n[:, 0] * d[:, 2],
            n[:, 0],
        ], axis=-1)
        M_p = segments.sorted_segment_sum(Ms, seg_p, num_segments=cap_l)
        qabs_p = segments.segment_first(qp, seg_p, num_segments=cap_l)
        tables[l] = (M_p, qabs_p, n_p, None)
        tables[l + 1] = (M_c, qabs_c, n_c, seg_p)   # child -> parent rows

    # --- 3c. per-layer stats + root->fine decision cascade ---
    meta_center = jnp.zeros((Gcap + 1, 3), dtype)
    meta_layer = jnp.zeros(Gcap + 1, jnp.int32)
    meta_decision = jnp.zeros(Gcap + 1, dtype)

    n_leaves = jnp.int32(0)
    leaf_of_cell = {}
    can_split_parent = None   # (cap_{l-1},) bool, True rows may subdivide
    for l in range(L + 1):
        cap = int(cell_caps[l])
        cell_sz = voxel_size / (1 << l)
        M, qabs, n_cells, seg_to_parent = tables[l]
        cnt = M[:, 9]
        cnt1 = jnp.maximum(cnt, 1.0)
        mean = M[:, 6:9] / cnt1[:, None]
        cxx = M[:, 0] / cnt1 - mean[:, 0] * mean[:, 0]
        cxy = M[:, 1] / cnt1 - mean[:, 0] * mean[:, 1]
        cxz = M[:, 2] / cnt1 - mean[:, 0] * mean[:, 2]
        cyy = M[:, 3] / cnt1 - mean[:, 1] * mean[:, 1]
        cyz = M[:, 4] / cnt1 - mean[:, 1] * mean[:, 2]
        czz = M[:, 5] / cnt1 - mean[:, 2] * mean[:, 2]
        cov = jnp.stack([
            jnp.stack([cxx, cxy, cxz], -1),
            jnp.stack([cxy, cyy, cyz], -1),
            jnp.stack([cxz, cyz, czz], -1),
        ], axis=-2)
        lam = eigh3.eigvals3(cov)                              # ascending
        decision = lam[:, 0] / jnp.maximum(lam[:, 1], 1e-30)

        alive = cnt > min_points          # strict >, grid.py:210 semantics
        is_real = jnp.arange(cap) < n_cells
        is_plane = alive & (decision < ratios[l]) & is_real
        if can_split_parent is not None:
            ancestor_ok = can_split_parent[jnp.minimum(
                seg_to_parent, can_split_parent.shape[0] - 1)][:cap]
            is_plane = is_plane & ancestor_ok
            can_split = alive & ~(alive & (decision < ratios[l])) \
                & is_real & ancestor_ok
        else:
            can_split = alive & ~is_plane & is_real

        prank = jnp.cumsum(is_plane.astype(jnp.int32)) - 1
        lc = jnp.where(is_plane, n_leaves + prank, Gcap)
        n_new = jnp.sum(is_plane.astype(jnp.int32))
        cap_overflow |= (n_leaves + n_new) > Gcap
        lc = jnp.minimum(lc, Gcap)
        leaf_of_cell[l] = lc
        n_leaves = n_leaves + n_new

        cell_center = (qabs.astype(dtype) + 0.5) * cell_sz
        meta_center = meta_center.at[lc].set(mean + cell_center,
                                             mode="drop")
        meta_layer = meta_layer.at[lc].set(
            jnp.full(cap, l, jnp.int32), mode="drop")
        meta_decision = meta_decision.at[lc].set(decision, mode="drop")
        meta_center = meta_center.at[Gcap].set(0.0)
        meta_decision = meta_decision.at[Gcap].set(0.0)
        can_split_parent = can_split

    # leaf of each FINE cell = nearest plane ancestor (the cascade
    # guarantees at most one cell on any root->fine path is a plane)
    leaf_fine_tab = leaf_of_cell[L]
    fine_to_l = None   # fine row -> layer-l row, composed incrementally
    for l in range(L - 1, -1, -1):
        up = tables[l + 1][3]          # layer-(l+1) row -> layer-l row
        if fine_to_l is None:
            fine_to_l = up
        else:
            fine_to_l = up[jnp.minimum(fine_to_l,
                                       int(cell_caps[l + 1]) - 1)]
        lc_l = jnp.concatenate([leaf_of_cell[l],
                                jnp.asarray([Gcap], jnp.int32)])
        cand = lc_l[jnp.minimum(fine_to_l, int(cell_caps[l]))]
        leaf_fine_tab = jnp.where(cand < Gcap, cand, leaf_fine_tab)

    leaf_fine_ext = jnp.concatenate(
        [leaf_fine_tab, jnp.asarray([Gcap], jnp.int32)])
    leaf_prov = leaf_fine_ext[jnp.minimum(seg_f, capL)]        # per point
    if _stage == 3:          # + coarse tables, cascade, leaf assignment
        return leaf_prov, meta_center
    if _stage == 35:         # audit: per-layer cell tables (M, qabs, n)
        return {l: (tables[l][0], tables[l][1], tables[l][2])
                for l in range(L + 1)}, cap_overflow

    # --- 4. factor emission: two-pass centered per (leaf, scan) ---
    # second sort puts (leaf, scan) runs contiguous for the blocked pass
    scan_s = (perm // Nmax).astype(jnp.int32)
    body_s = bodyf[perm]
    has_leaf = leaf_prov < Gcap
    GW = Gcap * W
    key2 = jnp.where(has_leaf, leaf_prov * W + scan_s, GW)
    key2, idx2 = jax.lax.sort(
        (key2, jnp.arange(N, dtype=jnp.int32)), num_keys=1)
    body2 = body_s[idx2]
    one2 = jnp.where(key2 < GW, jnp.asarray(1.0, dtype), 0.0)
    bounds2 = segments.segment_bounds(key2, GW)
    if _stage == 4:          # + emission sort + bounds
        return key2, body2
    # ONE blocked pass instead of two (was 2x the dominant emission
    # cost): body coordinates are anchored at each segment's FIRST point
    # — all points of a (leaf, scan) pair sit within one leaf extent of
    # each other in the body frame too (same rigid transform), so the
    # anchored coordinates are bounded by the voxel size and the
    # one-pass covariance has no |range|^2 cancellation (the same
    # argument as the classification pass's cell-local coordinates).
    # The exact centered moments then come from the table-level
    # parallel-axis identity  Sum (c-m)(c-m)^T = Sum c c^T - n m m^T.
    start2, _, have2 = bounds2
    banchor = body2[jnp.where(have2, start2, 0)]               # (GW, 3)
    banchor = jnp.where(have2[:, None], banchor, 0.0)
    c = (body2 - banchor[jnp.minimum(key2, GW - 1)]) * one2[:, None]
    cx, cy, cz = c[:, 0], c[:, 1], c[:, 2]
    M2 = segments.sorted_segment_sum(
        jnp.stack([cx * cx, cx * cy, cx * cz, cy * cy, cy * cz, cz * cz,
                   cx, cy, cz, one2], axis=-1),
        key2, num_segments=GW, bounds=bounds2)                 # (GW, 10)
    cnt_flat = M2[:, 9]
    cnt_ls = cnt_flat.reshape(Gcap, W)
    m = M2[:, 6:9] / jnp.maximum(cnt_flat[:, None], 1.0)       # local mean
    P = jnp.stack([
        M2[:, 0] - cnt_flat * m[:, 0] * m[:, 0],
        M2[:, 1] - cnt_flat * m[:, 0] * m[:, 1],
        M2[:, 2] - cnt_flat * m[:, 0] * m[:, 2],
        M2[:, 3] - cnt_flat * m[:, 1] * m[:, 1],
        M2[:, 4] - cnt_flat * m[:, 1] * m[:, 2],
        M2[:, 5] - cnt_flat * m[:, 2] * m[:, 2],
    ], axis=-1).reshape(Gcap, W, 6)
    bmean = jnp.where(cnt_flat[:, None] > 0, banchor + m, 0.0)

    # --- 5. admission + compaction ---
    observers = jnp.sum(cnt_ls > 0, axis=1)
    total = jnp.sum(cnt_ls, axis=1)
    admit = (observers >= min_observers) & (total > 0)
    # jnp.argsort is stable: admitted leaves first, original order kept
    order = jnp.argsort((~admit).astype(jnp.int32))            # (Gcap,)
    adm_o = admit[order]

    Po = P[order] * adm_o[:, None, None]
    cnt_o = cnt_ls[order] * adm_o[:, None]
    b_o = bmean.reshape(Gcap, W, 3)[order] * adm_o[:, None, None]

    C = jnp.zeros((Gcap, W, 4, 4), dtype)
    C = C.at[..., 0, 0].set(Po[..., 0])
    C = C.at[..., 0, 1].set(Po[..., 1])
    C = C.at[..., 1, 0].set(Po[..., 1])
    C = C.at[..., 0, 2].set(Po[..., 2])
    C = C.at[..., 2, 0].set(Po[..., 2])
    C = C.at[..., 1, 1].set(Po[..., 3])
    C = C.at[..., 1, 2].set(Po[..., 4])
    C = C.at[..., 2, 1].set(Po[..., 4])
    C = C.at[..., 2, 2].set(Po[..., 5])
    C = C.at[..., 3, 3].set(cnt_o)

    coe = (jnp.where(adm_o, 1.0, 0.0).astype(dtype) if unit_coe
           else jnp.sum(cnt_o, axis=1))
    centers = meta_center[:-1][order] * adm_o[:, None]

    factors = PlaneFactors(
        C=C,
        Cfix=jnp.zeros((Gcap, 4, 4), dtype),
        coe=coe,
        centers=centers,
        body_centers=b_o,
    )

    # point_leaf in the ORIGINAL (W, Nmax) layout, compacted ids
    inv = jnp.zeros(Gcap + 1, jnp.int32).at[order].set(
        jnp.arange(Gcap, dtype=jnp.int32))
    pl_sorted = jnp.where(
        has_leaf & admit[jnp.minimum(leaf_prov, Gcap - 1)],
        inv[jnp.minimum(leaf_prov, Gcap - 1)], -1)
    point_leaf = jnp.zeros(N, jnp.int32).at[perm].set(pl_sorted)

    num_planes = jnp.sum(admit.astype(jnp.int32))
    return DeviceVoxelizeResult(
        factors=factors,
        num_planes=num_planes,
        point_leaf=point_leaf.reshape(W, Nmax),
        leaf_layer=meta_layer[:-1][order],
        leaf_decision=meta_decision[:-1][order],
        overflow=cap_overflow,
    )


jax.tree_util.register_pytree_node(
    DeviceVoxelizeResult,
    lambda r: ((r.factors, r.num_planes, r.point_leaf, r.leaf_layer,
                r.leaf_decision, r.overflow), None),
    lambda _, ch: DeviceVoxelizeResult(*ch),
)


def pad_scans(points: Sequence[np.ndarray], dtype=np.float32,
              multiple: int = 1024):
    """Host helper: list of (Ni, 3) scans -> ((W, Nmax, 3), (W, Nmax) mask)
    with Nmax rounded up to `multiple` (stable static shapes across calls
    with similar scan sizes -> compile-cache hits)."""
    W = len(points)
    Nmax = max(len(s) for s in points)
    Nmax = max(multiple, -(-Nmax // multiple) * multiple)
    body = np.zeros((W, Nmax, 3), dtype)
    mask = np.zeros((W, Nmax), bool)
    for i, s in enumerate(points):
        body[i, :len(s)] = s
        mask[i, :len(s)] = True
    return body, mask


def voxelize_device(
    points,
    R: np.ndarray,
    p: np.ndarray,
    cfg: VoxelConfig = VoxelConfig(),
    *,
    weighting: str = "point_count",
    cell_caps: tuple | None = None,
    Gcap: int = 1 << 13,
    max_retries: int = 2,
) -> DeviceVoxelizeResult:
    """Associate scans into plane factors, entirely on device.

    points: list of (Ni, 3) scans (host) OR a pre-padded ((W, Nmax, 3),
    (W, Nmax)) pair of device arrays — the production form, where points
    are already on-chip from an upstream stage and association adds ZERO
    host<->device traffic.

    The returned factors are recentered f32 (or f64 under x64) padded to
    Gcap rows; feed them straight to lm.damping_iter.  Capacity overflow
    is detected via one scalar fetch per retry (only at the API boundary;
    use `_voxelize_core` directly inside fused device pipelines).
    """
    if weighting not in ("point_count", "unit"):
        raise ValueError(weighting)
    dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    if (isinstance(points, tuple) and len(points) == 2
            and getattr(points[0], "ndim", 0) == 3):
        body, mask = points                    # pre-padded (body, mask)
    else:
        body, mask = pad_scans(points, dtype)  # list of (Ni, 3) scans

    N = int(np.prod(body.shape[:2]))
    if cell_caps is None:
        # roots bounded by point count / min_points is far too loose; use
        # a practical default and retry on overflow
        base = max(1 << 14, min(N // 8, 1 << 20))
        cell_caps = tuple(min(base * (4 ** l), 1 << 21)
                          for l in range(cfg.layer_limit + 1))

    body = jnp.asarray(body, dtype)
    mask = jnp.asarray(mask)
    Rj = jnp.asarray(R, dtype)
    pj = jnp.asarray(p, dtype)

    for attempt in range(max_retries + 1):
        out = _voxelize_core(
            body, mask, Rj, pj,
            voxel_size=float(cfg.voxel_size),
            layer_limit=int(cfg.layer_limit),
            eigen_ratio=tuple(float(r) for r in cfg.eigen_ratio),
            min_points=int(cfg.min_points),
            min_observers=int(cfg.min_observers),
            unit_coe=(weighting == "unit"),
            cell_caps=tuple(int(c) for c in cell_caps),
            Gcap=int(Gcap),
        )
        if attempt == max_retries or not bool(out.overflow):
            return out
        cell_caps = tuple(min(c * 4, 1 << 22) for c in cell_caps)
        Gcap *= 4
    return out
