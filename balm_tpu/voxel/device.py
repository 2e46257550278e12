"""Device-side (TPU) adaptive voxelization: scans -> plane factors, on-chip.

The third association backend (after voxel/grid.py numpy and native/ C++),
and the one the SURVEY blueprint prescribes (§2.2 "TPU equivalents"): the
reference's pointer octree + unordered_map (cut_voxel bavoxel.hpp:1170-1223,
recut 737-776, hash tools.hpp:29-54) becomes a fixed-capacity, static-shape
pipeline of XLA-native primitives — no trees, no host round-trips, one
compiled computation from raw points to padded `PlaneFactors`.

v4 design (ONE per-point pass, ONE per-point sort, ONE per-point gather
— everything else at table granularity).  History: v2 measured 3.2 s at
16M points (two sorts, two per-point moment passes); v3 cut to 1.9 s by
packing the scan id into the sort key; v4 removes the per-point anchor
gather and the cs-table rotations by anchoring at CELL CENTERS
(microbench basis: artifacts/microbench_pass_pieces.json — boundary
gathers scale with table capacity, the anchor gather alone was 0.13 s):

  1. rigid transform of all scans — elementwise VPU math (an einsum here
     would run as ONE bf16 MXU pass and flip ~10% of borderline gates)
  2. quantize to the FINEST octree resolution voxel/2^L and sort points
     ONCE by the packed (fine-cell, scan) key: root coords in the high
     bits, one octant triple per layer below, the scan id in the lowest
     bits.  Every coarser cell key AND the fine-cell key AND the
     (cell, scan) key are PREFIXES of this one sort order.
  3. ONE per-point moment pass at (fine-cell, scan) granularity, in
     CELL-CENTER-LOCAL world coordinates (elementwise from the
     quantization — no anchor gather; |local| <= cell*sqrt(3)/2 keeps
     the one-pass covariance cancellation-free)
  4. everything after is table-sized (#(cell,scan) rows ~ N/9):
     classification needs NO transformation at all (rows of a cell share
     its center anchor — fine-cell moments are a straight sum); coarser
     layers aggregate cell tables by the parallel-axis theorem;
     closed-form 3x3 eigenvalues (ops/eigh3) gate planarity
     lambda0/lambda1 < eigen_ratio[layer] (judge_eigen,
     bavoxel.hpp:654-699); decisions cascade root->fine ON TABLES — a
     cell is a leaf iff it passes and no ancestor did
  5. emission rotates each (cell, scan) row's moments to the body frame
     (rigid invariance: P_b = R^T P_w_local R about the cell center's
     body image), re-sorts only the TABLE by (leaf, scan), shifts by
     exact integer-cell-coordinate deltas rotated into the body frame,
     and reduces — no second per-point pass, no range-scale rounding
  6. admission (>= min_observers scans, bavoxel.hpp:33-37) + compaction
     puts admitted leaves first; padding rows are exactly zero (the
     tested invariant: zero planes contribute zero)

Everything is jit-compiled with STATIC shapes; dynamic quantities (cell
counts, leaf counts) are traced values bounded by static capacities, with
overflow flags returned for host-side retry-with-bigger-caps.

PRECISION (all-f32 regime, x64 off — the TPU production default):
  * per-point moments are single-pass about each point's CELL CENTER —
    |local| is bounded by the cell extent, so there is no |position|^2
    cancellation; the remaining error is O(sqrt(n_cell) * eps * cell^2),
    small vs the lambda0 ~ noise^2 decision scale.
  * all subsequent shifts move anchors by at most a leaf diagonal, with
    deltas computed from exact integer cell-coordinate differences;
    rotations are exact-f32 elementwise products (ops/smallmat) — never
    the MXU's bf16 path.  The body-frame anchor position a_b = R^T(c-p)
    carries ~|p|*eps absolute rounding (~1e-5 m at 100 m range), which
    only offsets the reported body centroid — a 10 um centroid shift,
    2*sigma*delta ~ 1e-7 m^2 against lambda0 ~ 2.5e-5: negligible — and
    never enters the aggregated covariance.
  * borderline planarity decisions can still differ from the f64 host
    backends at the 1e-4 level; under x64 (CPU tests) this path runs f64
    and matches them.  Measured on realworld-177: 5528 vs 5529 planes,
    cost ratio 1.0 (artifacts/device_assoc_quality.json).

Extent limits: the fine grid must fit 16 bits per axis relative to the
cloud minimum (65536 fine cells/axis, e.g. 16 km at voxel 1 m, L = 2);
out-of-range input sets the `extent_overflow` flag.  The scan id rides in
the low key bits: ceil(log2(W)) + 3*layer_limit <= 16 (W=1024 scans at
layer_limit=2; the dense-window regime this targets).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import VoxelConfig
from ..ops import eigh3, smallmat
from ..ops.factors import PlaneFactors

_I32MAX = np.iinfo(np.int32).max


@dataclasses.dataclass
class DeviceVoxelizeResult:
    """Device-array analogue of grid.VoxelizeResult.

    All fields are jax arrays ON DEVICE; `num_planes` is a traced/device
    scalar so the hot path never forces a device->host transfer.
    `factors` is already recentered (body_centers set, per-(leaf,scan)
    first moments zero).
    """

    factors: PlaneFactors
    num_planes: jnp.ndarray        # () int32 — admitted leaf count
    point_leaf: jnp.ndarray        # (W, Nmax) int32 leaf id or -1
                                   # ((W, 0) when want_point_leaf=False)
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
    nonnegative i32 (a sign flip would reorder runs).  Callers may shift
    further ids (the scan) into lo's low bits when they fit.
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


def _paxis_shift(M, d):
    """Parallel-axis move of packed moments (..., 10) by anchor delta d.

    M holds [xx, xy, xz, yy, yz, zz, x, y, z, n] about anchor a; returns
    the same moments about a' = a - d (i.e. coordinates c' = c + d):
      sum c'c'^T = sum cc^T + v d^T + d v^T + n dd^T,  v' = v + n d.
    """
    v = M[..., 6:9]
    n = M[..., 9:10]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    return jnp.stack([
        M[..., 0] + 2 * v[..., 0] * dx + n[..., 0] * dx * dx,
        M[..., 1] + v[..., 0] * dy + v[..., 1] * dx + n[..., 0] * dx * dy,
        M[..., 2] + v[..., 0] * dz + v[..., 2] * dx + n[..., 0] * dx * dz,
        M[..., 3] + 2 * v[..., 1] * dy + n[..., 0] * dy * dy,
        M[..., 4] + v[..., 1] * dz + v[..., 2] * dy + n[..., 0] * dy * dz,
        M[..., 5] + 2 * v[..., 2] * dz + n[..., 0] * dz * dz,
        v[..., 0] + n[..., 0] * dx,
        v[..., 1] + n[..., 0] * dy,
        v[..., 2] + n[..., 0] * dz,
        n[..., 0],
    ], axis=-1)


def _rot_moments(M, R):
    """Rotate packed anchored moments (..., 10) by R (..., 3, 3).

    Rigid invariance: with w - wa = R (b - ba), the world-frame anchored
    moments are sum (w-wa)(w-wa)^T = R [sum (b-ba)(b-ba)^T] R^T and
    R sum (b-ba).  Unrolled elementwise products (ops/smallmat) — a
    batched dot_general here would take the MXU's bf16 path.
    """
    P = jnp.stack([
        jnp.stack([M[..., 0], M[..., 1], M[..., 2]], -1),
        jnp.stack([M[..., 1], M[..., 3], M[..., 4]], -1),
        jnp.stack([M[..., 2], M[..., 4], M[..., 5]], -1),
    ], axis=-2)
    Pw = smallmat.congruence(R, P)
    vw = smallmat.matvec(R, M[..., 6:9])
    return jnp.concatenate([
        jnp.stack([Pw[..., 0, 0], Pw[..., 0, 1], Pw[..., 0, 2],
                   Pw[..., 1, 1], Pw[..., 1, 2], Pw[..., 2, 2]], -1),
        vw, M[..., 9:10],
    ], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "voxel_size", "layer_limit", "eigen_ratio", "min_points",
        "min_observers", "unit_coe", "cell_caps", "Gcap", "cs_cap",
        "pair_cap", "want_point_leaf", "_stage",
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
    cs_cap: int | None = None,   # static (fine-cell, scan) pair capacity
    pair_cap: int | None = None,  # static (leaf, scan) pair capacity
    want_point_leaf: bool = True,
    _stage: int = 99,    # profiling: early-return after stage k (see
                         # scripts/profile_assoc_stages.py)
):
    """scans -> PlaneFactors, on-chip; ONE sort + ONE moment pass at 16M.

    See the module docstring for the v3 dataflow.  The per-point budget
    is exactly: elementwise transform/quantize, one 3-operand sort, one
    3-channel gather (sorted body), one 3-channel anchor gather, one
    10-channel blocked segmented reduction (ops/segments), and one
    1-channel bounds scatter (+ an optional gather/scatter pair for the
    per-point leaf map).  Everything else runs at (cell, scan)-table
    granularity, ~N/20 rows.
    """
    from ..ops import segments

    W, Nmax = body.shape[:2]
    N = W * Nmax
    dtype = body.dtype
    L = layer_limit
    if cs_cap is None:
        cs_cap = int(min(max(4 * int(cell_caps[L]), 1 << 16), max(N, 1 << 16)))
    if pair_cap is None:
        pair_cap = int(min(Gcap * W, max(32 * Gcap, 1 << 16)))
    S = max((W - 1).bit_length(), 1)             # scan bits in the key
    # lo bit budget: root_z contributes exactly 15 bits at EVERY L (the
    # extent limit on fine z is 2^(15+L), so qroot_z = qrel_z >> L < 2^15
    # — see `lim` below), plus 3L octant bits, plus S scan bits; 31 keeps
    # the i32 non-negative.  (Round-4 advisor suggested 16-L root bits;
    # the L-scaled extent limit is what makes the root width constant.)
    if 15 + 3 * L + S > 31:
        raise ValueError(
            f"W={W} scans need {S} key bits; at layer_limit={L} the "
            f"packed key would overflow int32 (need ceil(log2(W)) + "
            f"3*layer_limit <= 16)")

    # --- 1. transform ---
    # Elementwise on purpose: an einsum here hits the MXU, whose f32
    # matmuls default to ONE bf16 pass on TPU (8 mantissa bits -> cm-scale
    # coordinate error at range), silently flipping ~10% of the borderline
    # planarity gates (the round-3 5001-vs-5529 plane gap: the f32 CPU run
    # reproduces the host count exactly).  A 3-wide contraction can't tile
    # the MXU anyway; the VPU form is both exact-f32 and faster.
    world = (R[:, None, :, 0] * body[..., 0, None]
             + R[:, None, :, 1] * body[..., 1, None]
             + R[:, None, :, 2] * body[..., 2, None]) + p[:, None, :]
    world = world.reshape(N, 3)
    valid = mask.reshape(N)

    # --- 2. fine quantization + the ONE global sort ---
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
    scan_pt = (jnp.arange(N, dtype=jnp.int32) // Nmax)          # W-major
    lo = (lo << S) | scan_pt
    # invalid points sort to the end (and never contribute: masked data)
    hi = jnp.where(valid, hi, _I32MAX)
    hi, lo, perm = jax.lax.sort(
        (hi, lo, jnp.arange(N, dtype=jnp.int32)), num_keys=2)
    valid_s = hi < _I32MAX
    n_valid = jnp.sum(valid_s.astype(jnp.int32))
    cap_overflow = extent_overflow
    if _stage == 1:          # sort only (the one per-point gather is the
        return hi, lo, perm  # world reorder in stage 3)

    ratios = tuple(eigen_ratio) + (eigen_ratio[-1],) * max(
        0, L + 1 - len(eigen_ratio))

    # --- 3. ONE moment pass at (fine-cell, scan) granularity ---
    # coordinates are CELL-CENTER-LOCAL world (elementwise from the
    # quantization — no anchor gather): |local| <= fine*sqrt(3)/2, so the
    # one-pass covariance is cancellation-free, and the SAME moments
    # serve classification (plain sums share the cell's anchor) AND
    # emission (rigid invariance: rotating by R^T gives body-frame
    # moments about the cell center's body image; see step 5)
    newcs = _boundaries(hi, lo) & valid_s
    seg_cs = jnp.cumsum(newcs.astype(jnp.int32)) - 1
    n_cs = jnp.sum(newcs.astype(jnp.int32))
    cap_overflow |= n_cs > cs_cap
    seg_cs = jnp.where(valid_s, jnp.minimum(seg_cs, cs_cap - 1), cs_cap)
    # cheap bounds: contiguous cumsum ids mean end[s] = start[s+1]; one
    # 1-channel scatter replaces segment_bounds' two index scatters
    pos = jnp.arange(N, dtype=jnp.int32)
    starts = jnp.zeros(cs_cap + 1, jnp.int32).at[
        jnp.where(newcs, jnp.minimum(seg_cs, cs_cap), cs_cap)
    ].set(pos, mode="drop")
    starts = jnp.where(jnp.arange(cs_cap + 1) >= n_cs, n_valid, starts)
    have_cs = jnp.arange(cs_cap) < n_cs
    bounds_cs = (starts[:cs_cap], starts[1:], have_cs)

    world_s = world[perm]
    # recompute the fine coords from the sorted positions (identical
    # rounding to the key build); the cell center is then elementwise
    qrel_s = jnp.clip(
        jnp.floor(world_s / fine).astype(jnp.int32) - qbase, 0, lim - 1)
    center_s = ((qrel_s + qbase[None, :]).astype(dtype) + 0.5) * fine
    c = (world_s - center_s) * valid_s[:, None].astype(dtype)
    cx, cy, cz = c[:, 0], c[:, 1], c[:, 2]
    one = valid_s.astype(dtype)
    data = jnp.stack([cx * cx, cx * cy, cx * cz, cy * cy, cy * cz,
                      cz * cz, cx, cy, cz, one], axis=-1)
    M_cs = segments.sorted_segment_sum(data, seg_cs, num_segments=cs_cap,
                                       bounds=bounds_cs)        # (cs, 10)
    if _stage == 2:          # + cell-local (cell, scan) moment pass
        return M_cs, center_s

    # ======== everything below is TABLE-granularity (~N/20 rows) ========

    # --- 4a. unpack per-row keys ---
    first = jnp.where(have_cs, bounds_cs[0], 0)
    hi_tab = hi[first]
    lo_tab = lo[first]
    scan_tab = jnp.where(have_cs, lo_tab & ((1 << S) - 1), 0)
    cell_lo = lo_tab >> S                        # root_z + octant path
    rootx = hi_tab >> 15
    rooty = hi_tab & 0x7FFF
    rootz = cell_lo >> (3 * L)
    octs = cell_lo & ((1 << (3 * L)) - 1)
    sx = jnp.zeros_like(octs)
    sy = jnp.zeros_like(octs)
    sz = jnp.zeros_like(octs)
    for l in range(L):
        bits = (octs >> (3 * (L - 1 - l))) & 7
        sx = (sx << 1) | ((bits >> 2) & 1)
        sy = (sy << 1) | ((bits >> 1) & 1)
        sz = (sz << 1) | (bits & 1)
    qabs_tab = jnp.stack([(rootx << L) | sx, (rooty << L) | sy,
                          (rootz << L) | sz], -1) + qbase[None, :]
    qabs_tab = jnp.where(have_cs[:, None], qabs_tab, 0)

    # --- 4b. classification: plain fine-cell aggregation ---
    # every (cell, scan) row of a cell shares the SAME anchor (the cell
    # center), so the fine-cell world moments are a straight sum — no
    # rotation, no shift (v3 rotated body-anchored rows here; the
    # world-local formulation moves that one rotation to emission)
    capL = int(cell_caps[L])
    newf_tab = _boundaries(hi_tab, cell_lo) & have_cs
    segf_tab = jnp.cumsum(newf_tab.astype(jnp.int32)) - 1
    n_cells_f = jnp.sum(newf_tab.astype(jnp.int32))
    cap_overflow |= n_cells_f > capL
    segf_tab = jnp.where(have_cs, jnp.minimum(segf_tab, capL - 1), capL)
    M_f = segments.sorted_segment_sum(M_cs, segf_tab, num_segments=capL)
    qabs_f = segments.segment_first(qabs_tab, segf_tab, num_segments=capL)
    if _stage == 3:          # + fine-cell classification tables
        return M_f, qabs_f

    # --- 4c. coarser layers: parallel-axis aggregation on cell tables ---
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

        # shift child moments from child-cell-local to parent-cell-local.
        # EXACT integer-delta form: qabs_c - 2*qp is 0 or 1 per axis, so
        # d = sz_c * ((qabs_c - 2 qp) - 1/2) carries no |world-center|-
        # scale rounding (the absolute-center difference form loses
        # ~|center| * eps_f32 per axis at km-scale extents — advisor
        # round-4 finding)
        sz_c = voxel_size / (1 << (l + 1))
        d = ((qabs_c - 2 * qp).astype(dtype) - 0.5) * sz_c     # (cap_c, 3)
        Ms = _paxis_shift(M_c, d)
        M_p = segments.sorted_segment_sum(Ms, seg_p, num_segments=cap_l)
        qabs_p = segments.segment_first(qp, seg_p, num_segments=cap_l)
        tables[l] = (M_p, qabs_p, n_p, None)
        tables[l + 1] = (M_c, qabs_c, n_c, seg_p)   # child -> parent rows

    if _stage == 35:         # audit: per-layer cell tables (M, qabs, n)
        return {l: (tables[l][0], tables[l][1], tables[l][2])
                for l in range(L + 1)}, cap_overflow

    # --- 4d. per-layer stats + root->fine decision cascade ---
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
    leaf_cs = leaf_fine_ext[jnp.minimum(segf_tab, capL)]       # per cs row
    if _stage == 4:          # + cascade + leaf assignment
        return leaf_cs, meta_center

    # --- 5. emission: shift in WORLD frame, reduce to a COMPACT pair
    # table, rotate once per pair ---
    # Rotation commutes with the within-group aggregation (all rows of a
    # (leaf, scan) pair share the scan's R), so the world-local moments
    # are shifted by exact integer-cell-coordinate deltas, reduced to the
    # ~N/70 observed (leaf, scan) PAIRS (contiguous cumsum ids -> cheap
    # bounds; boundary-gather cost scales with table size, so compact
    # beats the dense Gcap*W layout ~6x), and only then rotated to the
    # body frame about the target cell center's body image
    # a_b = R^T(c_w - p).
    GW = Gcap * W
    center_tab = (qabs_tab.astype(dtype) + 0.5) * fine

    key_e = jnp.where((leaf_cs < Gcap) & have_cs,
                      leaf_cs * W + scan_tab, GW)
    key_e, operm = jax.lax.sort(
        (key_e, jnp.arange(cs_cap, dtype=jnp.int32)), num_keys=1)
    Mw = M_cs[operm]
    cw = center_tab[operm]
    qa_e = qabs_tab[operm]                                  # exact int cells
    live_e = key_e < GW
    new_e = jnp.ones(cs_cap, bool).at[1:].set(
        key_e[1:] != key_e[:-1]) & live_e
    seg_e = jnp.cumsum(new_e.astype(jnp.int32)) - 1
    n_pairs = jnp.sum(new_e.astype(jnp.int32))
    cap_overflow |= n_pairs > pair_cap
    seg_e = jnp.where(live_e, jnp.minimum(seg_e, pair_cap - 1), pair_cap)
    n_live = jnp.sum(live_e.astype(jnp.int32))
    pos_e = jnp.arange(cs_cap, dtype=jnp.int32)
    starts_e = jnp.zeros(pair_cap + 1, jnp.int32).at[
        jnp.where(new_e, jnp.minimum(seg_e, pair_cap), pair_cap)
    ].set(pos_e, mode="drop")
    starts_e = jnp.where(jnp.arange(pair_cap + 1) >= n_pairs,
                         n_live, starts_e)
    have_p = jnp.arange(pair_cap) < n_pairs
    bounds_e = (starts_e[:pair_cap], starts_e[1:], have_p)

    first_p = jnp.where(have_p, bounds_e[0], 0)
    cw_tgt = jnp.where(have_p[:, None], cw[first_p], 0.0)   # (pairs, 3)
    pairkey = jnp.where(have_p, key_e[first_p], GW)
    # EXACT integer-cell-coordinate deltas (as the module docstring
    # promises): fine * (qabs - qabs_tgt) — the absolute-center
    # difference (cw - cw_tgt) would carry ~|center| * eps_f32 rounding
    # per axis into the shifted moments at km-scale extents for
    # non-power-of-two voxel sizes (advisor round-4 finding)
    qa_tgt = jnp.where(have_p[:, None], qa_e[first_p], 0)
    d_w = jnp.where(
        live_e[:, None],
        (qa_e - qa_tgt[jnp.minimum(seg_e, pair_cap - 1)]).astype(dtype)
        * fine, 0.0)
    Mp = segments.sorted_segment_sum(
        _paxis_shift(Mw, d_w) * live_e[:, None].astype(dtype),
        seg_e, num_segments=pair_cap, bounds=bounds_e)      # (pairs, 10)

    scan_p = jnp.where(have_p, pairkey % W, 0)
    Rt_p = jnp.swapaxes(R[scan_p], -1, -2)                  # (pairs, 3, 3)
    Mp_b = _rot_moments(Mp, Rt_p)                           # body frame
    a_b = smallmat.matvec(Rt_p, cw_tgt - p[scan_p])
    a_b = jnp.where(have_p[:, None], a_b, 0.0)

    cnt_p = Mp_b[:, 9]
    m_p = Mp_b[:, 6:9] / jnp.maximum(cnt_p[:, None], 1.0)   # local mean
    P_p = jnp.stack([
        Mp_b[:, 0] - cnt_p * m_p[:, 0] * m_p[:, 0],
        Mp_b[:, 1] - cnt_p * m_p[:, 0] * m_p[:, 1],
        Mp_b[:, 2] - cnt_p * m_p[:, 0] * m_p[:, 2],
        Mp_b[:, 3] - cnt_p * m_p[:, 1] * m_p[:, 1],
        Mp_b[:, 4] - cnt_p * m_p[:, 1] * m_p[:, 2],
        Mp_b[:, 5] - cnt_p * m_p[:, 2] * m_p[:, 2],
    ], axis=-1)                                             # (pairs, 6)
    bmean_p = jnp.where(cnt_p[:, None] > 0, a_b + m_p, 0.0)

    # scatter the compact pairs into the dense (Gcap, W) factor layout
    tgt = jnp.where(have_p, pairkey, GW)
    cnt_flat = jnp.zeros(GW + 1, dtype).at[tgt].set(
        cnt_p, mode="drop")[:GW]
    P = jnp.zeros((GW + 1, 6), dtype).at[tgt].set(
        P_p, mode="drop")[:GW].reshape(Gcap, W, 6)
    bmean = jnp.zeros((GW + 1, 3), dtype).at[tgt].set(
        bmean_p, mode="drop")[:GW]
    cnt_ls = cnt_flat.reshape(Gcap, W)

    # --- 6. admission + compaction ---
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

    num_planes = jnp.sum(admit.astype(jnp.int32))
    if want_point_leaf:
        # point_leaf in the ORIGINAL (W, Nmax) layout, compacted ids
        inv = jnp.zeros(Gcap + 1, jnp.int32).at[order].set(
            jnp.arange(Gcap, dtype=jnp.int32))
        leaf_pt = leaf_cs[jnp.minimum(seg_cs, cs_cap - 1)]     # (N,)
        has_leaf = (leaf_pt < Gcap) & valid_s
        pl_sorted = jnp.where(
            has_leaf & admit[jnp.minimum(leaf_pt, Gcap - 1)],
            inv[jnp.minimum(leaf_pt, Gcap - 1)], -1)
        point_leaf = jnp.zeros(N, jnp.int32).at[perm].set(pl_sorted)
        point_leaf = point_leaf.reshape(W, Nmax)
    else:
        point_leaf = jnp.zeros((W, 0), jnp.int32)

    return DeviceVoxelizeResult(
        factors=factors,
        num_planes=num_planes,
        point_leaf=point_leaf,
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
    cs_cap: int | None = None,
    pair_cap: int | None = None,
    want_point_leaf: bool = True,
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

    want_point_leaf=False skips the per-point leaf map (one 16M-row
    gather + one scatter) — the production association+solve path never
    reads it.
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
    if cs_cap is None:
        cs_cap = int(min(max(4 * cell_caps[-1], 1 << 16), max(N, 1 << 16)))

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
            cs_cap=int(cs_cap),
            pair_cap=None if pair_cap is None else int(pair_cap),
            want_point_leaf=want_point_leaf,
        )
        if attempt == max_retries or not bool(out.overflow):
            return out
        cell_caps = tuple(min(c * 4, 1 << 22) for c in cell_caps)
        cs_cap = int(min(cs_cap * 4, max(N, 1 << 16)))
        if pair_cap is not None:
            pair_cap = int(pair_cap * 4)
        Gcap *= 4
    return out
