"""Device-side (TPU) adaptive voxelization: scans -> plane factors, on-chip.

The third association backend (after voxel/grid.py numpy and native/ C++),
and the one the SURVEY blueprint prescribes (§2.2 "TPU equivalents"): the
reference's pointer octree + unordered_map (cut_voxel bavoxel.hpp:1170-1223,
recut 737-776, hash tools.hpp:29-54) becomes a fixed-capacity, static-shape
pipeline of XLA-native primitives — no trees, no host round-trips, one
compiled computation from raw points to padded `PlaneFactors`:

  1. rigid transform of all scans — one batched (W, Nmax, 3) matmul (MXU)
  2. quantize to the FINEST octree resolution voxel/2^L and sort points by
     the packed fine cell key once (TPU sort: ~460 Mpts/s measured, 3-4x
     faster per pass than scatter — scripts/microbench_assoc_ops.py); every
     coarser cell key is a PREFIX of the fine key, so one sort serves all
     layers
  3. per layer l = 0..L: segment boundaries from prefix changes (cumsum),
     per-cell second moments via segment_sum in CELL-LOCAL coordinates
     (see PRECISION below), closed-form 3x3 eigenvalues (ops/eigh3),
     planarity gate lambda0/lambda1 < eigen_ratio[layer]
     (judge_eigen, bavoxel.hpp:654-699); failing cells "split" simply by
     letting their points continue to the next layer's finer prefix
  4. plane cells emit per-(leaf, scan) body-frame cluster moments with a
     TWO-PASS centered segment_sum (mean first, then centered products) —
     the factors come out already recentered (`recenter_bodies` is a no-op
     on them), which is the only f32-safe form (factors.py docstring)
  5. admission (>= min_observers scans, bavoxel.hpp:33-37) + compaction to
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
  * factor moments are two-pass centered per (leaf, scan) (the invariant
    from factors_windowed._window_moment applies to ALL new moment math).
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
        "min_observers", "unit_coe", "cell_caps", "Gcap",
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
):
    W, Nmax = body.shape[:2]
    N = W * Nmax
    dtype = body.dtype
    L = layer_limit

    # --- 1. transform (the one MXU op) ---
    world = jnp.einsum("wij,wnj->wni", R, body) + p[:, None, :]
    world = world.reshape(N, 3)
    bodyf = body.reshape(N, 3)
    valid = mask.reshape(N)
    scan_id = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[:, None], (W, Nmax)).reshape(N)

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
    # everything below runs in SORTED order
    qrel = qrel[perm]
    world_s = world[perm]
    valid_s = valid[perm]

    # --- 3. per-layer classification ---
    # per-point running state (sorted order)
    active = valid_s
    leaf_prov = jnp.full(N, Gcap, jnp.int32)   # provisional leaf id
    n_leaves = jnp.int32(0)
    cap_overflow = extent_overflow

    # per-leaf metadata, provisional-id indexed, sentinel row at Gcap
    meta_center = jnp.zeros((Gcap + 1, 3), dtype)
    meta_layer = jnp.zeros(Gcap + 1, jnp.int32)
    meta_decision = jnp.zeros(Gcap + 1, dtype)

    ratios = tuple(eigen_ratio) + (eigen_ratio[-1],) * max(
        0, L + 1 - len(eigen_ratio))

    for l in range(L + 1):
        shift = L - l
        cell_sz = voxel_size / (1 << l)
        cap = int(cell_caps[l])

        klo = lo >> (3 * shift)
        new = _boundaries(hi, klo) & active
        # a run only starts a NEW cell if its points are active; inactive
        # points (already leafed/dead/padding) must not occupy segments.
        # Because activity is a per-CELL property (all points of a cell
        # share their ancestors), runs are uniformly active or inactive.
        seg = jnp.cumsum(new.astype(jnp.int32)) - 1          # (N,)
        n_cells = seg[-1] + 1
        cap_overflow |= n_cells > cap
        seg = jnp.where(active, jnp.minimum(seg, cap - 1), cap)

        # cell-local coordinates: |local| <= cell_sz/2 (PRECISION note).
        # Layer-l world-grid cell coord = (qrel >> shift) + (qbase >> shift)
        # (exact: qbase is a multiple of 2^L); its center is (coord+0.5)*sz.
        cell_q = (qrel >> shift) + (qbase >> shift)[None, :]
        center_pt = (cell_q.astype(dtype) + 0.5) * cell_sz
        local = world_s - center_pt

        x, y, z = local[:, 0], local[:, 1], local[:, 2]
        one = jnp.where(active, jnp.asarray(1.0, dtype), 0.0)
        data = jnp.stack([
            x * x, x * y, x * z, y * y, y * z, z * z, x, y, z, one,
        ], axis=-1) * one[:, None]
        M = jax.ops.segment_sum(data, seg, num_segments=cap + 1,
                                indices_are_sorted=True)       # (cap+1, 10)
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
        is_real = jnp.arange(cap + 1) < jnp.minimum(n_cells, cap)
        is_plane = alive & (decision < ratios[l]) & is_real
        can_split = (alive & ~is_plane & is_real) if l < L else \
            jnp.zeros_like(alive)

        # provisional leaf ids for this layer's plane cells
        prank = jnp.cumsum(is_plane.astype(jnp.int32)) - 1
        leaf_of_cell = jnp.where(is_plane, n_leaves + prank, Gcap)
        n_new = jnp.sum(is_plane.astype(jnp.int32))
        cap_overflow |= (n_leaves + n_new) > Gcap
        leaf_of_cell = jnp.minimum(leaf_of_cell, Gcap)

        # leaf metadata (mean is cell-local -> add back the cell center;
        # representative center from any member point: segment_max)
        cell_center = jax.ops.segment_max(
            jnp.where(active[:, None], center_pt, -jnp.inf), seg,
            num_segments=cap + 1, indices_are_sorted=True)
        cell_center = jnp.where(jnp.isfinite(cell_center), cell_center, 0.0)
        meta_center = meta_center.at[leaf_of_cell].set(
            mean + cell_center, mode="drop")
        meta_layer = meta_layer.at[leaf_of_cell].set(
            jnp.full(cap + 1, l, jnp.int32), mode="drop")
        meta_decision = meta_decision.at[leaf_of_cell].set(
            decision, mode="drop")
        # the scatters above also hit the sentinel row Gcap; re-zero it
        meta_center = meta_center.at[Gcap].set(0.0)
        meta_decision = meta_decision.at[Gcap].set(0.0)

        # per-point updates
        got = leaf_of_cell[seg]
        leaf_prov = jnp.where(active & (got < Gcap), got, leaf_prov)
        active = active & can_split[seg]
        n_leaves = n_leaves + n_new

    # --- 4. factor emission: two-pass centered per (leaf, scan) ---
    scan_s = scan_id[perm]
    has_leaf = leaf_prov < Gcap
    seg2 = jnp.where(has_leaf, leaf_prov * W + scan_s, Gcap * W)
    body_s = bodyf[perm]
    onep = jnp.where(has_leaf, jnp.asarray(1.0, dtype), 0.0)
    S1 = jax.ops.segment_sum(
        jnp.concatenate([body_s * onep[:, None], onep[:, None]], axis=-1),
        seg2, num_segments=Gcap * W + 1)                       # (GW+1, 4)
    cnt_ls = S1[:-1, 3].reshape(Gcap, W)
    bmean = S1[:, :3] / jnp.maximum(S1[:, 3:4], 1.0)
    c = (body_s - bmean[seg2]) * onep[:, None]
    cx, cy, cz = c[:, 0], c[:, 1], c[:, 2]
    P = jax.ops.segment_sum(
        jnp.stack([cx * cx, cx * cy, cx * cz, cy * cy, cy * cz, cz * cz],
                  axis=-1),
        seg2, num_segments=Gcap * W + 1)[:-1].reshape(Gcap, W, 6)

    # --- 5. admission + compaction ---
    observers = jnp.sum(cnt_ls > 0, axis=1)
    total = jnp.sum(cnt_ls, axis=1)
    admit = (observers >= min_observers) & (total > 0)
    # jnp.argsort is stable: admitted leaves first, original order kept
    order = jnp.argsort((~admit).astype(jnp.int32))            # (Gcap,)
    adm_o = admit[order]

    Po = P[order] * adm_o[:, None, None]
    cnt_o = cnt_ls[order] * adm_o[:, None]
    b_o = bmean[:-1].reshape(Gcap, W, 3)[order] * adm_o[:, None, None]

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
