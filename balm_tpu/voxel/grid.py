"""Adaptive voxelization: scans -> plane factor tensors.

Re-design of the reference's pointer octree
(`cut_voxel` bavoxel.hpp:1170-1223, `OCTO_TREE_NODE::recut/cut_func/
judge_eigen` bavoxel.hpp:626-776, `tras_opt` bavoxel.hpp:908-929) as a
flat, fully vectorized pipeline:

  1. hash points into root voxels (integer floor-divide, packed int64 key)
  2. per-cell moment accumulation via vectorized bincount (the octree's
     per-node sig_orig/sig_tran accumulators)
  3. planarity test lambda0/lambda1 < eigen_ratio[layer] on the batched
     3x3 eigendecomposition (judge_eigen, bavoxel.hpp:654-699)
  4. failing cells split into 8 octants by appending 3 bits to the cell id
     (cut_func re-scatter, bavoxel.hpp:701-735) — up to layer_limit rounds
  5. surviving plane cells emit per-(plane, scan) body-frame cluster
     moments as a padded PlaneFactors batch (tras_opt + VOX_HESS::
     push_voxel, bavoxel.hpp:30-51)

There are no trees and no pointers: a "node" is a row index, subdivision is
key arithmetic, and every pass is O(N) vectorized host work (association is
run once per BA problem; the per-iteration hot path is all on-device).
Association uses the INITIAL pose estimates, exactly like the reference
(recut consumes sig_tran built at cut_voxel time).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import VoxelConfig
from ..ops.factors import PlaneFactors

_OFFSET = 1 << 20  # voxel coordinates valid in (-2^20, 2^20)


@dataclasses.dataclass
class VoxelizeResult:
    factors: PlaneFactors
    num_planes: int            # valid (un-padded) plane count
    # per-point association (for display, merging, corruption experiments):
    point_leaf: np.ndarray     # (N,) leaf id per input point, -1 = dropped
    point_scan: np.ndarray     # (N,) scan id per input point
    leaf_center: np.ndarray    # (L, 3) world center of each plane leaf
    leaf_layer: np.ndarray     # (L,) octree layer of each leaf
    leaf_decision: np.ndarray  # (L,) lambda0/lambda1 at admission


def _moment_bincount(pts: np.ndarray, seg: np.ndarray, n: int) -> np.ndarray:
    """Per-segment homogeneous moments (n, 4, 4) via 10 bincounts."""
    C = np.zeros((n, 4, 4), pts.dtype)
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    C[:, 0, 0] = np.bincount(seg, x * x, minlength=n)
    C[:, 0, 1] = np.bincount(seg, x * y, minlength=n)
    C[:, 0, 2] = np.bincount(seg, x * z, minlength=n)
    C[:, 1, 1] = np.bincount(seg, y * y, minlength=n)
    C[:, 1, 2] = np.bincount(seg, y * z, minlength=n)
    C[:, 2, 2] = np.bincount(seg, z * z, minlength=n)
    C[:, 0, 3] = np.bincount(seg, x, minlength=n)
    C[:, 1, 3] = np.bincount(seg, y, minlength=n)
    C[:, 2, 3] = np.bincount(seg, z, minlength=n)
    C[:, 3, 3] = np.bincount(seg, minlength=n)
    C[:, 1, 0] = C[:, 0, 1]
    C[:, 2, 0] = C[:, 0, 2]
    C[:, 2, 1] = C[:, 1, 2]
    C[:, 3, 0] = C[:, 0, 3]
    C[:, 3, 1] = C[:, 1, 3]
    C[:, 3, 2] = C[:, 2, 3]
    return C


def _plane_test(C_tot: np.ndarray, eigen_ratio: float):
    """lambda0/lambda1 planarity decision per cell (judge_eigen,
    bavoxel.hpp:654-699). Returns (is_plane, decision, center, normal)."""
    N = np.maximum(C_tot[:, 3, 3], 1.0)
    vbar = C_tot[:, :3, 3] / N[:, None]
    cov = C_tot[:, :3, :3] / N[:, None, None] - vbar[:, :, None] * vbar[:, None, :]
    lam, U = np.linalg.eigh(cov)
    lam1 = np.maximum(lam[:, 1], 1e-30)
    decision = lam[:, 0] / lam1
    return decision < eigen_ratio, decision, vbar, U[:, :, 0]


def voxelize(
    points: List[np.ndarray],
    R: np.ndarray,
    p: np.ndarray,
    cfg: VoxelConfig = VoxelConfig(),
    *,
    dtype=np.float64,
    pad_to: int = 128,
    weighting: str = "point_count",
    backend: str = "auto",
) -> VoxelizeResult:
    """Associate scans into plane factors under initial poses (R, p).

    points: list of (Ni, 3) body-frame scans; R (W,3,3), p (W,3).
    backend: 'native' (C++ engine, balm_tpu/native), 'numpy' (reference
    implementation), or 'auto' (native when available).
    """
    W = len(points)
    if W == 0:
        raise ValueError("voxelize needs at least one scan")
    if weighting not in ("point_count", "unit"):
        raise ValueError(weighting)
    if backend == "auto":
        from .. import native
        backend = "native" if native.available() else "numpy"

    if backend == "native" and dtype == np.float64:
        from .. import native
        # fused concat + per-scan rigid transform, one parallel C++ pass
        body, world, scan_id = native.prepare_points(points, R, p)
    else:
        scan_id = np.concatenate(
            [np.full(len(pts), i, np.int64) for i, pts in enumerate(points)]
        )
        body = np.concatenate(points).astype(dtype, copy=False)
        # per-scan transform: avoids gathering a (N, 3, 3) rotation array
        world = np.empty_like(body)
        ofs = 0
        Rd = R.astype(dtype, copy=False)
        pd = p.astype(dtype, copy=False)
        for i, pts in enumerate(points):
            n = len(pts)
            seg = world[ofs:ofs + n]
            np.matmul(body[ofs:ofs + n], Rd[i].T, out=seg)
            seg += pd[i]
            ofs += n
    if len(body):
        # one-pass check (min/max propagate NaN, expose inf): non-finite
        # points silently poison cluster moments downstream.  Lidar
        # invalid returns are conventionally NaN — io/pcd.read_pcd_xyz
        # already drops them at load; filter before calling this.
        lo, hi = float(np.min(body)), float(np.max(body))
        if not (np.isfinite(lo) and np.isfinite(hi)):
            raise ValueError(
                "non-finite point coordinates in input scans; filter "
                "invalid returns first (io/pcd.read_pcd_xyz does)")
    n_pts = len(body)

    if backend == "native":
        from .. import native

        L, point_leaf, Cp, coep, centp, layers_all, decisions_all = (
            native.voxelize_factors(
                world, body, scan_id, W, cfg.voxel_size, cfg.layer_limit,
                np.asarray(cfg.eigen_ratio, np.float64), cfg.min_points,
                cfg.min_observers, weighting=weighting, pad_to=pad_to,
            )
        )
        Gpad = len(coep)
        if dtype != np.float64:
            Cp = Cp.astype(dtype)
            coep = coep.astype(dtype)
            centp = centp.astype(dtype)
        f = PlaneFactors(
            C=Cp,
            Cfix=np.zeros((Gpad, 4, 4), dtype),
            coe=coep,
            centers=centp,
            body_centers=np.zeros((Gpad, W, 3), dtype),
        )
        return VoxelizeResult(
            factors=f,
            num_planes=L,
            point_leaf=point_leaf,
            point_scan=scan_id,
            leaf_center=centp[:L],
            leaf_layer=layers_all,
            leaf_decision=decisions_all,
        )

    # --- root voxel hash (cut_voxel, bavoxel.hpp:1178-1184) ---
    coords = np.floor(world / cfg.voxel_size).astype(np.int64)
    if np.any(np.abs(coords) >= _OFFSET):
        raise ValueError("point cloud exceeds voxel-grid index range")
    key = (
        ((coords[:, 0] + _OFFSET) << 42)
        | ((coords[:, 1] + _OFFSET) << 21)
        | (coords[:, 2] + _OFFSET)
    )
    uniq, cell_of_point = np.unique(key, return_inverse=True)
    n_cells = len(uniq)
    cx = (uniq >> 42) - _OFFSET
    cy = ((uniq >> 21) & ((1 << 21) - 1)) - _OFFSET
    cz = (uniq & ((1 << 21) - 1)) - _OFFSET
    cell_center = (np.stack([cx, cy, cz], -1) + 0.5) * cfg.voxel_size
    half = cfg.voxel_size / 2.0

    active = np.ones(n_pts, bool)
    point_leaf = np.full(n_pts, -1, np.int64)

    leaf_C = []          # list of (l, W, 4, 4)
    leaf_center = []
    leaf_layer = []
    leaf_decision = []

    for layer in range(cfg.layer_limit + 1):
        idx = np.nonzero(active)[0]
        if len(idx) == 0:
            break
        cid = cell_of_point[idx]
        C_tot = _moment_bincount(world[idx], cid, n_cells)
        counts = C_tot[:, 3, 3]

        alive = counts > cfg.min_points      # (recut, bavoxel.hpp:746-747)
        ratio = cfg.eigen_ratio[min(layer, len(cfg.eigen_ratio) - 1)]
        is_plane, decision, centroid, _ = _plane_test(C_tot, ratio)
        is_plane &= alive
        can_split = alive & ~is_plane & (layer < cfg.layer_limit)

        # finalize plane leaves: build per-(leaf, scan) BODY-frame moments
        plane_ids = np.nonzero(is_plane)[0]
        if len(plane_ids) > 0:
            remap = np.full(n_cells, -1, np.int64)
            remap[plane_ids] = np.arange(len(plane_ids))
            on_plane = remap[cid] >= 0
            pidx = idx[on_plane]
            leafid = remap[cid[on_plane]]
            seg = leafid * W + scan_id[pidx]
            Cl = _moment_bincount(body[pidx], seg, len(plane_ids) * W)
            leaf_C.append(Cl.reshape(len(plane_ids), W, 4, 4))
            point_leaf[pidx] = leafid + sum(len(c) for c in leaf_C[:-1])
            leaf_center.append(centroid[plane_ids])
            leaf_layer.append([layer] * len(plane_ids))
            leaf_decision.append(decision[plane_ids])

        # drop dead + plane points from further processing
        keep = can_split[cid]
        active[idx[~keep]] = False

        if layer == cfg.layer_limit or not np.any(can_split):
            break

        # --- octant split (cut_func, bavoxel.hpp:701-735) ---
        idx2 = np.nonzero(active)[0]
        cid2 = cell_of_point[idx2]
        oct_bits = (world[idx2] > cell_center[cid2]).astype(np.int64)
        octant = 4 * oct_bits[:, 0] + 2 * oct_bits[:, 1] + oct_bits[:, 2]
        subkey = cid2 * 8 + octant
        uniq2, new_cid = np.unique(subkey, return_inverse=True)
        parent = uniq2 // 8
        obits = uniq2 % 8
        quarter = half / 2.0
        sign = np.stack(
            [2 * ((obits >> 2) & 1) - 1,
             2 * ((obits >> 1) & 1) - 1,
             2 * (obits & 1) - 1], -1
        ).astype(dtype)
        cell_center = cell_center[parent] + sign * quarter
        half = quarter
        n_cells = len(uniq2)
        cell_of_point = np.full(n_pts, -1, np.int64)
        cell_of_point[idx2] = new_cid

    # --- assemble factor batch (tras_opt + push_voxel) ---
    if leaf_C:
        C_all = np.concatenate(leaf_C, axis=0)
        centers_all = np.concatenate(leaf_center, axis=0)
        layers_all = np.concatenate([np.asarray(l) for l in leaf_layer])
        decisions_all = np.concatenate(leaf_decision)
    else:
        C_all = np.zeros((0, W, 4, 4), dtype)
        centers_all = np.zeros((0, 3), dtype)
        layers_all = np.zeros((0,), np.int64)
        decisions_all = np.zeros((0,), dtype)

    return _assemble(
        C_all, centers_all, layers_all, decisions_all, point_leaf,
        scan_id, W, cfg, dtype, pad_to, weighting,
    )


def _compress_rows(arr: np.ndarray, keep: np.ndarray) -> np.ndarray:
    """arr[keep] for a big (G, ...) array, as contiguous run memcpys.

    numpy's boolean fancy indexing gathers row-by-row (~1 s to drop 6 of
    5535 (W,4,4) leaf rows at realworld scale); copying the contiguous
    keep-runs instead is a handful of memcpys."""
    if keep.all():
        return arr
    drop = np.flatnonzero(~keep)
    out = np.empty((int(keep.sum()),) + arr.shape[1:], arr.dtype)
    src = dst = 0
    for d in drop:
        n = d - src
        out[dst:dst + n] = arr[src:d]
        dst += n
        src = d + 1
    out[dst:] = arr[src:]
    return out


def _assemble(C_all, centers_all, layers_all, decisions_all, point_leaf,
              scan_id, W, cfg, dtype, pad_to, weighting) -> VoxelizeResult:
    """Admission gates + padding -> PlaneFactors (push_voxel,
    bavoxel.hpp:30-51)."""

    # admission: >= min_observers scans (bavoxel.hpp:33-37)
    observers = (C_all[..., 3, 3] > 0).sum(axis=1)
    admit = observers >= cfg.min_observers
    C_all = _compress_rows(C_all, admit)
    centers_all = centers_all[admit]
    layers_all = layers_all[admit]
    decisions_all = decisions_all[admit]
    # remap point_leaf: admitted leaves get compact ids, others dropped
    old_ids = np.nonzero(admit)[0]
    remap = np.full(len(admit), -1, np.int64)
    remap[old_ids] = np.arange(len(old_ids))
    valid_pts = point_leaf >= 0
    point_leaf[valid_pts] = remap[point_leaf[valid_pts]]

    G = len(C_all)
    if weighting == "point_count":
        coe = C_all[..., 3, 3].sum(axis=1)   # bavoxel.hpp:41-44
    elif weighting == "unit":
        coe = np.ones(G, dtype)              # BAs_left.hpp:43-45
    else:
        raise ValueError(weighting)

    Gpad = max(pad_to, -(-G // pad_to) * pad_to)
    Cp = np.zeros((Gpad, W, 4, 4), dtype)
    Cp[:G] = C_all
    coep = np.zeros(Gpad, dtype)
    coep[:G] = coe
    centp = np.zeros((Gpad, 3), dtype)
    centp[:G] = centers_all

    # keep everything in host numpy f64: converting through jnp here would
    # silently truncate to f32 when jax x64 mode is off, destroying the
    # moments before recenter_bodies can condition them
    f = PlaneFactors(
        C=Cp,
        Cfix=np.zeros((Gpad, 4, 4), dtype),
        coe=coep,
        centers=centp,
        body_centers=np.zeros((Gpad, W, 3), dtype),
    )
    return VoxelizeResult(
        factors=f,
        num_planes=G,
        point_leaf=point_leaf,
        point_scan=scan_id,
        leaf_center=centers_all,
        leaf_layer=layers_all,
        leaf_decision=decisions_all,
    )


def down_sample_stride(points: np.ndarray, stride: int) -> np.ndarray:
    """Keep every stride-th point (reference down_sampling_serie,
    tools.hpp:244-254)."""
    return points[:: max(int(stride), 1)]


def down_sample_voxel(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Voxel-grid centroid downsampling (reference down_sampling_voxel,
    tools.hpp:203-242)."""
    if voxel_size < 1e-3:
        return points
    coords = np.floor(points / voxel_size).astype(np.int64)
    key = (
        ((coords[:, 0] + _OFFSET) << 42)
        | ((coords[:, 1] + _OFFSET) << 21)
        | (coords[:, 2] + _OFFSET)
    )
    uniq, inv = np.unique(key, return_inverse=True)
    n = len(uniq)
    out = np.zeros((n, 3), points.dtype)
    cnt = np.bincount(inv, minlength=n)
    for a in range(3):
        out[:, a] = np.bincount(inv, points[:, a], minlength=n) / cnt
    return out


class StreamingVoxelizer:
    """Incremental root-cell accumulation — the reference's per-scan
    `cut_voxel` into a persistent map (consistency.cpp:127-136,
    bavoxel.hpp:1170-1223): each inserted scan routes its points into
    root voxels, keeping BOTH the raw per-scan point lists (vec_orig/
    vec_tran) and running per-(cell, scan) cluster moments (sig_orig/
    sig_tran).  `finalize` then runs the subdivision/harvest exactly like
    the one-shot `voxelize` (recut + tras_opt are invoked once, when the
    window is full — consistency.cpp:132-136), reusing the incrementally
    accumulated layer-0 moments for the root planarity decisions.

    Final factors are equivalent to batch `voxelize` on the same scans
    (tests/test_voxelize.py pins the equality).
    """

    def __init__(self, W: int, cfg: VoxelConfig = VoxelConfig(), *,
                 dtype=np.float64):
        self.W = W
        self.cfg = cfg
        self.dtype = dtype
        self._scans = []          # (scan_id, body, world, key) chunks
        self._cells = {}          # root key -> (G, W-slot moment dict)
        self._moments = {}        # root key -> {scan: (4,4) moment}
        self.n_inserted = 0

    def insert(self, scan_idx: int, pts_body: np.ndarray,
               R: np.ndarray, p: np.ndarray):
        """Route one scan's points into root voxels (cut_voxel)."""
        body = pts_body.astype(self.dtype, copy=False)
        world = body @ R.astype(self.dtype).T + p.astype(self.dtype)
        coords = np.floor(world / self.cfg.voxel_size).astype(np.int64)
        if np.any(np.abs(coords) >= _OFFSET):
            raise ValueError("point cloud exceeds voxel-grid index range")
        key = (((coords[:, 0] + _OFFSET) << 42)
               | ((coords[:, 1] + _OFFSET) << 21)
               | (coords[:, 2] + _OFFSET))
        self._scans.append((scan_idx, body, world, key))
        # running per-(cell, scan) world moments (sig_tran): the root
        # decisions in finalize() come from THESE accumulators, not a
        # batch recompute
        uniq, inv = np.unique(key, return_inverse=True)
        C = _moment_bincount(world, inv, len(uniq))
        for k, Ck in zip(uniq, C):
            slot = self._moments.setdefault(int(k), {})
            if scan_idx in slot:
                slot[scan_idx] = slot[scan_idx] + Ck
            else:
                slot[scan_idx] = Ck
        self.n_inserted += 1

    def finalize(self, *, pad_to: int = 128, weighting: str = "unit"):
        """recut + tras_opt over the accumulated map -> VoxelizeResult."""
        cfg = self.cfg
        keys = sorted(self._moments)
        key_to_cell = {k: i for i, k in enumerate(keys)}
        n_cells = len(keys)
        # layer-0 moments from the INCREMENTAL accumulators
        C0 = np.zeros((n_cells, 4, 4), self.dtype)
        for k, slot in self._moments.items():
            C0[key_to_cell[k]] = sum(slot.values())
        is_plane0, dec0, cent0, _ = _plane_test(
            C0, cfg.eigen_ratio[0])
        alive0 = C0[:, 3, 3] > cfg.min_points
        is_plane0 &= alive0

        # assemble the point-level view once for subdivision + emission
        scan_id = np.concatenate([
            np.full(len(b), s, np.int64) for s, b, _, _ in self._scans])
        body = np.concatenate([b for _, b, _, _ in self._scans])
        world = np.concatenate([w for _, _, w, _ in self._scans])
        key = np.concatenate([k for _, _, _, k in self._scans])
        cell_of_point = np.asarray(
            [key_to_cell[int(k)] for k in np.unique(key)])[
                np.searchsorted(np.asarray(keys), key)]

        point_leaf = np.full(len(body), -1, np.int64)
        leaf_C, leaf_center, leaf_layer, leaf_dec = [], [], [], []

        # layer-0 plane leaves (from the incremental moments)
        plane_ids = np.nonzero(is_plane0)[0]
        W = self.W
        if len(plane_ids):
            remap = np.full(n_cells, -1, np.int64)
            remap[plane_ids] = np.arange(len(plane_ids))
            on_plane = remap[cell_of_point] >= 0
            leafid = remap[cell_of_point[on_plane]]
            seg = leafid * W + scan_id[on_plane]
            Cl = _moment_bincount(body[on_plane], seg,
                                  len(plane_ids) * W)
            leaf_C.append(Cl.reshape(len(plane_ids), W, 4, 4))
            point_leaf[on_plane] = leafid
            leaf_center.append(cent0[plane_ids])
            leaf_layer.append([0] * len(plane_ids))
            leaf_dec.append(dec0[plane_ids])

        # deeper layers: delegate to the batch pipeline restricted to
        # subdividing cells (recut recursion, identical semantics)
        can_split = alive0 & ~is_plane0 & (cfg.layer_limit > 0)
        sel = can_split[cell_of_point]
        if np.any(sel):
            import dataclasses as _dc

            # subdivision runs in WORLD space (identity poses over the
            # already-transformed points); the deeper leaves' factor
            # moments are then rebuilt from the true BODY coordinates
            sub_scans = []
            for w in range(W):
                m = sel & (scan_id == w)
                sub_scans.append(world[m])
            sub = voxelize(
                sub_scans, np.tile(np.eye(3), (W, 1, 1)),
                np.zeros((W, 3)), _dc.replace(cfg), dtype=self.dtype,
                pad_to=pad_to, weighting=weighting, backend="numpy")
            # sub re-derives roots over the same grid -> only deeper
            # leaves appear (roots that pass here were already excluded)
            n0 = sum(len(c) for c in leaf_C)
            keep = sub.leaf_layer > 0
            kidx = np.nonzero(keep)[0]
            if len(kidx):
                remap2 = np.full(sub.num_planes, -1, np.int64)
                remap2[kidx] = np.arange(len(kidx)) + n0
                subm = sub.point_leaf >= 0
                gidx = np.nonzero(sel)[0]
                # sub's points are ordered scan-major; rebuild the map
                order = np.concatenate(
                    [gidx[scan_id[gidx] == w] for w in range(W)])
                point_leaf[order[subm]] = remap2[sub.point_leaf[subm]]
                # body-frame moments for the deeper leaves
                deep = point_leaf >= n0
                seg2 = ((point_leaf[deep] - n0) * W + scan_id[deep])
                C2 = _moment_bincount(body[deep], seg2, len(kidx) * W)
                leaf_C.append(C2.reshape(len(kidx), W, 4, 4))
                leaf_center.append(sub.leaf_center[kidx])
                leaf_layer.append(sub.leaf_layer[kidx])
                leaf_dec.append(sub.leaf_decision[kidx])

        if leaf_C:
            C_all = np.concatenate(leaf_C, 0)
            centers_all = np.concatenate(leaf_center, 0)
            layers_all = np.concatenate(
                [np.asarray(x) for x in leaf_layer])
            dec_all = np.concatenate(leaf_dec)
        else:
            C_all = np.zeros((0, W, 4, 4), self.dtype)
            centers_all = np.zeros((0, 3), self.dtype)
            layers_all = np.zeros((0,), np.int64)
            dec_all = np.zeros((0,), self.dtype)
        return _assemble(C_all, centers_all, layers_all, dec_all,
                         point_leaf, scan_id, W, self.cfg, self.dtype,
                         pad_to, weighting)
