"""LOAM-style feature front-end: corner + surf two-stage scan-to-map.

The counterpart of the reference's alternative front-end node
`loamscan2map` (BALM-old/src/loamscan2map.cpp:1-1223): per sweep, split
the scanlines into EDGE (high curvature) and SURF (low curvature)
features (features/loam.py re-designs velodyne_feature.cpp), then
register edge points against a CORNER map's line landmarks and surf
points against a SURF map's plane landmarks in one joint
Gauss-Newton (the reference runs corner and surf cost blocks in the same
LM, loamscan2map.cpp's laserCloudCornerFromMap/SurfFromMap stages).

Differences by design (not a translation):
  * the two maps are incremental `VoxelPlaneMap`s (flat sorted-array
    voxel stores with batched eigendecomposition refresh) instead of
    pointwise kd-trees rebuilt per sweep — association is a vectorized
    searchsorted over packed voxel keys;
  * the joint corner x surf IRLS solve is the fused one-dispatch GN of
    pipelines/odometry (`_gn_mixed_fused`), not per-point Ceres-style
    residual blocks;
  * map maintenance is moment subtraction/addition (contribution swaps)
    rather than cloud re-downsampling.

`pipelines/odometry.run` remains the PRIMARY front-end (scan-to-map on
raw downsampled points, the balm_front_back equivalent); this module is
the feature-based alternative the reference ships alongside it.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np
import jax.numpy as jnp

from ..features import loam
from . import odometry as odo


@dataclasses.dataclass
class LoamFrontConfig:
    loam: loam.LoamConfig = dataclasses.field(
        default_factory=loam.LoamConfig)
    # surf map: plane landmarks; corner map: LINE landmarks only
    surf_voxel: float = 1.0
    # corner voxels are COARSER than surf voxels: an edge cluster is a
    # thin strip plus short arms of bend-adjacent wall picks; a larger
    # voxel keeps the strip's extent dominant in the line eigen test
    # (lambda_1/lambda_2 ~ (arm/extent)^2)
    corner_voxel: float = 1.0
    plane_ratio: float = 1.0 / 9.0
    line_ratio: float = 1.0 / 16.0
    min_points: int = 8
    reg_iters: int = 6
    reg_reassociate: int = 2
    huber: float = 0.1
    min_matches: int = 20


def register_features(surf_pts, edge_pts, smap, cmap,
                      cfg: LoamFrontConfig, R0, p0):
    """Joint surf-to-plane + edge-to-line GN against the two maps.

    Two-stage like the reference (re-associate between GN passes).
    Returns (R, p, n_surf_used, n_edge_used)."""
    R, p = jnp.asarray(R0), jnp.asarray(p0)
    ns = ne = 0
    for _ in range(cfg.reg_reassociate):
        Rn = np.asarray(R)
        pn = np.asarray(p)
        sw = surf_pts @ Rn.T + pn
        rows = smap.lookup(sw)
        sel = rows >= 0
        ns = int(sel.sum())
        _, cents, norms = smap.plane_table()
        lkeys, lcents, ldirs = cmap.line_table()
        ew = edge_pts @ Rn.T + pn
        lrows = cmap.lookup_lines(ew) if len(lkeys) else \
            np.full(len(edge_pts), -1)
        lsel = lrows >= 0
        ne = int(lsel.sum())
        if ns + ne < cfg.min_matches:
            break
        m = odo._bucket_pow2(max(ns, 1), 512)
        P = np.zeros((m, 3)); P[:ns] = surf_pts[sel]
        Nn = np.zeros((m, 3)); Nn[:ns] = norms[rows[sel]]
        Cc = np.zeros((m, 3)); Cc[:ns] = cents[rows[sel]]
        mask = np.zeros(m); mask[:ns] = 1.0
        ml = odo._bucket_pow2(max(ne, 1), 128)
        Pl = np.zeros((ml, 3)); Pl[:ne] = edge_pts[lsel].reshape(-1, 3)
        Dl = np.tile(np.array([0.0, 0.0, 1.0]), (ml, 1))
        Dl[:ne] = ldirs[lrows[lsel]].reshape(-1, 3)
        Cl = np.zeros((ml, 3)); Cl[:ne] = lcents[lrows[lsel]].reshape(-1, 3)
        lmask = np.zeros(ml); lmask[:ne] = 1.0
        R, p, _cost = odo._gn_mixed_fused(
            R, p, jnp.asarray(P), jnp.asarray(Nn), jnp.asarray(Cc),
            jnp.asarray(mask), jnp.asarray(Pl), jnp.asarray(Dl),
            jnp.asarray(Cl), jnp.asarray(lmask), cfg.huber,
            iters=cfg.reg_iters)
    return np.asarray(R), np.asarray(p), ns, ne


def run(sweeps: Sequence[List[np.ndarray]],
        cfg: LoamFrontConfig = LoamFrontConfig(), *,
        verbose: bool = False):
    """Process sweeps (each a list of scanline arrays) sequentially.

    Returns (R (W,3,3), p (W,3), info).  Feature extraction -> two-map
    scan-to-map registration -> map insertion, the loamscan2map loop."""
    W = len(sweeps)
    R = np.tile(np.eye(3), (W, 1, 1))
    p = np.zeros((W, 3))
    smap = odo.VoxelPlaneMap(cfg.surf_voxel, cfg.plane_ratio,
                             cfg.min_points)
    cmap = odo.VoxelPlaneMap(cfg.corner_voxel, 0.0, max(cfg.min_points
                                                        // 2, 4),
                             line_ratio=cfg.line_ratio)
    feats = [loam.extract(list(sw), cfg.loam) for sw in sweeps]
    info = {"surf_used": [], "edge_used": []}

    smap.insert(feats[0][0] @ R[0].T + p[0])
    cmap.insert(feats[0][1] @ R[0].T + p[0])
    for i in range(1, W):
        if i >= 2:
            dR = R[i - 2].T @ R[i - 1]
            dp = R[i - 2].T @ (p[i - 1] - p[i - 2])
            R[i] = odo._project_so3(R[i - 1] @ dR)
            p[i] = R[i - 1] @ dp + p[i - 1]
        else:
            R[i], p[i] = R[i - 1], p[i - 1]
        surf, edge = feats[i]
        R[i], p[i], ns, ne = register_features(
            surf, edge, smap, cmap, cfg, R[i], p[i])
        info["surf_used"].append(ns)
        info["edge_used"].append(ne)
        smap.insert(surf @ R[i].T + p[i])
        if len(edge):
            cmap.insert(edge @ R[i].T + p[i])
        if verbose and i % 10 == 0:
            print(f"sweep {i}: surf {ns}, edge {ne}")
    return R, p, info
