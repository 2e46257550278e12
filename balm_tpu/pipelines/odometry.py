"""Streaming lidar odometry + sliding-window BA (the BALM 1.0 system).

Functional re-design of the reference's real-time pipeline
(BALM-old/src/balm_front_back.cpp:171-684):

  per incoming scan:
    1. predict pose by constant motion      (balm_front_back.cpp:580-589)
    2. scan-to-map registration: point-to-plane LM against the plane map
       (VOXEL_DISTANCE, balmclass.hpp:1069-1231 — here: voxel lookup into
       a hashed plane-landmark map + a jitted 6-DoF Gauss-Newton)
    3. insert the scan into the voxel map (cut_voxel incremental)
    4. every `ba_every` scans: window BA over the last `window` poses
       (LM_SLWD_VOXEL, balmclass.hpp:236-724 — here: re-association via
       grid.voxelize + the production damped-Newton solver) and
       marginalize the oldest scans' geometry into the map

The map is a flat hash of root voxels holding world-frame cluster moments;
a voxel becomes a plane landmark (center + normal) once its cluster passes
the eigen-ratio test — the v1 octree's "centor map" (balmclass.hpp:727-1063)
without pointers.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SolverConfig, VoxelConfig
from ..ops import factors as Fmod
from ..ops import lie
from ..solver import lm
from ..voxel import grid


@dataclasses.dataclass
class OdometryConfig:
    voxel_size: float = 1.0
    plane_ratio: float = 1.0 / 9.0    # map-plane eigen gate (v1 used 1/9)
    min_plane_points: int = 20
    reg_iters: int = 6                 # point-to-plane GN iterations
    reg_reassociate: int = 2           # association passes (two-pass, C40)
    huber: float = 0.1                 # residual cap [m]
    window: int = 10
    ba_every: int = 5
    ba_voxel: VoxelConfig = VoxelConfig(min_observers=2, min_points=10)
    ba_solver: SolverConfig = SolverConfig(
        max_iters=8, u_init=0.01, min_planes_per_pose=1, gauge_fix=False
    )
    downsample: float = 0.25           # registration downsample


class VoxelPlaneMap:
    """Hashed root-voxel map of world-frame cluster moments."""

    def __init__(self, voxel_size: float, ratio: float, min_points: int):
        self.vs = voxel_size
        self.ratio = ratio
        self.min_points = min_points
        self.C: Dict[Tuple[int, int, int], np.ndarray] = {}
        self._planes = None  # cached (keys -> center, normal)

    def insert(self, world: np.ndarray):
        ks = np.floor(world / self.vs).astype(np.int64)
        q = np.concatenate([world, np.ones((len(world), 1))], -1)
        outer = q[:, :, None] * q[:, None, :]
        uniq, inv = np.unique(ks, axis=0, return_inverse=True)
        sums = np.zeros((len(uniq), 4, 4))
        np.add.at(sums, inv, outer)
        for i, key in enumerate(map(tuple, uniq)):
            if key in self.C:
                self.C[key] += sums[i]
            else:
                self.C[key] = sums[i]
        self._planes = None

    def plane_table(self):
        """-> (dict key->row, centers (M,3), normals (M,3)) of valid planes."""
        if self._planes is not None:
            return self._planes
        keys, cents, norms = [], [], []
        for key, C in self.C.items():
            N = C[3, 3]
            if N < self.min_points:
                continue
            vbar = C[:3, 3] / N
            cov = C[:3, :3] / N - np.outer(vbar, vbar)
            lam, U = np.linalg.eigh(cov)
            if lam[0] / max(lam[1], 1e-30) < self.ratio:
                keys.append(key)
                cents.append(vbar)
                norms.append(U[:, 0])
        table = {k: i for i, k in enumerate(keys)}
        self._planes = (
            table,
            np.asarray(cents).reshape(-1, 3),
            np.asarray(norms).reshape(-1, 3),
        )
        return self._planes


@jax.jit
def _gn_point_to_plane(R, p, pts, normals, centers, wgt):
    """One Gauss-Newton step on sum wgt (n . (R x + p - c))^2."""
    with jax.default_matmul_precision("float32"):
        return _gn_step(R, p, pts, normals, centers, wgt)


def _gn_step(R, p, pts, normals, centers, wgt):
    x = pts @ R.T + p
    r = jnp.sum(normals * (x - centers), axis=-1)
    # left-perturbation jacobian rows: [x cross n ; n]
    Jw = jnp.cross(x, normals)
    J = jnp.concatenate([Jw, normals], axis=-1)          # (M, 6)
    Jw_ = J * wgt[:, None]
    H = Jw_.T @ J
    g = Jw_.T @ r
    dx = jnp.linalg.solve(H + 1e-6 * jnp.eye(6), -g)
    Rn, pn = lie.se3_left_update(R, p, dx)
    cost = jnp.sum(wgt * r * r)
    return Rn, pn, cost


def register_scan(scan: np.ndarray, R0, p0, vmap: VoxelPlaneMap,
                  cfg: OdometryConfig):
    """Point-to-plane registration of one scan against the map."""
    table, cents, norms = vmap.plane_table()
    if len(cents) == 0:
        return R0, p0, 0
    pts = scan
    if cfg.downsample > 0:
        pts = grid.down_sample_voxel(pts, cfg.downsample)
    R, p = jnp.asarray(R0), jnp.asarray(p0)
    n_used = 0
    for _ in range(cfg.reg_reassociate):
        world = np.asarray(pts @ np.asarray(R).T + np.asarray(p))
        ks = np.floor(world / vmap.vs).astype(np.int64)
        rows = np.asarray(
            [table.get(tuple(k), -1) for k in ks], np.int64
        )
        sel = rows >= 0
        if sel.sum() < 20:
            break
        n_used = int(sel.sum())
        P = jnp.asarray(pts[sel])
        Nn = jnp.asarray(norms[rows[sel]])
        Cc = jnp.asarray(cents[rows[sel]])
        for _ in range(cfg.reg_iters):
            # huber-style reweighting on current residuals
            x = P @ R.T + p
            r = jnp.sum(Nn * (x - Cc), axis=-1)
            w = jnp.where(jnp.abs(r) < cfg.huber, 1.0,
                          cfg.huber / jnp.maximum(jnp.abs(r), 1e-12))
            R, p, cost = _gn_point_to_plane(R, p, P, Nn, Cc, w)
    return np.asarray(R), np.asarray(p), n_used


def run(scans: List[np.ndarray], cfg: OdometryConfig = OdometryConfig(),
        R_init=None, p_init=None, *, verbose: bool = False):
    """Process scans sequentially. Returns (R (W,3,3), p (W,3), info)."""
    W = len(scans)
    R = np.tile(np.eye(3), (W, 1, 1))
    p = np.zeros((W, 3))
    if R_init is not None:
        R[0] = R_init
    if p_init is not None:
        p[0] = p_init

    vmap = VoxelPlaneMap(cfg.voxel_size, cfg.plane_ratio,
                         cfg.min_plane_points)
    vmap.insert(scans[0] @ R[0].T + p[0])
    info = {"reg_points": [], "ba_runs": 0}

    for i in range(1, W):
        # constant-motion prediction (balm_front_back.cpp:580-589)
        if i >= 2:
            dR = R[i - 2].T @ R[i - 1]
            dp = R[i - 2].T @ (p[i - 1] - p[i - 2])
            R[i] = R[i - 1] @ dR
            p[i] = R[i - 1] @ dp + p[i - 1]
        else:
            R[i] = R[i - 1]
            p[i] = p[i - 1]

        R[i], p[i], used = register_scan(scans[i], R[i], p[i], vmap, cfg)
        info["reg_points"].append(used)
        vmap.insert(scans[i] @ R[i].T + p[i])

        # window BA (LM_SLWD_VOXEL equivalent)
        if cfg.ba_every > 0 and i >= cfg.window - 1 and (
                (i + 1) % cfg.ba_every == 0 or i == W - 1):
            lo = i - cfg.window + 1
            idx = list(range(lo, i + 1))
            vres = grid.voxelize(
                [scans[j] for j in idx], R[idx], p[idx], cfg.ba_voxel,
                dtype=np.float64,
            )
            if vres.num_planes >= 3:
                fj = Fmod.PlaneFactors(
                    *[jnp.asarray(x) for x in vres.factors]
                )
                res = lm.damping_iter(
                    jnp.asarray(R[idx]), jnp.asarray(p[idx]), fj,
                    cfg.ba_solver,
                )
                # re-anchor the window to keep pose lo fixed (the past is
                # already marginalized into the map)
                Rw = np.asarray(res.R)
                pw = np.asarray(res.p)
                A = R[lo] @ Rw[0].T
                b = p[lo] - A @ pw[0]
                for j, jj in enumerate(idx):
                    R[jj] = A @ Rw[j]
                    p[jj] = A @ pw[j] + b
                info["ba_runs"] += 1
                # refresh the map region covered by the window
                vmap = VoxelPlaneMap(cfg.voxel_size, cfg.plane_ratio,
                                     cfg.min_plane_points)
                for j in range(i + 1):
                    vmap.insert(scans[j] @ R[j].T + p[j])
        if verbose and i % 10 == 0:
            print(f"scan {i}: reg pts {used}, planes {len(vmap.plane_table()[1])}")

    return R, p, info
