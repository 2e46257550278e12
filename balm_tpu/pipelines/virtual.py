"""Synthetic plane benchmark — the reference's `benchmark_virtual` experiment.

Reproduces the data-generation and evaluation protocol of
src/benchmark/benchmark_virtual.cpp:524-609 (generator), 486-522
(perturbation + RSME) and its embedded solver (375-482): known plane/scan
association, so no voxelization is involved — this is the solver's
ground-truth oracle.

Protocol (same constants as the reference):
  * trajectory: smooth interpolation from identity to a random end pose
    with |rot| = 0.5 rad, |trans| = 1 m (lines 559-570)
  * planes: 1x1 m patches, first 3 axis-aligned for observability, centers
    uniform in [-surf_range, surf_range]^3, point thickness sigma =
    point_noise (lines 572-606)
  * perturbation: sigma = 2 deg / sqrt(3) per axis rot, 0.1/sqrt(3) m per
    axis trans (lines 491-503)
  * solver: u0 = 0.1, <= 20 iterations (lines 380, 408)
  * metric: pose RSME vs ground truth after gauge alignment (lines 48-62)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..config import SolverConfig
from ..ops import clusters, factors, lie
from ..solver import lm
from ..utils import metrics


@dataclasses.dataclass
class VirtualConfig:
    win_size: int = 20          # winSize (launch default 20)
    surf_size: int = 20         # sufSize (launch benchmark_virtual.launch: 20)
    pts_size: int = 40          # ptsSize per (plane, scan)
    point_noise: float = 0.01   # plane thickness sigma
    surf_range: float = 2.0
    rot_noise_deg: float = 2.0
    trans_noise: float = 0.1
    seed: int = 0
    dtype: str = "float64"


def generate(cfg: VirtualConfig):
    """Generate ground-truth poses and per-(plane, scan) body-frame points.

    Returns (R_gt (W,3,3), p_gt (W,3), points (G, W, K, 3) body frame).
    """
    rng = np.random.default_rng(cfg.seed)
    W, G, K = cfg.win_size, cfg.surf_size, cfg.pts_size

    rot_end = rng.normal(size=3)
    rot_end = rot_end / np.linalg.norm(rot_end) * 0.5
    tra_end = rng.normal(size=3)
    tra_end = tra_end / np.linalg.norm(tra_end) * 1.0

    ratios = np.arange(W) / W
    R_gt = np.array(lie.so3_exp(jnp.asarray(ratios[:, None] * rot_end[None])))
    p_gt = ratios[:, None] * tra_end[None]

    # plane orientations: first 3 axis-aligned (benchmark_virtual.cpp:578-587)
    rots = np.zeros((G, 3, 3))
    for i in range(G):
        if i < 3:
            fd = np.zeros(3)
            fd[i] = np.pi / 2
            rots[i] = np.array(lie.so3_exp(jnp.asarray(fd)))
        else:
            rots[i] = np.array(
                lie.so3_exp(jnp.asarray(rng.uniform(-np.pi, np.pi, size=3)))
            )
    centers = rng.uniform(-cfg.surf_range, cfg.surf_range, size=(G, 3))

    # points: uniform in the plane patch, gaussian thickness
    uv = rng.uniform(-0.5, 0.5, size=(G, W, K, 2))
    th = rng.normal(0.0, cfg.point_noise, size=(G, W, K, 1))
    local = np.concatenate([uv, th], axis=-1)  # (G, W, K, 3)
    world = np.einsum("gab,gwkb->gwka", rots, local) + centers[:, None, None, :]
    # into body frame of scan w: R^T (x - p)
    body = np.einsum("wba,gwkb->gwka", R_gt, world - p_gt[None, :, None, :])
    return R_gt, p_gt, body


def perturb(R_gt, p_gt, cfg: VirtualConfig):
    """Apply the reference's pose corruption (benchmark_virtual.cpp:491-503)."""
    rng = np.random.default_rng(cfg.seed + 1)
    W = R_gt.shape[0]
    s_rot = (cfg.rot_noise_deg / 57.3) / np.sqrt(3.0)
    s_tra = cfg.trans_noise / np.sqrt(3.0)
    drot = rng.normal(0.0, s_rot, size=(W, 3))
    dtra = rng.normal(0.0, s_tra, size=(W, 3))
    # right-multiplicative rotation noise (line 501)
    R0 = np.einsum("wab,wbc->wac", R_gt, np.array(lie.so3_exp(jnp.asarray(drot))))
    p0 = p_gt + dtra
    return R0, p0


def build_factors(body_points, dtype) -> factors.PlaneFactors:
    """Known-association cluster build (benchmark_virtual.cpp:391-403)."""
    G, W, K, _ = body_points.shape
    pts = jnp.asarray(body_points.reshape(-1, 3), dtype)
    seg = jnp.arange(G * W, dtype=jnp.int32).repeat(K)
    C = clusters.from_points(pts, seg, G * W).reshape(G, W, 4, 4)
    coe = jnp.full((G,), float(W * K), dtype)  # coeffs = winSize*ptsSize (line 391)
    return factors.PlaneFactors.create(C, coe=coe)


def run(cfg: VirtualConfig = VirtualConfig(), solver_cfg: Optional[SolverConfig] = None,
        *, centered: bool = False, verbose: bool = False):
    """Full experiment. Returns dict with rsme and solver result."""
    if solver_cfg is None:
        solver_cfg = SolverConfig(max_iters=20, u_init=0.1, min_planes_per_pose=3)
    dtype = jnp.dtype(cfg.dtype)

    R_gt, p_gt, body = generate(cfg)
    R0, p0 = perturb(R_gt, p_gt, cfg)
    f = build_factors(body, dtype)
    if centered:
        T0 = lie.pose_matrix(jnp.asarray(R0, dtype), jnp.asarray(p0, dtype))
        f = f._replace(centers=factors.estimate_centers(T0, f))

    res = lm.damping_iter(
        jnp.asarray(R0, dtype), jnp.asarray(p0, dtype), f, solver_cfg,
        centered=centered,
    )
    rot0, tra0 = metrics.pose_rsme(
        jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(R_gt), jnp.asarray(p_gt)
    )
    rot1, tra1 = metrics.pose_rsme(
        res.R.astype(jnp.float64), res.p.astype(jnp.float64),
        jnp.asarray(R_gt), jnp.asarray(p_gt),
    )
    out = {
        "rsme_rot_deg_initial": float(rot0) * 57.29577951308232,
        "rsme_trans_m_initial": float(tra0),
        "rsme_rot_deg": float(rot1) * 57.29577951308232,
        "rsme_trans_m": float(tra1),
        "iters": int(res.iters),
        "residual": float(res.residual),
        "degenerate": bool(res.degenerate),
        "result": res,
    }
    if verbose:
        print(lm.format_trace(res))
        print(f"RSME: {out['rsme_rot_deg']:.6f}deg, {out['rsme_trans_m']:.6f}m")
    return out
