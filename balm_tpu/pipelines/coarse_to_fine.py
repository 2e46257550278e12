"""Coarse-to-fine multi-resolution bundle adjustment.

The reference README (README.md:5, "Notes for real-world experiments")
prescribes the recipe for poor initial trajectories: run BA with a LARGE
voxel size and LOOSE plane criteria first, then re-associate at smaller
voxels with stricter criteria using the refined poses — repeated
re-association per stage (BASELINE.json configs[3]).  The reference leaves
this to the user (its driver runs one stage); here it is a first-class
pipeline.
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ..config import SolverConfig, VoxelConfig
from ..ops import factors as Fmod
from ..solver import lm
from ..voxel import grid


def default_stages() -> List[VoxelConfig]:
    """4 -> 2 -> 1 m voxels, 1/9 -> 1/16 ratio (loose -> strict)."""
    return [
        VoxelConfig(voxel_size=4.0, eigen_ratio=(1 / 9, 1 / 9, 1 / 9)),
        VoxelConfig(voxel_size=2.0, eigen_ratio=(1 / 12, 1 / 12, 1 / 12)),
        VoxelConfig(voxel_size=1.0, eigen_ratio=(1 / 16, 1 / 16, 1 / 9)),
    ]


def run(
    scans: Sequence[np.ndarray],
    R: np.ndarray,
    p: np.ndarray,
    stages: Optional[List[VoxelConfig]] = None,
    solver_cfg: SolverConfig = SolverConfig(max_iters=10, u_init=0.01),
    *,
    dtype: str = "float64",
    centered: bool = False,
    verbose: bool = False,
):
    """Iterate (associate at current poses -> solve) over the stages.

    Returns (R, p, per-stage summaries)."""
    if stages is None:
        stages = default_stages()
    jdt = jnp.dtype(dtype)
    R = np.asarray(R, np.float64)
    p = np.asarray(p, np.float64)
    history = []

    for si, vcfg in enumerate(stages):
        t0 = time.perf_counter()
        vres = grid.voxelize(scans, R, p, vcfg, dtype=np.float64)
        t_assoc = time.perf_counter() - t0
        f = vres.factors
        if centered:
            f = Fmod.recenter_bodies(f)
        if jdt != jnp.float64:
            f = f.astype(jdt)
        fj = Fmod.PlaneFactors(*[jnp.asarray(x) for x in f])

        t0 = time.perf_counter()
        res = lm.damping_iter(
            jnp.asarray(R, jdt), jnp.asarray(p, jdt), fj, solver_cfg,
            centered=centered,
        )
        res.R.block_until_ready()
        t_solve = time.perf_counter() - t0

        R = np.asarray(res.R, np.float64)
        p = np.asarray(res.p, np.float64)
        info = {
            "stage": si,
            "voxel_size": vcfg.voxel_size,
            "num_planes": vres.num_planes,
            "iters": int(res.iters),
            "residual_initial": float(res.trace_res1[0]),
            "residual_final": float(res.residual),
            "degenerate": bool(res.degenerate),
            "t_assoc_s": t_assoc,
            "t_solve_s": t_solve,
        }
        history.append(info)
        if verbose:
            print(
                f"stage {si}: voxel {vcfg.voxel_size} m, "
                f"{vres.num_planes} planes, "
                f"{info['residual_initial']:.2f} -> {info['residual_final']:.2f} "
                f"({info['iters']} iters)"
            )

    return R, p, history
