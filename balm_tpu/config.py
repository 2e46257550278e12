"""Single configuration surface for the whole framework.

The reference (hku-mars/BALM) scatters its configuration across compile-time
globals (src/benchmark/bavoxel.hpp:8-19), ROS launch files (launch/*.launch)
and in-code overrides (src/benchmark/benchmark_realworld.cpp:183-185).  Here
everything lives in one dataclass so no experiment can silently override a
threshold in code.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VoxelConfig:
    """Adaptive voxelization (reference: bavoxel.hpp:8-19, 626-965, 1170-1223)."""

    voxel_size: float = 1.0
    # Max octree depth below the root voxel (reference `layer_limit`,
    # bavoxel.hpp:8; consistency uses 0, BAs_left.hpp:18).
    layer_limit: int = 2
    # Planarity gate lambda0/lambda1 per layer (reference `eigen_value_array`,
    # bavoxel.hpp:11; realworld overrides to {1/16,1/16,1/9},
    # benchmark_realworld.cpp:183-185; consistency uses 1/64, BAs_left.hpp:20).
    eigen_ratio: Tuple[float, ...] = (1.0 / 16, 1.0 / 16, 1.0 / 9, 1.0 / 16)
    # Minimum points for a voxel to stay alive (reference `min_ps`,
    # bavoxel.hpp:12; consistency uses 10, BAs_left.hpp:21).
    min_points: int = 15
    # A plane voxel is frozen (state 2) above this count (reference
    # `layer_size`, bavoxel.hpp:9). Only matters for incremental maps.
    freeze_size: int = 30
    # A factor must be observed by at least this many scans to enter the BA
    # (reference bavoxel.hpp:37 `process_size < 2`; the consistency build
    # comments this out, BAs_left.hpp:41 -> use 1 there).
    min_observers: int = 2


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Damped Newton / LM loop (reference BALM2::damping_iter,
    bavoxel.hpp:1069-1166; virtual variant benchmark_virtual.cpp:375-482;
    consistency variant BAs_left.hpp:1025-1098)."""

    max_iters: int = 10
    u_init: float = 0.01          # virtual benchmark uses 0.1
    v_init: float = 2.0
    rel_tol: float = 1e-6         # |res1-res2|/res1 (bavoxel.hpp:1155)
    abs_tol: float = 0.0          # consistency uses |res1-res2| < 1e-9
    # f32-aware stop floor: also stop when |res1-res2| drops below
    # ulp_tol * eps(dtype) * res1 — i.e. the trial delta is within a few
    # ULPs of the cost and further iterations only chase reduction-order
    # dither.  In f64 (eps ~ 2e-16) the floor sits ~9 orders below the
    # reference's tolerances and never binds; in f32 it is what
    # terminates solves whose residual dither straddles abs_tol (the
    # round-4 consistency seeds that burned the 1000-iteration cap).
    # 128 covers the measured systematic offset between the full and
    # residual-only evaluators' reduction orders (~56 ULP on the
    # consistency problem) with margin; 0 disables.
    ulp_tol: float = 128.0
    # Every pose must observe at least this many planes, else the problem is
    # declared degenerate (reference bavoxel.hpp:1071-1085 exits; we return a
    # status instead).
    min_planes_per_pose: int = 20
    # Re-anchor the trajectory to pose 0 after optimization
    # (reference bavoxel.hpp:1159-1164).
    gauge_fix: bool = True


@dataclasses.dataclass(frozen=True)
class FactorConfig:
    """Plane-factor evaluation options."""

    # 'point_count': coe = sum_i N_i (bavoxel.hpp:42-44);
    # 'unit': coe = 1 (BAs_left.hpp:43-45, the consistency build).
    weighting: str = "point_count"
    # Use jnp.linalg.eigh instead of the closed-form 3x3 eigensolver
    # (slower; for bitwise-style validation only).
    use_lapack_eigh: bool = False
    # Guard for the 1/(lambda_k - lambda_0) eigen-gap terms.
    gap_eps: float = 1e-12


@dataclasses.dataclass(frozen=True)
class BalmConfig:
    voxel: VoxelConfig = VoxelConfig()
    solver: SolverConfig = SolverConfig()
    factor: FactorConfig = FactorConfig()
    # Compute dtype for the BA kernels. float64 requires jax x64 mode and is
    # the parity/testing mode; float32 (with per-plane centering, see
    # ops/factors.py) is the TPU fast path, mirroring the reference's float
    # build (Supplementary/data/*/5.txt).
    dtype: str = "float64"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


DEFAULT = BalmConfig()
