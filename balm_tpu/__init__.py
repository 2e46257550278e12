"""balm_tpu: TPU-native lidar bundle adjustment (BALM-class capabilities).

A from-scratch JAX/XLA/Pallas framework implementing eigenvalue-minimization
bundle adjustment over SE(3) lidar pose windows: adaptive voxelization into
plane clusters, point-cluster sufficient statistics, closed-form second-order
plane factors, a jit-compiled damped-Newton solver, sliding-window
marginalization, pose-covariance/NEES propagation, and factor-sharded
multi-chip execution.  Reference capability target: hku-mars/BALM 2.0.
"""

from .config import BalmConfig, FactorConfig, SolverConfig, VoxelConfig


def optimize_poses(*args, **kwargs):
    """One-call BA over a pose window — see balm_tpu.api.optimize_poses.
    (Lazy import keeps `import balm_tpu` free of jax device init.)"""
    from .api import optimize_poses as _f

    return _f(*args, **kwargs)


__version__ = "0.2.0"
