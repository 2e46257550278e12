"""balm_tpu: TPU-native lidar bundle adjustment (BALM-class capabilities).

A from-scratch JAX/XLA/Pallas framework implementing eigenvalue-minimization
bundle adjustment over SE(3) lidar pose windows: adaptive voxelization into
plane clusters, point-cluster sufficient statistics, closed-form second-order
plane factors, a jit-compiled damped-Newton solver, sliding-window
marginalization, pose-covariance/NEES propagation, and factor-sharded
multi-chip execution.  Reference capability target: hku-mars/BALM 2.0.
"""

from .config import BalmConfig, FactorConfig, SolverConfig, VoxelConfig

__version__ = "0.1.0"
