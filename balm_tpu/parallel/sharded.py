"""Multi-chip execution: factor-parallel Hessian assembly over a device mesh.

The reference's entire "distributed backend" is 4 std::threads over
contiguous plane ranges with private (6W, 6W) accumulators reduced by a
join + matrix add (bavoxel.hpp:989-1059).  The TPU-native equivalent:
shard the PLANE axis of the factor batch over the mesh; every per-plane
quantity (moments, eigendecompositions, outer-product rows) is computed
locally, and the G-axis reductions that produce the (6W, 6W) normal
equations — a matmul and two segment sums — are partitioned by XLA's SPMD
pass, which inserts the psum/reduce-scatter over ICI that replaces
thread::join.  Poses, H, and the LM state are replicated (6W x 6W is tiny
next to the factor data); the dense solve runs replicated.

The same annotations scale to multi-host meshes: 'factor' spans all chips,
the factor tensors are laid out host-local, and the collective rides
ICI within a slice / DCN across slices.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.factors import PlaneFactors

FACTOR_AXIS = "factor"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the factor axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (FACTOR_AXIS,))


def pad_planes(f: PlaneFactors, multiple: int) -> PlaneFactors:
    """Pad the plane axis to a multiple (padding planes have coe == 0 and
    contribute exactly zero — tests/test_factors.py::test_padding)."""
    G = f.num_planes
    Gp = -(-G // multiple) * multiple
    if Gp == G:
        return f
    import jax.numpy as jnp

    def pad(x):
        return jnp.zeros((Gp,) + x.shape[1:], x.dtype).at[:G].set(x)

    return PlaneFactors(*[pad(x) for x in f])


def shard_factors(f: PlaneFactors, mesh: Mesh) -> PlaneFactors:
    """Place the factor batch with its plane axis split over the mesh."""
    n = mesh.devices.size
    f = pad_planes(f, n)
    spec = NamedSharding(mesh, P(FACTOR_AXIS))
    return PlaneFactors(*[jax.device_put(x, spec) for x in f])


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def evaluate_shard_map(T, f: PlaneFactors, mesh: Mesh, **kw):
    """Explicit shard_map variant of ops.factors.evaluate.

    Each device evaluates its local plane shard into private (6W, 6W)
    normal equations; one psum over the factor axis forms the global
    H/J/residual — the literal collective replacing the reference's
    4-thread join + matrix add (bavoxel.hpp:1025-1059).  Numerically
    identical to the GSPMD path (which XLA partitions the same way); this
    form pins the communication pattern explicitly and is the template
    for multi-host meshes.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from ..ops import factors as Fmod

    def local(T, f):
        res, J, H = Fmod.evaluate(T, f, **kw)
        res = jax.lax.psum(res, FACTOR_AXIS)
        J = jax.lax.psum(J, FACTOR_AXIS)
        H = jax.lax.psum(H, FACTOR_AXIS)
        return res, J, H

    fn = jax.jit(shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(FACTOR_AXIS)),
        out_specs=(P(), P(), P()),
    ))
    return fn(T, f)
