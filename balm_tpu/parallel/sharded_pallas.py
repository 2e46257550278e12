"""Multi-chip fused evaluation: the Pallas kernels under shard_map.

The packed factor layout (ops/packed.py) has the plane axis on the
trailing (lane) dimension, so sharding G across a mesh gives every
device a self-contained PackedFactors shard — the fused kernels run
per-device on their local planes and one psum over the factor axis
forms the global (residual, J, H), exactly like the XLA path in
parallel/sharded.py (which replaces the reference's 4-thread join,
bavoxel.hpp:1025-1059) but with the kernel-fused evaluator inside.

Poses are replicated (6W is tiny); H/J arrive replicated after psum, so
the dense solve proceeds unchanged on every device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import packed as packed_mod
from ..ops import pallas_evaluate as pe

FACTOR_AXIS = "factor"


def shard_packed(pk: packed_mod.PackedFactors, mesh: Mesh):
    """Place a PackedFactors with its plane (lane) axis split over the
    mesh (zero-padded so every device holds whole kernel blocks)."""
    n = mesh.devices.size
    pk = packed_mod.pad_planes(pk, n * packed_mod.GPAD)
    sh_last = lambda ndim: NamedSharding(
        mesh, P(*([None] * (ndim - 1) + [FACTOR_AXIS])))
    return packed_mod.PackedFactors(
        mom=jax.device_put(pk.mom, sh_last(3)),
        cen=jax.device_put(pk.cen, sh_last(2)),
        coe=jax.device_put(pk.coe, sh_last(2)),
        cfix=jax.device_put(pk.cfix, sh_last(2)),
    )


def evaluate_packed_sharded(R, p, pk: packed_mod.PackedFactors, mesh: Mesh,
                            *, interpret: bool = False, impl: str = "xla"):
    """(res, J (6W,), H (6W,6W)) with per-device fused kernels + psum.

    impl: per-device evaluator form — 'xla', 'pallas', 'pallas2', or
    'pallas3' (see ops/pallas_evaluate.evaluate_packed); the plane-axis
    sharding and psum reduction are identical for all of them."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec_last3 = P(None, None, FACTOR_AXIS)
    spec_last2 = P(None, FACTOR_AXIS)

    def local(R, p, mom, cen, coe, cfix):
        lpk = packed_mod.PackedFactors(mom=mom, cen=cen, coe=coe, cfix=cfix)
        res, J, H = pe.evaluate_packed(R, p, lpk, interpret=interpret,
                                       impl=impl)
        return (jax.lax.psum(res, FACTOR_AXIS),
                jax.lax.psum(J, FACTOR_AXIS),
                jax.lax.psum(H, FACTOR_AXIS))

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), spec_last3, spec_last2, spec_last2, spec_last2),
        out_specs=(P(), P(), P()),
        check_vma=False,  # pallas_call out_shapes carry no vma annotation
    ))
    return fn(R, p, pk.mom, pk.cen, pk.coe, pk.cfix)


def residual_only_packed_sharded(R, p, pk, mesh, *, interpret: bool = False):
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    def local(R, p, mom, cen, coe, cfix):
        lpk = packed_mod.PackedFactors(mom=mom, cen=cen, coe=coe, cfix=cfix)
        return jax.lax.psum(
            pe.residual_only_packed(R, p, lpk, interpret=interpret),
            FACTOR_AXIS)

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(None, None, FACTOR_AXIS),
                  P(None, FACTOR_AXIS), P(None, FACTOR_AXIS),
                  P(None, FACTOR_AXIS)),
        out_specs=P(),
        check_vma=False,
    ))
    return fn(R, p, pk.mom, pk.cen, pk.coe, pk.cfix)
