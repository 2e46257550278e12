"""Fused Pallas evaluation under shard_map (plane axis over the mesh)
must equal the single-device fused path — the multi-chip story for the
kernel backend (psum replaces the reference's thread join, like
parallel/sharded.py does for the XLA path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from balm_tpu.ops import factors
from balm_tpu.ops import packed as pk
from balm_tpu.ops import pallas_evaluate as pe
from balm_tpu.parallel import sharded_pallas as sp

from test_factors import make_problem


def test_sharded_pallas_equals_single_device(monkeypatch):
    # shrink kernel blocks: interpret mode executes programs in Python,
    # and the default 512-lane padding times 8 devices is minutes of work
    monkeypatch.setattr(pe, "BG_CSUM", 128)
    monkeypatch.setattr(pe, "BG_HESS", 128)
    monkeypatch.setattr(pk, "GPAD", 128)

    R, p, f, centers = make_problem(G=10, W=5, seed=51, sparse_obs=True)
    f = factors.recenter_bodies(f._replace(centers=centers)).astype(
        jnp.float32)
    R32, p32 = R.astype(jnp.float32), p.astype(jnp.float32)
    packed = pk.pack_factors(f)

    res0, J0, H0 = pe.evaluate_packed(R32, p32, packed, interpret=True)

    mesh = Mesh(np.asarray(jax.devices()), ("factor",))
    pks = sp.shard_packed(packed, mesh)
    res1, J1, H1 = sp.evaluate_packed_sharded(
        R32, p32, pks, mesh, interpret=True)
    assert abs(float(res0) - float(res1)) < 1e-4 * abs(float(res0))
    assert float(jnp.max(jnp.abs(J0 - J1))) < 1e-4 * float(
        jnp.max(jnp.abs(J0)) + 1e-12)
    assert float(jnp.max(jnp.abs(H0 - H1))) < 1e-4 * float(
        jnp.max(jnp.abs(H0)) + 1e-12)

    r1 = sp.residual_only_packed_sharded(
        R32, p32, pks, mesh, interpret=True)
    assert abs(float(r1) - float(res0)) < 1e-4 * abs(float(res0))


def test_sharded_pallas3_equals_single_device(monkeypatch):
    """The VMEM-bounded v3 kernel under shard_map: per-device pose-pair
    grids over local plane shards + psum must equal single-device."""
    monkeypatch.setattr(pe, "BG_CSUM", 128)
    monkeypatch.setattr(pe, "BG_HESS", 128)
    monkeypatch.setattr(pe, "BG_HESS3", 128)
    monkeypatch.setattr(pk, "GPAD", 128)

    R, p, f, centers = make_problem(G=9, W=6, seed=52, sparse_obs=True)
    f = factors.recenter_bodies(f._replace(centers=centers)).astype(
        jnp.float32)
    R32, p32 = R.astype(jnp.float32), p.astype(jnp.float32)
    packed = pk.pack_factors(f)

    res0, J0, H0 = pe.evaluate_packed(R32, p32, packed, interpret=True,
                                      impl="pallas3")

    mesh = Mesh(np.asarray(jax.devices()), ("factor",))
    pks = sp.shard_packed(packed, mesh)
    res1, J1, H1 = sp.evaluate_packed_sharded(
        R32, p32, pks, mesh, interpret=True, impl="pallas3")
    assert abs(float(res0) - float(res1)) < 1e-4 * abs(float(res0))
    assert float(jnp.max(jnp.abs(J0 - J1))) < 1e-4 * float(
        jnp.max(jnp.abs(J0)) + 1e-12)
    assert float(jnp.max(jnp.abs(H0 - H1))) < 1e-4 * float(
        jnp.max(jnp.abs(H0)) + 1e-12)
