"""Mesh construction + multi-host initialization.

Single-host: a 1-D mesh over all local devices (factor axis).
Multi-host: call `init_distributed()` once per process (jax.distributed),
then `make_global_mesh()` spans every chip in the pod slice; the factor
axis is laid out host-major so each host's factor shard lives on its own
chips and the H/J reduction rides ICI within a slice and DCN across
slices (SURVEY.md section 2.7's replacement for thread::join)."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .sharded import FACTOR_AXIS


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize jax.distributed (no-op if single-process or already up).

    Must run before anything touches the XLA backend — so the
    already-initialized guard uses jax.distributed.is_initialized(), NOT
    jax.process_count() (which itself initializes the backend and would
    lock the process into single-host mode; found by
    scripts/multihost_demo.py)."""
    if coordinator is None:
        return  # single-host
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh() -> Mesh:
    """1-D factor mesh over ALL devices in the job (host-major order)."""
    return Mesh(np.asarray(jax.devices()), (FACTOR_AXIS,))


def local_factor_slice(num_planes_global: int):
    """[start, stop) of this host's plane shard for host-local loading."""
    pc = jax.process_count()
    pi = jax.process_index()
    per = -(-num_planes_global // pc)
    return pi * per, min(num_planes_global, (pi + 1) * per)
