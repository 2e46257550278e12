"""Scaling-efficiency harness: LM iterations/sec vs device count.

BASELINE.md target: >= 80% scaling efficiency at 4 hosts.  The harness
runs the same factor problem on 1, 2, ..., N-device meshes (factor axis)
and reports iter/s + efficiency.  On the CPU backend the virtual devices
share cores, so absolute numbers are meaningless there — the harness is
exercised for correctness in tests and produces real curves on pod
slices.
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..ops.factors import PlaneFactors
from ..parallel import sharded
from ..solver import lm


def measure(R, p, f: PlaneFactors, device_counts: Optional[List[int]] = None,
            solver_cfg: SolverConfig = SolverConfig(max_iters=10, u_init=0.01,
                                                    rel_tol=0.0,
                                                    min_planes_per_pose=1),
            *, centered: bool = False, repeats: int = 3):
    """Returns list of dicts {devices, iters_per_sec, efficiency}."""
    if device_counts is None:
        n = len(jax.devices())
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n]

    results = []
    base_ips = None
    for nd in device_counts:
        mesh = sharded.make_mesh(nd)
        fs = sharded.shard_factors(f, mesh)
        Rr = sharded.replicate(R, mesh)
        pr = sharded.replicate(p, mesh)
        with mesh:
            res = lm.damping_iter(Rr, pr, fs, solver_cfg, centered=centered)
            res.R.block_until_ready()
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                res = lm.damping_iter(Rr, pr, fs, solver_cfg,
                                      centered=centered)
                res.R.block_until_ready()
                best = min(best, time.perf_counter() - t0)
        ips = max(int(res.iters), 1) / best
        if base_ips is None:
            base_ips = ips
        # efficiency relative to LINEAR scaling from the first measured
        # count: ips(base) * (nd / base_nd).  (The round-1 form divided
        # by nd as if the baseline were 1 device, reporting wrong numbers
        # whenever device_counts didn't start at 1.)
        results.append({
            "devices": nd,
            "iters_per_sec": ips,
            "efficiency": ips / (base_ips * nd / device_counts[0]),
            "speedup_vs_base": ips / base_ips,
            "residual": float(res.residual),
        })
    return results
