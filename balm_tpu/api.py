"""One-call user API: the reference's whole benchmark node as a function.

    import balm_tpu
    R1, p1, info = balm_tpu.optimize_poses(scans, R0, p0)

covers load->voxelize->(recenter)->solve->gauge (what
benchmark_realworld.cpp:144-236 does around BALM2::damping_iter), picking
the right execution path for the hardware and problem size:

  * TPU + moderate W  -> f32 centered factors + the packed fast path
  * CPU / f64         -> the XLA evaluator (oracle-exact path)
  * W > large_threshold -> span-compressed matrix-free solver (the dense
    (6W)^2 system would not be the right tool)
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .config import SolverConfig, VoxelConfig
from .ops import factors as Fmod
from .solver import lm
from .voxel import grid


def optimize_poses(
    scans,
    R,
    p,
    *,
    voxel: VoxelConfig = VoxelConfig(),
    solver: SolverConfig = SolverConfig(),
    backend: str = "auto",   # 'auto' | 'packed' (alias 'pallas') | 'xla' | 'large'
    dtype: Optional[str] = None,    # None = f32 on TPU else f64 (needs x64)
    large_threshold: int = 600,
    loop_closure: bool = False,
    loop_config=None,        # pipelines.loopclose.LoopConfig when set
    verbose: bool = False,
):
    """Bundle-adjust a pose window against self-consistent plane factors.

    scans: list of (Ni, 3) body-frame clouds; R (W,3,3), p (W,3) initial
    poses.  Returns (R, p, info).

    loop_closure=True prepends place recognition + pose-graph warping
    (pipelines/loopclose.py) before BA — required once cumulative drift
    exceeds the voxel size, where plane association alone can never form
    the revisit constraints (artifacts/loopclose_city.json).  When no
    loop survives verification the input poses pass through unchanged.
    """
    W = len(scans)
    if loop_closure and W > 0:
        from .pipelines import loopclose as LC

        lcfg = loop_config if loop_config is not None else LC.LoopConfig()
        # Pin detect+PGO to CPU f64 regardless of the ambient regime:
        # (a) with x64 off (the TPU default) pose_graph_optimize's f64
        # asarray would silently truncate to f32, which cannot hold the
        # stiff-chain (w~2.5e5) normal equations; (b) the host-stepped
        # damped-Newton loop fetches scalars between dispatches, which
        # through the tunneled TPU poisons every later BA dispatch ~16x
        # (artifacts/transfer_poisoning.md).  CPU f64 sidesteps both; the
        # stage is seconds of host work either way.
        with jax.enable_x64(), jax.default_device(jax.devices("cpu")[0]):
            R, p, lc_edges, lc_info = LC.close_loops(
                scans, np.asarray(R, np.float64), np.asarray(p, np.float64),
                lcfg, verbose=verbose)
        R, p = np.asarray(R, np.float64), np.asarray(p, np.float64)
        loop_info = {
            "n_edges": 0 if lc_edges is None else int(
                np.asarray(lc_edges.i).shape[0]),
            "n_verified": lc_info.get("n_verified", 0),
        }
        if "pgo" in lc_info:
            loop_info["pgo_iters"] = lc_info["pgo"].get("iters")
    else:
        loop_info = None
    on_tpu = jax.default_backend() == "tpu"
    if dtype is None:
        dtype = "float32" if on_tpu else (
            "float64" if jax.config.jax_enable_x64 else "float32")
    if backend == "pallas":
        backend = "packed"
    if backend == "auto":
        if W > large_threshold:
            backend = "large"
        elif on_tpu and dtype == "float32":
            backend = "packed"
        else:
            backend = "xla"

    if W == 0:
        raise ValueError("optimize_poses needs at least one scan")
    R = np.asarray(R, np.float64)
    p = np.asarray(p, np.float64)
    vres = grid.voxelize(list(scans), R, p, voxel, dtype=np.float64)
    info = {"num_planes": vres.num_planes, "backend": backend,
            "dtype": dtype}
    if loop_info is not None:
        info["loop_closure"] = loop_info
    if vres.num_planes == 0:
        info["status"] = "no_planes"
        return R, p, info

    use_f32 = dtype == "float32"
    f = vres.factors
    if use_f32:
        f = Fmod.recenter_bodies(f)

    if backend == "large":
        from .ops import factors_windowed as FW
        from .solver import large as large_mod

        if use_f32:
            f = f.astype(jnp.float32)
        wf = FW.from_dense(Fmod.PlaneFactors(
            *[jnp.asarray(x) for x in f]))
        res = large_mod.damping_iter_large(
            jnp.asarray(R, dtype), jnp.asarray(p, dtype), wf, solver)
        info.update(status="ok", iters=int(res.iters),
                    residual=float(res.residual),
                    span=int(wf.span))
        return np.asarray(res.R), np.asarray(res.p), info

    if use_f32:
        f = f.astype(jnp.float32)
    # device-resident factors: numpy leaves re-transfer the whole tree
    # on every dispatch (tunneled TPU: ~0.6 s for realworld-scale)
    f = Fmod.PlaneFactors(*[jnp.asarray(x) for x in f])
    res = lm.damping_iter(
        jnp.asarray(R, dtype), jnp.asarray(p, dtype), f, solver,
        centered=use_f32, backend=backend if backend == "packed" else "xla")
    res1_0 = float(res.trace_res1[0])
    info.update(
        status="degenerate" if bool(res.degenerate) else "ok",
        iters=int(res.iters), residual=float(res.residual),
        # trace_res1[0] is unwritten (NaN) when the loop never iterated
        residual_initial=res1_0 if np.isfinite(res1_0)
        else float(res.residual))
    if verbose:
        print(lm.format_trace(res))
    return np.asarray(res.R), np.asarray(res.p), info
