"""Real-world benchmark — the reference's `benchmark_realworld` experiment.

Pipeline (src/benchmark/benchmark_realworld.cpp:144-236):
  1. load alidarPose.csv + full{i}.pcd scans (177 poses)
  2. re-anchor the trajectory to pose 0 (lines 163-168)
  3. adaptive voxelization with voxel_size=1, eigen ratios
     {1/16, 1/16, 1/9} (lines 183-188)
  4. degeneracy gate: >= 3 planes per pose on average (lines 209-215)
  5. BALM2 damped-Newton refinement, max 10 iterations (line 218)

The interactive rviz confirmation gates (lines 174-176, 203-207) become a
returned summary dict; visualization export lives in utils/export.
"""

from __future__ import annotations

import dataclasses
import pathlib
import time
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SolverConfig, VoxelConfig
from ..io import pcd, poses
from ..ops import factors as Fmod
from ..ops import lie
from ..solver import lm
from ..voxel import grid


@dataclasses.dataclass
class RealworldConfig:
    data_dir: str = "/root/reference/datas/benchmark_realworld"
    max_scans: Optional[int] = None    # None = all 177
    voxel: VoxelConfig = VoxelConfig(
        voxel_size=1.0, eigen_ratio=(1.0 / 16, 1.0 / 16, 1.0 / 9)
    )
    solver: SolverConfig = SolverConfig(max_iters=10, u_init=0.01)
    dtype: str = "float64"
    centered: bool = False     # enable for the f32 fast path
    downsample: float = 0.0    # optional voxel downsample of input scans
    # fuse coplanar leaves into single factors before the solve
    # (VOXEL_MERGE, bavoxel.hpp:484-624)
    merge_planes: bool = False
    # write refined trajectory (reference CSV format) + convergence curve
    # ("time cost" per accepted iteration, the Supplementary/data format)
    export_dir: Optional[str] = None
    # solver backend: 'auto' picks the packed TPU fast path when running
    # centered f32 on a TPU, the XLA evaluator otherwise
    backend: str = "auto"
    # association backend: 'auto' (the on-device voxelizer when running
    # centered f32 on a TPU with no host-side consumers of the per-point
    # maps — merge/stages/export; the native C++ host engine otherwise),
    # 'device', 'native', or 'numpy'.
    assoc_backend: str = "auto"
    # factor-parallel execution: shard the plane axis over the first N
    # devices (jax.sharding mesh; the psum XLA inserts replaces the
    # reference's 4-thread join, bavoxel.hpp:1025-1059).  0/1 = single
    # device.  Uses the 'xla' evaluator (the packed fast path is the
    # single-chip production kernel).
    mesh_devices: int = 0
    # coarse-to-fine multi-resolution stages (the reference README's
    # "Notes for real-world experiments" recipe for poor initial
    # trajectories: large voxel + loose criteria -> small + strict).
    # None = single-resolution (cfg.voxel); pass
    # coarse_to_fine.default_stages() or a custom VoxelConfig list to
    # re-associate per stage.  The LAST stage uses cfg.voxel so the
    # final solve matches the single-resolution configuration exactly.
    stages: Optional[Sequence[VoxelConfig]] = None


def load(cfg: RealworldConfig):
    """Load poses + scans, re-anchored to pose 0."""
    d = pathlib.Path(cfg.data_dir)
    R, p, t = poses.read_pose_csv(d / "alidarPose.csv", cfg.max_scans)
    W = len(R)
    scans = []
    for i in range(W):
        pts = pcd.read_pcd_xyz(d / f"full{i}.pcd", np.float64)
        if cfg.downsample > 0:
            pts = grid.down_sample_voxel(pts, cfg.downsample)
        scans.append(pts)
    # gauge anchor (benchmark_realworld.cpp:163-168)
    R0, p0 = R[0].copy(), p[0].copy()
    p = (p - p0) @ R0
    R = np.einsum("ba,nbc->nac", R0, R)
    return R, p, scans


def run(cfg: RealworldConfig = RealworldConfig(), *, verbose: bool = False):
    dtype = jnp.dtype(cfg.dtype)
    t0 = time.perf_counter()
    R, p, scans = load(cfg)
    W = len(scans)
    t_load = time.perf_counter() - t0

    stage_history = None
    if cfg.stages is not None:
        # coarse-to-fine prologue: every stage except the production
        # voxel re-associates at the refined poses; the final stage
        # below IS the single-resolution pipeline at cfg.voxel
        from . import coarse_to_fine as c2f

        R, p, stage_history = c2f.run(
            scans, R, p, list(cfg.stages), cfg.solver,
            dtype=cfg.dtype, centered=cfg.centered, verbose=verbose)

    assoc = cfg.assoc_backend
    needs_host_assoc = (cfg.merge_planes or cfg.export_dir is not None
                        or cfg.stages is not None
                        or not cfg.centered or dtype != jnp.float32)
    # the device voxelizer packs the scan id into the sort key:
    # ceil(log2(W)) + 3*layer_limit <= 16 (W <= 1024 at layer_limit 2)
    device_key_ok = (max(W - 1, 1).bit_length()
                     + 3 * cfg.voxel.layer_limit) <= 16
    if assoc == "auto":
        assoc = ("device" if (jax.default_backend() == "tpu"
                              and device_key_ok
                              and not needs_host_assoc)
                 else "host")
    elif assoc == "device" and needs_host_assoc:
        raise ValueError(
            "assoc_backend='device' supports the plain centered-f32 solve "
            "path only (merge/stages/export consume host per-point maps)")

    merged_planes = None
    if assoc == "device":
        # association entirely on-chip: scans in, recentered f32
        # PlaneFactors out (voxel/device.py) — no host octree, no
        # host<->device factor traffic
        from ..voxel import device as vdev

        t0 = time.perf_counter()
        dres = vdev.voxelize_device(
            [s.astype(np.float32) for s in scans],
            R.astype(np.float32), p.astype(np.float32), cfg.voxel,
            want_point_leaf=False)
        f = dres.factors
        num_planes = int(dres.num_planes)     # one sync fetch
        t_assoc = time.perf_counter() - t0
        vres = None
    else:
        t0 = time.perf_counter()
        vres = grid.voxelize(
            scans, R, p, cfg.voxel, dtype=np.float64,
            backend=assoc if assoc in ("native", "numpy") else "auto")
        t_assoc = time.perf_counter() - t0
        f = vres.factors
        num_planes = vres.num_planes
        if cfg.merge_planes:
            from ..voxel import merge as merge_mod

            f, merged_planes, _ = merge_mod.merge_coplanar(f, num_planes)
            f = Fmod.PlaneFactors(*[jnp.asarray(x) for x in f])
            num_planes = merged_planes
        if cfg.centered:
            f = Fmod.recenter_bodies(f)
        if dtype != jnp.float64:
            f = f.astype(dtype)
        # device-resident before the solve (numpy leaves would transfer
        # inside the timed region — and again on every later dispatch)
        f = jax.tree_util.tree_map(jnp.asarray, f)

    summary = {
        "num_scans": W,
        "num_points": int(sum(len(s) for s in scans)),
        "num_planes": num_planes,
        "merged_planes": merged_planes,
        "t_load_s": t_load,
        "t_assoc_s": t_assoc,
        "stage_history": stage_history,
    }
    # degeneracy gate (benchmark_realworld.cpp:209-215)
    if num_planes < 3 * W:
        summary["status"] = "too_few_planes"
        return summary

    backend = cfg.backend
    mesh = None
    if cfg.mesh_devices and cfg.mesh_devices > 1:
        from ..parallel import sharded

        if len(jax.devices()) < cfg.mesh_devices:
            raise ValueError(
                f"mesh_devices={cfg.mesh_devices} but only "
                f"{len(jax.devices())} devices visible (set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"for a virtual CPU mesh)")
        mesh = sharded.make_mesh(cfg.mesh_devices)
        f = sharded.shard_factors(f, mesh)
        if backend in ("auto", "packed", "pallas"):
            backend = "xla"      # mesh path runs the GSPMD evaluator
        summary_mesh = {
            "mesh_devices": cfg.mesh_devices,
            "planes_per_shard": int(f.C.shape[0]) // cfg.mesh_devices,
        }
    if backend == "auto":
        import jax as _jax
        backend = ("packed" if (_jax.default_backend() == "tpu"
                                and cfg.centered
                                and jnp.dtype(dtype) == jnp.float32)
                   else "xla")
    t0 = time.perf_counter()
    if mesh is not None:
        from ..parallel import sharded

        with mesh:
            res = lm.damping_iter(
                sharded.replicate(jnp.asarray(R, dtype), mesh),
                sharded.replicate(jnp.asarray(p, dtype), mesh),
                f, cfg.solver, centered=cfg.centered, backend=backend,
            )
    else:
        res = lm.damping_iter(
            jnp.asarray(R, dtype), jnp.asarray(p, dtype), f, cfg.solver,
            centered=cfg.centered, backend=backend,
        )
    res.R.block_until_ready()
    t_solve = time.perf_counter() - t0

    # HONEST convergence timestamps must be captured BEFORE any host
    # fetch: one fetch degrades every later dispatch ~16x through the
    # axon tunnel (artifacts/transfer_poisoning.md), which would inflate
    # exactly the per-iteration times being recorded.
    if cfg.export_dir is not None:
        res_t, t_iter = lm.damping_iter_timed(
            jnp.asarray(R, dtype), jnp.asarray(p, dtype), f, cfg.solver,
            centered=cfg.centered, backend=backend,
        )

    if mesh is not None:
        summary.update(summary_mesh)
    summary.update(
        status="degenerate" if bool(res.degenerate) else "ok",
        t_solve_s=t_solve,
        iters=int(res.iters),
        residual_final=float(res.residual),
        residual_initial=float(res.trace_res1[0]),
        result=res,
    )

    if cfg.export_dir is not None:
        import pathlib as _pl

        from ..utils import checkpoint

        out = _pl.Path(cfg.export_dir)
        out.mkdir(parents=True, exist_ok=True)
        checkpoint.write_pose_csv(
            out / "refined_poses.csv", np.asarray(res.R), np.asarray(res.p)
        )
        # convergence curve in the Supplementary/data format:
        # "cumulative_time(s) cost" per accepted iteration
        # (Supplementary/data/readme.txt)
        n = int(res_t.iters)
        accepted = np.array(res_t.trace_accept)[:n] > 0.5
        costs = np.array(res_t.trace_res2)[:n][accepted]
        tstamps = np.asarray(t_iter)[:n][accepted]
        with open(out / "convergence.txt", "w") as fh:
            fh.write(f"0.0 {float(res_t.trace_res1[0]):.6f}\n")
            for tk, cst in zip(tstamps, costs):
                fh.write(f"{tk:.4f} {cst:.6f}\n")
        # colored per-leaf plane cloud (headless tras_display,
        # bavoxel.hpp:825-871)
        from ..io import planecloud

        planecloud.export_plane_cloud(
            scans, np.asarray(res.R), np.asarray(res.p),
            vres.point_scan, vres.point_leaf, out / "plane_cloud")
        summary["export_dir"] = str(out)
    if verbose:
        print(lm.format_trace(res))
        for k, v in summary.items():
            if k != "result":
                print(f"  {k}: {v}")
    return summary
