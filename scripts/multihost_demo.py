"""Multi-process (multi-"host") validation of the distributed backend.

The reference's parallelism is 4 std::threads in one process
(bavoxel.hpp:989-1059); this framework's is a device mesh that is meant
to span HOSTS (parallel/mesh.py).  Real pod slices aren't available in
this environment, but jax.distributed works across OS processes on the
CPU backend (gloo collectives), which exercises every multi-host code
path short of the ICI/DCN fabric itself: per-process device addressing,
global-mesh construction, cross-process `device_put` of globally-sharded
factor batches, SPMD collectives spanning processes, and replicated
fetch of the results.

This script launches N worker processes (each holding D virtual CPU
devices), runs the SAME realistically-sized LM solve (a) single-process
single-device and (b) sharded over the N*D-device global mesh with the
factor axis split across processes, and asserts bitwise-level (f64)
agreement.  It also runs the explicit shard_map evaluate
(evaluate_shard_map) across processes and compares H against the
single-process one.

Run: python scripts/multihost_demo.py [nproc] [devices_per_proc]
Writes artifacts/multihost_cpu.json.  Used by tests/test_multihost.py.
"""

from __future__ import annotations

import json
import os
import pathlib
import socket
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _problem(win_size, surf_size, pts_size):
    """Deterministic factor problem, identical in every process."""
    import jax.numpy as jnp

    from balm_tpu.pipelines import virtual

    cfg = virtual.VirtualConfig(win_size=win_size, surf_size=surf_size,
                                pts_size=pts_size, seed=3, dtype="float64")
    R_gt, p_gt, body = virtual.generate(cfg)
    R0, p0 = virtual.perturb(R_gt, p_gt, cfg)
    f = virtual.build_factors(body, jnp.dtype("float64"))
    return jnp.asarray(R0), jnp.asarray(p0), f


def _solve(R, p, f, mesh=None):
    import contextlib

    from balm_tpu.config import SolverConfig
    from balm_tpu.parallel import sharded
    from balm_tpu.solver import lm

    cfg = SolverConfig(max_iters=8, u_init=0.01, min_planes_per_pose=1)
    if mesh is not None:
        f = sharded.shard_factors(f, mesh)
        R = sharded.replicate(R, mesh)
        p = sharded.replicate(p, mesh)
    with (mesh if mesh is not None else contextlib.nullcontext()):
        out = lm.damping_iter(R, p, f, cfg)
        out.R.block_until_ready()
    return out


def worker(proc_id, nproc, dev_per_proc, coord, win, surf, pts, out_path):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={dev_per_proc}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from balm_tpu.ops import factors as Fmod, lie
    from balm_tpu.parallel import mesh as mesh_mod, sharded

    mesh_mod.init_distributed(coord, num_processes=nproc, process_id=proc_id)
    assert jax.process_count() == nproc, jax.process_count()
    gmesh = mesh_mod.make_global_mesh()
    assert gmesh.devices.size == nproc * dev_per_proc

    R, p, f = _problem(win, surf, pts)

    # host-local loading contract: each process's slice, re-assembled,
    # must tile the plane axis
    lo, hi = mesh_mod.local_factor_slice(f.num_planes)
    assert 0 <= lo <= hi <= f.num_planes

    out = _solve(R, p, f, mesh=gmesh)

    # explicit-collective evaluate across processes
    T = lie.pose_matrix(R, p)
    fs = sharded.shard_factors(f, gmesh)
    Ts = sharded.replicate(T, gmesh)
    res_sm, J_sm, H_sm = sharded.evaluate_shard_map(Ts, fs, gmesh)

    if proc_id == 0:
        rec = {
            "processes": int(jax.process_count()),
            "global_devices": int(len(jax.devices())),
            "local_devices": int(len(jax.local_devices())),
            "iters": int(out.iters),
            "residual": float(out.residual),
            "res_shard_map": float(res_sm),
        }
        np.savez(out_path, R=np.asarray(out.R), p=np.asarray(out.p),
                 J=np.asarray(J_sm), H=np.asarray(H_sm),
                 meta=json.dumps(rec))
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")


def main(nproc=2, dev_per_proc=4, win=20, surf=40, pts=30,
         artifact="artifacts/multihost_cpu.json"):
    # free port for the coordinator
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    out_npz = str(REPO / "artifacts" / "multihost_worker0.npz")
    procs = []
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    for i in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i), str(nproc),
             str(dev_per_proc), coord, str(win), str(surf), str(pts),
             out_npz],
            env=env, cwd=str(REPO)))
    try:
        # one shared deadline: a worker that dies mid-init leaves its
        # peers blocked in a collective forever — kill the whole fleet
        # on timeout or partial failure instead of orphaning it
        deadline = time.monotonic() + 900
        codes = [q.wait(timeout=max(1.0, deadline - time.monotonic()))
                 for q in procs]
    finally:
        for q in procs:
            if q.poll() is None:
                q.kill()
    if any(codes):
        raise SystemExit(f"worker failure: exit codes {codes}")

    # single-process single-device reference (this process)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from balm_tpu.ops import factors as Fmod, lie

    R, p, f = _problem(win, surf, pts)
    ref = _solve(R, p, f, mesh=None)
    res0, J0, H0 = Fmod.evaluate(lie.pose_matrix(R, p), f)

    dist = np.load(out_npz, allow_pickle=True)
    meta = json.loads(str(dist["meta"]))
    dR = float(np.max(np.abs(dist["R"] - np.asarray(ref.R))))
    dp = float(np.max(np.abs(dist["p"] - np.asarray(ref.p))))
    dres = abs(meta["residual"] - float(ref.residual))
    dH = float(np.max(np.abs(dist["H"] - np.asarray(H0))))
    dJ = float(np.max(np.abs(dist["J"] - np.asarray(J0))))
    dres_sm = abs(meta["res_shard_map"] - float(res0))

    rec = {
        **meta,
        "devices_per_process": dev_per_proc,
        "iters_single": int(ref.iters),
        "residual_single": float(ref.residual),
        "max_abs_dR": dR, "max_abs_dp": dp, "abs_dresidual": dres,
        "shard_map_max_abs_dH": dH, "shard_map_max_abs_dJ": dJ,
        "shard_map_abs_dres": dres_sm,
        "ok": bool(dR < 1e-9 and dp < 1e-9 and dres < 1e-9
                   and dH < 1e-7 and dJ < 1e-9 and dres_sm < 1e-9
                   and meta["iters"] == int(ref.iters)),
    }
    path = REPO / artifact
    path.parent.mkdir(exist_ok=True)
    with open(path, "w") as fh:
        json.dump(rec, fh, indent=2)
    os.remove(out_npz)
    print(json.dumps(rec, indent=2))
    if not rec["ok"]:
        raise SystemExit("multihost mismatch")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        (_, _, pid, npc, dpp, coord, win, surf, pts, out_npz) = sys.argv
        worker(int(pid), int(npc), int(dpp), coord, int(win), int(surf),
               int(pts), out_npz)
    else:
        kw = {}
        if len(sys.argv) > 1:
            kw["nproc"] = int(sys.argv[1])
        if len(sys.argv) > 2:
            kw["dev_per_proc"] = int(sys.argv[2])
        main(**kw)
