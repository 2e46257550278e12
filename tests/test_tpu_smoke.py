"""TPU-gated smoke test (round-4 verdict item 9).

The suite conftest pins every test to CPU (the axon plugin overrides
JAX_PLATFORMS, so a TPU test cannot run in-process).  This test probes
the tunneled TPU in a SUBPROCESS and, when a chip answers, runs a small
end-to-end check on real hardware:

  * device voxelizer (f32, on-chip) vs the host numpy backend (f64):
    identical plane count on a synthetic scene
  * packed evaluator vs the XLA evaluator on-device: residual/J/H agree
  * a packed damping_iter solve: positive decreasing residual, synced by
    a device->host fetch (the only sync that works through the tunnel)

Skips cleanly when no TPU is attached (CPU CI) or the tunnel is down.
Set BALM_TPU_SMOKE=0 to skip unconditionally.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

_CHILD = r"""
import json, sys
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

out = {"backend": jax.default_backend()}
if out["backend"] != "tpu":
    print(json.dumps(out)); sys.exit(0)

sys.path.insert(0, sys.argv[2])
from balm_tpu.config import SolverConfig, VoxelConfig
from balm_tpu.ops import factors as Fmod, lie, packed as pkmod
from balm_tpu.ops import pallas_evaluate as pe
from balm_tpu.solver import lm
from balm_tpu.voxel import device as vdev, grid
from balm_tpu.utils import sync

rng = np.random.default_rng(5)
W, n_planes, pts_per = 5, 10, 300
normals = rng.normal(size=(n_planes, 3)); normals /= np.linalg.norm(normals, axis=1, keepdims=True)
centers = rng.uniform(-4, 4, size=(n_planes, 3))
R = np.stack([np.eye(3)] * W); p = rng.normal(0, 0.1, size=(W, 3))
scans = []
for w in range(W):
    pts = []
    for g in range(n_planes):
        b1 = np.cross(normals[g], [1.0, 0.3, 0.2]); b1 /= np.linalg.norm(b1)
        b2 = np.cross(normals[g], b1)
        uv = rng.uniform(-0.45, 0.45, size=(pts_per, 2))
        world = centers[g] + uv[:, :1] * b1 + uv[:, 1:] * b2 \
            + rng.normal(0, 0.003, size=(pts_per, 1)) * normals[g]
        pts.append((world - p[w]) @ R[w])
    scans.append(np.concatenate(pts))
cfg = VoxelConfig(voxel_size=2.0, min_observers=2)

host = grid.voxelize(scans, R, p, cfg, backend="numpy", dtype=np.float64)
dev = vdev.voxelize_device([s.astype(np.float32) for s in scans],
                           R.astype(np.float32), p.astype(np.float32),
                           cfg, Gcap=256)
out["host_planes"] = int(host.num_planes)
out["device_planes"] = int(dev.num_planes)
out["overflow"] = bool(dev.overflow)

f = Fmod.recenter_bodies(host.factors).astype(jnp.float32)
f = jax.tree_util.tree_map(jnp.asarray, f)
Rj = jnp.asarray(R, jnp.float32); pj = jnp.asarray(p, jnp.float32)
pk = pkmod.pack_factors(f)
with jax.default_matmul_precision("float32"):
    r1, J1, H1 = jax.jit(lambda R, p: pe.evaluate_packed(R, p, pk))(Rj, pj)
    r2, J2, H2 = jax.jit(lambda R, p: Fmod.evaluate(
        lie.pose_matrix(R, p), f, centered=True))(Rj, pj)
out["res_relerr"] = abs(float(r1) - float(r2)) / max(abs(float(r2)), 1e-30)
out["J_relerr"] = float(jnp.max(jnp.abs(J1 - J2)) / jnp.max(jnp.abs(J2)))
out["H_relerr"] = float(jnp.max(jnp.abs(H1 - H2)) / jnp.max(jnp.abs(H2)))

res = lm.damping_iter(Rj, pj, f, SolverConfig(max_iters=5, u_init=0.01,
                                              min_planes_per_pose=1),
                      centered=True, backend="packed")
sync.fetch_scalar(res.residual)                    # the working sync
out["residual_initial"] = float(res.trace_res1[0])
out["residual_final"] = float(res.residual)
out["iters"] = int(res.iters)
print(json.dumps(out))
"""


def _clean_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        t for t in flags.split()
        if "xla_force_host_platform_device_count" not in t)
    return env


def test_tpu_smoke_device_voxelizer_and_packed_solver():
    if os.environ.get("BALM_TPU_SMOKE", "1") == "0":
        pytest.skip("BALM_TPU_SMOKE=0")
    root = str(pathlib.Path(__file__).resolve().parents[1])
    cache = os.path.join(root, ".jax_cache")
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.default_backend())"],
        capture_output=True, timeout=240, env=_clean_env())
    if probe.returncode != 0 or b"tpu" not in probe.stdout:
        pytest.skip("no TPU attached (CPU CI) or tunnel down")

    r = subprocess.run(
        [sys.executable, "-c", _CHILD, cache, root],
        capture_output=True, timeout=540, env=_clean_env(), cwd=root)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    out = json.loads(r.stdout.decode().strip().splitlines()[-1])
    assert out["backend"] == "tpu"
    assert not out["overflow"]
    assert out["device_planes"] == out["host_planes"], out
    assert out["res_relerr"] < 1e-4, out
    assert out["J_relerr"] < 1e-3, out
    assert out["H_relerr"] < 1e-3, out
    assert 0 < out["residual_final"] <= out["residual_initial"], out
    assert out["iters"] >= 1
