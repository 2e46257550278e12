"""Stage-by-stage cost of the device voxelizer at realworld scale.

The full `_voxelize_core` measures 11.95 s at N=16M on the v5e while the
primitive microbenchmarks (scripts/microbench_assoc_ops.py) predict
~3-4 s — this isolates which stage eats the difference.  Each stage is a
standalone jit over synthetic data with realworld-like shapes, slope-timed
(utils/sync.py; block_until_ready does not block through the tunnel).

NOTE: all large arrays must be jit ARGUMENTS — a closed-over device array
is baked into the program as a constant and shipped with the remote
compile request (HTTP 413 past ~200 MB).

Run: python scripts/profile_assoc_stages.py [N_millions]
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

_CACHE = str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.ops import eigh3  # noqa: E402
from balm_tpu.utils import sync  # noqa: E402
from balm_tpu.voxel import device as vdev  # noqa: E402


def slope(fn, args, k=4, reps=2):
    """Slope-time fn(carry, *args) where carry is a f32 scalar folded into
    the computation (data dependency between chained runs)."""
    t0 = time.perf_counter()
    sync.fetch_scalar(fn(jnp.float32(0.0), *args))  # compile
    t_compile = time.perf_counter() - t0

    def chain(k):
        t0 = time.perf_counter()
        c = jnp.float32(0.0)
        out = None
        for _ in range(k):
            out = fn(c, *args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            c = (leaf.ravel()[0] * 0).astype(jnp.float32)
        sync.fetch_scalar(out)
        return time.perf_counter() - t0

    t1 = min(chain(1) for _ in range(reps))
    tk = min(chain(k) for _ in range(reps))
    return max((tk - t1) / (k - 1), 0.0), t_compile


def main(nm=16):
    N = nm * 1_000_000
    W = 177
    Nmax = N // W
    N = W * Nmax
    CAP = 1 << 21
    GW = (1 << 13) * W
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} N={N}", flush=True)
    results = {}

    def rec(name, fn, args):
        per, tc = slope(fn, args)
        results[name] = per
        print(f"{name}: {per:.3f}s (compile {tc:.1f}s)", flush=True)

    body = jax.device_put(
        rng.standard_normal((W, Nmax, 3)).astype(np.float32) * 30)
    Rm = jax.device_put(np.stack([np.eye(3, dtype=np.float32)] * W))
    pm = jax.device_put(rng.standard_normal((W, 3)).astype(np.float32))

    # --- stage 1: transform + quantize + pack + sort ---
    @jax.jit
    def s1(c, b, Rm_, pm_):
        world = jnp.einsum("wij,wnj->wni", Rm_, b + c) + pm_[:, None, :]
        world = world.reshape(N, 3)
        qf = jnp.floor(world / 0.25).astype(jnp.int32)
        qmin = jnp.min(qf, axis=0)
        qrel = qf - (qmin & ~jnp.int32(3))
        hi, lo = vdev._pack_keys(qrel, 2)
        hi, lo, perm = jax.lax.sort(
            (hi, lo, jnp.arange(N, dtype=jnp.int32)), num_keys=2)
        return hi, lo, perm

    rec("transform_quant_sort", s1, (body, Rm, pm))
    hi, lo, perm = s1(jnp.float32(0.0), body, Rm, pm)

    # --- stage 2: the reorder gathers (qrel, world, body, valid) ---
    world = jax.device_put(rng.standard_normal((N, 3)).astype(np.float32))
    qrel = jax.device_put(
        rng.integers(0, 1 << 17, (N, 3)).astype(np.int32))

    @jax.jit
    def s2(c, pm_, q, w):
        pm2 = pm_ + c.astype(jnp.int32)
        return q[pm2], w[pm2], (w * 2.0)[pm2], pm2 < N // 2

    rec("reorder_gathers", s2, (perm, qrel, world))

    # --- stage 3: ONE classification layer (10ch segsum + cov + eig) ---
    seg_pts = jax.device_put(
        np.sort(rng.integers(0, CAP, N)).astype(np.int32))

    @jax.jit
    def s3(c, w, seg):
        w = w + c
        x, y, z = w[:, 0], w[:, 1], w[:, 2]
        one = jnp.ones_like(x)
        data = jnp.stack(
            [x * x, x * y, x * z, y * y, y * z, z * z, x, y, z, one], -1)
        M = jax.ops.segment_sum(data, seg, num_segments=CAP + 1,
                                indices_are_sorted=True)
        cnt1 = jnp.maximum(M[:, 9], 1.0)
        mean = M[:, 6:9] / cnt1[:, None]
        cov = jnp.stack([
            jnp.stack([M[:, 0] / cnt1 - mean[:, 0] ** 2,
                       M[:, 1] / cnt1 - mean[:, 0] * mean[:, 1],
                       M[:, 2] / cnt1 - mean[:, 0] * mean[:, 2]], -1),
            jnp.stack([M[:, 1] / cnt1 - mean[:, 0] * mean[:, 1],
                       M[:, 3] / cnt1 - mean[:, 1] ** 2,
                       M[:, 4] / cnt1 - mean[:, 1] * mean[:, 2]], -1),
            jnp.stack([M[:, 2] / cnt1 - mean[:, 0] * mean[:, 2],
                       M[:, 4] / cnt1 - mean[:, 1] * mean[:, 2],
                       M[:, 5] / cnt1 - mean[:, 2] ** 2], -1),
        ], -2)
        lam = eigh3.eigvals3(cov)
        return lam[:, 0] / jnp.maximum(lam[:, 1], 1e-30)

    rec("one_layer_classify", s3, (world, seg_pts))

    # --- stage 3s: JUST the 10ch segment_sum of the same shapes ---
    data10 = jax.device_put(
        rng.standard_normal((N, 10)).astype(np.float32))

    @jax.jit
    def s3s(c, d, seg):
        return jax.ops.segment_sum(d + c, seg, num_segments=CAP + 1,
                                   indices_are_sorted=True)

    rec("segsum10_cap2M", s3s, (data10, seg_pts))

    # --- stage 3e: JUST eigvals3 on the cell table ---
    covs = rng.standard_normal((CAP + 1, 3, 3)).astype(np.float32)
    covs = jax.device_put(covs @ covs.transpose(0, 2, 1))

    @jax.jit
    def s3e(c, cv):
        lam = eigh3.eigvals3(cv + c)
        return lam[:, 0]

    rec("eigvals3_2M", s3e, (covs,))

    # --- stage 3b: boundaries + cumsum ---
    @jax.jit
    def s3b(c, h):
        h = h + c.astype(jnp.int32)
        new = jnp.ones_like(h, dtype=bool).at[1:].set(h[1:] != h[:-1])
        seg = jnp.cumsum(new.astype(jnp.int32)) - 1
        return jnp.minimum(seg, CAP - 1)

    rec("boundaries_cumsum", s3b, (hi,))

    # --- stage 4: metadata scatter at cell-table size ---
    leafof = jax.device_put(rng.integers(0, 1 << 13, CAP + 1)
                            .astype(np.int32))
    meanc = jax.device_put(
        rng.standard_normal((CAP + 1, 3)).astype(np.float32))

    @jax.jit
    def s4(c, m, lf):
        tbl = jnp.zeros(((1 << 13) + 1, 3), jnp.float32)
        return tbl.at[lf].set(m + c, mode="drop")

    rec("meta_scatter", s4, (meanc, leafof))

    # --- stage 5: segment_max 3ch (cell_center path) ---
    @jax.jit
    def s5(c, w, seg):
        return jax.ops.segment_max(w + c, seg, num_segments=CAP + 1,
                                   indices_are_sorted=True)

    rec("segment_max_3ch", s5, (world, seg_pts))

    # --- stage 6: emission (4ch + gather + 6ch), GW segments ---
    seg2 = jax.device_put(rng.integers(0, GW, N).astype(np.int32))

    @jax.jit
    def s6(c, b, seg):
        b = b + c
        one = jnp.ones((N, 1), jnp.float32)
        S1 = jax.ops.segment_sum(jnp.concatenate([b, one], -1), seg,
                                 num_segments=GW + 1)
        bmean = S1[:, :3] / jnp.maximum(S1[:, 3:4], 1.0)
        cc = b - bmean[seg]
        cx, cy, cz = cc[:, 0], cc[:, 1], cc[:, 2]
        P = jax.ops.segment_sum(
            jnp.stack([cx * cx, cx * cy, cx * cz, cy * cy, cy * cz,
                       cz * cz], -1), seg, num_segments=GW + 1)
        return P

    rec("emission", s6, (world, seg2))

    total = (results["transform_quant_sort"] + results["reorder_gathers"]
             + 3 * (results["one_layer_classify"]
                    + results["boundaries_cumsum"]
                    + results["meta_scatter"]
                    + results["segment_max_3ch"])
             + results["emission"])
    results["predicted_total"] = total
    print(f"predicted full-pipeline: {total:.2f}s", flush=True)
    with open("artifacts/assoc_stage_profile.json", "w") as fh:
        json.dump({k: round(v, 4) for k, v in results.items()}, fh,
                  indent=2)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
