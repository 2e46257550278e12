"""Bytes-touched vs achieved-bandwidth model for the packed evaluate.

Round-5 correction (round-4 verdict item 4): the round-4 artifact
modeled traffic as args + out + 2*temps and produced frac_hbm_roof of
1.76-1.96 — physically impossible, meaning temp bytes are NOT all real
HBM round-trips (XLA keeps some fusion intermediates on-chip and the
2x multiplier double-counts).  This version reports a defensible LOWER
BOUND only:

  * mandatory_bytes = argument + output buffer bytes (these MUST cross
    HBM at least once each); temp bytes are reported separately as
    diagnostics, never folded into the bound
  * frac_hbm_roof_lb = mandatory_bytes / time / 819 GB/s  — a lower
    bound on how close the phase is to the bandwidth roof
  * slope-timed (utils/sync.py); a phase whose chain slope is within
    measurement noise (tk - t1 < 30% of t1) is marked
    timing_unreliable and excluded from bandwidth claims (the round-4
    "aux at 1640x roof" row came from a clamped negative slope)

Run: python scripts/roofline_bytes.py
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

_CACHE = str(pathlib.Path(__file__).resolve().parents[1] / ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from balm_tpu.ops import factors as Fmod  # noqa: E402
from balm_tpu.ops import packed as pkmod  # noqa: E402
from balm_tpu.ops import pallas_evaluate as pe  # noqa: E402
from balm_tpu.utils import sync  # noqa: E402

HBM_GBPS = 819.0          # v5e
PEAK_BF16 = 197.0e12
PEAK_F32_3PASS = PEAK_BF16 / 3.0


def synth(W, G, seed=0):
    rng = np.random.default_rng(seed)
    C = np.zeros((G, W, 4, 4), np.float64)
    n = rng.integers(20, 200, size=(G, W)).astype(np.float64)
    A = rng.normal(size=(G, W, 3, 3)) * 0.05
    P = np.einsum("gwab,gwcb->gwac", A, A) * n[..., None, None]
    C[..., :3, :3] = P
    C[..., 3, 3] = n
    f = Fmod.PlaneFactors.create(jnp.asarray(C, jnp.float32))
    f = f._replace(centers=jnp.asarray(rng.normal(size=(G, 3)) * 30,
                                       jnp.float32))
    R = jnp.asarray(np.stack([np.eye(3)] * W), jnp.float32)
    p = jnp.asarray(rng.normal(size=(W, 3)), jnp.float32)
    return R, p, f


def mem_model(compiled):
    ma = compiled.memory_analysis()
    args = getattr(ma, "argument_size_in_bytes", 0)
    out = getattr(ma, "output_size_in_bytes", 0)
    temp = getattr(ma, "temp_size_in_bytes", 0)
    return {
        "arg_bytes": int(args),
        "out_bytes": int(out),
        "temp_bytes_diagnostic": int(temp),
        "mandatory_bytes": int(args + out),
    }


def main():
    out = {"device": str(jax.devices()[0]), "hbm_gbps_roof": HBM_GBPS,
           "protocol": "LOWER-BOUND traffic = args + out only "
                       "(mandatory HBM crossings); temps diagnostic; "
                       "slope-timed, noisy slopes flagged", "configs": []}
    for W, G in ((512, 8192), (1024, 16384)):
        R, p, f = synth(W, G)
        pk = pkmod.pack_factors(f)
        pk = jax.device_put(pk)
        pose = pe.pad_poses(R, p, pk.wp).astype(jnp.float32)
        cfg = {"W": W, "G": G}

        with jax.default_matmul_precision("float32"):
            # phase 1: moment accumulation.  Big operands must be jit
            # ARGUMENTS: closed-over device arrays ship as constants
            # with the remote compile request (HTTP 413 past ~200 MB)
            csum_f0 = jax.jit(lambda pose, mom, cen, cfix:
                              pe.csum_packed_xla(pose, mom, cen, cfix))
            csum_f = lambda pose: csum_f0(pose, pk.mom, pk.cen, pk.cfix)
            lowered = csum_f0.lower(pose, pk.mom, pk.cen, pk.cfix)
            comp = lowered.compile()
            csum = csum_f(pose)
            cfg["csum"] = mem_model(comp)
            cfg["csum"]["time_s"] = sync.time_per_run(
                csum_f, pose, k=12, reps=3)

            # phase 2: aux (eigh + weights)
            aux_f0 = jax.jit(
                lambda csum, coe: pe._aux_from_csum(
                    csum, pkmod.PackedFactors(
                        mom=jnp.zeros((1, 10, coe.shape[1])), cen=None,
                        coe=coe, cfix=None), 1e-9)[1])
            aux_f = lambda csum: aux_f0(csum, pk.coe)
            comp = aux_f0.lower(csum, pk.coe).compile()
            aux = aux_f(csum)
            cfg["aux"] = mem_model(comp)
            cfg["aux"]["time_s"] = sync.time_per_run(
                aux_f, csum, k=12, reps=3)

            # phase 3a: rows channels ONLY (materialized as one array)
            def rows_only(pose, mom, cen, aux):
                rows, jv, D = pe._rows_channels_xla(pose, mom, cen, aux)
                return [jnp.stack([rows[j][k] for j in range(6)], axis=1)
                        for k in range(3)]

            rows_f0 = jax.jit(rows_only)
            comp = rows_f0.lower(pose, pk.mom, pk.cen, aux).compile()
            cfg["rows_only"] = mem_model(comp)
            cfg["rows_only"]["time_s"] = sync.time_per_run(
                lambda pose: rows_f0(pose, pk.mom, pk.cen, aux),
                pose, k=8, reps=3)

            # phase 3b: full rows + matmul (hess HIGH)
            hess_f0 = jax.jit(lambda pose, mom, cen, aux:
                              pe.hess_packed_xla(
                                  pose, mom, cen, aux,
                                  hess_precision=lax.Precision.HIGH))
            comp = hess_f0.lower(pose, pk.mom, pk.cen, aux).compile()
            cfg["hess"] = mem_model(comp)
            cfg["hess"]["time_s"] = sync.time_per_run(
                lambda pose: hess_f0(pose, pk.mom, pk.cen, aux),
                pose, k=6, reps=3)

            # full evaluate
            ev_f0 = jax.jit(lambda R, p, pk: pe.evaluate_packed(
                R, p, pk, hess_precision=lax.Precision.HIGH))
            ev_f = lambda R, p: ev_f0(R, p, pk)
            comp = ev_f0.lower(R, p, pk).compile()
            cfg["evaluate"] = mem_model(comp)

            def run_ev(R):
                return ev_f(R, p)

            cfg["evaluate"]["time_s"] = sync.time_per_run(
                run_ev, R, k=6, reps=3)

        Wp, Gp = pk.wp, pk.gp
        flops_mm = 2.0 * (6 * Wp) ** 2 * (3 * Gp)
        for ph in ("csum", "aux", "rows_only", "hess", "evaluate"):
            d = cfg[ph]
            tinfo = d.pop("time_s")
            d["time_s"] = tinfo["per_run_s"]
            d["t1_s"] = tinfo["t1_s"]
            d["tk_s"] = tinfo["tk_s"]
            # slope within chain-to-chain noise -> no bandwidth claim
            d["timing_unreliable"] = bool(
                tinfo["tk_s"] - tinfo["t1_s"] < 0.3 * tinfo["t1_s"])
            if d["timing_unreliable"]:
                d["achieved_gbps_lb"] = None
                d["frac_hbm_roof_lb"] = None
            else:
                d["achieved_gbps_lb"] = round(
                    d["mandatory_bytes"] / d["time_s"] / 1e9, 1)
                d["frac_hbm_roof_lb"] = round(
                    d["achieved_gbps_lb"] / HBM_GBPS, 3)
        cfg["hess"]["matmul_flops"] = flops_mm
        if not cfg["hess"]["timing_unreliable"]:
            cfg["hess"]["rows_s_est"] = round(
                cfg["hess"]["time_s"] - flops_mm / PEAK_F32_3PASS, 5)
        out["configs"].append(cfg)
        print(json.dumps(cfg, indent=1), flush=True)

    with open("artifacts/roofline_bytes.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote artifacts/roofline_bytes.json")


if __name__ == "__main__":
    main()
