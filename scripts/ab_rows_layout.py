"""A/B the rank-row matmul operand layout (round-4 verdict item 2).

hess_packed_xla assembles each rank-k operand as
stack([rows[j][k] for j], axis=1).reshape(6Wp, Gp) — (w, j)-major, which
XLA lowers as a strided relayout of 300+ MB.  The j-major alternative
concatenate([rows[j][k] for j], axis=0) is a fusable concat (producers
write straight into the operand buffer); H then comes back (j, w)-major
and needs one (6W, 6W) transpose — 37 MB, trivial.

Also measures: rows channels alone, matmul alone on pre-materialized
operands, and the fully-fused evaluate, to locate the relayout cost.

Run: python scripts/ab_rows_layout.py [W] [G]
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

from balm_tpu.ops import packed as pkmod  # noqa: E402
from balm_tpu.ops import pallas_evaluate as pe  # noqa: E402
from balm_tpu.utils import sync  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / "scripts"))
from roofline_bytes import synth  # noqa: E402


def main(W=512, G=8192):
    R, p, f = synth(W, G)
    pk = jax.device_put(pkmod.pack_factors(f))
    pose = pe.pad_poses(R, p, pk.wp).astype(jnp.float32)
    Wp, Gp = pk.wp, pk.gp
    out = {"W": W, "G": G, "device": str(jax.devices()[0])}

    with jax.default_matmul_precision("float32"):
        csum = pe.csum_packed_xla(pose, pk.mom, pk.cen, pk.cfix)
        _, aux = pe._aux_from_csum(csum, pk, 1e-9)
        aux = jax.device_put(aux)
        kwH = {"dimension_numbers": (((1,), (1,)), ((), ())),
               "preferred_element_type": jnp.float32,
               "precision": lax.Precision.HIGH}

        def current(pose):
            H, J, D = pe.hess_packed_xla(pose, pk.mom, pk.cen, aux,
                                         hess_precision=lax.Precision.HIGH)
            return H

        def jmajor(pose):
            rows, jv, D = pe._rows_channels_xla(pose, pk.mom, pk.cen, aux)
            H = None
            for k in range(3):
                Mk = jnp.concatenate([rows[j][k] for j in range(6)],
                                     axis=0)          # (6Wp, Gp) j-major
                Hk = lax.dot_general(Mk, Mk, **kwH)
                H = Hk if H is None else H + Hk
            # back to (w, j)-major
            return H.reshape(6, Wp, 6, Wp).transpose(1, 0, 3, 2).reshape(
                6 * Wp, 6 * Wp)

        for name, fn in (("current_wj", current), ("jmajor_concat",
                                                   jmajor)):
            g = jax.jit(fn)
            r = g(pose)
            sync.fetch_scalar(r)
            t = sync.time_per_run(g, pose, k=6, reps=2,
                                  warmup=False)["per_run_s"]
            out[name + "_s"] = round(t, 5)
            out[name + "_check"] = float(jnp.sum(r))
            print(name, out[name + "_s"], flush=True)

        # matmul alone on a pre-materialized operand (the MXU floor)
        M0 = jnp.asarray(np.random.default_rng(0).normal(
            size=(6 * Wp, Gp)).astype(np.float32))

        mm = jax.jit(lambda M: lax.dot_general(M, M, **kwH)
                     + lax.dot_general(M, M, **kwH)
                     + lax.dot_general(M, M, **kwH))
        sync.fetch_scalar(mm(M0))
        out["matmul3_alone_s"] = round(sync.time_per_run(
            mm, M0, k=6, reps=2, warmup=False)["per_run_s"], 5)
        print("matmul3", out["matmul3_alone_s"], flush=True)

    d = abs(out["current_wj_check"] - out["jmajor_concat_check"])
    out["layouts_agree"] = bool(
        d < 1e-4 * abs(out["current_wj_check"]) + 1e-3)
    with open(f"artifacts/ab_rows_layout_w{W}.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8192)
