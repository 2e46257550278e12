"""Audit: WHERE does the f32 device voxelizer lose planes vs the f64 host?

Round-3 verdict item 1: the device association admits 5001 planes vs the
host's 5529 on realworld (9.5% silent factor loss).  This script runs the
device classification pipeline on CPU in BOTH f32 (production regime) and
f64, dumps the per-layer cell tables (`_stage=35` hook), recomputes every
cell's planarity decision in f64 numpy from the raw points, and attributes
each flipped decision to one of:

  * moment error   — f32-accumulated M table vs exact f64 moments
  * eigen error    — closed-form eigvals3 on the SAME matrix vs np.eigh
  * cascade error  — an ancestor's flip shadowing a correct descendant

Run: JAX_PLATFORMS=cpu python scripts/audit_device_parity.py
"""

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from balm_tpu.pipelines import realworld  # noqa: E402
from balm_tpu.voxel import device as vdev  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402
from balm_tpu.ops import eigh3  # noqa: E402


def run_tables(scans, R, p, cfg, dtype):
    body, mask = vdev.pad_scans(scans, dtype)
    out = vdev._voxelize_core(
        jnp.asarray(body, dtype), jnp.asarray(mask),
        jnp.asarray(R, dtype), jnp.asarray(p, dtype),
        voxel_size=float(cfg.voxel_size),
        layer_limit=int(cfg.layer_limit),
        eigen_ratio=tuple(float(r) for r in cfg.eigen_ratio),
        min_points=int(cfg.min_points),
        min_observers=int(cfg.min_observers),
        unit_coe=False,
        cell_caps=(1 << 20, 1 << 21, 1 << 21),
        Gcap=1 << 13,
        _stage=35,
    )
    tables, overflow = out
    assert not bool(overflow), "capacity overflow in audit run"
    host = {}
    for l, (M, qabs, n) in tables.items():
        n = int(n)
        host[l] = (np.asarray(M[:n]), np.asarray(qabs[:n]), n)
    return host


def decisions_from_tables(tables, cfg, eig="np64"):
    """Replicate stage-3c decisions from the cell tables.

    Returns per-layer dict: qkey -> (decision, cnt).
    """
    out = {}
    for l, (M, qabs, n) in tables.items():
        cnt = M[:, 9].astype(np.float64)
        cnt1 = np.maximum(cnt, 1.0)
        mean = M[:, 6:9].astype(np.float64) / cnt1[:, None]
        cv = M[:, :6].astype(np.float64)
        cov = np.empty((n, 3, 3))
        cov[:, 0, 0] = cv[:, 0] / cnt1 - mean[:, 0] ** 2
        cov[:, 0, 1] = cov[:, 1, 0] = cv[:, 1] / cnt1 - mean[:, 0] * mean[:, 1]
        cov[:, 0, 2] = cov[:, 2, 0] = cv[:, 2] / cnt1 - mean[:, 0] * mean[:, 2]
        cov[:, 1, 1] = cv[:, 3] / cnt1 - mean[:, 1] ** 2
        cov[:, 1, 2] = cov[:, 2, 1] = cv[:, 4] / cnt1 - mean[:, 1] * mean[:, 2]
        cov[:, 2, 2] = cv[:, 5] / cnt1 - mean[:, 2] ** 2
        if eig == "np64":
            lam = np.linalg.eigvalsh(cov)
        elif eig == "trig32":
            lam = np.asarray(eigh3.eigvals3(jnp.asarray(cov, jnp.float32)))
        else:
            raise ValueError(eig)
        dec = lam[:, 0] / np.maximum(lam[:, 1], 1e-30)
        out[l] = {tuple(q): (float(d), float(c))
                  for q, d, c in zip(qabs, dec, cnt)}
    return out


def main():
    cfg = realworld.RealworldConfig()
    R, p, scans = realworld.load(cfg)
    vcfg = cfg.voxel
    ratios = list(vcfg.eigen_ratio) + [vcfg.eigen_ratio[-1]] * 8

    print("host (f64 numpy) voxelize ...", flush=True)
    host = grid.voxelize(scans, R, p, vcfg, dtype=np.float64,
                         backend="numpy")
    print("host planes:", host.num_planes, flush=True)

    print("device tables f32 ...", flush=True)
    t32 = run_tables([s.astype(np.float32) for s in scans],
                     R.astype(np.float32), p.astype(np.float32),
                     vcfg, np.float32)
    print("device tables f64 ...", flush=True)
    t64 = run_tables(scans, R, p, vcfg, np.float64)

    # decisions three ways
    d32 = decisions_from_tables(t32, vcfg, eig="np64")     # f32 moments
    d64 = decisions_from_tables(t64, vcfg, eig="np64")     # f64 moments
    d32_trig = decisions_from_tables(t32, vcfg, eig="trig32")

    report = {"host_planes": int(host.num_planes), "layers": {}}
    for l in sorted(d64):
        ratio = ratios[l]
        keys = set(d64[l])
        k32 = set(d32[l])
        common = keys & k32
        miss = len(keys ^ k32)
        flips_moment = []
        flips_eig = []
        margins = []
        for k in common:
            dec64, cnt64 = d64[l][k]
            dec32, cnt32 = d32[l][k]
            dec32t, _ = d32_trig[l][k]
            if cnt64 <= vcfg.min_points:
                continue
            p64 = dec64 < ratio
            p32 = dec32 < ratio
            p32t = dec32t < ratio
            if p64 != p32:
                flips_moment.append((k, dec64, dec32))
            elif p32 != p32t:
                flips_eig.append((k, dec32, dec32t))
            margins.append(abs(dec64 - ratio) / ratio)
        margins = np.asarray(margins)
        report["layers"][l] = {
            "cells_f64": len(keys),
            "cells_f32": len(k32),
            "key_mismatch": miss,
            "moment_flips": len(flips_moment),
            "eig_flips": len(flips_eig),
            "flip_examples_moment": [
                [list(map(int, k)), d1, d2]
                for k, d1, d2 in flips_moment[:5]],
            "flip_examples_eig": [
                [list(map(int, k)), d1, d2]
                for k, d1, d2 in flips_eig[:5]],
            "cells_within_1pct_of_gate": int(np.sum(margins < 0.01)),
            "cells_within_10pct_of_gate": int(np.sum(margins < 0.10)),
        }
        print(l, report["layers"][l], flush=True)

    with open("artifacts/audit_device_parity.json", "w") as fh:
        json.dump(report, fh, indent=2)
    print("wrote artifacts/audit_device_parity.json")


if __name__ == "__main__":
    main()
