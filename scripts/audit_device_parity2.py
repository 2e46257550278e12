"""Audit 2: classify WHERE each host plane goes missing on the device path.

Audit 1 (audit_device_parity.py) showed f32 moments + trig eigensolver
flip ~2 of 130k cell decisions — precision is NOT the cause of the
5001-vs-5529 plane gap.  This script runs the FULL device pipeline (f32)
and the host pipeline (f64), matches admitted leaves by (layer, cell
coords), and for every host leaf missing on the device side replays the
device cascade state from the `_stage=35` tables to say which gate lost
it: not-alive / decision-fail / ancestor-shadow / admission(observers).

Run: JAX_PLATFORMS=cpu python scripts/audit_device_parity2.py
"""

import collections
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from balm_tpu.pipelines import realworld  # noqa: E402
from balm_tpu.voxel import device as vdev  # noqa: E402
from balm_tpu.voxel import grid  # noqa: E402
from balm_tpu.ops import eigh3  # noqa: E402


def leaf_cells(centers, layers, voxel_size):
    """(layer, cx, cy, cz) keys from world leaf centroids."""
    keys = []
    for c, l in zip(centers, layers):
        sz = voxel_size / (1 << int(l))
        q = np.floor(c / sz).astype(np.int64)
        keys.append((int(l), int(q[0]), int(q[1]), int(q[2])))
    return keys


def main():
    cfg = realworld.RealworldConfig()
    R, p, scans = realworld.load(cfg)
    vcfg = cfg.voxel
    L = vcfg.layer_limit
    ratios = list(vcfg.eigen_ratio) + [vcfg.eigen_ratio[-1]] * 8

    print("host (f64 numpy) voxelize ...", flush=True)
    host = grid.voxelize(scans, R, p, vcfg, dtype=np.float64,
                         backend="numpy")
    hkeys = leaf_cells(host.leaf_center, host.leaf_layer, vcfg.voxel_size)
    print("host planes:", host.num_planes, flush=True)

    print("device full pipeline f32 ...", flush=True)
    scans32 = [s.astype(np.float32) for s in scans]
    dres = vdev.voxelize_device(scans32, R.astype(np.float32),
                                p.astype(np.float32), vcfg)
    nd = int(dres.num_planes)
    print("device planes:", nd, "overflow:", bool(dres.overflow), flush=True)
    dcent = np.asarray(dres.factors.centers)[:nd]
    dlay = np.asarray(dres.leaf_layer)[:nd]
    dkeys = leaf_cells(dcent, dlay, vcfg.voxel_size)

    hset, dset = set(hkeys), set(dkeys)
    missing = hset - dset          # host has, device lost
    extra = dset - hset            # device has, host doesn't
    print(f"missing on device: {len(missing)}  extra on device: {len(extra)}")
    by_layer_missing = collections.Counter(k[0] for k in missing)
    by_layer_extra = collections.Counter(k[0] for k in extra)
    print("missing by layer:", dict(by_layer_missing))
    print("extra by layer:", dict(by_layer_extra))

    # --- replay the cascade from f32 tables to classify each miss ---
    print("device tables f32 ...", flush=True)
    body, mask = vdev.pad_scans(scans32, np.float32)
    tables, _ = vdev._voxelize_core(
        jnp.asarray(body), jnp.asarray(mask),
        jnp.asarray(R, jnp.float32), jnp.asarray(p, jnp.float32),
        voxel_size=float(vcfg.voxel_size), layer_limit=L,
        eigen_ratio=tuple(float(r) for r in vcfg.eigen_ratio),
        min_points=int(vcfg.min_points),
        min_observers=int(vcfg.min_observers),
        unit_coe=False, cell_caps=(1 << 20, 1 << 21, 1 << 21),
        Gcap=1 << 13, _stage=35)
    state = {}
    for l in sorted(tables):
        M, qabs, n = tables[l]
        n = int(n)
        M = np.asarray(M[:n], np.float64)
        qabs = np.asarray(qabs[:n])
        cnt = M[:, 9]
        cnt1 = np.maximum(cnt, 1.0)
        mean = M[:, 6:9] / cnt1[:, None]
        cov = np.empty((n, 3, 3))
        cov[:, 0, 0] = M[:, 0] / cnt1 - mean[:, 0] ** 2
        cov[:, 0, 1] = cov[:, 1, 0] = M[:, 1] / cnt1 - mean[:, 0] * mean[:, 1]
        cov[:, 0, 2] = cov[:, 2, 0] = M[:, 2] / cnt1 - mean[:, 0] * mean[:, 2]
        cov[:, 1, 1] = M[:, 3] / cnt1 - mean[:, 1] ** 2
        cov[:, 1, 2] = cov[:, 2, 1] = M[:, 4] / cnt1 - mean[:, 1] * mean[:, 2]
        cov[:, 2, 2] = M[:, 5] / cnt1 - mean[:, 2] ** 2
        lam = np.asarray(eigh3.eigvals3(jnp.asarray(cov, jnp.float32)),
                         np.float64)
        dec = lam[:, 0] / np.maximum(lam[:, 1], 1e-30)
        # cell coords at this layer are qabs >> (L - l)... no: tables store
        # layer-l coords directly (qabs halved per level).  Use as-is.
        state[l] = {tuple(q): (float(c), float(d))
                    for q, c, d in zip(qabs, cnt, dec)}

    causes = collections.Counter()
    examples = collections.defaultdict(list)
    for k in sorted(missing):
        l, cx, cy, cz = k
        cell = (cx, cy, cz)
        st = state[l].get(cell)
        if st is None:
            causes["cell_absent_in_tables"] += 1
            examples["cell_absent_in_tables"].append(k)
            continue
        cnt, dec = st
        if not (cnt > vcfg.min_points):
            causes["not_alive"] += 1
            examples["not_alive"].append((k, cnt))
            continue
        if not (dec < ratios[l]):
            causes["decision_fail"] += 1
            examples["decision_fail"].append((k, dec, ratios[l]))
            continue
        # decision passed on device too -> ancestor shadow or admission
        anc = None
        for al in range(l):
            ak = (cx >> (l - al), cy >> (l - al), cz >> (l - al))
            ast = state[al].get(ak)
            if ast is not None and ast[0] > vcfg.min_points \
                    and ast[1] < ratios[al]:
                anc = (al, ak, ast)
                break
        if anc is not None:
            causes["ancestor_plane_shadow"] += 1
            examples["ancestor_plane_shadow"].append((k, anc))
        else:
            causes["admission_or_other"] += 1
            examples["admission_or_other"].append(k)

    print("causes:", dict(causes))
    for c, ex in examples.items():
        print(f"  {c}: {ex[:4]}")

    out = {
        "host_planes": int(host.num_planes),
        "device_planes": nd,
        "missing": len(missing),
        "extra": len(extra),
        "missing_by_layer": dict(by_layer_missing),
        "extra_by_layer": dict(by_layer_extra),
        "causes": dict(causes),
    }
    with open("artifacts/audit_device_parity2.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print("wrote artifacts/audit_device_parity2.json")


if __name__ == "__main__":
    main()
