"""Minimal PCD v0.7 reader (binary + ascii), numpy-vectorized.

Replaces the reference's pcl::io::loadPCDFile usage
(src/benchmark/benchmark_realworld.cpp:89, src/simulation/consistency.cpp:108).
Only the fields the BA pipeline needs (x, y, z) are required; all declared
fields are parsed.
"""

from __future__ import annotations

import numpy as np

_TYPEMAP = {("F", 4): "f4", ("F", 8): "f8",
            ("I", 1): "i1", ("I", 2): "i2", ("I", 4): "i4",
            ("U", 1): "u1", ("U", 2): "u2", ("U", 4): "u4"}


def read_pcd(path):
    """Read a PCD file -> dict of field name -> (N,) numpy array."""
    with open(path, "rb") as fh:
        header = {}
        while True:
            line = fh.readline().decode("ascii", errors="replace").strip()
            if line.startswith("#") or not line:
                continue
            key, _, rest = line.partition(" ")
            header[key] = rest.split()
            if key == "DATA":
                break
        fields = header["FIELDS"]
        sizes = [int(s) for s in header["SIZE"]]
        types = header["TYPE"]
        counts = [int(c) for c in header.get("COUNT", ["1"] * len(fields))]
        npoints = int(header["POINTS"][0])
        mode = header["DATA"][0]

        dt = []
        for name, size, typ, cnt in zip(fields, sizes, types, counts):
            base = _TYPEMAP[(typ, size)]
            if cnt == 1:
                dt.append((name, base))
            else:
                dt.append((name, base, (cnt,)))
        dtype = np.dtype(dt)

        if mode == "binary":
            buf = fh.read(npoints * dtype.itemsize)
            arr = np.frombuffer(buf, dtype=dtype, count=npoints)
        elif mode == "ascii":
            raw = np.loadtxt(fh, dtype=np.float64, max_rows=npoints)
            raw = np.atleast_2d(raw)
            arr = np.zeros(npoints, dtype=dtype)
            col = 0
            for name, cnt in zip(fields, counts):
                if cnt == 1:
                    arr[name] = raw[:, col].astype(arr[name].dtype)
                else:
                    arr[name] = raw[:, col:col + cnt].astype(arr[name].dtype)
                col += cnt
        else:
            raise ValueError(f"unsupported PCD DATA mode: {mode}")

    return {name: np.ascontiguousarray(arr[name]) for name in fields}


def read_pcd_xyz(path, dtype=np.float64):
    """Read just the xyz coordinates -> (N, 3)."""
    d = read_pcd(path)
    pts = np.stack([d["x"], d["y"], d["z"]], axis=-1).astype(dtype)
    # drop non-finite points (the reference datasets contain none, but
    # lidar streams in general do)
    mask = np.isfinite(pts).all(axis=1)
    return pts[mask]
