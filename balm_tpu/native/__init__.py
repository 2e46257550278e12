"""Native (C++) host-side runtime components, loaded via ctypes.

Built on demand with g++ into a cached shared library next to the sources
(pybind11 is not available in this environment; the C ABI + ctypes keeps
the binding surface minimal).  Falls back cleanly if no compiler exists —
callers must check `available()`.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "voxelize_native.cpp"
_LIB = _DIR / "libvoxelize_native.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-march=native", str(_SRC), "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not _LIB.exists()
                    or _LIB.stat().st_mtime < _SRC.stat().st_mtime):
                _build()
            lib = ctypes.CDLL(str(_LIB))
        except (OSError, subprocess.CalledProcessError):
            return None
        fn = lib.voxelize_adaptive
        fn.restype = ctypes.c_int64
        fn.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,   # world, body, scan
            ctypes.c_int64, ctypes.c_int64,                      # n, n_scans
            ctypes.c_double, ctypes.c_int64,                     # voxel, layer_limit
            ctypes.c_void_p, ctypes.c_int64,                     # ratios, n_ratio
            ctypes.c_int64,                                      # min_points
            ctypes.c_void_p,                                     # point_leaf
            ctypes.c_void_p, ctypes.c_int64,                     # moments, max_leaves
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,   # center, layer, decision
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def voxelize_adaptive(world, body, scan_id, n_scans, voxel_size, layer_limit,
                      eigen_ratio, min_points, max_leaves=1 << 17):
    """Run the native adaptive voxelization.

    Returns (n_leaves, point_leaf (N,), moments (L, W, 4, 4) f64,
    leaf_center (L,3), leaf_layer (L,), leaf_decision (L,)).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native voxelizer unavailable (no g++?)")
    world = np.ascontiguousarray(world, np.float64)
    body = np.ascontiguousarray(body, np.float64)
    scan_id = np.ascontiguousarray(scan_id, np.int64)
    ratios = np.ascontiguousarray(eigen_ratio, np.float64)
    n = len(world)

    while True:
        point_leaf = np.empty(n, np.int64)
        # empty, not zeros: the native side memsets only the rows it emits
        moments = np.empty((max_leaves, n_scans, 10), np.float64)
        center = np.empty((max_leaves, 3), np.float64)
        layer = np.empty(max_leaves, np.int64)
        decision = np.empty(max_leaves, np.float64)
        r = lib.voxelize_adaptive(
            world.ctypes.data, body.ctypes.data, scan_id.ctypes.data,
            n, n_scans, float(voxel_size), int(layer_limit),
            ratios.ctypes.data, len(ratios), int(min_points),
            point_leaf.ctypes.data,
            moments.ctypes.data, max_leaves,
            center.ctypes.data, layer.ctypes.data, decision.ctypes.data,
        )
        if r >= 0:
            L = int(r)
            break
        max_leaves = int(-r) + 1024  # retry with the required capacity

    m = moments[:L]
    C = np.zeros((L, n_scans, 4, 4), np.float64)
    C[..., 0, 0] = m[..., 0]
    C[..., 0, 1] = C[..., 1, 0] = m[..., 1]
    C[..., 0, 2] = C[..., 2, 0] = m[..., 2]
    C[..., 1, 1] = m[..., 3]
    C[..., 1, 2] = C[..., 2, 1] = m[..., 4]
    C[..., 2, 2] = m[..., 5]
    C[..., 0, 3] = C[..., 3, 0] = m[..., 6]
    C[..., 1, 3] = C[..., 3, 1] = m[..., 7]
    C[..., 2, 3] = C[..., 3, 2] = m[..., 8]
    C[..., 3, 3] = m[..., 9]
    return L, point_leaf, C, center[:L], layer[:L], decision[:L]
