"""LOAM-style feature extraction: walls yield surf points, a sharp fold
yields edge points near the crease."""

import numpy as np

from balm_tpu.features import loam


def make_corner_lines(n_lines=8, pts=400, seed=0):
    """Horizontal scan lines sweeping across two walls meeting at x=0:
    wall A: y = 2 (for x < 0), wall B: x ... a crease along x=0."""
    rng = np.random.default_rng(seed)
    lines = []
    for li in range(n_lines):
        z = -0.5 + li * 0.15
        ang = np.linspace(np.deg2rad(20), np.deg2rad(160), pts)
        pts3 = []
        for a in ang:
            d = np.array([np.cos(a), np.sin(a), 0.0])
            # intersect ray with the two planes x = -2 and y = 2
            ts = []
            if d[0] < -1e-6:
                ts.append(-2.0 / d[0])
            if d[1] > 1e-6:
                ts.append(2.0 / d[1])
            t = min(t for t in ts if t > 0)
            q = t * d + np.array([0, 0, z])
            pts3.append(q + rng.normal(0, 0.002, 3))
        lines.append(np.asarray(pts3))
    return lines


def test_extracts_surf_and_edge():
    lines = make_corner_lines()
    surf, edge = loam.extract(lines)
    assert len(surf) > 500
    assert len(edge) > 0
    # edge points concentrate near the crease (the x=-2 / y=2 corner line)
    crease = np.array([-2.0, 2.0])
    d = np.linalg.norm(edge[:, :2] - crease, axis=-1)
    assert np.median(d) < 0.5
    # surf points are NOT concentrated at the crease
    ds = np.linalg.norm(surf[:, :2] - crease, axis=-1)
    assert np.median(ds) > np.median(d)


def test_blind_range_filter():
    line = np.concatenate(
        [np.full((50, 3), 0.1), np.tile([[3.0, 0, 0]], (50, 1))]
    )
    surf, edge = loam.extract([line], loam.LoamConfig(blind=0.5))
    if len(surf):
        assert np.all(np.linalg.norm(surf, axis=-1) > 0.5)
    if len(edge):
        assert np.all(np.linalg.norm(edge, axis=-1) > 0.5)


def test_flat_wall_mostly_surf():
    rng = np.random.default_rng(1)
    lines = []
    for li in range(4):
        x = np.linspace(-2, 2, 300)
        pts = np.stack([x, np.full(300, 3.0), np.full(300, li * 0.2)], -1)
        lines.append(pts + rng.normal(0, 0.001, pts.shape))
    surf, edge = loam.extract(lines)
    assert len(surf) > 10 * max(len(edge), 1)
