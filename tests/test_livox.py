"""Livox rule-based extractor: synthetic scanlines must reproduce the
reference's categories (Real_Plane interiors, Edge_Plane at surface
intersections, Edge_Jump at depth discontinuities)."""

import numpy as np

from balm_tpu.features import livox


def _wall_line(start, end, n):
    t = np.linspace(0.0, 1.0, n)[:, None]
    return start[None, :] * (1 - t) + end[None, :] * t


def test_flat_wall_is_plane():
    # a single wall segment, finely sampled, sweeping in angle
    ang = np.linspace(-0.4, 0.4, 300)
    d = 5.0 / np.cos(ang)               # wall at x = 5
    pts = np.stack([d * np.cos(ang), d * np.sin(ang),
                    np.zeros_like(ang)], axis=-1)
    surf, corn, ftype = livox.extract_scanline(pts)
    frac_plane = np.mean((ftype == livox.REAL_PLANE)
                         | (ftype == livox.POSS_PLANE))
    assert frac_plane > 0.8
    assert len(surf) > 20
    assert len(corn) == 0


def test_corner_between_walls_is_edge_plane():
    # two walls meeting at 90 deg: x=4 then y=2
    a = _wall_line(np.array([4.0, -2.0, 0.0]), np.array([4.0, 2.0, 0.0]), 200)
    b = _wall_line(np.array([4.0, 2.0, 0.0]), np.array([0.5, 2.0, 0.0]), 200)
    pts = np.concatenate([a, b[1:]])
    surf, corn, ftype = livox.extract_scanline(pts)
    # an Edge_Plane classification lands near the junction (index ~200)
    edge_idx = np.where(ftype == livox.EDGE_PLANE)[0]
    assert len(edge_idx) >= 1
    assert np.min(np.abs(edge_idx - 200)) < 12
    assert len(corn) >= 1


def test_depth_jump_is_edge_jump():
    # near wall segment, then a jump to a far wall (occlusion boundary)
    ang1 = np.linspace(-0.3, 0.0, 150)
    near = np.stack([3.0 * np.cos(ang1), 3.0 * np.sin(ang1),
                     np.zeros_like(ang1)], -1)
    ang2 = np.linspace(0.002, 0.3, 150)
    far = np.stack([9.0 * np.cos(ang2), 9.0 * np.sin(ang2),
                    np.zeros_like(ang2)], -1)
    pts = np.concatenate([near, far])
    surf, corn, ftype = livox.extract_scanline(pts)
    jump_idx = np.where(ftype == livox.EDGE_JUMP)[0]
    assert len(jump_idx) >= 1
    assert np.min(np.abs(jump_idx - 150)) < 4


def test_blind_region_excluded():
    ang = np.linspace(-0.4, 0.4, 200)
    pts = np.stack([0.3 * np.cos(ang), 0.3 * np.sin(ang),
                    np.zeros_like(ang)], -1)   # all inside blind radius
    surf, corn, ftype = livox.extract_scanline(pts)
    assert len(surf) == 0 and len(corn) == 0


def test_ring_split_covers_all_rings():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2000, 3)) * np.array([5, 5, 1.0])
    rings = livox.split_rings_velodyne(pts)
    assert sum(len(r) for r in rings) <= len(pts)
    assert sum(len(r) > 0 for r in rings) >= 8
