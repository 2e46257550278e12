"""Coplanar voxel fusion: merge leaf planes that belong to one physical
plane into single factors.

Re-design of the reference's `VOXEL_MERGE::push_voxel/reorganize` +
`tras_merge` (src/benchmark/bavoxel.hpp:484-624, 873-906): leaves whose
normals agree within `angle_deg` and whose center line is either
perpendicular to both normals (within `perp_deg`) or shorter than
`dist_thresh` are greedily grouped against each group's first member;
grouped clusters are summed per scan and re-admitted as one factor.

Merging reduces the factor count and couples distant observations of large
walls/floors, which both speeds up the solve and strengthens the Hessian.
"""

from __future__ import annotations

import numpy as np

from ..ops.factors import PlaneFactors


def _leaf_normals(C_tot: np.ndarray):
    N = np.maximum(C_tot[:, 3, 3], 1.0)
    vbar = C_tot[:, :3, 3] / N[:, None]
    cov = C_tot[:, :3, :3] / N[:, None, None] - vbar[:, :, None] * vbar[:, None, :]
    lam, U = np.linalg.eigh(cov)
    return vbar, U[:, :, 0]


def merge_coplanar(
    f: PlaneFactors,
    num_planes: int,
    *,
    angle_deg: float = 8.0,
    perp_deg: float = 80.0,
    dist_thresh: float = 0.1,
    weighting: str = "point_count",
):
    """Returns (merged PlaneFactors (numpy arrays), new_num_planes,
    group_of_leaf (num_planes,)).

    Thresholds match the reference (bavoxel.hpp:513-514: cos(8 deg),
    cos(80 deg); 0.1 m at bavoxel.hpp:543).
    """
    C = np.asarray(f.C)[:num_planes]
    Cfix = np.asarray(f.Cfix)[:num_planes]
    G, W = C.shape[:2]
    if G == 0:
        return f, 0, np.zeros(0, np.int64)

    C_tot = C.sum(axis=1) + Cfix
    centers, normals = _leaf_normals(C_tot)

    cos1 = np.cos(np.deg2rad(angle_deg))
    cos2 = np.cos(np.deg2rad(perp_deg))

    # greedy grouping against each group's FIRST member
    # (VOXEL_MERGE::reorganize, bavoxel.hpp:516-558).  Same greedy
    # first-match semantics as the reference, but each leaf is tested
    # against ALL current heads in one vectorized pass (the round-1
    # Python pair loop was O(G^2) interpreter time and unusable at
    # 100k+ leaves).
    group_of = np.empty(G, np.int64)
    head_n = np.empty((G, 3))          # head normals (grow in place)
    head_c = np.empty((G, 3))
    n_heads = 0
    for i in range(G):
        c2, d2 = centers[i], normals[i]
        gi = -1
        if n_heads:
            hn = head_n[:n_heads]
            hc = head_c[:n_heads]
            cand = np.abs(hn @ d2) > cos1
            if cand.any():
                c2c = c2 - hc
                dist = np.linalg.norm(c2c, axis=1)
                near = dist < dist_thresh
                with np.errstate(invalid="ignore", divide="ignore"):
                    u = c2c / np.maximum(dist, 1e-30)[:, None]
                perp = (np.abs(np.einsum("hj,hj->h", u, hn)) < cos2) & (
                    np.abs(u @ d2) < cos2)
                ok = cand & (near | perp)
                idx = np.flatnonzero(ok)
                if len(idx):
                    gi = int(idx[0])     # FIRST matching head, like the ref
        if gi < 0:
            gi = n_heads
            head_n[n_heads] = d2
            head_c[n_heads] = c2
            n_heads += 1
        group_of[i] = gi
    group_heads = list(range(n_heads))

    n_groups = len(group_heads)
    Cm = np.zeros((n_groups, W, 4, 4), C.dtype)
    Cfm = np.zeros((n_groups, 4, 4), C.dtype)
    np.add.at(Cm, group_of, C)
    np.add.at(Cfm, group_of, Cfix)

    counts = Cm[..., 3, 3]
    if weighting == "point_count":
        coe = counts.sum(axis=1)
    else:
        coe = np.ones(n_groups, C.dtype)
    # keep the reference's >= 2 observer admission (bavoxel.hpp:602-606)
    observers = (counts > 0).sum(axis=1)
    coe = np.where(observers >= 2, coe, 0.0)

    Ntot = np.maximum(counts.sum(axis=1) + Cfm[:, 3, 3], 1.0)
    cent = (Cm[..., :3, 3].sum(axis=1) + Cfm[:, :3, 3]) / Ntot[:, None]

    Gpad = max(128, -(-n_groups // 128) * 128)
    pad = lambda x: np.concatenate(
        [x, np.zeros((Gpad - len(x),) + x.shape[1:], x.dtype)]
    )
    fm = PlaneFactors(
        C=pad(Cm), Cfix=pad(Cfm), coe=pad(coe), centers=pad(cent),
        body_centers=np.zeros((Gpad, W, 3), C.dtype),
    )
    return fm, n_groups, group_of
