"""Sliding-window marginalization on factor tensors.

Re-design of the reference's `OCTO_TREE_NODE::to_margi` /
`OCTO_TREE_ROOT::marginalize` (src/benchmark/bavoxel.hpp:778-816, 948-963;
consistency variant src/simulation/BAs_left.hpp:754-792, 926-941): the
oldest `mg_size` scans of every plane are absorbed into the fixed
world-frame cluster (the paper's P_fix prior) and the window shifts down.

In the functional tensor layout this is three pure array ops: a transform
+ sum into Cfix, a slice of the scan axis, and a weight refresh — no tree
traversal, no slot shuffling.
"""

from __future__ import annotations

import numpy as np

from ..ops.factors import PlaneFactors


def marginalize(
    f: PlaneFactors,
    T_margi: np.ndarray,
    mg_size: int,
    *,
    fix_cap: float = 50.0,
    weighting: str = "point_count",
) -> PlaneFactors:
    """Absorb scans [0, mg_size) into Cfix and shift the window.

    T_margi: (mg_size, 4, 4) world poses used to transform the absorbed
    body-frame clusters (the reference uses the poses current at
    marginalization time; to_margi re-transforms when given refined poses,
    bavoxel.hpp:782-787).

    fix_cap: a plane stops absorbing once its fixed cluster holds >= this
    many points (reference `fix_point.N < 50`, bavoxel.hpp:789); the
    marginalized scans of such planes are dropped, matching the reference.

    Host-side numpy op (marginalization happens once per window step, not
    in the hot loop); accepts numpy or jax arrays, returns numpy.
    """
    C = np.asarray(f.C)
    Cfix = np.asarray(f.Cfix).copy()
    G, W = C.shape[:2]
    assert 0 < mg_size < W

    absorb = Cfix[:, 3, 3] < fix_cap                       # (G,)
    for i in range(mg_size):
        T = np.asarray(T_margi[i])
        TCT = np.einsum("ab,gbc,dc->gad", T, C[:, i], T)
        Cfix[absorb] += TCT[absorb]

    C_new = C[:, mg_size:].copy()

    counts = C_new[..., 3, 3]
    if weighting == "point_count":
        coe = counts.sum(axis=1)
    else:
        coe = (counts.sum(axis=1) > 0).astype(C.dtype)
    # planes with neither window points nor fixed points die
    alive = (counts.sum(axis=1) + Cfix[:, 3, 3]) > 0
    coe = np.where(alive & (counts.sum(axis=1) > 0), coe, 0.0)

    return PlaneFactors(
        C=C_new,
        Cfix=Cfix,
        coe=coe,
        centers=np.asarray(f.centers),
        body_centers=np.asarray(f.body_centers)[:, mg_size:],
    )
