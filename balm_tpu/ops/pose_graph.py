"""SE(3) relative-pose factors for the hierarchical top level.

The reference has no pose-graph machinery (its HBA README pointer leaves
large maps to a separate project); these factors are the inter-block
constraints that survive super-scan compression in pipelines/hierarchical:
two overlapping bottom blocks both solve the shared scans, and the
consensus relative pose between their anchors becomes a measurement

    Z = T_i^-1 T_j      (anchor j expressed in anchor i's frame)

with cost

    E = w_rot |Log(Zr^T R_i^T R_j)|^2 + w_tr |R_i^T (p_j - p_i) - Zp|^2.

Derivatives are taken by autodiff in the SAME left-perturbation chart as
the plane factors (eps -> Exp(eps_k) T_k, solver/lm.py), so the two factor
families add directly into one damped-Newton system.  The top level has
tens of anchors, so a jax.hessian of this cost is negligible next to one
plane-factor evaluation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import lie


class RelPoseEdges(NamedTuple):
    """Batch of relative-pose factors (a pytree).

    i, j:   (E,) int32 pose indices (measurement: pose j in pose i frame)
    Zr:     (E, 3, 3) measured relative rotations R_i^T R_j
    Zp:     (E, 3) measured relative translations R_i^T (p_j - p_i)
    w_rot:  (E,) rotation weights (1/sigma^2)
    w_tr:   (E,) translation weights
    """

    i: jnp.ndarray
    j: jnp.ndarray
    Zr: jnp.ndarray
    Zp: jnp.ndarray
    w_rot: jnp.ndarray
    w_tr: jnp.ndarray

    @classmethod
    def empty(cls, dtype=jnp.float64):
        z = jnp.zeros((0,), jnp.int32)
        return cls(i=z, j=z, Zr=jnp.zeros((0, 3, 3), dtype),
                   Zp=jnp.zeros((0, 3), dtype),
                   w_rot=jnp.zeros((0,), dtype),
                   w_tr=jnp.zeros((0,), dtype))


def _robust(chi2, delta):
    """Huber in the residual-norm chart, parameterized in chi^2 units:
    quadratic to chi^2 = delta, linear in ||r|| past it (gradient
    continuous).  Pass a huge finite delta (not inf) for quadratic edges
    — jax.grad of `where` NaN-poisons on inf in the untaken branch.

    Double-where safe-sqrt: an exactly-satisfied edge (chi2 == 0, e.g.
    stationary consecutive poses making a chain edge exact) must not put
    sqrt(0) in the untaken branch — its infinite derivative NaN-poisons
    grad/Hessian through the `where` reverse pass.  (A fixed 1e-300
    floor underflows to 0 in float32; even finfo.tiny leaves the
    second-derivative x^{-3/2} term to overflow to inf in f32.)  The
    untaken branch is evaluated at chi2=1 instead, where every
    derivative order is finite; the taken sqrt branch only sees
    chi2 > delta > 0."""
    quad = chi2 <= delta
    safe = jnp.where(quad, jnp.ones_like(chi2), chi2)
    s = jnp.sqrt(safe)
    d = jnp.sqrt(delta)
    return jnp.where(quad, chi2, 2.0 * d * s - delta)


def relpose_cost(R, p, edges: RelPoseEdges, delta=None):
    """Total weighted pose-graph cost (scalar).

    delta: optional (E,) per-edge Huber thresholds in chi^2 units
    (None = pure quadratic, the BA-solver path)."""
    Ri = R[edges.i]
    Rj = R[edges.j]
    dR = jnp.einsum("eba,ebc->eac", Ri, Rj)          # R_i^T R_j
    rerr = lie.so3_log(jnp.einsum("eba,ebc->eac", edges.Zr, dR))
    dp = jnp.einsum("eba,eb->ea", Ri, p[edges.j] - p[edges.i])
    terr = dp - edges.Zp
    chi2 = (edges.w_rot * jnp.sum(rerr * rerr, -1)
            + edges.w_tr * jnp.sum(terr * terr, -1))
    if delta is not None:
        chi2 = _robust(chi2, delta)
    return jnp.sum(chi2)


def _edge_cost(eps, Ri, pi, Rj, pj, Zr, Zp, wr, wt, delta):
    """One edge's cost as a function of its OWN 12 perturbation dims
    (eps = [eps_i, eps_j], each a left twist (w, t))."""
    dRi = lie.so3_exp(eps[:3])
    dRj = lie.so3_exp(eps[6:9])
    Rni = dRi @ Ri
    pni = dRi @ pi + eps[3:6]
    Rnj = dRj @ Rj
    pnj = dRj @ pj + eps[9:12]
    rerr = lie.so3_log(Zr.T @ (Rni.T @ Rnj))
    terr = Rni.T @ (pnj - pni) - Zp
    chi2 = wr * (rerr @ rerr) + wt * (terr @ terr)
    return _robust(chi2, delta)


def evaluate_relpose_blocks(R, p, edges: RelPoseEdges, delta=None):
    """Per-edge exact derivatives: (res, g (E,12), h (E,12,12)).

    The raw material for BOTH the dense scatter assembly
    (`evaluate_relpose`) and the sparse block solver
    (pipelines/loopclose.pose_graph_optimize): each edge touches exactly
    two poses, so its 12-dim grad / 12x12 Hessian in the left-update
    chart is the complete global contribution — O(E * 12^2) work.

    delta: optional (E,) per-edge Huber thresholds (chi^2 units); the
    exact Hessian of the robustified cost comes out of the same per-edge
    autodiff for free.
    """
    E = edges.i.shape[0]
    dtype = R.dtype
    if delta is None:
        delta = jnp.full((E,), 1e30, dtype)
    eps0 = jnp.zeros((E, 12), dtype)
    args = (edges.Zr, edges.Zp, edges.w_rot, edges.w_tr, delta)
    Ri, pi = R[edges.i], p[edges.i]
    Rj, pj = R[edges.j], p[edges.j]
    res = jnp.sum(jax.vmap(_edge_cost)(eps0, Ri, pi, Rj, pj, *args))
    g = jax.vmap(jax.grad(_edge_cost))(eps0, Ri, pi, Rj, pj, *args)
    h = jax.vmap(jax.hessian(_edge_cost))(eps0, Ri, pi, Rj, pj, *args)
    return res, g, h


def evaluate_relpose(R, p, edges: RelPoseEdges, delta=None):
    """(res, J (6W,), H (6W, 6W)) in the left-update chart.

    Dense scatter of `evaluate_relpose_blocks` — same values to roundoff
    as autodiff through the full 6W-dim chart (kept as
    `evaluate_relpose_dense`, the equality oracle).  For large W prefer
    the sparse solver in pipelines/loopclose.py, which consumes the
    blocks directly and never materializes (6W)^2.
    """
    W = R.shape[0]
    E = edges.i.shape[0]
    dtype = R.dtype
    if E == 0:
        z6 = jnp.zeros(6 * W, dtype)
        return jnp.zeros((), dtype), z6, jnp.zeros((6 * W, 6 * W), dtype)

    res, g, h = evaluate_relpose_blocks(R, p, edges, delta)

    J = jnp.zeros((W, 6), dtype)
    J = J.at[edges.i].add(g[:, :6]).at[edges.j].add(g[:, 6:])

    Hb = jnp.zeros((W, W, 6, 6), dtype)
    Hb = (Hb.at[edges.i, edges.i].add(h[:, :6, :6])
            .at[edges.i, edges.j].add(h[:, :6, 6:])
            .at[edges.j, edges.i].add(h[:, 6:, :6])
            .at[edges.j, edges.j].add(h[:, 6:, 6:]))
    H = Hb.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
    return res, J.reshape(6 * W), H


def evaluate_relpose_dense(R, p, edges: RelPoseEdges):
    """Reference implementation: autodiff through the full 6W-dim chart.

    Kept as the equality oracle for `evaluate_relpose` (the per-edge
    scatter form above); do not use in production at large W.
    """
    W = R.shape[0]

    def cost(eps):
        Rn, pn = lie.se3_left_update(R, p, eps.reshape(W, 6))
        return relpose_cost(Rn, pn, edges)

    eps0 = jnp.zeros(6 * W, R.dtype)
    res = cost(eps0)
    J = jax.grad(cost)(eps0)
    H = jax.hessian(cost)(eps0)
    return res, J, H


def concat_edges(a: RelPoseEdges | None, b: RelPoseEdges | None):
    """Concatenate two edge batches (either may be None)."""
    if a is None:
        return b
    if b is None:
        return a
    return RelPoseEdges(*[
        jnp.concatenate([jnp.asarray(x), jnp.asarray(y)])
        for x, y in zip(a, b)
    ])


def lift_edges(edges: RelPoseEdges, owner: np.ndarray,
               rel_R, rel_p) -> RelPoseEdges | None:
    """Lift scan-level relative-pose edges onto the anchor (block) graph.

    The hierarchical pipeline solves each block in its anchor frame, so
    scan a decomposes as T_a = T_A(owner[a]) * T_rel(a).  A scan-level
    measurement Z_ab = T_a^-1 T_b therefore induces the anchor-level
    measurement

        T_A(ka)^-1 T_A(kb) = T_rel(a) * Z_ab * T_rel(b)^-1,

    i.e. Zr' = Ra Zr Rb^T and Zp' = Ra Zp + pa - Zr' pb with
    (Ra, pa) = rel pose of scan a, (Rb, pb) = rel pose of scan b.  This
    is how LOOP-CLOSURE edges (pipelines/loopclose.py) — which span
    distant blocks by construction — survive the super-scan compression;
    in-block edges (ka == kb) are already enforced by the bottom solve
    and are dropped.  Weights carry over unchanged (the lift is a rigid
    re-expression of the same measurement).

    Caveat: the lift bakes the refined rel poses into the measurement,
    so it is only as good as the bottom blocks.  If a block solve
    corrupts its intra-block geometry (e.g. the information-limited
    corridor regime, artifacts/corridor_scale.json), the lifted edge
    inherits that error at full weight.  The hierarchical pipeline
    defends in two ways: the cycle guard includes the scan-level edge
    cost (a cycle whose composed result violates the original loops is
    reverted), and the polish pass re-enforces the edges at the scan
    level, lift-free.
    """
    ei = np.asarray(edges.i)
    ej = np.asarray(edges.j)
    keep = [k for k in range(len(ei))
            if owner[ei[k]] != owner[ej[k]]]
    if not keep:
        return None
    li, lj, Zr_l, Zp_l = [], [], [], []
    Zr = np.asarray(edges.Zr)
    Zp = np.asarray(edges.Zp)
    for k in keep:
        a, b = int(ei[k]), int(ej[k])
        Ra, pa = np.asarray(rel_R[a]), np.asarray(rel_p[a])
        Rb, pb = np.asarray(rel_R[b]), np.asarray(rel_p[b])
        Zr2 = Ra @ Zr[k] @ Rb.T
        Zp2 = Ra @ Zp[k] + pa - Zr2 @ pb
        li.append(int(owner[a]))
        lj.append(int(owner[b]))
        Zr_l.append(Zr2)
        Zp_l.append(Zp2)
    return RelPoseEdges(
        i=jnp.asarray(li, jnp.int32),
        j=jnp.asarray(lj, jnp.int32),
        Zr=jnp.asarray(np.stack(Zr_l)),
        Zp=jnp.asarray(np.stack(Zp_l)),
        w_rot=jnp.asarray(np.asarray(edges.w_rot)[keep]),
        w_tr=jnp.asarray(np.asarray(edges.w_tr)[keep]),
    )


def consensus_edge(rel_Ri, rel_pi, rel_Rj, rel_pj):
    """Consensus relative pose between two anchors from shared scans.

    rel_R*/rel_p* are lists of the SAME scans' refined poses expressed in
    anchor i's resp. anchor j's frame.  For each shared scan s:
        T_ij^(s) = T_i^s (T_j^s)^-1   (pose of anchor j in anchor i frame)
    and the consensus is the Lie-algebra mean over s (the overlap is a few
    scans, all agreeing up to intra-block residual error).

    Returns (Zr, Zp, spread) with spread = max pairwise deviation (rad+m),
    usable as a weight / gating signal.
    """
    Ts = []
    for (Ri, pi, Rj, pj) in zip(rel_Ri, rel_pi, rel_Rj, rel_pj):
        Rij = np.asarray(Ri) @ np.asarray(Rj).T
        pij = np.asarray(pi) - Rij @ np.asarray(pj)
        Ts.append((Rij, pij))
    R0, p0 = Ts[0]
    if len(Ts) == 1:
        return R0, p0, 0.0
    # mean in the tangent space at T0
    ws = []
    vs = []
    for (Rk, pk) in Ts:
        ws.append(np.asarray(lie.so3_log(jnp.asarray(R0.T @ Rk))))
        vs.append(pk - p0)
    wbar = np.mean(ws, axis=0)
    vbar = np.mean(vs, axis=0)
    spread = max(
        float(np.max(np.linalg.norm(np.asarray(ws) - wbar, axis=-1))),
        float(np.max(np.linalg.norm(np.asarray(vs) - vbar, axis=-1))),
    )
    Rm = R0 @ np.asarray(lie.so3_exp(jnp.asarray(wbar)))
    pm = p0 + vbar
    return Rm, pm, spread
