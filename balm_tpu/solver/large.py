"""Large-window LM: matrix-free damped-Newton over span-compressed factors.

The reference caps bundle adjustment at a dense (6W, 6W) LDLT
(bavoxel.hpp:1113-1114, W <= 177 in its benchmarks).  This solver scales
the SAME damping algebra (accept/reject, u/v schedule — see solver/lm.py)
to thousands of poses by replacing the dense factorization with a
block-Jacobi preconditioned conjugate-gradient solve on the implicit
normal equations

    (H + u diag(H)) dx = -J,    H = -R^T R + blockdiag(D)

where R is the factored rank-row matrix of ops/factors_windowed.py
(never materialized; one H v costs O(G S) flops).  Memory is O(G S + W),
so the pose window is bounded by HBM only through the factor data.

CG on an exact-Newton H needs H + uD positive definite; far from the
optimum LM's rejection loop raises u until it is (the same mechanism
that protects the reference's LDLT from indefinite pivots).  A
non-finite or ascent step is treated as a rejected iteration.

Multi-chip: shard the plane axis of WindowedFactors (sorted by `base`,
so shards are trajectory segments); poses/J/dx stay replicated (O(W)).
XLA inserts the psum over the factor axis for every segment reduction —
tests/test_large_solver.py asserts sharded == single-device.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import SolverConfig
from ..ops import factors_windowed as FW
from ..ops import lie
from ..ops import smallmat
from . import banded as _banded


class LMOps(NamedTuple):
    """The solver schedule abstracted over its linear-algebra engine.

    The LM damping loop (accept/reject, u/v schedule, truncated PCG) is
    identical whether the normal equations live on one device or are
    pose-partitioned over a mesh; only these six operations differ.  The
    single-device engine is `_windowed_ops`; the pose-sharded engine
    (parallel/pose_sharded.py) swaps in halo-exchanging variants and a
    psum'd dot so the SAME loop body runs as one SPMD program.

    evaluate: (R, p) -> (res, J_flat, diagH_flat, parts)
    residual: (R, p) -> scalar trial cost
    matvec:   (parts, Dd_flat, u, v_flat) -> (H + u diag(Dd)) v, flat
    precond:  (parts, u, Dd_flat) -> (n_local, 6, 6) block-Jacobi blocks
    dot:      global inner product (psum'd when sharded)
    update:   (R, p, dx_flat) -> trial poses (left perturbation)
    reduce_min: global min of a local flat array (None -> jnp.min);
              psum-style pmin when pose-sharded so the tau-shift damping
              is replicated-consistent.
    direct:   optional EXACT direct solve (parts, Dd_flat, u, J_flat)
              -> (dx_flat, ok) — the block-tridiagonal banded Cholesky
              (solver/banded.py) on single-device engines; selected by
              linear_solver='banded'.
    """

    evaluate: Callable[..., Any]
    residual: Callable[..., Any]
    matvec: Callable[..., Any]
    precond: Callable[..., Any]
    dot: Callable[..., Any]
    update: Callable[..., Any]
    reduce_min: Any = None
    direct: Any = None


class LargeLMResult(NamedTuple):
    R: jnp.ndarray
    p: jnp.ndarray
    residual: jnp.ndarray
    iters: jnp.ndarray
    trace_res1: jnp.ndarray
    trace_res2: jnp.ndarray
    trace_u: jnp.ndarray
    trace_accept: jnp.ndarray
    trace_cg: jnp.ndarray     # CG iterations used per LM iteration


def _chol6(A):
    """Batched 6x6 Cholesky (vmapped jnp is fine at this size)."""
    return jax.vmap(jnp.linalg.cholesky)(A)


def _inv6(A):
    """Batched symmetrized 6x6 inverse for the block-Jacobi preconditioner.

    The preconditioner is applied EVERY CG iteration; on TPU, batched
    triangular solves lower to serial code (~0.6 ms per application at
    W=177 — measured dominating the whole CG solve), while a precomputed
    explicit inverse applies as unrolled FMAs in ~microseconds.  M^-1
    only steers CG (any SPD approximation is valid), so inverse roundoff
    is harmless; symmetrization keeps it an exact CG preconditioner.
    """
    Minv = jax.vmap(jnp.linalg.inv)(A)
    return 0.5 * (Minv + jnp.swapaxes(Minv, -1, -2))


def _precond_apply(Minv, r):
    """z = M^-1 r via the cached block inverses; r flat (6W,)."""
    W = Minv.shape[0]
    return smallmat.matvec(Minv, r.reshape(W, 6)).reshape(-1)


def _pcg(matvec, b, Minv, max_iters, tol, dot=jnp.vdot):
    """Preconditioned CG for A x = b; returns (x, iterations).

    Minv: (W, 6, 6) block-Jacobi inverse blocks (see _inv6).
    All inner products go through `dot` so a pose-sharded caller can make
    them global (psum) while the iterates stay device-local.
    """
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = _precond_apply(Minv, r0)
    p0 = z0
    rz0 = dot(r0, z0)
    bnorm = jnp.sqrt(dot(b, b))

    def cond(carry):
        _, r, _, _, k, ok = carry
        return ok & (k < max_iters) & (jnp.sqrt(dot(r, r)) > tol * bnorm)

    def body(carry):
        x, r, p, rz, k, _ = carry
        Ap = matvec(p)
        pAp = dot(p, Ap)
        # truncated CG: stop at non-positive curvature and keep the
        # partial step (x may be 0 -> LM rejects and raises u, the same
        # protection the reference's LDLT gets from the damping loop)
        posdef = pAp > 0
        alpha = jnp.where(posdef, rz / jnp.where(posdef, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = _precond_apply(Minv, r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return x, r, p, rz_new, k + 1, posdef

    x, r, _, _, k, ok = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, jnp.asarray(0, jnp.int32),
                     jnp.asarray(True)))
    return x, k


def windowed_ops(wf: FW.WindowedFactors, W: int,
                 supernode: int | None = None, edges=None) -> LMOps:
    """Single-device (or GSPMD plane-sharded) engine over WindowedFactors.

    edges: optional ops.pose_graph.RelPoseEdges — SE(3) relative-pose
    factors added to the plane cost (the hierarchy's inter-block
    consensus constraints, or odometry priors that pin corridor-class
    null modes).  Every edge must satisfy i < j and j - i < span so its
    Hessian blocks stay inside the band.
    """
    B = max(int(wf.span), 1) if supernode is None else int(supernode)
    if edges is not None:
        from ..ops import pose_graph as PG
        S = int(wf.span)
        ei = edges.i
        ej = edges.j

    def evaluate(R, p):
        parts = FW.evaluate_windowed(R, p, wf)
        diagH = FW.hess_diag(parts, W)
        res = parts.res
        J = parts.J
        if edges is not None:
            eres, g, h = PG.evaluate_relpose_blocks(R, p, edges)
            res = res + eres.astype(res.dtype)
            J = J.at[ei].add(g[:, :6].astype(J.dtype)).at[ej].add(
                g[:, 6:].astype(J.dtype))
            dii = jnp.diagonal(h[:, :6, :6], axis1=-2, axis2=-1)
            djj = jnp.diagonal(h[:, 6:, 6:], axis1=-2, axis2=-1)
            diagH = diagH.at[ei].add(dii.astype(diagH.dtype)).at[ej].add(
                djj.astype(diagH.dtype))
            parts = (parts, h)
        return res, J.reshape(-1), diagH.reshape(-1), parts

    def residual(R, p):
        res = FW.residual_only_windowed(R, p, wf)
        if edges is not None:
            res = res + PG.relpose_cost(R, p, edges).astype(res.dtype)
        return res

    def matvec(parts, Dd, u, v):
        v2 = v.reshape(W, 6)
        if edges is not None:
            parts, h = parts
        out = FW.hvp(parts, v2, W)
        if edges is not None:
            hi = (jnp.einsum("eab,eb->ea", h[:, :6, :6], v2[ei])
                  + jnp.einsum("eab,eb->ea", h[:, :6, 6:], v2[ej]))
            hj = (jnp.einsum("eab,eb->ea", h[:, 6:, :6], v2[ei])
                  + jnp.einsum("eab,eb->ea", h[:, 6:, 6:], v2[ej]))
            out = out.at[ei].add(hi.astype(out.dtype)).at[ej].add(
                hj.astype(out.dtype))
        return (out + u * Dd.reshape(W, 6) * v2).reshape(-1)

    def precond(parts, u, Dd):
        if edges is not None:
            parts, h = parts
        A = FW.block_jacobi(parts, W, 0.0)
        if edges is not None:
            A = A.at[ei].add(h[:, :6, :6].astype(A.dtype)).at[ej].add(
                h[:, 6:, 6:].astype(A.dtype))
        return A + u * Dd.reshape(W, 6)[..., None] * jnp.eye(
            6, dtype=A.dtype)

    def update(R, p, dx):
        return lie.se3_left_update(R, p, dx.reshape(-1, 6))

    def direct(parts, Dd, u, J):
        if edges is not None:
            parts, h = parts
        Hband = FW.band_hessian(parts, W)
        if edges is not None:
            hd = Hband.dtype
            Hband = (Hband
                     .at[ei, 0].add(h[:, :6, :6].astype(hd))
                     .at[ej, 0].add(h[:, 6:, 6:].astype(hd))
                     .at[ei, ej - ei].add(h[:, :6, 6:].astype(hd)))
        damp = (u * Dd.reshape(W, 6))[..., None] * jnp.eye(
            6, dtype=Hband.dtype)
        return _banded.solve_banded(Hband.at[:, 0].add(damp), -J, B)

    return LMOps(evaluate=evaluate, residual=residual, matvec=matvec,
                 precond=precond, dot=jnp.vdot, update=update,
                 reduce_min=jnp.min, direct=direct)


def damping_iter_large(R, p, wf: FW.WindowedFactors,
                       cfg: SolverConfig = SolverConfig(),
                       *, cg_iters: int = 100, cg_tol: float = 1e-4,
                       linear_solver: str = "banded", edges=None):
    """LM loop over WindowedFactors; same schedule as solver/lm.py
    (bavoxel.hpp:1069-1166) with the dense solve replaced by the
    block-tridiagonal banded Cholesky (linear_solver='banded', default:
    EXACT dense-quality steps, O(W span^2) — solver/banded.py) or the
    block-Jacobi PCG ('pcg': matrix-free, the multi-chip engine).

    edges: optional ops.pose_graph.RelPoseEdges folded into cost /
    gradient / Hessian (see windowed_ops); requires i < j, j - i < span
    (checked host-side here)."""
    if edges is not None:
        import numpy as _np

        ei = _np.asarray(edges.i)
        ej = _np.asarray(edges.j)
        if ei.size and not (_np.all(ei < ej)
                            and _np.all(ej - ei < wf.span)):
            raise ValueError(
                "edges must satisfy i < j and j - i < span "
                f"(span={wf.span}); got max j-i={int((ej-ei).max())}")
    return _damping_iter_large_jit(
        R, p, wf, cfg.max_iters, cfg.u_init, cfg.v_init, cfg.rel_tol,
        cfg.abs_tol, cfg.gauge_fix, cg_iters, cg_tol, linear_solver,
        getattr(cfg, "ulp_tol", 128.0), edges)


@functools.partial(jax.jit, static_argnums=(3, 7, 8, 9, 10, 11, 12))
def _damping_iter_large_jit(R, p, wf, max_iters, u_init, v_init, rel_tol,
                            abs_tol, gauge_fix, cg_iters, cg_tol,
                            linear_solver="pcg", ulp_tol=128.0,
                            edges=None):
    W = R.shape[0]
    ops = windowed_ops(wf, W, edges=edges)
    with jax.default_matmul_precision("float32"):
        c = lm_loop(ops, R, p, max_iters, u_init, v_init, rel_tol,
                    abs_tol, cg_iters, cg_tol,
                    linear_solver=linear_solver, ulp_tol=ulp_tol)
        Rf, pf = c.R, c.p
        if gauge_fix:
            Rf, pf = lie.gauge_fix(Rf, pf)
        final_res = jax.lax.cond(
            c.it > 0, lambda: c.res1,
            lambda: ops.residual(c.R, c.p))
        return LargeLMResult(
            R=Rf, p=pf, residual=final_res, iters=c.it,
            trace_res1=c.t_res1, trace_res2=c.t_res2, trace_u=c.t_u,
            trace_accept=c.t_acc, trace_cg=c.t_cg)


class _Carry(NamedTuple):
    R: jnp.ndarray
    p: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    res1: jnp.ndarray
    J: jnp.ndarray
    diagH: jnp.ndarray
    parts: Any
    calc_hess: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    t_res1: jnp.ndarray
    t_res2: jnp.ndarray
    t_u: jnp.ndarray
    t_acc: jnp.ndarray
    t_cg: jnp.ndarray


def lm_loop(ops: LMOps, R, p, max_iters, u_init, v_init, rel_tol, abs_tol,
            cg_iters, cg_tol, linear_solver: str = "pcg",
            ulp_tol: float = 128.0) -> "_Carry":
    """The damping loop over an abstract engine (see LMOps).

    R/p may be device-local pose blocks (pose-sharded caller) — every
    cross-pose reduction goes through ops.*, and all branch decisions
    (accept, stop, finiteness) derive from ops.dot / ops.residual
    scalars, so the control flow is replicated-consistent under SPMD.
    """
    dtype = R.dtype
    one_three = jnp.asarray(1.0 / 3.0, dtype)

    def body(c: _Carry) -> _Carry:
        # reject-reuse: recompute the (expensive) Hessian parts only
        # after an accepted step, exactly like the dense loop
        # (bavoxel.hpp:1134-1149 / solver/lm.py)
        res1, J, diagH, parts = jax.lax.cond(
            c.calc_hess,
            lambda: ops.evaluate(c.R, c.p),
            lambda: (c.res1, c.J, c.diagH, c.parts),
        )

        # tau-shift damping (see solver/lm.py): the exact Newton diag
        # can go negative near degenerate clusters, and H + u diag(H)
        # then NEVER becomes PD -> every step fails and the loop stalls
        # (the round-4 large-W failure mode).  A uniform shift at the
        # scale of the most negative entry is bit-identical to the
        # reference schedule (bavoxel.hpp:1113) for all-positive diags
        # and makes the damped system eventually PD otherwise.  The min
        # is a GLOBAL reduction (pmin when pose-sharded) so control flow
        # stays replicated.
        rmin = ops.reduce_min if ops.reduce_min is not None else jnp.min
        tau = 2.0 * jnp.maximum(-rmin(diagH), 0.0)
        Dd = diagH + tau

        def matvec(v):
            return ops.matvec(parts, Dd, c.u, v)

        if linear_solver == "banded":
            dx, _ok = ops.direct(parts, Dd, c.u, J)
            k_cg = jnp.asarray(0, jnp.int32)
        else:
            Ablk = ops.precond(parts, c.u, Dd)
            # guard: if a block is not SPD / singular (far-from-optimum
            # exact Newton), fall back to identity preconditioning for
            # that block.  SPD check via Cholesky (NaN rows on
            # indefinite blocks), then a precomputed explicit inverse so
            # each CG application is unrolled FMAs, not serial
            # triangular solves (see _inv6).
            L = _chol6(Ablk)
            bad = ~jnp.all(jnp.isfinite(L), axis=(-2, -1))
            eye = jnp.eye(6, dtype=dtype)
            Minv = _inv6(jnp.where(bad[:, None, None], eye, Ablk))
            Minv = jnp.where(
                jnp.all(jnp.isfinite(Minv), axis=(-2, -1))[:, None, None],
                Minv, eye)

            dx, k_cg = _pcg(matvec, -J, Minv, cg_iters, cg_tol,
                            dot=ops.dot)
        # global finiteness: a NaN/Inf anywhere poisons the dot (psum'd
        # when sharded), so every device zeroes its block together
        nsq = ops.dot(dx, dx)
        solve_ok = jnp.isfinite(nsq) & (nsq > 0)
        dx = jnp.where(jnp.isfinite(nsq), dx, jnp.zeros_like(dx))

        Rt, pt = ops.update(c.R, c.p, dx)
        q1 = 0.5 * ops.dot(dx, (c.u * Dd) * dx - J)
        res2 = ops.residual(Rt, pt)

        q = res1 - res2
        # res2 <= 0 is numerically impossible for a sum of PSD-eigenvalue
        # costs: it means the trial poses left the region where the f32
        # centered evaluation is trustworthy -> reject (u grows, the next
        # step is shorter).  Without this guard one wild step along a
        # weakly-constrained mode "wins" with a garbage negative cost.
        accept = (q > 0) & jnp.isfinite(res2) & (res2 > 0)

        rho = q / q1
        shrink = 1.0 - (2.0 * rho - 1.0) ** 3
        u_acc = c.u * jnp.maximum(one_three, shrink)
        u_rej = c.u * c.v
        v_new = jnp.where(accept, 2.0, 2.0 * c.v)
        u_new = jnp.where(accept, u_acc, u_rej)

        Rn = jnp.where(accept, Rt, c.R)
        pn = jnp.where(accept, pt, c.p)
        res1n = jnp.where(accept, res2, res1)

        rel = jnp.abs(res1 - res2) / jnp.maximum(res1, 1e-30)
        stop = rel < rel_tol
        if abs_tol > 0:
            stop = stop | (jnp.abs(res1 - res2) < abs_tol)
        if ulp_tol > 0:
            # f32 floor: the trial delta is reduction-order dither
            stop = stop | (jnp.abs(res1 - res2)
                           < ulp_tol * jnp.finfo(dtype).eps
                           * jnp.abs(res1))
        # a failed/zero solve must NOT read as convergence (res2 == res1
        # -> rel == 0): re-damp instead.  J == 0 exactly (true optimum)
        # still stops.
        stop = stop & (solve_ok | (ops.dot(J, J) == 0))
        # damping overflow -> numerically-zero steps forever: stop
        stop = stop | (u_new > 1e30) | ~jnp.isfinite(u_new)

        i = c.it
        return _Carry(
            R=Rn, p=pn, u=u_new, v=v_new, res1=res1n,
            J=J, diagH=diagH, parts=parts, calc_hess=accept,
            it=i + 1, done=stop,
            t_res1=c.t_res1.at[i].set(res1),
            t_res2=c.t_res2.at[i].set(res2),
            t_u=c.t_u.at[i].set(c.u),
            t_acc=c.t_acc.at[i].set(accept.astype(dtype)),
            t_cg=c.t_cg.at[i].set(k_cg),
        )

    def cond(c: _Carry):
        return (~c.done) & (c.it < max_iters)

    nan = jnp.full((max_iters,), jnp.nan, dtype)
    shapes = jax.eval_shape(ops.evaluate, R, p)
    _, J0, dH0, parts0 = jax.tree.map(
        lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes)
    init = _Carry(
        R=R, p=p,
        u=jnp.asarray(u_init, dtype), v=jnp.asarray(v_init, dtype),
        res1=jnp.asarray(jnp.inf, dtype),
        J=J0, diagH=dH0, parts=parts0,
        calc_hess=jnp.asarray(True),
        it=jnp.asarray(0, jnp.int32), done=jnp.asarray(False),
        t_res1=nan, t_res2=nan, t_u=nan, t_acc=nan,
        t_cg=jnp.zeros((max_iters,), jnp.int32),
    )
    return jax.lax.while_loop(cond, body, init)
