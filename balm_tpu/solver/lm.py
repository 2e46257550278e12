"""Damped Newton / Levenberg-Marquardt loop over SE(3) pose windows.

Functional, jit-compiled re-design of the reference's `BALM2::damping_iter`
(src/benchmark/bavoxel.hpp:1069-1166; virtual variant
src/benchmark/benchmark_virtual.cpp:375-482; consistency variant
src/simulation/BAs_left.hpp:1025-1098).  The accept/reject algebra, damping
schedule and stopping rules match the reference exactly so iteration traces
are comparable:

  * solve (H + u D) dx = -J with D = diag(H)        (bavoxel.hpp:1113-1114)
  * LEFT update R' = Exp(dw) R, p' = Exp(dw) p + dt (bavoxel.hpp:1122-1125)
  * gain ratio rho = (res1 - res2)/q1, q1 = 0.5 dx.(u D dx - J)
  * accept: u *= max(1/3, 1 - (2 rho - 1)^3), v = 2, recompute Hessian
  * reject: u *= v, v *= 2, reuse Hessian          (bavoxel.hpp:1134-1149)
  * stop when |res1 - res2| / res1 < rel_tol (or < abs_tol)

Differences by design:
  * degeneracy is a returned status, not exit(0) (bavoxel.hpp:1079-1085)
  * the per-iteration printf trace (bavoxel.hpp:1132) becomes fixed-size
    trace arrays in LMResult
  * the 4-thread Hessian assembly (bavoxel.hpp:1025-1059) is inside the
    factor kernel: sharding the plane axis over a device mesh makes XLA
    insert the psum that replaces thread::join + matrix add.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverConfig
from ..ops import factors as F
from ..ops import lie


class LMResult(NamedTuple):
    R: jnp.ndarray            # (W, 3, 3) refined rotations
    p: jnp.ndarray            # (W, 3) refined translations
    residual: jnp.ndarray     # final accepted cost
    iters: jnp.ndarray        # LM iterations executed
    degenerate: jnp.ndarray   # bool: some pose saw < min_planes_per_pose
    trace_res1: jnp.ndarray   # (max_iters,) cost before step (nan = unused)
    trace_res2: jnp.ndarray   # (max_iters,) trial cost
    trace_u: jnp.ndarray      # (max_iters,) damping
    trace_accept: jnp.ndarray  # (max_iters,) 1.0 accepted / 0.0 rejected


class _Carry(NamedTuple):
    R: jnp.ndarray
    p: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray
    res1: jnp.ndarray
    H: jnp.ndarray
    J: jnp.ndarray
    calc_hess: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    t_res1: jnp.ndarray
    t_res2: jnp.ndarray
    t_u: jnp.ndarray
    t_acc: jnp.ndarray


def damping_iter(R, p, f: F.PlaneFactors, cfg: SolverConfig = SolverConfig(),
                 *, centered: bool = False, use_lapack_eigh: bool = False,
                 update: str = "left", linear_solver: str = "cholesky",
                 backend: str = "xla", edges=None,
                 pcg_iters: int = 0, pcg_tol: float = 1e-6,
                 hess_precision: str = "high", packed_impl: str = "auto",
                 chunk_planes: int = 0):
    """Run the LM loop. R (W,3,3), p (W,3), f: PlaneFactors.

    update: 'left' (production, bavoxel.hpp:1122-1125) or 'right'
    (the reference's alternative form, bavoxel.hpp:1108, 1118-1120;
    requires raw body moments and centered=False).
    linear_solver: 'cholesky' (direct; LU fallback when indefinite),
    'lu' (handles indefinite H + uD without relying on LM rejection;
    reference uses LDLT), or 'pcg' (block-Jacobi CG on the damped dense
    system — bypasses XLA's slow TPU triangular kernels; pcg_iters 0
    means min(6W, 400), pcg_tol is the relative residual stop).
    backend: 'xla' (ops/factors.py einsum evaluator) or 'packed' (alias
    'pallas': the packed lane-major fast path of ops/pallas_evaluate.py —
    channel-formulated moment/row assembly + MXU matmuls; requires
    centered=True, left update, float32, body-recentered factors).  The
    packed path has no window-size limit (its Hessian is an HBM matmul);
    it is the TPU production path at every dense-solver scale.
    edges: optional ops.pose_graph.RelPoseEdges — SE(3) relative-pose
    factors added to the plane cost (the hierarchical pipeline's
    inter-block constraints); requires update='left'.
    hess_precision (packed backend only): matmul precision for the
    Hessian rank-row product — 'high' (3-pass bf16x3, default: H relerr
    ~2e-6 vs exact-f32, measured convergence-identical), 'highest'
    (6-pass exact f32), or 'bf16' (1-pass, ~1e-4 relerr).  J and the
    residual always use exact-f32 channel sums.
    packed_impl (packed backend only): 'xla' (channel formulation, the
    default), 'pallas2' (the fused VMEM-rows kernel), or 'pallas3' (the
    pose-block-pair grid — VMEM bounded at ANY window size; pallas2
    auto-upgrades to it past Wp ~ 680).  HONEST-SYNC CORRECTION
    (artifacts/roofline.json, round 3): with the fetch-synced slope
    protocol the fused kernels measure SLOWER than the XLA channel
    formulation at W>=512 (pallas3 0.176 s vs xla 0.140 s per evaluate
    at W=1024/G=16k) — the earlier 'fused 1.3-1.5x faster device-side'
    numbers in artifacts/tpu_dense_scale.json were enqueue-acknowledge
    timings.  'xla' is the production choice everywhere; the Pallas
    kernels remain as independent implementations for equality testing
    and as the VMEM-bounded fallback.
    """
    if update == "right" and centered:
        raise ValueError("right update requires centered=False")
    if edges is not None and update != "left":
        raise ValueError("pose-graph edges require the left update")
    if packed_impl == "auto":
        # 'hybrid' (Pallas rows + XLA dot, consumed in its natural
        # (j,w)-major layout) wins 1.4-1.8x on real TPU once the window
        # is large enough for the rows assembly to matter (W >= ~256,
        # artifacts/mfu_hybrid_jw.json); at W=177 it ties xla (16.8 vs
        # 16.0 ms/solve), and on CPU the interpreted kernel would crawl
        packed_impl = ("hybrid"
                       if (jax.default_backend() == "tpu"
                           and int(R.shape[0]) >= 256)
                       else "xla")
    if backend in ("pallas", "packed"):
        backend = "pallas"
        if not centered or update != "left":
            raise ValueError(
                "packed backend requires centered=True, left update")
        if R.dtype != jnp.float32:
            raise ValueError("packed backend is the float32 fast path")
    pallas_interpret = jax.default_backend() != "tpu"
    return _damping_iter_jit(
        R, p, f,
        cfg.max_iters, cfg.u_init, cfg.v_init, cfg.rel_tol, cfg.abs_tol,
        cfg.min_planes_per_pose, cfg.gauge_fix, centered, use_lapack_eigh,
        update, linear_solver, backend, pallas_interpret, edges,
        pcg_iters, pcg_tol, hess_precision, packed_impl, chunk_planes,
        getattr(cfg, "ulp_tol", 128.0),
    )


@functools.partial(
    jax.jit,
    static_argnums=(3, 7, 9, 10, 11, 12, 13, 14, 15, 17, 18, 19, 20, 21,
                    22))
def _damping_iter_jit(R, p, f, max_iters, u_init, v_init, rel_tol, abs_tol,
                      min_planes, gauge_fix, centered, use_lapack_eigh,
                      update, linear_solver, backend="xla",
                      pallas_interpret=False, edges=None,
                      pcg_iters=0, pcg_tol=1e-6, hess_precision="high",
                      packed_impl="xla", chunk_planes=0, ulp_tol=128.0):
    # full f32 matmul precision for EVERYTHING in the loop: on TPU the
    # default runs matmuls (pose composition, triangular solves) in bf16,
    # which silently degrades steps and stalls convergence ~0.1% above
    # the true optimum.
    with jax.default_matmul_precision("float32"):
        return _damping_iter_body(
            R, p, f, max_iters, u_init, v_init, rel_tol, abs_tol,
            min_planes, gauge_fix, centered, use_lapack_eigh,
            update, linear_solver, backend, pallas_interpret, edges,
            pcg_iters, pcg_tol, hess_precision, packed_impl,
            chunk_planes, ulp_tol)


def _blocks6(A, W):
    """(6W, 6W) -> (W, 6, 6) diagonal blocks."""
    iw = jnp.arange(W)
    return A.reshape(W, 6, W, 6)[iw, :, iw, :]


def _build_loop(R, p, f, max_iters, u_init, v_init, rel_tol, abs_tol,
                min_planes, centered, use_lapack_eigh, update,
                linear_solver, backend="xla", pallas_interpret=False,
                edges=None, pcg_iters=0, pcg_tol=1e-6,
                hess_precision="high", packed_impl="xla",
                chunk_planes=0, ulp_tol=128.0):
    """Construct (cond, body, init, degenerate, eval_res) for the LM loop
    — shared by the fused while_loop solver and the host-stepped timed
    variant (honest per-iteration wall-clock for convergence curves)."""
    W = R.shape[0]
    dtype = R.dtype
    one_three = jnp.asarray(1.0 / 3.0, dtype)

    degenerate = jnp.min(f.planes_per_pose()) < min_planes

    jw_layout = False
    if backend == "pallas":
        from ..ops import packed as packed_mod
        from ..ops import pallas_evaluate as pe

        pkf = packed_mod.pack_factors(f)  # once per solve, reused every iter
        hp = {"highest": None, "high": jax.lax.Precision.HIGH,
              "bf16": jax.lax.Precision.DEFAULT}[hess_precision]

        jw_layout = (packed_impl == "hybrid" and edges is None
                     and chunk_planes == 0
                     # the pcg branch's block-Jacobi extraction
                     # (_blocks6) assumes (w,j)-major; in (j,w)-major
                     # the "pose blocks" would be scrambled cross-pose
                     # entries (advisor round-4 finding)
                     and linear_solver != "pcg")
        if jw_layout:
            # the hybrid backend's natural H layout is (j, w)-major;
            # consuming it directly saves the (6, Wp, 6, Wp) transpose
            # (~27 ms at W=1024 — more than the rows assembly).  Only
            # dx's per-pose reshape is layout-dependent (handled below).
            def eval_full_planes(R, p):
                return pe.evaluate_packed_jw(
                    R, p, pkf, interpret=pallas_interpret,
                    hess_precision=hp)

            def eval_res_planes(R, p):
                return pe.residual_only_packed(
                    R, p, pkf, interpret=pallas_interpret)
        elif chunk_planes > 0:
            # factor-chunked dense evaluate: scan over plane chunks so
            # the compiled body stays under the W=2048 one-program
            # VMEM/compile ceiling (pe.evaluate_packed_chunked)
            pkf = packed_mod.pad_planes(pkf, chunk_planes)
            n_chunks = pkf.gp // chunk_planes

            def eval_full_planes(R, p):
                return pe.evaluate_packed_chunked(
                    R, p, pkf, n_chunks=n_chunks, hess_precision=hp)

            def eval_res_planes(R, p):
                return pe.residual_only_packed_chunked(
                    R, p, pkf, n_chunks=n_chunks)
        else:
            def eval_full_planes(R, p):
                return pe.evaluate_packed(
                    R, p, pkf, interpret=pallas_interpret,
                    hess_precision=hp, impl=packed_impl)

            def eval_res_planes(R, p):
                return pe.residual_only_packed(
                    R, p, pkf, interpret=pallas_interpret)
    else:
        def eval_full_planes(R, p):
            T = lie.pose_matrix(R, p)
            if update == "right":
                return F.evaluate_right(T, f, use_lapack_eigh=use_lapack_eigh)
            return F.evaluate(
                T, f, centered=centered, use_lapack_eigh=use_lapack_eigh
            )

        def eval_res_planes(R, p):
            T = lie.pose_matrix(R, p)
            return F.residual_only(
                T, f, centered=centered, use_lapack_eigh=use_lapack_eigh
            )

    jw = jw_layout
    if edges is None:
        eval_full, eval_res = eval_full_planes, eval_res_planes
    else:
        from ..ops import pose_graph as PG

        def eval_full(R, p):
            res, J, H = eval_full_planes(R, p)
            r2, J2, H2 = PG.evaluate_relpose(R, p, edges)
            return (res + r2.astype(res.dtype), J + J2.astype(J.dtype),
                    H + H2.astype(H.dtype))

        def eval_res(R, p):
            res = eval_res_planes(R, p)
            return res + PG.relpose_cost(R, p, edges).astype(res.dtype)

    def body(c: _Carry) -> _Carry:
        res1, J, H = jax.lax.cond(
            c.calc_hess,
            lambda: eval_full(c.R, c.p),
            lambda: (c.res1, c.J, c.H),
        )
        D = jnp.diag(H)
        # Damping scale: FLOOR, don't reflect.  The EXACT Newton H can
        # carry negative diagonal entries near degenerate clusters (the
        # eigen-gap terms), and H + u*diag(D) with D_i < 0 never becomes
        # positive definite no matter how far LM raises u — the solve
        # then rejects forever (seen on the W=1536 corridor: diag min
        # -1.1e5).  Replacing only the non-positive entries with the
        # largest-|diag| scale keeps the D > 0 case bit-identical to the
        # reference's schedule (bavoxel.hpp:1113) while making A
        # diagonally dominant (hence eventually PD) after O(1) damping
        # doublings on indefinite problems.  round-4's max(|D|, eps)
        # reflected negative entries instead and changed behavior on
        # every indefinite-diagonal problem (it broke coarse-to-fine
        # recovery); see tests/test_solver.py negative-diag tests.
        tau = 2.0 * jnp.maximum(-jnp.min(D), 0.0)
        Dd = D + tau
        A = H + c.u * jnp.diag(Dd)
        # solve_ok: False when the linear solve produced no usable step
        # (failed Cholesky in the nofallback path, non-finite PCG).  A
        # zero step makes res2 == res1 and the rel-tol test would then
        # DECLARE CONVERGENCE on a solve that never happened — the
        # actual mechanism of the round-4 W=1536 "stall".  The stop
        # test below requires solve_ok so LM re-damps instead.
        solve_ok = jnp.asarray(True)
        if linear_solver == "cholesky_nofallback":
            # the pivoted-LU fallback's LuDecompositionBlock custom call
            # needs ~18 MB scoped VMEM at 6W = 12288 and stops compiling
            # (it sits in a lax.cond branch, so it must compile even if
            # never taken).  Without it, an indefinite H + uD yields a
            # non-finite Cholesky step -> dx = 0 -> the trial is
            # rejected and LM raises u, which is exactly the damping
            # loop's own recovery mechanism (one wasted iteration).
            L = jax.scipy.linalg.cho_factor(A, lower=True)
            dx_c = jax.scipy.linalg.cho_solve(L, -J)
            solve_ok = jnp.all(jnp.isfinite(dx_c))
            dx = jnp.where(solve_ok, dx_c, jnp.zeros_like(dx_c))
        elif linear_solver == "cholesky":
            # Cholesky is much faster than LU on TPU (no pivoting), but the
            # exact Newton H + uD can be indefinite far from the optimum
            # (the reference's LDLT handles that, bavoxel.hpp:1114).  Fast
            # path: factorize; if the step comes back non-finite, fall back
            # to the pivoted LU solve for this iteration only.
            L = jax.scipy.linalg.cho_factor(A, lower=True)
            dx_c = jax.scipy.linalg.cho_solve(L, -J)
            dx = jax.lax.cond(
                jnp.all(jnp.isfinite(dx_c)),
                lambda: dx_c,
                lambda: jnp.linalg.solve(A, -J),
            )
        elif linear_solver == "pcg":
            # Kept as an option, but measured SLOWER than the direct
            # Cholesky at every dense scale tried (W=177 and W=512,
            # artifacts/w512_solver_ab.json): XLA's blocked Cholesky runs
            # at ~1.2 TFLOP/s on TPU (~0.3 ms at 6W=1062, ~8 ms at 3072),
            # while each CG iteration is a chain of small sequential
            # kernels that are latency-bound (~5 ms/iteration).  (Earlier
            # notes claiming a 24 ms Cholesky were transfer-poisoned
            # timings — artifacts/transfer_poisoning.md.)
            from . import large as _large

            Ablk = _blocks6(A, W)
            eye = jnp.eye(6, dtype=A.dtype)
            Lb = _large._chol6(Ablk)
            bad = ~jnp.all(jnp.isfinite(Lb), axis=(-2, -1))
            Minv = _large._inv6(
                jnp.where(bad[:, None, None], eye, Ablk))
            Minv = jnp.where(
                jnp.all(jnp.isfinite(Minv), axis=(-2, -1))[:, None, None],
                Minv, eye)
            dx_c, _ = _large._pcg(lambda v: A @ v, -J, Minv,
                                  pcg_iters if pcg_iters > 0
                                  else min(6 * W, 400), pcg_tol)
            solve_ok = jnp.all(jnp.isfinite(dx_c))
            dx = jnp.where(solve_ok, dx_c, jnp.zeros_like(dx_c))
        else:
            dx = jnp.linalg.solve(A, -J)

        dxw = (dx.reshape(6, W).T if jw else dx.reshape(W, 6))
        if update == "right":
            Rt, pt = lie.se3_right_update(c.R, c.p, dxw)
        else:
            Rt, pt = lie.se3_left_update(c.R, c.p, dxw)
        q1 = 0.5 * jnp.dot(dx, c.u * Dd * dx - J)
        res2 = eval_res(Rt, pt)

        q = res1 - res2
        # reject non-finite or non-positive trial costs: the plane cost is
        # a sum of PSD-matrix eigenvalues, so res2 <= 0 can only mean the
        # f32 centered evaluation broke down at the trial point
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
            # f32-aware floor: the trial delta is within a few ULPs of
            # the cost itself — further iterations only chase f32
            # reduction-order dither (round-4: 2/10 consistency seeds
            # burned the 1000-iteration cap this way).  In f64 the floor
            # is ~1e-14 relative and never binds.
            stop = stop | (jnp.abs(res1 - res2)
                           < ulp_tol * jnp.finfo(dtype).eps
                           * jnp.abs(res1))
        stop = stop & solve_ok
        # damping overflow: u this large means the trust region has
        # shrunk to numerically-zero steps with nothing accepted (an
        # f32 evaluator-offset reject loop); continuing only overflows
        # u to inf and poisons the trace with NaNs
        stop = stop | (u_new > 1e30) | ~jnp.isfinite(u_new)

        i = c.it
        return _Carry(
            R=Rn, p=pn, u=u_new, v=v_new,
            res1=res1n, H=H, J=J,
            calc_hess=accept,
            it=i + 1,
            done=stop,
            t_res1=c.t_res1.at[i].set(res1),
            t_res2=c.t_res2.at[i].set(res2),
            t_u=c.t_u.at[i].set(c.u),
            t_acc=c.t_acc.at[i].set(accept.astype(dtype)),
        )

    def cond(c: _Carry):
        return (~c.done) & (c.it < max_iters) & (~degenerate)

    n6 = 6 * W
    nan = jnp.full((max_iters,), jnp.nan, dtype)
    init = _Carry(
        R=R, p=p,
        u=jnp.asarray(u_init, dtype), v=jnp.asarray(v_init, dtype),
        res1=jnp.asarray(0.0, dtype),
        H=jnp.zeros((n6, n6), dtype), J=jnp.zeros((n6,), dtype),
        calc_hess=jnp.asarray(True),
        it=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        t_res1=nan, t_res2=nan, t_u=nan, t_acc=nan,
    )
    return cond, body, init, degenerate, eval_res


def _finish(c: _Carry, degenerate, eval_res, gauge_fix):
    Rf, pf = c.R, c.p
    if gauge_fix:
        Rf, pf = lie.gauge_fix(Rf, pf)
    final_res = jax.lax.cond(
        c.it > 0, lambda: c.res1, lambda: eval_res(c.R, c.p)
    )
    return LMResult(
        R=Rf, p=pf, residual=final_res, iters=c.it,
        degenerate=degenerate,
        trace_res1=c.t_res1, trace_res2=c.t_res2,
        trace_u=c.t_u, trace_accept=c.t_acc,
    )


def _damping_iter_body(R, p, f, max_iters, u_init, v_init, rel_tol, abs_tol,
                       min_planes, gauge_fix, centered, use_lapack_eigh,
                       update, linear_solver, backend="xla",
                       pallas_interpret=False, edges=None,
                       pcg_iters=0, pcg_tol=1e-6, hess_precision="high",
                       packed_impl="xla", chunk_planes=0, ulp_tol=128.0):
    cond, body, init, degenerate, eval_res = _build_loop(
        R, p, f, max_iters, u_init, v_init, rel_tol, abs_tol, min_planes,
        centered, use_lapack_eigh, update, linear_solver, backend,
        pallas_interpret, edges, pcg_iters, pcg_tol, hess_precision,
        packed_impl, chunk_planes, ulp_tol)
    c = jax.lax.while_loop(cond, body, init)
    return _finish(c, degenerate, eval_res, gauge_fix)


def damping_iter_resumable(R, p, f: F.PlaneFactors,
                           cfg: SolverConfig = SolverConfig(), *,
                           state=None, chunk_iters: int = 0,
                           centered: bool = False, backend: str = "xla",
                           packed_impl: str = "xla", edges=None):
    """Run the LM loop in checkpointable chunks (SURVEY §5: real
    checkpoint/resume for preemptible multi-hour runs — the reference
    has none, state lives in RAM).

    Returns (LMResult, state): `state` is the COMPLETE mid-solve carry
    (poses, damping u/v, cached Hessian/gradient for the reject-reuse
    path, iteration counter, trace arrays) as host numpy arrays.
    Persist it with utils/checkpoint.save(..., **checkpoint.pack_lm_state
    (state)) and pass it back as `state=` (after checkpoint.
    unpack_lm_state) to continue EXACTLY where the solve stopped: the
    chunk boundary is invisible to the damping schedule, so chaining
    chunks reproduces damping_iter bit-for-bit (same _Carry transition;
    a converged carry passes through further chunks unchanged).

    chunk_iters: LM iterations per call (0 = run to cfg.max_iters in one
    chunk).  Each chunk is ONE jitted while_loop dispatch.
    """
    pallas_interpret = jax.default_backend() != "tpu"
    with jax.default_matmul_precision("float32"):
        cond, body, init, degenerate, eval_res = _build_loop(
            R, p, f, cfg.max_iters, cfg.u_init, cfg.v_init, cfg.rel_tol,
            cfg.abs_tol, cfg.min_planes_per_pose, centered, False,
            "left", "cholesky", backend, pallas_interpret, edges,
            packed_impl=packed_impl,
            ulp_tol=getattr(cfg, "ulp_tol", 128.0))

        if state is not None:
            init = _Carry(*[jnp.asarray(np.asarray(x)).astype(y.dtype)
                            for x, y in zip(_Carry(**state), init)])
        limit = (int(init.it) + chunk_iters if chunk_iters > 0
                 else cfg.max_iters)

        # the limit rides the carry (not the closure) so every chunk of a
        # solve reuses one compiled while_loop
        c, _ = jax.lax.while_loop(
            lambda cl: cond(cl[0]) & (cl[0].it < cl[1]),
            lambda cl: (body(cl[0]), cl[1]),
            (init, jnp.asarray(limit, jnp.int32)))
        res = _finish(c, degenerate, eval_res, cfg.gauge_fix)
    out_state = {k: np.asarray(v) for k, v in c._asdict().items()}
    return res, out_state


def damping_iter_timed(R, p, f: F.PlaneFactors,
                       cfg: SolverConfig = SolverConfig(), *,
                       centered: bool = False,
                       use_lapack_eigh: bool = False,
                       backend: str = "xla"):
    """LM with HONEST per-iteration wall-clock timestamps.

    Runs the identical loop body as damping_iter but stepped from the
    host, recording wall-clock after each device-synchronized iteration
    — the Supplementary 'time cost' convergence-curve protocol
    (Supplementary/data/readme.txt) requires real accepted-iteration
    times, not synthesized ones.  Returns (LMResult, times (iters,)
    seconds since solve start).
    """
    import time as _time

    pallas_interpret = jax.default_backend() != "tpu"
    with jax.default_matmul_precision("float32"):
        cond, body, init, degenerate, eval_res = _build_loop(
            R, p, f, cfg.max_iters, cfg.u_init, cfg.v_init, cfg.rel_tol,
            cfg.abs_tol, cfg.min_planes_per_pose, centered,
            use_lapack_eigh, "left", "cholesky", backend,
            pallas_interpret, None,
            ulp_tol=getattr(cfg, "ulp_tol", 128.0))

        # guarded step: a finished carry passes through unchanged, so the
        # host can dispatch a FIXED max_iters steps and read NOTHING
        # between them — through the axon tunnel a single host fetch
        # (even `bool(cond(c))`) degrades every later dispatch ~16x
        # (artifacts/transfer_poisoning.md), which would corrupt exactly
        # the per-iteration times this function exists to measure.
        @jax.jit
        def step(c):
            return jax.lax.cond(cond(c), body, lambda c: c, c)

        # warm up (compile) outside the timed region
        jax.block_until_ready(step(init))

        times = []
        c = init
        t0 = _time.perf_counter()
        for _ in range(cfg.max_iters):
            c = jax.block_until_ready(step(c))
            times.append(_time.perf_counter() - t0)
        res = _finish(c, degenerate, eval_res, cfg.gauge_fix)
        # keep only the timestamps of iterations that actually ran
        times = times[:int(res.iters)]
    return res, np.asarray(times)


def format_trace(result: LMResult) -> str:
    """Render the LM trace in the reference's comparable format
    (bavoxel.hpp:1132: `iter%d: (res1 res2) u: ...`)."""
    import numpy as np

    lines = []
    n = int(result.iters)
    for i in range(n):
        r1 = float(result.trace_res1[i])
        r2 = float(result.trace_res2[i])
        u = float(result.trace_u[i])
        acc = "accept" if result.trace_accept[i] > 0.5 else "reject"
        if np.isnan(r1):
            break
        lines.append(f"iter{i}: ({r1:.6f} {r2:.6f}) u: {u:.6f} {acc}")
    return "\n".join(lines)
