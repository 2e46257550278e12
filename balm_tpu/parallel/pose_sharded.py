"""Pose-axis-partitioned large-window LM: the distributed-Schur story.

solver/large.py scales the factor data by sharding the PLANE axis with
poses replicated — fine while 6W floats fit everywhere, but the pose
state, gradient, preconditioner, and every CG iterate are still O(W) per
device.  This module partitions the POSE axis itself, the regime the
reference cannot reach at all (its solve is one dense LDLT on a
replicated (6W, 6W), bavoxel.hpp:1113-1114):

  * Device d owns the contiguous pose block [d*Wb, (d+1)*Wb) and every
    plane whose observation span STARTS in that block (planes are
    span-compressed and sorted by base — ops/factors_windowed.py).
  * A span may run at most S poses past the block edge, so each device
    keeps a READ halo of the S poses after its block, fetched from the
    right neighbor with one `ppermute` per evaluation, and returns the
    gradient / diag-block / Hv contributions it produced for those halo
    poses with one reverse `ppermute` (a fold-add).  Communication per CG
    iteration is 2 neighbor messages of O(S) — it rides ICI, never DCN,
    and is independent of W.
  * All solver decisions (CG α/β, LM accept, stopping) derive from
    psum'd scalars, so the whole damping loop — solver/large.py's
    `lm_loop` over an LMOps engine — runs as ONE SPMD program inside
    shard_map; per-device memory is O(W/D + S + G_d·S).

Equality with the replicated solver holds up to floating-point
reassociation of the pose-axis reductions (halo fold + psum'd dots,
~1e-13 relative in f64) — tests/test_pose_sharded.py asserts full-loop
trajectory and accept-schedule agreement on an 8-device mesh for a
well-posed problem with converged CG, plus engine-level (evaluate /
matvec / precond) agreement on an ill-posed one.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..config import SolverConfig
from ..ops import factors_windowed as FW
from ..ops import lie
from ..solver import large as L

POSE_AXIS = "pose"


def make_pose_mesh(n_devices=None, devices=None) -> Mesh:
    """1-D mesh over the pose axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (POSE_AXIS,))


class PoseShardedProblem(NamedTuple):
    """Host-prepared pose-partitioned problem (arrays are global views;
    shard on axis 0 with `P(POSE_AXIS)` — pose arrays are (D*Wb, ...),
    factor arrays (D*Gd, ...) in owner-major order with LOCAL base)."""

    R: jnp.ndarray          # (D*Wb, 3, 3) padded with identity
    p: jnp.ndarray          # (D*Wb, 3)
    wf: FW.WindowedFactors  # (D*Gd, ...) owner-major, base in [0, Wb)
    W: int                  # true pose count
    Wb: int                 # poses per device
    n: int                  # devices


def prepare(R, p, wf: FW.WindowedFactors, n: int) -> PoseShardedProblem:
    """Partition poses into n contiguous blocks and planes by owning block.

    Host-side (numpy), once per problem.  Requires span <= Wb so the halo
    only ever reaches the immediate right neighbor.
    """
    R = np.asarray(R)
    p = np.asarray(p)
    W = R.shape[0]
    S = wf.span
    Wb = -(-W // n)
    if S > Wb:
        raise ValueError(
            f"span {S} exceeds pose block {Wb}; use fewer devices or "
            f"cap the span (factors_windowed.from_dense(span=...))")

    Rp = np.tile(np.eye(3, dtype=R.dtype), (n * Wb, 1, 1))
    pp = np.zeros((n * Wb, 3), p.dtype)
    Rp[:W] = R
    pp[:W] = p

    base = np.asarray(wf.base)
    coe = np.asarray(wf.coe)
    owner = np.clip(base // Wb, 0, n - 1)
    owner = np.where(coe > 0, owner, 0)   # padding planes -> device 0
    valid = np.nonzero(coe > 0)[0]
    counts = np.bincount(owner[valid], minlength=n)
    Gd = max(int(counts.max()), 1)
    order = np.argsort(owner[valid], kind="stable")
    src = valid[order]                               # owner-major plane order
    ov = owner[src]
    slot = np.arange(src.size) - np.concatenate(
        [[0], np.cumsum(counts)])[:-1][ov]           # rank within owner
    dest = ov * Gd + slot

    def scatter(x):
        x = np.asarray(x)
        out = np.zeros((n * Gd,) + x.shape[1:], x.dtype)
        out[dest] = x[src]
        return out

    C = scatter(wf.C)
    base_l = scatter(base - owner * Wb).astype(np.int32)
    wf_sh = FW.WindowedFactors(
        C=jnp.asarray(C),
        base=jnp.asarray(base_l),
        coe=jnp.asarray(scatter(coe)),
        centers=jnp.asarray(scatter(wf.centers)),
        body_centers=jnp.asarray(scatter(wf.body_centers)),
        Cfix=jnp.asarray(scatter(wf.Cfix)),
    )
    return PoseShardedProblem(
        R=jnp.asarray(Rp), p=jnp.asarray(pp), wf=wf_sh, W=W, Wb=Wb, n=n)


def _pose_sharded_ops(wf_loc: FW.WindowedFactors, Wb: int, n: int) -> L.LMOps:
    """The LMOps engine seen by one device inside shard_map."""
    S = wf_loc.span
    We = Wb + S
    fwd = [(d, d + 1) for d in range(n - 1)]   # fold: recv from LEFT
    bwd = [(d + 1, d) for d in range(n - 1)]   # halo: recv from RIGHT

    def halo_ext(x):
        """(Wb, ...) -> (Wb+S, ...): append right neighbor's first S rows
        (zeros on the last device — only padding slots reference them)."""
        if n == 1:
            recv = jnp.zeros((S,) + x.shape[1:], x.dtype)
        else:
            recv = lax.ppermute(x[:S], POSE_AXIS, bwd)
        return jnp.concatenate([x, recv], axis=0)

    def fold(x):
        """(Wb+S, ...) -> (Wb, ...): return the contributions this device
        produced for its halo poses to their owner and add the ones the
        left neighbor produced for ours."""
        if n == 1:
            return x[:Wb]
        recv = lax.ppermute(x[Wb:], POSE_AXIS, fwd)
        return x[:Wb].at[:S].add(recv)

    def psum(x):
        return lax.psum(x, POSE_AXIS) if n > 1 else x

    def evaluate(Rl, pl):
        parts = FW.evaluate_windowed(halo_ext(Rl), halo_ext(pl), wf_loc)
        res = psum(parts.res)
        J = fold(parts.J)
        D = fold(parts.D)
        diagH = fold(FW.hess_diag(parts, We))
        # keep the UNFOLDED parts for Hv (rank rows are plane-local) but
        # swap in the folded diag blocks for the per-pose D·v term
        return res, J.reshape(-1), diagH.reshape(-1), (parts, D)

    def residual(Rl, pl):
        return psum(
            FW.residual_only_windowed(halo_ext(Rl), halo_ext(pl), wf_loc))

    def matvec(state, diagH, u, v):
        parts, D = state
        v2 = v.reshape(Wb, 6)
        ve = halo_ext(v2)
        # rank part over the extended window (hvp also adds parts.D @ v —
        # subtract it and apply the folded D locally instead, so the
        # D·v term is not double-counted through the fold)
        hv = FW.hvp(parts, ve, We) - jnp.einsum(
            "wij,wj->wi", parts.D, ve)
        out = fold(hv) + jnp.einsum("wij,wj->wi", D, v2)
        return (out + u * diagH.reshape(Wb, 6) * v2).reshape(-1)

    def precond(state, u, Dd):
        parts, _ = state
        # the damped term is per-pose local: add it AFTER the fold so
        # halo rows are not double-damped
        A = fold(FW.block_jacobi(parts, We, 0.0))
        return A + u * Dd.reshape(Wb, 6)[..., None] * jnp.eye(
            6, dtype=A.dtype)

    def dot(a, b):
        return psum(jnp.vdot(a, b))

    def reduce_min(x):
        m = jnp.min(x)
        return lax.pmin(m, POSE_AXIS) if n > 1 else m

    def update(Rl, pl, dx):
        return lie.se3_left_update(Rl, pl, dx.reshape(Wb, 6))

    return L.LMOps(evaluate=evaluate, residual=residual, matvec=matvec,
                   precond=precond, dot=dot, update=update,
                   reduce_min=reduce_min)


def damping_iter_pose_sharded(
        prob: PoseShardedProblem, mesh: Mesh,
        cfg: SolverConfig = SolverConfig(),
        *, cg_iters: int = 100, cg_tol: float = 1e-4) -> L.LargeLMResult:
    """Run the full LM loop as one SPMD program over the pose mesh."""
    n, Wb, W = prob.n, prob.Wb, prob.W
    assert mesh.devices.size == n

    sh_pose = NamedSharding(mesh, P(POSE_AXIS))
    R = jax.device_put(prob.R, sh_pose)
    p = jax.device_put(prob.p, sh_pose)
    wf = jax.tree.map(lambda x: jax.device_put(x, sh_pose), prob.wf)

    def run(R, p, wf_loc):
        ops = _pose_sharded_ops(wf_loc, Wb, n)
        with jax.default_matmul_precision("float32"):
            c = L.lm_loop(ops, R, p, cfg.max_iters, cfg.u_init, cfg.v_init,
                          cfg.rel_tol, cfg.abs_tol, cg_iters, cg_tol)
            final_res = jax.lax.cond(
                c.it > 0, lambda: c.res1, lambda: ops.residual(c.R, c.p))
        return (c.R, c.p, final_res, c.it, c.t_res1, c.t_res2, c.t_u,
                c.t_acc, c.t_cg)

    spec_wf = jax.tree.map(lambda _: P(POSE_AXIS), prob.wf)
    fn = jax.jit(shard_map(
        run, mesh=mesh,
        in_specs=(P(POSE_AXIS), P(POSE_AXIS), spec_wf),
        out_specs=(P(POSE_AXIS), P(POSE_AXIS)) + (P(),) * 7,
        check_vma=False,  # psum'd scalars are replicated by construction
    ))
    Rf, pf, res, it, t1, t2, tu, ta, tc = fn(R, p, wf)
    Rf, pf = Rf[:W], pf[:W]
    if cfg.gauge_fix:
        Rf, pf = lie.gauge_fix(Rf, pf)
    return L.LargeLMResult(
        R=Rf, p=pf, residual=res, iters=it, trace_res1=t1, trace_res2=t2,
        trace_u=tu, trace_accept=ta, trace_cg=tc)
