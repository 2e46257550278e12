"""Span-compressed factors must reproduce the dense evaluator exactly:
same residual/gradient, and the factored parts must reassemble to the
dense Hessian (H = -sum rows^T rows + blockdiag(D))."""

import jax
import jax.numpy as jnp
import numpy as np

from balm_tpu.ops import factors, factors_windowed as FW, lie

from test_factors import make_problem


def _centered_problem(seed=0, G=8, W=6, sparse_obs=True, with_fix=False):
    R, p, f, centers = make_problem(G=G, W=W, seed=seed,
                                    sparse_obs=sparse_obs, with_fix=with_fix)
    f = factors.recenter_bodies(f._replace(centers=centers))
    return R, p, f


def _dense_from_parts(parts, W):
    G, T, S, _ = parts.rows.shape
    idx = np.clip(np.asarray(parts.base)[:, None] + np.arange(S)[None, :],
                  0, W - 1)
    H = np.zeros((6 * W, 6 * W))
    rows = np.asarray(parts.rows)
    for g in range(G):
        cols = np.concatenate(
            [idx[g, s] * 6 + np.arange(6) for s in range(S)])
        r = rows[g].reshape(T, S * 6)
        H[np.ix_(cols, cols)] += -(r.T @ r)
    D = np.asarray(parts.D)
    for w in range(W):
        H[6 * w:6 * w + 6, 6 * w:6 * w + 6] += D[w]
    return H


def test_windowed_matches_dense_evaluate():
    R, p, f = _centered_problem(seed=21, with_fix=True)
    W = R.shape[0]
    T = lie.pose_matrix(R, p)
    res0, J0, H0 = factors.evaluate(T, f, centered=True)

    wf = FW.from_dense(f)
    parts = FW.evaluate_windowed(R, p, wf)
    assert abs(float(parts.res) - float(res0)) < 1e-9 * abs(float(res0))
    assert np.allclose(np.asarray(parts.J).reshape(-1), np.asarray(J0),
                       atol=1e-9 * float(jnp.max(jnp.abs(J0))))
    Hre = _dense_from_parts(parts, W)
    hs = float(jnp.max(jnp.abs(H0)))
    assert np.max(np.abs(Hre - np.asarray(H0))) < 1e-8 * hs

    r0 = factors.residual_only(T, f, centered=True)
    r1 = FW.residual_only_windowed(R, p, wf)
    assert abs(float(r0) - float(r1)) < 1e-10 * abs(float(r0))


def test_hvp_and_diag_match_dense():
    R, p, f = _centered_problem(seed=22)
    W = R.shape[0]
    T = lie.pose_matrix(R, p)
    _, _, H0 = factors.evaluate(T, f, centered=True)
    wf = FW.from_dense(f)
    parts = FW.evaluate_windowed(R, p, wf)

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(W, 6)))
    hv = FW.hvp(parts, v, W)
    hv_dense = (np.asarray(H0) @ np.asarray(v).reshape(-1)).reshape(W, 6)
    scale = np.max(np.abs(hv_dense)) + 1e-12
    assert np.max(np.abs(np.asarray(hv) - hv_dense)) < 1e-8 * scale

    dg = FW.hess_diag(parts, W)
    dg_dense = np.diag(np.asarray(H0)).reshape(W, 6)
    assert np.max(np.abs(np.asarray(dg) - dg_dense)) < 1e-8 * (
        np.max(np.abs(dg_dense)) + 1e-12)

    blocks = FW.block_jacobi(parts, W, jnp.asarray(0.0))
    for w in range(W):
        blk = np.asarray(H0)[6 * w:6 * w + 6, 6 * w:6 * w + 6]
        assert np.max(np.abs(np.asarray(blocks[w]) - blk)) < 1e-8 * (
            np.max(np.abs(blk)) + 1e-12)


def test_large_solver_matches_dense_lm():
    from balm_tpu.config import SolverConfig
    from balm_tpu.solver import large, lm

    R, p, f = _centered_problem(seed=23, G=10, W=6)
    rng = np.random.default_rng(4)
    # small perturbation: H + uD stays SPD, so tight CG must reproduce
    # the dense LM trajectory step for step
    dx = jnp.asarray(rng.normal(size=(R.shape[0], 6)) * 0.005)
    R0, p0 = lie.se3_left_update(R, p, dx)

    cfg = SolverConfig(max_iters=8, rel_tol=0.0, min_planes_per_pose=0)
    ra = lm.damping_iter(R0, p0, f, cfg, centered=True)
    wf = FW.from_dense(f)
    rb = large.damping_iter_large(R0, p0, wf, cfg,
                                  cg_iters=200, cg_tol=1e-12)
    # tight CG -> the same LM trajectory
    assert abs(float(ra.residual) - float(rb.residual)) < 1e-6 * abs(
        float(ra.residual)) + 1e-12
    assert float(jnp.max(jnp.abs(ra.p - rb.p))) < 1e-4


def test_large_solver_converges_from_rough_start():
    """With a big perturbation (indefinite exact-Newton H early on) the
    truncated-CG LM must still reach the dense optimum."""
    from balm_tpu.config import SolverConfig
    from balm_tpu.solver import large, lm

    R, p, f = _centered_problem(seed=25, G=10, W=6)
    rng = np.random.default_rng(7)
    dx = jnp.asarray(rng.normal(size=(R.shape[0], 6)) * 0.02)
    R0, p0 = lie.se3_left_update(R, p, dx)

    cfg = SolverConfig(max_iters=25, rel_tol=0.0, min_planes_per_pose=0)
    ra = lm.damping_iter(R0, p0, f, cfg, centered=True)
    wf = FW.from_dense(f)
    rb = large.damping_iter_large(R0, p0, wf, cfg,
                                  cg_iters=200, cg_tol=1e-10)
    assert abs(float(ra.residual) - float(rb.residual)) < 1e-3 * abs(
        float(ra.residual)) + 1e-10


def test_windowed_sharded_equals_single_device():
    """Plane-axis sharding (sorted by base == trajectory segments) must be
    numerically identical to the replicated computation."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    R, p, f = _centered_problem(seed=24, G=16, W=6)
    W = R.shape[0]
    wf = FW.from_dense(f)
    # sort by base pose (the locality-aware shard order)
    order = np.argsort(np.asarray(wf.base), kind="stable")
    wf = jax.tree.map(lambda x: x[jnp.asarray(order)], wf)

    parts0 = FW.evaluate_windowed(R, p, wf)

    ndev = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()), ("factor",))
    spec = NamedSharding(mesh, P("factor"))
    # pad plane axis to device multiple
    G = wf.num_planes
    Gp = -(-G // ndev) * ndev
    wfp = jax.tree.map(
        lambda x: jnp.zeros((Gp,) + x.shape[1:], x.dtype).at[:G].set(x), wf)
    wfs = jax.tree.map(lambda x: jax.device_put(x, spec), wfp)

    parts1 = FW.evaluate_windowed(R, p, wfs)
    assert abs(float(parts0.res) - float(parts1.res)) < 1e-9 * abs(
        float(parts0.res))
    assert np.allclose(np.asarray(parts0.J), np.asarray(parts1.J),
                       atol=1e-10 * float(jnp.max(jnp.abs(parts0.J)) + 1e-12))
    assert np.allclose(np.asarray(parts0.D), np.asarray(parts1.D),
                       atol=1e-9 * float(jnp.max(jnp.abs(parts0.D)) + 1e-12))

    v = jnp.asarray(np.random.default_rng(1).normal(size=(W, 6)))
    hv0 = FW.hvp(parts0, v, W)
    hv1 = FW.hvp(parts1, v, W)
    assert np.allclose(np.asarray(hv0), np.asarray(hv1),
                       atol=1e-9 * float(jnp.max(jnp.abs(hv0)) + 1e-12))


def test_band_hessian_matches_dense():
    """band_hessian must reproduce the dense Hessian exactly: the band IS
    the whole matrix (every factor spans <= S contiguous poses)."""
    R, p, f = _centered_problem(seed=26, G=12, W=8)
    W = R.shape[0]
    T = lie.pose_matrix(R, p)
    _, _, H0 = factors.evaluate(T, f, centered=True)
    wf = FW.from_dense(f)
    parts = FW.evaluate_windowed(R, p, wf)
    Hband = np.asarray(FW.band_hessian(parts, W))
    S = wf.span
    Hd = np.zeros((6 * W, 6 * W))
    for w in range(W):
        for d in range(S):
            if w + d < W:
                Hd[6 * w:6 * w + 6, 6 * (w + d):6 * (w + d) + 6] += \
                    Hband[w, d]
                if d > 0:
                    Hd[6 * (w + d):6 * (w + d) + 6, 6 * w:6 * w + 6] += \
                        Hband[w, d].T
    hs = float(jnp.max(jnp.abs(H0))) + 1e-12
    assert np.max(np.abs(Hd - np.asarray(H0))) < 1e-8 * hs


def test_banded_direct_solve_matches_dense_solve():
    """solver/banded.solve_banded on the damped band must equal the dense
    linear solve for several supernode sizes."""
    from balm_tpu.solver import banded

    R, p, f = _centered_problem(seed=27, G=14, W=9)
    W = R.shape[0]
    T = lie.pose_matrix(R, p)
    _, J0, H0 = factors.evaluate(T, f, centered=True)
    wf = FW.from_dense(f)
    parts = FW.evaluate_windowed(R, p, wf)
    Hband = FW.band_hessian(parts, W)
    # damp like LM does so the system is SPD
    D = jnp.diag(jnp.asarray(H0))
    tau = 2.0 * jnp.maximum(-jnp.min(D), 0.0)
    Dd = (D + tau).reshape(W, 6)
    u = 1.0
    damp = (u * Dd)[..., None] * jnp.eye(6, dtype=Hband.dtype)
    A = np.asarray(H0) + np.diag(u * np.asarray(Dd).reshape(-1))
    x_ref = np.linalg.solve(A, -np.asarray(J0))
    S = wf.span
    for B in (S, S + 3, 2 * S):
        x, ok = banded.solve_banded(
            Hband.at[:, 0].add(damp), -jnp.asarray(J0), B)
        assert bool(ok)
        err = np.max(np.abs(np.asarray(x) - x_ref))
        assert err < 1e-6 * (np.max(np.abs(x_ref)) + 1e-12), (B, err)


def test_banded_lm_matches_dense_lm_trajectory():
    """damping_iter_large(linear_solver='banded') takes EXACT dense-solver
    steps: the full LM trajectory must match the dense solver's."""
    from balm_tpu.config import SolverConfig
    from balm_tpu.solver import large, lm

    R, p, f = _centered_problem(seed=28, G=12, W=7)
    rng = np.random.default_rng(11)
    dx = jnp.asarray(rng.normal(size=(R.shape[0], 6)) * 0.01)
    R0, p0 = lie.se3_left_update(R, p, dx)

    cfg = SolverConfig(max_iters=10, rel_tol=0.0, min_planes_per_pose=0)
    ra = lm.damping_iter(R0, p0, f, cfg, centered=True)
    wf = FW.from_dense(f)
    rb = large.damping_iter_large(R0, p0, wf, cfg,
                                  linear_solver="banded")
    assert abs(float(ra.residual) - float(rb.residual)) < 1e-8 * abs(
        float(ra.residual)) + 1e-12
    assert float(jnp.max(jnp.abs(ra.p - rb.p))) < 1e-6
    # iteration-for-iteration identical accept pattern
    na, nb = int(ra.iters), int(rb.iters)
    assert na == nb
    assert np.allclose(np.asarray(ra.trace_res1)[:na],
                       np.asarray(rb.trace_res1)[:nb], rtol=1e-6)


def test_banded_lm_with_edges_matches_dense():
    """damping_iter_large(edges=...) must reproduce the dense solver's
    plane+relpose trajectory (lm.damping_iter(edges=...)) — the edge
    Hessian blocks land inside the band."""
    from balm_tpu.config import SolverConfig
    from balm_tpu.ops import pose_graph as PG
    from balm_tpu.solver import large, lm

    R, p, f = _centered_problem(seed=31, G=12, W=7)
    rng = np.random.default_rng(17)
    dx = jnp.asarray(rng.normal(size=(R.shape[0], 6)) * 0.01)
    R0, p0 = lie.se3_left_update(R, p, dx)
    W = R.shape[0]

    # consecutive-pose odometry edges measured at the TRUE poses
    i = jnp.arange(W - 1, dtype=jnp.int32)
    j = i + 1
    Zr = jnp.einsum("eba,ebc->eac", R[:-1], R[1:])
    Zp = jnp.einsum("eba,eb->ea", R[:-1], p[1:] - p[:-1])
    edges = PG.RelPoseEdges(i=i, j=j, Zr=Zr, Zp=Zp,
                            w_rot=jnp.full((W - 1,), 50.0),
                            w_tr=jnp.full((W - 1,), 50.0))

    cfg = SolverConfig(max_iters=8, rel_tol=0.0, min_planes_per_pose=0)
    ra = lm.damping_iter(R0, p0, f, cfg, centered=True, edges=edges)
    wf = FW.from_dense(f)
    assert int(wf.span) > 1
    rb = large.damping_iter_large(R0, p0, wf, cfg,
                                  linear_solver="banded", edges=edges)
    assert abs(float(ra.residual) - float(rb.residual)) < 1e-7 * abs(
        float(ra.residual)) + 1e-12
    assert float(jnp.max(jnp.abs(ra.p - rb.p))) < 1e-6
    np.testing.assert_allclose(np.asarray(ra.trace_accept),
                               np.asarray(rb.trace_accept))

    # and a far-separated edge must be rejected (outside the band)
    bad = PG.RelPoseEdges(
        i=jnp.asarray([0], jnp.int32),
        j=jnp.asarray([W - 1], jnp.int32),
        Zr=Zr[:1], Zp=Zp[:1], w_rot=jnp.ones((1,)), w_tr=jnp.ones((1,)))
    if W - 1 >= wf.span:
        import pytest as _pytest
        with _pytest.raises(ValueError):
            large.damping_iter_large(R0, p0, wf, cfg,
                                     linear_solver="banded", edges=bad)
