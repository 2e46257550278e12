"""Covariance propagation oracles.

1. The structured scatter-jacobian accumulation must equal the autodiff
   ground truth  sum_gj (dJ/ds_gj) ccov_gj (dJ/ds_gj)^T  computed with
   jax.jacfwd through the analytic gradient.
2. End-to-end NEES on a synthetic scene must be ~ chi-square consistent
   (the reference's consistency experiment, expected NEES = 6 W).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balm_tpu.config import SolverConfig
from balm_tpu.ops import clusters, covariance, factors, lie
from balm_tpu.solver import lm
from tests.test_factors import make_problem


def stats_from_C(C):
    """Inverse of covariance._stat_basis packing: (..., 4, 4) -> (..., 9)."""
    return jnp.stack(
        [C[..., 0, 0], C[..., 0, 1], C[..., 0, 2], C[..., 1, 1],
         C[..., 1, 2], C[..., 2, 2], C[..., 0, 3], C[..., 1, 3],
         C[..., 2, 3]],
        axis=-1,
    )


def test_rhs_matches_autodiff():
    R, p, f, _ = make_problem(G=3, W=3, K=25, seed=21, sparse_obs=True,
                              with_fix=True)
    f = f._replace(coe=jnp.where(f.coe > 0, 1.0, 0.0))  # unit weights
    W = R.shape[0]
    T = lie.pose_matrix(R, p)
    E4 = covariance._stat_basis(jnp.float64)
    N = f.C[..., 3, 3]

    def grad_fn(s):
        C = jnp.einsum("gwi,iab->gwab", s, E4)
        C = C.at[..., 3, 3].set(N)
        f2 = f._replace(C=C)
        _, J, _ = factors.evaluate(T, f2, use_lapack_eigh=True)
        return J

    s0 = stats_from_C(f.C)
    J0 = grad_fn(s0)
    # converged-gradient assumption is not needed for the identity
    # sum L c L^T itself — compare the raw accumulation
    Jac = jax.jacfwd(grad_fn)(s0)  # (6W, G, W, 9)
    ccov = clusters.stat_noise_cov(f.C, 0.02)
    ref = jnp.einsum("agws,gwst,bgwt->ab", Jac, ccov, Jac)

    rhs = covariance.scatter_jacobian_rhs(T, f, ccov)
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(rhs - ref)))
    assert err < 1e-6 * scale, (err, scale)


def make_nees_problem(seed, G=12, W=5, K=40, sigma=0.02):
    """Synthetic scene with a marginalized anchor scan: gauge-constrained."""
    rng = np.random.default_rng(seed)
    Rg = np.array(lie.so3_exp(jnp.asarray(rng.normal(size=(W + 1, 3)) * 0.2)))
    pg = rng.normal(size=(W + 1, 3)) * 0.5

    normals = rng.normal(size=(G, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    centers = rng.normal(size=(G, 3)) * 2.0

    C = np.zeros((G, W, 4, 4))
    Cfix = np.zeros((G, 4, 4))
    for g in range(G):
        basis = np.linalg.qr(
            np.column_stack([normals[g], rng.normal(size=(3, 2))])
        )[0]
        for w in range(W + 1):
            uv = rng.uniform(-0.5, 0.5, size=(K, 2))
            local = np.concatenate([np.zeros((K, 1)), uv], -1)
            world = local @ basis.T + centers[g]
            if w == 0:
                # anchor scan: noise-free marginalized prior in world frame
                Cfix[g] = np.array(clusters.from_points(jnp.asarray(world)))
            else:
                body = (world - pg[w]) @ Rg[w]
                body = body + rng.normal(0, sigma, size=body.shape)
                C[g, w - 1] = np.array(
                    clusters.from_points(jnp.asarray(body))
                )

    f = factors.PlaneFactors.create(
        jnp.asarray(C), Cfix=jnp.asarray(Cfix),
        coe=jnp.ones(G),
    )
    return jnp.asarray(Rg[1:]), jnp.asarray(pg[1:]), f


def test_nees_consistent():
    """Monte-Carlo NEES ~ chi-square(6W): averaged ratio near 1."""
    sigma = 0.02
    ratios = []
    for seed in range(6):
        Rg, pg, f = make_nees_problem(seed, sigma=sigma)
        W = Rg.shape[0]
        cfg = SolverConfig(max_iters=100, u_init=0.01, rel_tol=0.0,
                           abs_tol=1e-12, min_planes_per_pose=1,
                           gauge_fix=False)
        res = lm.damping_iter(Rg, pg, f, cfg)
        T = lie.pose_matrix(res.R, res.p)
        ccov = clusters.stat_noise_cov(f.C, sigma)
        Rcov = np.asarray(covariance.pose_covariance(T, f, ccov))

        Rw = np.asarray(res.R)
        pw = np.asarray(res.p)
        err = np.zeros(6 * W)
        for i in range(W):
            Rr = np.asarray(Rg[i]) @ Rw[i].T
            err[6 * i:6 * i + 3] = np.asarray(lie.so3_log(jnp.asarray(Rr)))
            err[6 * i + 3:6 * i + 6] = -Rr @ pw[i] + np.asarray(pg[i])
        nees = float(err @ np.linalg.solve(Rcov, err))
        ratios.append(nees / (6 * W))

    mean_ratio = float(np.mean(ratios))
    # chi2(30)/30 has std ~0.26; mean of 6 -> std ~0.106
    assert 0.6 < mean_ratio < 1.5, ratios