"""Derivative checks the reference never had: the analytic gradient/Hessian
of the plane factors must equal jax.grad / jax.hessian of the residual
through the eigendecomposition (SURVEY.md section 4, oracle (d))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balm_tpu.ops import clusters, factors, lie
from balm_tpu.ops.eigh3 import eigvals3


def make_problem(G=5, W=4, K=30, seed=0, sparse_obs=False, with_fix=False):
    rng = np.random.default_rng(seed)
    # ground-truth-ish poses
    R = np.array(lie.so3_exp(jnp.asarray(rng.normal(size=(W, 3)) * 0.3)))
    p = rng.normal(size=(W, 3)) * 0.5

    normals = rng.normal(size=(G, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    centers = rng.normal(size=(G, 3)) * 2.0

    C = np.zeros((G, W, 4, 4))
    Cfix = np.zeros((G, 4, 4))
    obs = np.ones((G, W), bool)
    if sparse_obs:
        obs = rng.random((G, W)) > 0.4
        obs[:, 0] = True
        obs[:, 1] = True  # ensure >= 2 observers

    for g in range(G):
        basis = np.linalg.qr(
            np.column_stack([normals[g], rng.normal(size=(3, 2))])
        )[0]
        for w in range(W):
            if not obs[g, w]:
                continue
            uv = rng.uniform(-0.5, 0.5, size=(K, 2))
            th = rng.normal(0, 0.01, size=(K, 1))
            local = np.concatenate([th, uv], -1)  # normal is first basis col
            world = local @ basis.T + centers[g]
            body = (world - p[w]) @ R[w]
            C[g, w] = np.array(clusters.from_points(jnp.asarray(body)))
        if with_fix:
            uv = rng.uniform(-0.5, 0.5, size=(K, 2))
            th = rng.normal(0, 0.01, size=(K, 1))
            world = np.concatenate([th, uv], -1) @ basis.T + centers[g]
            Cfix[g] = np.array(clusters.from_points(jnp.asarray(world)))

    coe = C[..., 3, 3].sum(-1)  # total point count (bavoxel.hpp:42-44)
    f = factors.PlaneFactors.create(
        jnp.asarray(C), Cfix=jnp.asarray(Cfix), coe=jnp.asarray(coe)
    )
    return jnp.asarray(R), jnp.asarray(p), f, jnp.asarray(centers)


def residual_fn(eps, R, p, f):
    """Cost as a function of stacked left-perturbation twists."""
    W = R.shape[0]
    Rn, pn = lie.se3_left_update(R, p, eps.reshape(W, 6))
    T = lie.pose_matrix(Rn, pn)
    return factors.residual_only(T, f, use_lapack_eigh=True)


@pytest.mark.parametrize("sparse_obs,with_fix", [(False, False), (True, True)])
def test_gradient_matches_autodiff(sparse_obs, with_fix):
    R, p, f, _ = make_problem(sparse_obs=sparse_obs, with_fix=with_fix, seed=1)
    W = R.shape[0]
    T = lie.pose_matrix(R, p)
    res, J, H = factors.evaluate(T, f)

    eps0 = jnp.zeros(6 * W)
    res_ad = residual_fn(eps0, R, p, f)
    assert jnp.allclose(res, res_ad, rtol=1e-10)

    J_ad = jax.grad(residual_fn)(eps0, R, p, f)
    assert jnp.allclose(J, J_ad, atol=1e-8 * float(jnp.max(jnp.abs(J_ad))) + 1e-12), (
        float(jnp.max(jnp.abs(J - J_ad)))
    )


@pytest.mark.parametrize("sparse_obs,with_fix", [(False, False), (True, True)])
def test_hessian_matches_autodiff(sparse_obs, with_fix):
    R, p, f, _ = make_problem(G=4, W=3, sparse_obs=sparse_obs,
                              with_fix=with_fix, seed=2)
    W = R.shape[0]
    T = lie.pose_matrix(R, p)
    _, _, H = factors.evaluate(T, f)

    H_ad = jax.hessian(residual_fn)(jnp.zeros(6 * W), R, p, f)
    scale = float(jnp.max(jnp.abs(H_ad)))
    err = float(jnp.max(jnp.abs(H - H_ad)))
    assert err < 1e-7 * scale, (err, scale)
    # symmetry
    assert jnp.allclose(H, H.T, atol=1e-9 * scale)


def test_centered_equals_uncentered():
    R, p, f, centers = make_problem(seed=3)
    T = lie.pose_matrix(R, p)
    res0, J0, H0 = factors.evaluate(T, f)
    fc = f._replace(centers=centers + 0.05)  # approximate centers suffice
    res1, J1, H1 = factors.evaluate(T, fc, centered=True)
    assert jnp.allclose(res0, res1, rtol=1e-10)
    assert jnp.allclose(J0, J1, atol=1e-8 * float(jnp.max(jnp.abs(J0))))
    assert jnp.allclose(H0, H1, atol=1e-7 * float(jnp.max(jnp.abs(H0))))

    r0 = factors.residual_only(T, f)
    r1 = factors.residual_only(T, fc, centered=True)
    assert jnp.allclose(r0, r1, rtol=1e-10)


def test_body_recentered_equals_raw():
    """T C T^T = (T B) C~ (T B)^T: derivatives depend only on the world
    moment, so body-recentered factors are exactly equivalent (in f64)."""
    R, p, f, centers = make_problem(seed=9, sparse_obs=True, with_fix=True)
    T = lie.pose_matrix(R, p)
    fc = factors.recenter_bodies(f._replace(centers=centers))
    # body_centers zero where cluster empty
    assert np.all(
        np.array(fc.body_centers[~np.array(f.observes())]) == 0.0
    )
    res0, J0, H0 = factors.evaluate(T, f._replace(centers=centers), centered=True)
    res1, J1, H1 = factors.evaluate(T, fc, centered=True)
    assert jnp.allclose(res0, res1, rtol=1e-10)
    assert jnp.allclose(J0, J1, atol=1e-9 * float(jnp.max(jnp.abs(J0))))
    assert jnp.allclose(H0, H1, atol=1e-8 * float(jnp.max(jnp.abs(H0))))
    assert jnp.allclose(
        factors.residual_only(T, fc, centered=True),
        factors.residual_only(T, f),
        rtol=1e-10,
    )


def test_closed_form_eigh_matches_lapack_path():
    R, p, f, _ = make_problem(seed=4)
    T = lie.pose_matrix(R, p)
    res0, J0, H0 = factors.evaluate(T, f, use_lapack_eigh=True)
    res1, J1, H1 = factors.evaluate(T, f, use_lapack_eigh=False)
    assert jnp.allclose(res0, res1, rtol=1e-9)
    assert jnp.allclose(J0, J1, atol=1e-7 * float(jnp.max(jnp.abs(J0))))
    assert jnp.allclose(H0, H1, atol=1e-6 * float(jnp.max(jnp.abs(H0))))


def test_padding_contributes_zero():
    R, p, f, _ = make_problem(G=5, seed=5)
    T = lie.pose_matrix(R, p)
    res0, J0, H0 = factors.evaluate(T, f)

    Gpad = 9
    W = f.window
    Cp = jnp.zeros((Gpad, W, 4, 4)).at[:5].set(f.C)
    f2 = factors.PlaneFactors.create(
        Cp,
        Cfix=jnp.zeros((Gpad, 4, 4)).at[:5].set(f.Cfix),
        coe=jnp.zeros((Gpad,)).at[:5].set(f.coe),
    )
    res1, J1, H1 = factors.evaluate(T, f2)
    assert jnp.allclose(res0, res1)
    assert jnp.allclose(J0, J1)
    assert jnp.allclose(H0, H1)
    assert jnp.all(jnp.isfinite(H1))

    r0 = factors.residual_only(T, f)
    r1 = factors.residual_only(T, f2)
    assert jnp.allclose(r0, r1)


def test_float32_centered_close_to_float64():
    """The f32 fast path with centering must track f64 on far-from-origin
    planes (the reference's float build parity, Supplementary data col 5)."""
    R, p, f, centers = make_problem(seed=6)
    # push the scene far from the origin to provoke cancellation
    shift = jnp.asarray([300.0, -200.0, 120.0])
    p_far = p + shift

    # moments must be rebuilt in the same body frames (body frame unchanged,
    # world shifted): C unchanged, centers shift
    f_far = f._replace(centers=centers + shift)
    T = lie.pose_matrix(R, p_far)
    res64, J64, H64 = factors.evaluate(T, f_far, centered=True)

    f32 = factors.recenter_bodies(f_far).astype(jnp.float32)
    T32 = T.astype(jnp.float32)
    res32, J32, H32 = factors.evaluate(T32, f32, centered=True)

    assert np.isfinite(float(res32))
    assert abs(float(res32) - float(res64)) < 2e-3 * abs(float(res64))
    jscale = float(jnp.max(jnp.abs(J64)))
    assert float(jnp.max(jnp.abs(J32.astype(jnp.float64) - J64))) < 5e-3 * jscale
    hscale = float(jnp.max(jnp.abs(H64)))
    assert float(jnp.max(jnp.abs(H32.astype(jnp.float64) - H64))) < 5e-3 * hscale


def test_planes_per_pose():
    R, p, f, _ = make_problem(G=6, W=4, sparse_obs=True, seed=7)
    ppp = f.planes_per_pose()
    obs = np.array(f.C[..., 3, 3] > 0.5)
    assert np.array_equal(np.array(ppp), obs.sum(0))
