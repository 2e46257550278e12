import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balm_tpu.ops import lie


def rand_w(key, n, scale=1.0):
    return jax.random.normal(key, (n, 3)) * scale


def test_hat_vee_roundtrip():
    v = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)))
    M = lie.hat(v)
    assert jnp.allclose(M, -jnp.swapaxes(M, -1, -2))
    assert jnp.allclose(lie.vee(M), v)


def test_exp_is_rotation():
    w = rand_w(jax.random.PRNGKey(0), 32, 2.0)
    R = lie.so3_exp(w)
    eye = jnp.eye(3)
    assert jnp.allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
    assert jnp.allclose(jnp.linalg.det(R), 1.0, atol=1e-12)


def test_exp_log_roundtrip():
    for scale in (1e-9, 1e-4, 0.5, 2.0, 3.0):
        w = np.random.default_rng(1).normal(size=(64, 3))
        w = w / np.linalg.norm(w, axis=-1, keepdims=True)
        w = w * np.random.default_rng(2).uniform(0, scale, size=(64, 1))
        w = jnp.asarray(w)
        back = lie.so3_log(lie.so3_exp(w))
        assert jnp.allclose(back, w, atol=1e-7), scale


def test_log_near_pi():
    axis = np.array([0.3, -0.5, 0.81])
    axis /= np.linalg.norm(axis)
    for ang in (np.pi - 1e-5, np.pi - 1e-8):
        w = jnp.asarray(ang * axis)
        back = lie.so3_log(lie.so3_exp(w))
        assert jnp.allclose(jnp.abs(back), jnp.abs(w), atol=1e-5)


def test_exp_matches_reference_formula():
    # Rodrigues with explicit axis normalization (tools.hpp:56-71)
    rng = np.random.default_rng(3)
    for _ in range(10):
        w = rng.normal(size=3)
        ang = np.linalg.norm(w)
        k = w / ang
        K = np.array(lie.hat(jnp.asarray(k)))
        R_ref = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
        assert np.allclose(np.array(lie.so3_exp(jnp.asarray(w))), R_ref, atol=1e-12)


def test_exp_grad_at_zero_no_nan():
    g = jax.jacobian(lambda w: lie.so3_exp(w))(jnp.zeros(3))
    assert jnp.all(jnp.isfinite(g))


def test_left_update_and_gauge_fix():
    rng = np.random.default_rng(4)
    R = np.array(lie.so3_exp(jnp.asarray(rng.normal(size=(5, 3)))))
    p = rng.normal(size=(5, 3))
    dx = jnp.asarray(rng.normal(size=(5, 6)) * 0.1)
    Rn, pn = lie.se3_left_update(jnp.asarray(R), jnp.asarray(p), dx)
    dR = lie.so3_exp(dx[..., :3])
    assert jnp.allclose(Rn, dR @ R)
    assert jnp.allclose(pn, jnp.einsum("nij,nj->ni", dR, jnp.asarray(p)) + dx[..., 3:])

    Rf, pf = lie.gauge_fix(Rn, pn)
    assert jnp.allclose(Rf[0], jnp.eye(3), atol=1e-12)
    assert jnp.allclose(pf[0], 0.0, atol=1e-12)
    # relative poses preserved
    rel_before = jnp.einsum("ji,jk->ik", Rn[0], Rn[3])
    rel_after = jnp.einsum("ji,jk->ik", Rf[0], Rf[3])
    assert jnp.allclose(rel_before, rel_after, atol=1e-12)


def test_right_jacobian_identities():
    """jr(w) jr_inv(w) = I and the defining property
    Exp(w + dw) ~ Exp(w) Exp(jr(w) dw)."""
    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.normal(size=(16, 3)))
    J = lie.so3_jr(w)
    Ji = lie.so3_jr_inv(w)
    assert jnp.allclose(J @ Ji, jnp.eye(3), atol=1e-10)

    dw = jnp.asarray(rng.normal(size=(16, 3)) * 1e-6)
    lhs = lie.so3_exp(w + dw)
    rhs = lie.so3_exp(w) @ lie.so3_exp(
        jnp.einsum("nij,nj->ni", J, dw)
    )
    assert jnp.allclose(lhs, rhs, atol=1e-10)

    # small-angle limit
    J0 = lie.so3_jr(jnp.zeros(3))
    assert jnp.allclose(J0, jnp.eye(3), atol=1e-12)


def test_adjoint_translation_consistency():
    """Gradient mapping through the centering shift must match autodiff."""
    rng = np.random.default_rng(5)
    c = jnp.asarray(rng.normal(size=3))
    R = lie.so3_exp(jnp.asarray(rng.normal(size=3)))
    p = jnp.asarray(rng.normal(size=3))
    A = jnp.asarray(rng.normal(size=(4, 4)))
    A = A + A.T

    S = jnp.eye(4).at[:3, 3].set(-c)

    def f_orig(eps):
        dR = lie.so3_exp(eps[:3])
        Rn = dR @ R
        pn = dR @ p + eps[3:]
        T = lie.pose_matrix(Rn, pn)
        Ts = S @ T
        return jnp.sum(Ts * (A @ Ts))  # arbitrary smooth scalar of S@T

    def f_shift(eps):
        T = lie.pose_matrix(R, p)
        Ts0 = S @ T
        dR = lie.so3_exp(eps[:3])
        Tn = lie.pose_matrix(dR @ Ts0[:3, :3], dR @ Ts0[:3, 3] + eps[3:])
        return jnp.sum(Tn * (A @ Tn))

    g_orig = jax.grad(f_orig)(jnp.zeros(6))
    g_shift = jax.grad(f_shift)(jnp.zeros(6))
    assert jnp.allclose(g_orig, lie.adjoint_translation_vec(g_shift, c), atol=1e-10)

    H_orig = jax.hessian(f_orig)(jnp.zeros(6))
    H_shift = jax.hessian(f_shift)(jnp.zeros(6))
    H_mapped = lie.adjoint_translation_mat(H_shift, c)
    # the conjugated left-update chart is nonlinear in w: exact mapping
    # needs the second-order chain term fed by the shifted-frame gradient
    H_mapped = H_mapped.at[:3, :3].add(
        lie.centering_hessian_correction(g_shift[3:], c)
    )
    assert jnp.allclose(H_orig, H_mapped, atol=1e-9)


def test_so3_log_grad_at_identity():
    """Gradients through so3_log must stay finite at theta = 0 (an
    odometry-chain pose-graph edge measured FROM the current trajectory
    is satisfied EXACTLY, so its rotation residual differentiates
    so3_log at the identity; the naive arccos chain rule is NaN there —
    regression for the guard in so3_log)."""
    import jax

    def cost(w):
        R = lie.so3_exp(w)
        return jnp.sum(lie.so3_log(R) ** 2)

    g = jax.grad(cost)(jnp.zeros(3))
    assert jnp.all(jnp.isfinite(g))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)
    H = jax.hessian(cost)(jnp.zeros(3))
    assert jnp.all(jnp.isfinite(H))
    np.testing.assert_allclose(np.asarray(H), 2.0 * np.eye(3), atol=1e-6)
    # and just off identity the gradient matches 2w
    w0 = jnp.asarray([1e-5, -2e-5, 0.5e-5])
    g2 = jax.grad(cost)(w0)
    np.testing.assert_allclose(np.asarray(g2), 2 * np.asarray(w0),
                               rtol=1e-6)
