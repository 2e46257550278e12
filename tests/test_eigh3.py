import jax.numpy as jnp
import numpy as np

from balm_tpu.ops.eigh3 import eigh3, eigvals3


def rand_sym(rng, n, scale=1.0):
    A = rng.normal(size=(n, 3, 3)) * scale
    return jnp.asarray(A + np.swapaxes(A, -1, -2))


def check_decomposition(A, lam, U, tol=1e-9):
    # ascending order
    assert jnp.all(lam[..., 0] <= lam[..., 1] + tol)
    assert jnp.all(lam[..., 1] <= lam[..., 2] + tol)
    # orthonormality
    eye = jnp.eye(3)
    err_orth = jnp.max(jnp.abs(jnp.swapaxes(U, -1, -2) @ U - eye))
    assert err_orth < tol, err_orth
    # A u = lam u
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-1, -2)), 1e-30)
    resid = A @ U - U * lam[..., None, :]
    err = jnp.max(jnp.abs(resid) / scale[..., None, None])
    assert err < tol, err


def test_random_matrices():
    rng = np.random.default_rng(0)
    A = rand_sym(rng, 512)
    lam, U = eigh3(A)
    check_decomposition(A, lam, U)
    lam_ref = jnp.linalg.eigvalsh(A)
    assert jnp.allclose(lam, lam_ref, atol=1e-10)


def test_various_scales():
    rng = np.random.default_rng(1)
    for scale in (1e-8, 1e-3, 1.0, 1e4, 1e8):
        A = rand_sym(rng, 64, scale)
        lam, U = eigh3(A)
        check_decomposition(A, lam, U)
        lam_ref = jnp.linalg.eigvalsh(A)
        assert jnp.allclose(lam, lam_ref, atol=1e-10 * scale, rtol=1e-8)


def test_plane_like_spectra():
    """Covariances like the BA sees: lam0 << lam1 ~ lam2."""
    rng = np.random.default_rng(2)
    n = 256
    # construct with known eigenstructure
    q = rng.normal(size=(n, 3, 3))
    Q = np.linalg.qr(q)[0]
    lam_true = np.sort(
        np.stack(
            [
                rng.uniform(1e-8, 1e-5, n),
                rng.uniform(0.05, 0.2, n),
                rng.uniform(0.05, 0.2, n),
            ],
            -1,
        ),
        -1,
    )
    A = jnp.asarray(np.einsum("nab,nb,ncb->nac", Q, lam_true, Q))
    lam, U = eigh3(A)
    check_decomposition(A, lam, U)
    # smallest eigenvalue must be accurate in absolute terms ~ eps*||A||
    assert np.allclose(np.array(lam[:, 0]), lam_true[:, 0], atol=1e-13, rtol=1e-6)


def test_degenerate_cases():
    eye = jnp.eye(3)
    cases = jnp.stack(
        [
            jnp.zeros((3, 3)),
            eye,
            2.5 * eye,
            jnp.diag(jnp.asarray([1.0, 1.0, 2.0])),
            jnp.diag(jnp.asarray([0.0, 0.0, 1.0])),
            jnp.diag(jnp.asarray([3.0, 3.0, 3.0])),
        ]
    )
    lam, U = eigh3(cases)
    check_decomposition(cases, lam, U, tol=1e-12)


def test_eigvals_only_matches():
    rng = np.random.default_rng(3)
    A = rand_sym(rng, 128)
    lam = eigvals3(A)
    lam_ref = jnp.linalg.eigvalsh(A)
    assert jnp.allclose(lam, lam_ref, atol=1e-10)


def test_float32_plane_accuracy():
    """f32 path: lambda_0 of a well-centered plane covariance."""
    rng = np.random.default_rng(4)
    n = 128
    q = rng.normal(size=(n, 3, 3))
    Q = np.linalg.qr(q)[0]
    lam_true = np.sort(
        np.stack(
            [
                rng.uniform(1e-5, 1e-4, n),
                rng.uniform(0.05, 0.2, n),
                rng.uniform(0.05, 0.2, n),
            ],
            -1,
        ),
        -1,
    )
    A64 = np.einsum("nab,nb,ncb->nac", Q, lam_true, Q)
    A = jnp.asarray(A64, jnp.float32)
    lam, U = eigh3(A)
    assert lam.dtype == jnp.float32
    # absolute error bounded by ~eps_f32 * ||A||
    assert np.allclose(np.array(lam[:, 0]), lam_true[:, 0], atol=5e-7)
    check_decomposition(A, lam, U, tol=1e-4)
