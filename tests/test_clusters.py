import jax.numpy as jnp
import numpy as np

from balm_tpu.ops import clusters, lie


def test_from_points_matches_definition():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(100, 3)))
    C = clusters.from_points(pts)
    P = jnp.einsum("ni,nj->ij", pts, pts)
    v = jnp.sum(pts, axis=0)
    assert jnp.allclose(C[:3, :3], P)
    assert jnp.allclose(C[:3, 3], v)
    assert jnp.allclose(C[3, 3], 100.0)
    assert jnp.allclose(C, C.T)


def test_segmented_build():
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(60, 3)))
    seg = jnp.asarray(rng.integers(0, 5, size=60), jnp.int32)
    C = clusters.from_points(pts, seg, 5)
    for s in range(5):
        mask = np.array(seg) == s
        Cd = clusters.from_points(pts[mask])
        assert jnp.allclose(C[s], Cd)


def test_transform_matches_transformed_points():
    """T C T^T equals the moment of the transformed points
    (reference PointCluster::transform, tools.hpp:341-347)."""
    rng = np.random.default_rng(2)
    pts = jnp.asarray(rng.normal(size=(50, 3)))
    R = lie.so3_exp(jnp.asarray(rng.normal(size=3)))
    p = jnp.asarray(rng.normal(size=3))
    T = lie.pose_matrix(R, p)
    C = clusters.from_points(pts)
    Ct = clusters.transform(C, T)
    pts_w = pts @ R.T + p
    Cw = clusters.from_points(pts_w)
    assert jnp.allclose(Ct, Cw, atol=1e-10)


def test_cov_matches_numpy():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(200, 3)) * np.array([1.0, 0.5, 0.01])
    C = clusters.from_points(jnp.asarray(pts))
    cov = clusters.cov(C)
    cov_np = np.cov(pts.T, bias=True)
    assert np.allclose(np.array(cov), cov_np, atol=1e-12)


def test_recenter_translation_invariance():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(80, 3)) + np.array([100.0, -50.0, 7.0])
    C = clusters.from_points(jnp.asarray(pts))
    c = jnp.asarray([100.0, -50.0, 7.0])
    Cs = clusters.recenter(C, c)
    assert jnp.allclose(clusters.cov(Cs), clusters.cov(C), atol=1e-9)
    assert jnp.allclose(clusters.mean(Cs), clusters.mean(C) - c, atol=1e-10)


def test_stat_noise_cov_matches_accumulation():
    """Closed-form c_cov == the reference's per-point accumulation
    (toolss.hpp:315-344)."""
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(30, 3))
    sigma = 0.02

    def B(p):
        x, y, z = p
        return np.array(
            [
                [2 * x, 0, 0],
                [y, x, 0],
                [z, 0, x],
                [0, 2 * y, 0],
                [0, z, y],
                [0, 0, 2 * z],
            ]
        )

    c_ref = np.zeros((9, 9))
    for p in pts:
        Bf = np.zeros((9, 3))
        Bf[:6] = B(p)
        Bf[6:] = np.eye(3)
        c_ref += Bf @ (sigma**2 * np.eye(3)) @ Bf.T

    C = clusters.from_points(jnp.asarray(pts))
    c_ours = clusters.stat_noise_cov(C, sigma)
    assert np.allclose(np.array(c_ours), c_ref, atol=1e-12)
