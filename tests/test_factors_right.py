"""Right-perturbation evaluator (reference acc_evaluate2) derivative
checks and solver parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from balm_tpu.config import SolverConfig
from balm_tpu.ops import factors, lie
from balm_tpu.solver import lm
from tests.test_factors import make_problem


def residual_fn_right(eps, R, p, f):
    W = R.shape[0]
    Rn, pn = lie.se3_right_update(R, p, eps.reshape(W, 6))
    T = lie.pose_matrix(Rn, pn)
    return factors.residual_only(T, f, use_lapack_eigh=True)


@pytest.mark.parametrize("sparse_obs,with_fix", [(False, False), (True, True)])
def test_right_gradient_matches_autodiff(sparse_obs, with_fix):
    R, p, f, _ = make_problem(sparse_obs=sparse_obs, with_fix=with_fix, seed=31)
    W = R.shape[0]
    T = lie.pose_matrix(R, p)
    res, J, H = factors.evaluate_right(T, f)

    eps0 = jnp.zeros(6 * W)
    assert jnp.allclose(res, residual_fn_right(eps0, R, p, f), rtol=1e-10)
    J_ad = jax.grad(residual_fn_right)(eps0, R, p, f)
    assert jnp.allclose(J, J_ad, atol=1e-8 * float(jnp.max(jnp.abs(J_ad))) + 1e-12)


def test_right_hessian_symmetric_part_matches_autodiff():
    """The reference's right Hessian carries a -0.5 hat(grad) antisymmetric
    term on diagonal rotation blocks (bavoxel.hpp:124); its symmetric part
    must equal the exact second derivative."""
    R, p, f, _ = make_problem(G=4, W=3, seed=32, sparse_obs=True, with_fix=True)
    W = R.shape[0]
    T = lie.pose_matrix(R, p)
    _, _, H = factors.evaluate_right(T, f)
    H_sym = 0.5 * (H + H.T)
    H_ad = jax.hessian(residual_fn_right)(jnp.zeros(6 * W), R, p, f)
    scale = float(jnp.max(jnp.abs(H_ad)))
    assert float(jnp.max(jnp.abs(H_sym - H_ad))) < 1e-7 * scale


def test_right_update_solver_converges():
    from balm_tpu.pipelines import virtual

    cfg = virtual.VirtualConfig(win_size=8, surf_size=15, pts_size=40, seed=33)
    R_gt, p_gt, body = virtual.generate(cfg)
    R0, p0 = virtual.perturb(R_gt, p_gt, cfg)
    f = virtual.build_factors(body, jnp.float64)

    scfg = SolverConfig(max_iters=20, u_init=0.1, min_planes_per_pose=3)
    res = lm.damping_iter(
        jnp.asarray(R0), jnp.asarray(p0), f, scfg, update="right"
    )
    from balm_tpu.utils import metrics

    rot, tra = metrics.pose_rsme(
        res.R, res.p, jnp.asarray(R_gt), jnp.asarray(p_gt)
    )
    assert float(rot) * 57.3 < 0.15
    assert float(tra) < 0.01
