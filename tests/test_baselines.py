"""Comparison baselines: the per-point BALM1 cost must match the cluster
cost exactly (independent oracle), and both baseline optimizers must
converge — slower than the production solver, as in the reference's
comparison tables (SURVEY.md section 6)."""

import numpy as np
import jax.numpy as jnp

from balm_tpu.baselines import balm1, ef
from balm_tpu.config import SolverConfig
from balm_tpu.ops import clusters, factors, lie
from balm_tpu.pipelines import virtual
from balm_tpu.solver import lm
from balm_tpu.utils import metrics


def setup(seed=0, win=6, surf=12, pts=25):
    cfg = virtual.VirtualConfig(win_size=win, surf_size=surf, pts_size=pts,
                                seed=seed)
    R_gt, p_gt, body = virtual.generate(cfg)
    R0, p0 = virtual.perturb(R_gt, p_gt, cfg)
    f = virtual.build_factors(body, jnp.float64)
    G, W, K, _ = body.shape
    pf = balm1.PointPlanes(
        points=jnp.asarray(body),
        mask=jnp.ones((G, W, K)),
        coe=f.coe,
    )
    return R_gt, p_gt, R0, p0, body, f, pf


def test_point_residual_matches_cluster_residual():
    _, _, R0, p0, body, f, pf = setup()
    T = lie.pose_matrix(jnp.asarray(R0), jnp.asarray(p0))
    r_cluster = factors.residual_only(T, f)
    # cluster cost is coe * lambda0 of the UNNORMALIZED... both use cov;
    # identical by construction
    r_points = balm1.residual(jnp.asarray(R0), jnp.asarray(p0), pf)
    assert jnp.allclose(r_cluster, r_points, rtol=1e-10)


def test_balm1_autodiff_matches_cluster_derivatives():
    _, _, R0, p0, body, f, pf = setup(seed=1, win=4, surf=8, pts=20)
    R0 = jnp.asarray(R0)
    p0 = jnp.asarray(p0)
    T = lie.pose_matrix(R0, p0)
    _, J, H = factors.evaluate(T, f)
    _, J1, H1 = balm1.evaluate(R0, p0, pf)
    assert jnp.allclose(J, J1, atol=1e-8 * float(jnp.max(jnp.abs(J))))
    assert jnp.allclose(H, H1, atol=1e-7 * float(jnp.max(jnp.abs(H))))


def test_balm1_baseline_converges():
    R_gt, p_gt, R0, p0, body, f, pf = setup(seed=2)
    R1, p1, res, iters = balm1.damping_iter(
        jnp.asarray(R0), jnp.asarray(p0), pf
    )
    R1, p1 = lie.gauge_fix(R1, p1)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    rot, tra = metrics.pose_rsme(R1, p1, Rg, pg)
    assert float(rot) * 57.3 < 0.3
    assert float(tra) < 0.02


def test_ef_descends_but_slower_than_lm():
    R_gt, p_gt, R0, p0, body, f, pf = setup(seed=3)
    T0 = lie.pose_matrix(jnp.asarray(R0), jnp.asarray(p0))
    res0 = float(factors.residual_only(T0, f))

    Re, pe, res_ef, it_ef = ef.descend(
        jnp.asarray(R0), jnp.asarray(p0), f, max_iters=50
    )
    assert res_ef < res0  # it descends

    out = lm.damping_iter(
        jnp.asarray(R0), jnp.asarray(p0), f,
        SolverConfig(max_iters=20, u_init=0.1, min_planes_per_pose=1),
    )
    # LM reaches a lower (or equal) cost in far fewer iterations
    assert float(out.residual) <= res_ef * (1 + 1e-6)
    assert int(out.iters) < it_ef or res_ef > float(out.residual)


def test_pa_baseline_converges():
    from balm_tpu.baselines import pa

    R_gt, p_gt, R0, p0, body, f, pf = setup(seed=4)
    R1, p1, cost, iters = pa.alternate(R0, p0, f, outer_iters=15)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    rot, tra = metrics.pose_rsme(R1, p1, Rg, pg)
    assert float(rot) * 57.3 < 0.3
    assert float(tra) < 0.02


def test_pa_plane_refit_is_optimal():
    """The closed-form refit must beat any perturbed plane."""
    import numpy as np
    from balm_tpu.baselines import pa

    _, _, R0, p0, body, f, pf = setup(seed=5, win=4, surf=6, pts=20)
    T = lie.pose_matrix(jnp.asarray(R0), jnp.asarray(p0))
    n, d = pa.refit_planes(T, f)
    base = float(pa._pose_cost(jnp.zeros(4 * 6), jnp.asarray(R0),
                               jnp.asarray(p0), f, n, d))
    rng = np.random.default_rng(0)
    for _ in range(5):
        dn = jnp.asarray(rng.normal(0, 0.01, size=n.shape))
        n2 = n + dn
        n2 = n2 / jnp.linalg.norm(n2, axis=-1, keepdims=True)
        d2 = d + jnp.asarray(rng.normal(0, 0.01, size=d.shape))
        c2 = float(pa._pose_cost(jnp.zeros(4 * 6), jnp.asarray(R0),
                                 jnp.asarray(p0), f, n2, d2))
        assert c2 >= base - 1e-9


def test_pa_whitened_converges():
    """The reference PA algorithm (joint poses + explicit planes,
    whitened 4-dim residual, PA_test.cpp:104-304) recovers the poses."""
    from balm_tpu.baselines import pa_whitened

    R_gt, p_gt, R0, p0, body, f, pf = setup(seed=7)
    R1, p1, cost, iters = pa_whitened.solve(R0, p0, f)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    rot, tra = metrics.pose_rsme(R1, p1, Rg, pg)
    assert iters > 0
    assert float(rot) * 57.3 < 0.5
    assert float(tra) < 0.03


def test_bareg_converges():
    """The reference BAREG algorithm (closed-form refit + trans/rot-axis
    factors, BAREG_test.cpp:129-295) recovers the poses."""
    from balm_tpu.baselines import bareg

    R_gt, p_gt, R0, p0, body, f, pf = setup(seed=8)
    R1, p1, cost, iters = bareg.solve(R0, p0, f)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    rot, tra = metrics.pose_rsme(R1, p1, Rg, pg)
    assert iters > 0
    assert float(rot) * 57.3 < 0.5
    assert float(tra) < 0.03


def test_method_ordering_matches_reference():
    """The reference's comparison finding (SURVEY.md section 6): BALM2 is
    the most accurate; PA and BAREG land between BALM1's first-order
    sluggishness and BALM2 — here measured as final plane cost on the
    identical problem."""
    from balm_tpu.baselines import bareg, pa_whitened

    R_gt, p_gt, R0, p0, body, f, pf = setup(seed=9)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))

    def acc(R, p):
        rot, tra = metrics.pose_rsme(
            jnp.asarray(R), jnp.asarray(p), Rg, pg)
        return float(rot)

    out = lm.damping_iter(jnp.asarray(R0), jnp.asarray(p0), f,
                          SolverConfig(max_iters=30, rel_tol=1e-9,
                                       min_planes_per_pose=1))
    rot_balm2 = acc(out.R, out.p)

    Rp, pp, _, _ = pa_whitened.solve(R0, p0, f)
    rot_pa = acc(Rp, pp)
    Rb, pb, _, _ = bareg.solve(R0, p0, f)
    rot_bareg = acc(Rb, pb)

    # first-order EF with the same iteration budget as BALM2 used
    it2 = int(out.iters)
    R1, p1, res_ef, _ = ef.descend(jnp.asarray(R0), jnp.asarray(p0), f,
                                   max_iters=it2)
    rot_ef = acc(*lie.gauge_fix(R1, p1))

    # BALM2 at least as accurate as every comparison method (small slack:
    # all methods reach the same basin on this clean problem)
    assert rot_balm2 <= rot_pa * 1.1 + 1e-9
    assert rot_balm2 <= rot_bareg * 1.1 + 1e-9
    # at an EQUAL iteration budget first-order EF is clearly behind
    # (the reference's speed ordering; at unlimited budget all converged
    # methods sit at the same noise floor)
    assert rot_ef > rot_balm2


def test_pa_schur_matches_joint():
    """solve_schur (the DENSE_SCHUR-scale form) reaches the same optimum
    as the joint dense solve and recovers the poses."""
    from balm_tpu.baselines import pa_whitened

    R_gt, p_gt, R0, p0, body, f, pf = setup(seed=7)
    R1, p1, c1, it1 = pa_whitened.solve(R0, p0, f)
    R2, p2, c2, it2 = pa_whitened.solve_schur(R0, p0, f)
    assert it2 > 0
    assert abs(c1 - c2) < 1e-6 * max(abs(c1), 1.0), (c1, c2)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    rot, tra = metrics.pose_rsme(R2, p2, Rg, pg)
    assert float(rot) * 57.3 < 0.5
    assert float(tra) < 0.03


def test_bareg_gn_matches_joint():
    """solve_gn (the full-scale GN form) reaches the same optimum as the
    autodiff-Newton inner solve and recovers the poses."""
    from balm_tpu.baselines import bareg

    R_gt, p_gt, R0, p0, body, f, pf = setup(seed=8)
    R1, p1, c1, it1 = bareg.solve(R0, p0, f)
    R2, p2, c2, it2 = bareg.solve_gn(R0, p0, f)
    assert it2 > 0
    assert abs(c1 - c2) < 1e-5 * max(abs(c1), 1e-9), (c1, c2)
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    rot, tra = metrics.pose_rsme(R2, p2, Rg, pg)
    assert float(rot) * 57.3 < 0.5
    assert float(tra) < 0.03
