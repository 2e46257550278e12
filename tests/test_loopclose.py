"""Place recognition + loop closure (pipelines/loopclose.py).

The reference has no loop-closure machinery; these tests pin our
from-scratch pipeline: descriptor yaw convention, edge lifting algebra,
and the end-to-end square-revisit study (detection accuracy, the
drift-bound false-positive gate, and the solve improvement).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from balm_tpu.config import SolverConfig, VoxelConfig
from balm_tpu.ops import factors as Fmod
from balm_tpu.ops import lie, pose_graph as PG
from balm_tpu.pipelines import loopclose as LC
from balm_tpu.solver import lm
from balm_tpu.utils import metrics
from balm_tpu.voxel import grid


def _yaw_mat(psi):
    c, s = np.cos(psi), np.sin(psi)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _dense_scene(seed=0, n=6000, ar=1.2, br=0.6, az=0.4, kr=3, kz=2):
    """Angle-coded radius+height point ring: every sector distinct."""
    rng = np.random.default_rng(seed)
    th = rng.uniform(-np.pi, np.pi, n)
    r = (2.0 + ar * np.cos(th) + br * np.sin(kr * th)
         + rng.normal(0, 0.1, n))
    z = 0.5 + az * np.sin(kz * th) + rng.normal(0, 0.05, n)
    return np.stack([r * np.cos(th), r * np.sin(th), z], -1)


def test_descriptor_yaw_convention():
    """R_B = R_A Rz(psi)  =>  sc dist ~ 0 and shift_to_yaw = -psi."""
    A = _dense_scene()
    cfg = LC.LoopConfig()
    for psi_deg in (30.0, 90.0, -54.0):
        psi = np.deg2rad(psi_deg)
        B = A @ _yaw_mat(psi)      # body points of the rotated pose
        desc, _ = LC.descriptors([A, B], cfg)
        d, s = LC.sc_distance(desc[[0]], desc[[1]], cfg.min_valid_cols)
        assert d[0] < 0.05
        yaw = LC.shift_to_yaw(int(s[0]), cfg.n_sectors)
        err = abs((yaw + psi + np.pi) % (2 * np.pi) - np.pi)
        assert err < 2 * np.pi / cfg.n_sectors + 1e-9


def test_descriptor_translation_sensitivity():
    """A far-away place must NOT match (sanity on the metric)."""
    A = _dense_scene(seed=0)
    # structurally different place (other harmonics, inverted height)
    C = _dense_scene(seed=99, ar=-0.8, br=1.0, az=-0.7, kr=5, kz=4)
    cfg = LC.LoopConfig()
    desc, _ = LC.descriptors([A, C], cfg)
    d_same, _ = LC.sc_distance(desc[[0]], desc[[0]], cfg.min_valid_cols)
    d_diff, _ = LC.sc_distance(desc[[0]], desc[[1]], cfg.min_valid_cols)
    assert d_same[0] < 1e-6
    assert d_diff[0] > d_same[0] + 0.05


def test_lift_edges_exact():
    """Lifting a gt-consistent scan edge yields the gt anchor edge."""
    rng = np.random.default_rng(3)

    def rand_pose():
        R = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.5, 3))))
        return R, rng.normal(0, 2.0, 3)

    # two blocks with anchors TA0, TA1; scans a (block 0), b (block 1)
    RA0, pA0 = rand_pose()
    RA1, pA1 = rand_pose()
    Ra, pa = rand_pose()    # rel pose of scan a in anchor 0 frame
    Rb, pb = rand_pose()    # rel pose of scan b in anchor 1 frame
    # global scan poses
    Rga = RA0 @ Ra
    pga = RA0 @ pa + pA0
    Rgb = RA1 @ Rb
    pgb = RA1 @ pb + pA1
    # gt scan-level edge a->b
    Zr = Rga.T @ Rgb
    Zp = Rga.T @ (pgb - pga)
    edges = PG.RelPoseEdges(
        i=jnp.asarray([0], jnp.int32), j=jnp.asarray([1], jnp.int32),
        Zr=jnp.asarray(Zr[None]), Zp=jnp.asarray(Zp[None]),
        w_rot=jnp.asarray([2.0]), w_tr=jnp.asarray([3.0]))
    owner = np.array([0, 1])
    lifted = PG.lift_edges(edges, owner, [Ra, Rb], [pa, pb])
    Zr_gt = RA0.T @ RA1
    Zp_gt = RA0.T @ (pA1 - pA0)
    np.testing.assert_allclose(np.asarray(lifted.Zr)[0], Zr_gt, atol=1e-12)
    np.testing.assert_allclose(np.asarray(lifted.Zp)[0], Zp_gt, atol=1e-12)
    assert float(lifted.w_rot[0]) == 2.0 and float(lifted.w_tr[0]) == 3.0
    # in-block edge is dropped
    assert PG.lift_edges(edges, np.array([0, 0]), [Ra, Rb], [pa, pb]) is None


def test_concat_edges():
    e = PG.RelPoseEdges(
        i=jnp.asarray([0], jnp.int32), j=jnp.asarray([1], jnp.int32),
        Zr=jnp.eye(3)[None], Zp=jnp.zeros((1, 3)),
        w_rot=jnp.ones(1), w_tr=jnp.ones(1))
    assert PG.concat_edges(None, e) is e
    assert PG.concat_edges(e, None) is e
    both = PG.concat_edges(e, e)
    assert both.i.shape == (2,)


# ---------------------------------------------------------------------------
# end-to-end square-revisit study


def make_loop_scene(W=72, side=12.0, laps=1.25, seed=0, pts_per=50,
                    vis=4.0):
    """Square-courtyard route traversed 1.25 laps: the last quarter
    revisits the first.  Same patch-world construction as the city demo
    (walls flanking the path, floor, cross patches pinning the
    along-path mode)."""
    rng = np.random.default_rng(seed)
    cs = [np.array([0.0, 0.0]), np.array([side, 0.0]),
          np.array([side, side]), np.array([0.0, side])]
    segs = [(cs[k], cs[(k + 1) % 4]) for k in range(4)]
    perim = 4 * side
    p = np.zeros((W, 3))
    yaw = np.zeros(W)
    for w, s in enumerate((np.arange(W) / W) * laps * perim):
        s = s % perim
        k = min(int(s // side), 3)
        a, b = segs[k]
        t = (s - k * side) / side
        d = (b - a) / side
        p[w, :2] = a + t * (b - a)
        yaw[w] = np.arctan2(d[1], d[0])
    R = np.stack([_yaw_mat(y) for y in yaw])

    centers, axes = [], []

    def street(a, b):
        d = (b - a) / np.linalg.norm(b - a)
        n = np.array([-d[1], d[0]])
        for t in np.arange(0.5, np.linalg.norm(b - a), 1.0):
            xy = a + t * d
            for off in (-1.5, 1.5):
                q = xy + off * n
                centers.append([q[0], q[1], 0.5])
                axes.append(1 if abs(n[1]) > 0.5 else 0)
            centers.append([xy[0], xy[1], -0.5])
            axes.append(2)
            if int(t) % 3 == 0:
                off = 1.2 if (int(t) // 3) % 2 == 0 else -1.2
                q = xy + off * n
                centers.append([q[0] + 0.5 * d[0], q[1] + 0.5 * d[1], 0.5])
                axes.append(0 if abs(n[1]) > 0.5 else 1)

    for a, b in segs:
        street(a, b)
    centers = np.asarray(centers)
    axes = np.asarray(axes)
    scans = []
    for w in range(W):
        pts = []
        near = np.linalg.norm(centers[:, :2] - p[w][:2], axis=1) < vis
        for g in np.nonzero(near)[0]:
            uv = rng.uniform(-0.45, 0.45, (pts_per, 2))
            th = rng.normal(0, 0.004, (pts_per, 1))
            local = np.concatenate([uv, th], -1)
            world = local[:, np.roll(np.arange(3), axes[g] + 1)] + centers[g]
            pts.append((world - p[w]) @ R[w])
        scans.append(np.concatenate(pts) if pts else np.zeros((0, 3)))
    return R, p, scans


def _perturb_cumulative(R, p, seed, rot_step_deg=0.06, trans_step=0.02):
    rng = np.random.default_rng(seed)
    W = len(R)
    dw = np.cumsum(rng.normal(0, rot_step_deg / 57.3, (W, 3)), axis=0)
    dt = np.cumsum(rng.normal(0, trans_step, (W, 3)), axis=0)
    Rn = np.einsum("wab,wbc->wac",
                   np.asarray(lie.so3_exp(jnp.asarray(dw))), R)
    return Rn, p + dt


@pytest.fixture(scope="module")
def square_revisit():
    R_gt, p_gt, scans = make_loop_scene()
    R0, p0 = _perturb_cumulative(R_gt, p_gt, seed=3)
    return R_gt, p_gt, scans, R0, p0


def test_detect_and_solve(square_revisit):
    R_gt, p_gt, scans, R0, p0 = square_revisit
    cfg = LC.LoopConfig(max_dist=5.0, query_every=2)
    edges, info = LC.detect(scans, R0, p0, cfg)
    assert edges is not None and info["n_verified"] >= 3

    # every verified edge matches the gt relative pose (the drift-bound
    # gate must have rejected the symmetric-street 180-deg flip)
    ei = np.asarray(edges.i)
    ej = np.asarray(edges.j)
    Zr = np.asarray(edges.Zr)
    Zp = np.asarray(edges.Zp)
    for k in range(len(ei)):
        a, b = int(ei[k]), int(ej[k])
        Zr_gt = R_gt[a].T @ R_gt[b]
        Zp_gt = R_gt[a].T @ (p_gt[b] - p_gt[a])
        ang = np.arccos(np.clip((np.trace(Zr_gt.T @ Zr[k]) - 1) / 2, -1, 1))
        assert ang < np.deg2rad(1.0)
        assert np.linalg.norm(Zp[k] - Zp_gt) < 0.06
        assert abs(a - b) >= cfg.min_separation

    # the solve study: this scene makes a FLAT solve from the drifted
    # init lock into drifted association and bend the square (trans gets
    # ~20x worse than init); the verified loop edges recover it to near
    # the from-gt floor
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    vcfg = VoxelConfig(voxel_size=1.0)
    scfg = SolverConfig(max_iters=30, u_init=0.01, min_planes_per_pose=1)

    def solve(eds):
        vres = grid.voxelize(list(scans), R0, p0, vcfg, dtype=np.float64)
        f = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
        res = lm.damping_iter(jnp.asarray(R0), jnp.asarray(p0), f, scfg,
                              edges=eds)
        return metrics.pose_rsme(*lie.gauge_fix(res.R, res.p), Rg, pg)

    _, t_noloop = solve(None)
    _, t_loop = solve(edges)
    _, t_init = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg), 0
    r_init, t_init = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg)
    assert float(t_loop) < 0.5 * float(t_noloop)
    assert float(t_loop) < 0.5 * float(t_init)


def test_drift_gate_rejects_flip(square_revisit):
    """With the drift bound disabled (loose), the symmetric street admits
    a ~180-deg flipped edge; the default bound rejects exactly those."""
    R_gt, p_gt, scans, R0, p0 = square_revisit
    loose = LC.LoopConfig(max_dist=5.0, query_every=2,
                          max_correction_rot=np.pi)
    e_loose, _ = LC.detect(scans, R0, p0, loose)
    tight = LC.LoopConfig(max_dist=5.0, query_every=2)
    e_tight, info_t = LC.detect(scans, R0, p0, tight)

    def worst_rot_err(edges):
        worst = 0.0
        for k in range(len(np.asarray(edges.i))):
            a, b = int(edges.i[k]), int(edges.j[k])
            Zr_gt = R_gt[a].T @ R_gt[b]
            ang = np.arccos(np.clip(
                (np.trace(Zr_gt.T @ np.asarray(edges.Zr)[k]) - 1) / 2,
                -1, 1))
            worst = max(worst, float(ang))
        return worst

    assert worst_rot_err(e_tight) < np.deg2rad(1.0)
    # the loose run demonstrates the failure mode exists at all (if the
    # scene ever stops producing it, the gate is still harmless)
    if worst_rot_err(e_loose) > np.deg2rad(90):
        assert info_t.get("n_drift_rejected", 0) >= 1


def test_hierarchical_consumes_loop_edges(square_revisit):
    """Cross-block loop edges reach the anchor graph via lift_edges and
    the scan-level polish; with them the hierarchy lands at least as
    well as without (the big WINS are scene-dependent — the flat study
    above and the city-demo artifact carry the improvement claims; this
    test pins the plumbing: edges are lifted, consumed at every level,
    and never degrade a healthy solve)."""
    from balm_tpu.pipelines import hierarchical as H

    R_gt, p_gt, scans, R0, p0 = square_revisit
    edges, _ = LC.detect(scans, R0, p0,
                         LC.LoopConfig(max_dist=5.0, query_every=2))
    assert edges is not None
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    cfg = H.HierarchicalConfig(
        block=12, stride=9, cycles=1, polish=True,
        voxel=VoxelConfig(voxel_size=1.0),
        top_voxel=VoxelConfig(voxel_size=1.0))
    R1, p1, info1 = H.run(scans, R0, p0, cfg)
    R2, p2, info2 = H.run(scans, R0, p0, cfg, scan_edges=edges)
    assert info2.get("n_lifted_edges", 0) >= 1
    _, t1 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R1), jnp.asarray(p1)), Rg, pg)
    _, t2 = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R2), jnp.asarray(p2)), Rg, pg)
    # with verified loops the polish-enforced result must not be worse
    assert float(t2) < 1.1 * float(t1)
    # and both land well under the drifted init
    _, t_init = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg)
    assert float(t2) < 0.6 * float(t_init)


def test_chain_edges_zero_cost(square_revisit):
    """Chain edges measured from a trajectory cost exactly zero on it."""
    _, _, _, R0, p0 = square_revisit
    chain = LC.chain_edges(R0, p0, 0.002, 0.01)
    c = float(PG.relpose_cost(jnp.asarray(R0), jnp.asarray(p0), chain))
    assert c < 1e-16


def test_pgo_flow(square_revisit):
    """The classic decomposition (detect -> PGO -> BA): the pose-graph
    stage alone reduces the loop-edge cost by >10x without breaking the
    chain, and the follow-up PLAIN flat BA (no edges) lands near the
    from-gt floor — on a scene where flat BA from the raw init bends the
    square by ~20x the init error (test_detect_and_solve)."""
    R_gt, p_gt, scans, R0, p0 = square_revisit
    Rg, pg = lie.gauge_fix(jnp.asarray(R_gt), jnp.asarray(p_gt))
    R1, p1, edges, info = LC.close_loops(
        scans, R0, p0, LC.LoopConfig(max_dist=5.0, query_every=2))
    assert edges is not None
    assert info["pgo"]["final_cost"] < 0.1 * info["pgo"]["initial_cost"]
    # gauge: pose 0 re-anchored to its input value
    np.testing.assert_allclose(R1[0], R0[0], atol=1e-12)
    np.testing.assert_allclose(p1[0], p0[0], atol=1e-12)

    _, t_init = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R0), jnp.asarray(p0)), Rg, pg)
    _, t_pgo = metrics.pose_rsme(
        *lie.gauge_fix(jnp.asarray(R1), jnp.asarray(p1)), Rg, pg)
    assert float(t_pgo) < 1.2 * float(t_init)  # PGO itself never hurts

    vres = grid.voxelize(list(scans), R1, p1, VoxelConfig(voxel_size=1.0),
                         dtype=np.float64)
    f = Fmod.PlaneFactors(*[jnp.asarray(x) for x in vres.factors])
    res = lm.damping_iter(
        jnp.asarray(R1), jnp.asarray(p1), f,
        SolverConfig(max_iters=30, u_init=0.01, min_planes_per_pose=1))
    _, t_ba = metrics.pose_rsme(*lie.gauge_fix(res.R, res.p), Rg, pg)
    assert float(t_ba) < 0.2 * float(t_init)


def test_evaluate_relpose_scatter_matches_dense():
    """The per-edge 12x12 scatter assembly IS the exact chart Hessian:
    the cost is a sum of two-pose terms, so scattering per-edge
    grads/Hessians must reproduce autodiff through the full 6W chart
    (the O((6W)^2) oracle kept as evaluate_relpose_dense)."""
    rng = np.random.default_rng(7)
    W, E = 11, 20
    R = np.stack([np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.5, 3))))
                  for _ in range(W)])
    p = rng.normal(0, 2, (W, 3))
    i = rng.integers(0, W, E)
    j = (i + 1 + rng.integers(0, W - 1, E)) % W
    Zr = np.stack([np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.3, 3))))
                   for _ in range(E)])
    edges = PG.RelPoseEdges(
        jnp.asarray(i, jnp.int32), jnp.asarray(j, jnp.int32),
        jnp.asarray(Zr), jnp.asarray(rng.normal(0, 1, (E, 3))),
        jnp.asarray(rng.uniform(0.5, 2, E)),
        jnp.asarray(rng.uniform(0.5, 2, E)))
    r1, J1, H1 = PG.evaluate_relpose(jnp.asarray(R), jnp.asarray(p), edges)
    r0, J0, H0 = PG.evaluate_relpose_dense(
        jnp.asarray(R), jnp.asarray(p), edges)
    np.testing.assert_allclose(float(r1), float(r0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), atol=1e-9)

    r, J, H = PG.evaluate_relpose(
        jnp.asarray(R), jnp.asarray(p), PG.RelPoseEdges.empty())
    assert float(r) == 0.0 and J.shape == (6 * W,) and H.shape == (6 * W, 6 * W)


def test_robust_edge_cap():
    """Huber-robustified edges: (a) chi2=0 stays NaN-free through grad,
    (b) inside the Huber point the cost/derivatives equal the quadratic
    form exactly, (c) an outlier edge's gradient norm is capped (stops
    growing with the error) while the quadratic one keeps growing."""
    rng = np.random.default_rng(11)
    W = 4
    R = np.stack([np.eye(3)] * W)
    p = rng.normal(0, 1, (W, 3))

    def one_edge(Zp_err, w=100.0):
        Zr = np.eye(3)[None]
        Zp = (p[1] - p[0] + np.array([Zp_err, 0, 0]))[None]
        return PG.RelPoseEdges(
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32),
            jnp.asarray(Zr), jnp.asarray(Zp),
            jnp.asarray([w]), jnp.asarray([w]))

    delta = jnp.asarray([1.0])   # chi2 Huber point: |err| = 0.1 at w=100

    # (a) exactly-satisfied edge: zero cost, finite derivatives
    r, J, H = PG.evaluate_relpose(jnp.asarray(R), jnp.asarray(p),
                                  one_edge(0.0), delta)
    assert float(r) == 0.0
    assert np.all(np.isfinite(np.asarray(J))) and np.all(
        np.isfinite(np.asarray(H)))

    # (b) inside the Huber point: identical to quadratic
    e = one_edge(0.05)           # chi2 = 100 * 0.0025 = 0.25 < 1
    rr, Jr, Hr = PG.evaluate_relpose(jnp.asarray(R), jnp.asarray(p), e, delta)
    rq, Jq, Hq = PG.evaluate_relpose(jnp.asarray(R), jnp.asarray(p), e)
    np.testing.assert_allclose(float(rr), float(rq), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Jr), np.asarray(Jq), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Hr), np.asarray(Hq), atol=1e-12)

    # (c) outliers: robust gradient saturates, quadratic grows linearly
    def gnorm(err, robust):
        d = delta if robust else None
        _, J, _ = PG.evaluate_relpose(jnp.asarray(R), jnp.asarray(p),
                                      one_edge(err), d)
        return float(jnp.linalg.norm(J))

    g1, g2 = gnorm(0.5, True), gnorm(5.0, True)
    q1, q2 = gnorm(0.5, False), gnorm(5.0, False)
    assert q2 > 5 * q1                  # quadratic: grad ~ err
    assert g2 < 1.5 * g1                # robust: grad ~ const past delta


def test_robust_edge_f32_exact_chain_nan_free():
    """f32 regression (ADVICE r2): the production TPU regime runs with
    x64 off, where a fixed 1e-300 sqrt floor underflows to 0 — an
    exactly-satisfied edge (chi2 == 0, e.g. stationary consecutive poses)
    then NaN-poisons J/H through the sqrt-at-zero `where` reverse pass,
    which silently no-ops every PGO/edge-constrained Newton step.  Runs
    the chi2=0 edge in explicit float32 through BOTH the delta=None
    (quadratic, routed via _robust with delta=1e30) and the Huber path."""
    W = 3
    R = jnp.asarray(np.stack([np.eye(3)] * W), jnp.float32)
    p = jnp.asarray(np.zeros((W, 3)), jnp.float32)   # stationary chain
    edges = PG.RelPoseEdges(
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([1, 2], jnp.int32),
        jnp.asarray(np.stack([np.eye(3)] * 2), jnp.float32),
        jnp.asarray(np.zeros((2, 3)), jnp.float32),
        jnp.asarray([1.0, 1.0], jnp.float32),
        jnp.asarray([1.0, 1.0], jnp.float32))
    for delta in (None, jnp.asarray([1.0, 1.0], jnp.float32)):
        r, J, H = PG.evaluate_relpose(R, p, edges, delta)
        assert float(r) == 0.0
        assert np.all(np.isfinite(np.asarray(J)))
        assert np.all(np.isfinite(np.asarray(H)))


def test_pose_graph_sparse_matches_dense():
    """The sparse block solver (chain + loop edges -> block-tridiagonal
    + off-band splu) must reproduce the dense (6W)^2 LU path exactly:
    same damped-Newton directions, same accept decisions, same final
    trajectory.  The dense path is kept solely as this oracle."""
    rng = np.random.default_rng(3)
    W = 40
    # noisy circle trajectory with a few long-range loop edges
    th = np.linspace(0, 2 * np.pi, W, endpoint=False)
    p_gt = np.stack([10 * np.cos(th), 10 * np.sin(th), 0 * th], -1)
    R_gt = np.stack([np.asarray(lie.so3_exp(jnp.asarray([0, 0, t])))
                     for t in th])
    R0 = np.stack([
        np.asarray(lie.so3_exp(jnp.asarray(rng.normal(0, 0.02, 3)))) @ R_gt[k]
        for k in range(W)])
    p0 = p_gt + rng.normal(0, 0.05, (W, 3))

    chain = LC.chain_edges(R_gt, p_gt, 0.01, 0.02)
    li = np.asarray([0, 5, 12], np.int32)
    lj = np.asarray([W // 2, W // 2 + 5, W - 3], np.int32)
    Zr = np.einsum("eba,ebc->eac", R_gt[li], R_gt[lj])
    Zp = np.einsum("eba,eb->ea", R_gt[li],
                   p_gt[lj] - p_gt[li]) + rng.normal(0, 0.01, (3, 3))
    loops = PG.RelPoseEdges(
        jnp.asarray(li), jnp.asarray(lj), jnp.asarray(Zr), jnp.asarray(Zp),
        jnp.full((3,), 100.0), jnp.full((3,), 100.0))
    edges = PG.concat_edges(chain, loops)
    delta = jnp.concatenate([jnp.full((W - 1,), 1e30),
                             jnp.full((3,), 0.5)])

    Rs, ps, is_ = LC.pose_graph_optimize(R0, p0, edges, delta=delta,
                                         solver="sparse")
    Rd, pd, id_ = LC.pose_graph_optimize(R0, p0, edges, delta=delta,
                                         solver="dense")
    assert is_["iters"] == id_["iters"]
    assert is_["accepted"] == id_["accepted"]
    np.testing.assert_allclose(is_["final_cost"], id_["final_cost"],
                               rtol=1e-10)
    np.testing.assert_allclose(Rs, Rd, atol=1e-9)
    np.testing.assert_allclose(ps, pd, atol=1e-8)
