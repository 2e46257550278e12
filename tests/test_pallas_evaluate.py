"""The fused Pallas evaluation path must reproduce the XLA evaluator
exactly (same math, same f32 precision) and track the f64 oracle.

Runs in interpreter mode on CPU (conftest forces CPU); the compiled TPU
path is exercised by bench.py / the realworld pipeline on hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from balm_tpu.ops import factors, lie
from balm_tpu.ops import packed as pk
from balm_tpu.ops import pallas_evaluate as pe

from test_factors import make_problem


def _packed_problem(seed=0, G=6, W=5, far_shift=None, **kw):
    R, p, f, centers = make_problem(G=G, W=W, seed=seed, **kw)
    if far_shift is not None:
        p = p + far_shift
        centers = centers + far_shift
    f = f._replace(centers=centers)
    fr = factors.recenter_bodies(f)
    f32 = fr.astype(jnp.float32)
    return (R.astype(jnp.float32), p.astype(jnp.float32), f32,
            pk.pack_factors(f32), fr, R, p)


@pytest.mark.parametrize("sparse_obs,with_fix", [(False, False), (True, True)])
def test_evaluate_packed_matches_xla(sparse_obs, with_fix):
    R32, p32, f32, packed, _, _, _ = _packed_problem(
        seed=11, sparse_obs=sparse_obs, with_fix=with_fix)
    T32 = lie.pose_matrix(R32, p32)
    res0, J0, H0 = factors.evaluate(T32, f32, centered=True)
    res1, J1, H1 = pe.evaluate_packed(R32, p32, packed, interpret=True)

    assert np.isfinite(float(res1))
    assert abs(float(res0) - float(res1)) < 1e-4 * abs(float(res0))
    # identical math, different f32 reduction order -> a few ulps per term
    js = float(jnp.max(jnp.abs(J0))) + 1e-12
    assert float(jnp.max(jnp.abs(J0 - J1))) < 1e-4 * js
    hs = float(jnp.max(jnp.abs(H0))) + 1e-12
    assert float(jnp.max(jnp.abs(H0 - H1))) < 1e-4 * hs


def test_evaluate_packed_tracks_f64_oracle():
    _, _, _, packed, fr, R, p = _packed_problem(seed=12, sparse_obs=True)
    T = lie.pose_matrix(R, p)
    res64, J64, H64 = factors.evaluate(T, fr, centered=True)
    res1, J1, H1 = pe.evaluate_packed(
        R.astype(jnp.float32), p.astype(jnp.float32), packed, interpret=True)
    assert abs(float(res64) - float(res1)) < 1e-3 * abs(float(res64))
    js = float(jnp.max(jnp.abs(J64))) + 1e-12
    assert float(jnp.max(jnp.abs(J64 - J1))) < 1e-3 * js
    hs = float(jnp.max(jnp.abs(H64))) + 1e-12
    assert float(jnp.max(jnp.abs(H64 - H1))) < 1e-3 * hs


def test_residual_only_packed_matches():
    R32, p32, f32, packed, _, _, _ = _packed_problem(
        seed=13, sparse_obs=True, with_fix=True)
    # perturbed trial poses (the LM trial-residual use case)
    dx = jnp.asarray(
        np.random.default_rng(3).normal(size=(R32.shape[0], 6)) * 0.01,
        jnp.float32)
    Rt, pt = lie.se3_left_update(R32, p32, dx)
    r0 = factors.residual_only(
        lie.pose_matrix(Rt, pt), f32, centered=True)
    r1 = pe.residual_only_packed(Rt, pt, packed, interpret=True)
    assert abs(float(r0) - float(r1)) < 1e-4 * abs(float(r0))


def test_far_from_origin_f32_conditioning():
    """Packed path inherits the centering trick: f32 stays within 1e-3 of
    f64 even with the scene 300+ m from the origin."""
    shift = jnp.asarray([300.0, -200.0, 120.0])
    _, _, _, packed, fr, R, p = _packed_problem(
        seed=14, far_shift=shift)
    T = lie.pose_matrix(R, p)
    res64, J64, H64 = factors.evaluate(T, fr, centered=True)
    res1, J1, H1 = pe.evaluate_packed(
        R.astype(jnp.float32), p.astype(jnp.float32), packed, interpret=True)
    assert abs(float(res64) - float(res1)) < 2e-3 * abs(float(res64))
    hs = float(jnp.max(jnp.abs(H64)))
    assert float(jnp.max(jnp.abs(H64 - H1))) < 5e-3 * hs


def test_csum_matches_plane_moment():
    """Two-pass f32 kernel covariance vs the f64 one-pass oracle — the
    two-pass form must track f64 tighter than one-pass f32 can."""
    R32, p32, f32, packed, fr, R, p = _packed_problem(
        seed=15, sparse_obs=True, with_fix=True)
    T = lie.pose_matrix(R, p)
    _, _, TCT, _, NN, vbar, covM = factors._plane_moment(
        T, fr, centered=True)  # f64 oracle
    pose = pk.pad_poses(R32, p32, packed.wp).astype(jnp.float32)
    csum = pe.csum_packed(pose, packed.mom, packed.cen, packed.cfix,
                          interpret=True)
    G = f32.num_planes
    _, _, _, vbar2, cov2 = pk.csum_to_cov(csum, packed.coe)
    assert float(jnp.max(jnp.abs(csum[9, :G] - NN))) < 1e-4 * float(
        jnp.max(NN))
    cs = float(jnp.max(jnp.abs(covM))) + 1e-12
    assert float(jnp.max(jnp.abs(cov2[:G] - covM))) < 2e-5 * cs
    assert float(jnp.max(jnp.abs(vbar2[:, :G].T - vbar))) < 1e-5 * (
        float(jnp.max(jnp.abs(vbar))) + 1e-12)


def test_csum_xla_matches_pallas_kernel():
    """The matmul formulation (production) vs the Pallas kernel
    (independent implementation) — same channels to f32 roundoff."""
    R32, p32, f32, packed, fr, R, p = _packed_problem(
        seed=21, sparse_obs=True, with_fix=True)
    pose = pk.pad_poses(R32, p32, packed.wp).astype(jnp.float32)
    a = pe.csum_packed(pose, packed.mom, packed.cen, packed.cfix,
                       interpret=True)
    b = pe.csum_packed_xla(pose, packed.mom, packed.cen, packed.cfix)
    scale = float(jnp.max(jnp.abs(a))) + 1e-12
    assert float(jnp.max(jnp.abs(a - b))) < 1e-5 * scale


def test_evaluate_packed_pallas2_matches_xla():
    """The v2 fused kernel (full-array channels + in-VMEM rows + split
    dot) vs the XLA formulation — same (res, J, H) to f32/tile-order
    roundoff."""
    R32, p32, f32, packed, fr, R, p = _packed_problem(
        seed=7, sparse_obs=True, with_fix=True)
    ra = pe.evaluate_packed(R32, p32, packed, impl="xla")
    rb = pe.evaluate_packed(R32, p32, packed, impl="pallas2",
                            interpret=True)
    assert abs(float(ra[0]) - float(rb[0])) < 1e-6 * abs(float(ra[0]))
    js = float(jnp.max(jnp.abs(ra[1]))) + 1e-12
    assert float(jnp.max(jnp.abs(ra[1] - rb[1]))) < 1e-4 * js
    hs = float(jnp.max(jnp.abs(ra[2]))) + 1e-12
    assert float(jnp.max(jnp.abs(ra[2] - rb[2]))) < 1e-4 * hs


@pytest.mark.parametrize("bw", [8, 16])
def test_hess_packed_v3_matches_xla_multiblock(bw):
    """The blocked pose-pair grid (v3) vs the XLA formulation with the
    window split across several pose blocks — bw=8 tiles Wp=24 exactly
    (3 blocks, 6 pairs); bw=16 exercises the ragged-final-block padding
    path (WpB=32 > Wp=24)."""
    R32, p32, f32, packed, fr, R, p = _packed_problem(
        seed=31, G=12, W=20, sparse_obs=True, with_fix=True)
    pose = pk.pad_poses(R32, p32, packed.wp).astype(jnp.float32)
    csum = pe.csum_packed_xla(pose, packed.mom, packed.cen, packed.cfix)
    _, aux = pe._aux_from_csum(csum, packed, 1e-9)
    Ha, Ja, Da = pe.hess_packed_xla(pose, packed.mom, packed.cen, aux)
    Hb, Jb, Db = pe.hess_packed_v3(pose, packed.mom, packed.cen, aux,
                                   interpret=True, split="f32",
                                   bw=bw, bg=128)
    # J/D accumulate per plane TILE (vs one full-axis sum in the XLA
    # form); the sum has real cancellation, so the split reduction order
    # shows up at ~1e-4 relative — same bound as the v2 kernel tests
    hs = float(jnp.max(jnp.abs(Ha))) + 1e-12
    assert float(jnp.max(jnp.abs(Ha - Hb))) < 1e-5 * hs
    js = float(jnp.max(jnp.abs(Ja))) + 1e-12
    assert float(jnp.max(jnp.abs(Ja - Jb[:, :6]))) < 1e-4 * js
    ds = float(jnp.max(jnp.abs(Da))) + 1e-12
    assert float(jnp.max(jnp.abs(Da - Db[:, :36]))) < 1e-4 * ds


def test_evaluate_packed_pallas3_matches_xla():
    """End-to-end evaluate with the v3 blocked kernel (single-block grid
    at this size — the multi-block case is covered above)."""
    R32, p32, f32, packed, fr, R, p = _packed_problem(
        seed=8, sparse_obs=True, with_fix=True)
    ra = pe.evaluate_packed(R32, p32, packed, impl="xla")
    rb = pe.evaluate_packed(R32, p32, packed, impl="pallas3",
                            interpret=True)
    assert abs(float(ra[0]) - float(rb[0])) < 1e-6 * abs(float(ra[0]))
    js = float(jnp.max(jnp.abs(ra[1]))) + 1e-12
    assert float(jnp.max(jnp.abs(ra[1] - rb[1]))) < 1e-4 * js
    hs = float(jnp.max(jnp.abs(ra[2]))) + 1e-12
    assert float(jnp.max(jnp.abs(ra[2] - rb[2]))) < 1e-4 * hs


def test_lm_backend_pallas_matches_xla():
    from balm_tpu.config import SolverConfig
    from balm_tpu.solver import lm

    R32, p32, f32, _, _, _, _ = _packed_problem(seed=16, G=8, W=5,
                                                sparse_obs=True)
    # perturb away from the optimum so the loop does real work
    dx = jnp.asarray(
        np.random.default_rng(5).normal(size=(R32.shape[0], 6)) * 0.02,
        jnp.float32)
    R0, p0 = lie.se3_left_update(R32, p32, dx)
    cfg = SolverConfig(max_iters=6, rel_tol=0.0)
    ra = lm.damping_iter(R0, p0, f32, cfg, centered=True, backend="xla")
    rb = lm.damping_iter(R0, p0, f32, cfg, centered=True, backend="pallas")
    assert int(ra.iters) == int(rb.iters)
    assert abs(float(ra.residual) - float(rb.residual)) < 1e-3 * abs(
        float(ra.residual))
    assert float(jnp.max(jnp.abs(ra.p - rb.p))) < 1e-3


def test_lm_packed_impl_and_precision_variants():
    """All (packed_impl, hess_precision) combinations must converge to
    the same solution on a small problem (interpret mode on CPU; the
    precision knob is a TPU matmul-pass count, a no-op here — this test
    covers the plumbing and the pallas2 loop path)."""
    from balm_tpu.config import SolverConfig
    from balm_tpu.solver import lm

    R32, p32, f32, packed, fr, R, p = _packed_problem(seed=13)
    cfg = SolverConfig(max_iters=4, rel_tol=0.0, min_planes_per_pose=0)
    ref = lm.damping_iter(R32, p32, fr, cfg, centered=True,
                          backend="packed")
    for impl, hp in (("pallas2", "high"), ("xla", "highest"),
                     ("xla", "bf16")):
        out = lm.damping_iter(R32, p32, fr, cfg, centered=True,
                              backend="packed", packed_impl=impl,
                              hess_precision=hp)
        assert abs(float(out.residual) - float(ref.residual)) < 1e-3 * (
            abs(float(ref.residual)) + 1e-12)
        assert float(jnp.max(jnp.abs(out.p - ref.p))) < 1e-3


def test_packed_backend_at_large_w():
    """The packed backend has no window-size limit (its Hessian is an
    HBM matmul, unlike the superseded all-VMEM Pallas kernel which OOMed
    past W ~ 230) — a W = 248 solve must just work."""
    import numpy as np
    from balm_tpu.config import SolverConfig
    from balm_tpu.solver import lm

    rng = np.random.default_rng(0)
    W, G = 248, 4
    C = jnp.zeros((128, W, 4, 4)).at[:G, :, 3, 3].set(5.0)
    C = C.at[:G, :, 0, 0].set(1.0).at[:G, :, 1, 1].set(1.0)
    f = factors.PlaneFactors.create(C.astype(jnp.float32))
    R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (W, 1, 1))
    p = jnp.asarray(rng.normal(size=(W, 3)) * 0.01, jnp.float32)
    res = lm.damping_iter(R, p, f,
                          SolverConfig(max_iters=1, min_planes_per_pose=0),
                          centered=True, backend="packed")
    assert np.isfinite(float(res.residual))


def test_chunked_evaluate_matches_unchunked():
    """evaluate_packed_chunked (the beyond-W=2048-compile-ceiling
    factor-chunked form) must match evaluate_packed bit-for-bit up to
    chunk-reduction roundoff."""
    import jax

    from balm_tpu.config import SolverConfig
    from balm_tpu.solver import lm
    from tests.test_factors import make_problem

    R, p, f, _ = make_problem(G=37, W=5, K=20, seed=9)
    fr = factors.recenter_bodies(f).astype(jnp.float32)
    fr = jax.tree_util.tree_map(jnp.asarray, fr)
    pkf = pk.pack_factors(fr)
    Rj = jnp.asarray(R, jnp.float32)
    pj = jnp.asarray(p, jnp.float32)
    with jax.default_matmul_precision("float32"):
        r0, J0, H0 = pe.evaluate_packed(Rj, pj, pkf, interpret=True)
        pk2 = pk.pad_planes(pkf, 128)
        r1, J1, H1 = pe.evaluate_packed_chunked(
            Rj, pj, pk2, n_chunks=pk2.gp // 128)
    assert abs(float(r0) - float(r1)) < 1e-5 * abs(float(r0))
    assert float(jnp.max(jnp.abs(J0 - J1))) < 1e-4 * float(
        jnp.max(jnp.abs(J0)))
    assert float(jnp.max(jnp.abs(H0 - H1))) < 1e-4 * float(
        jnp.max(jnp.abs(H0)))

    cfg = SolverConfig(max_iters=5, u_init=0.01, min_planes_per_pose=1)
    a = lm.damping_iter(Rj, pj, fr, cfg, centered=True, backend="packed")
    b = lm.damping_iter(Rj, pj, fr, cfg, centered=True, backend="packed",
                        chunk_planes=128)
    assert abs(float(a.residual) - float(b.residual)) < 1e-5 * abs(
        float(a.residual))


def test_hybrid_impl_matches_xla():
    """impl='hybrid' (Pallas rows + XLA dot — the TPU production
    default) must match the pure-XLA packed evaluator."""
    import jax

    R, p, f, _ = make_problem(G=21, W=4, K=20, seed=13)
    fr = factors.recenter_bodies(f).astype(jnp.float32)
    fr = jax.tree_util.tree_map(jnp.asarray, fr)
    pkf = pk.pack_factors(fr)
    Rj = jnp.asarray(R, jnp.float32)
    pj = jnp.asarray(p, jnp.float32)
    with jax.default_matmul_precision("float32"):
        r0, J0, H0 = pe.evaluate_packed(Rj, pj, pkf, interpret=True,
                                        impl="xla")
        r1, J1, H1 = pe.evaluate_packed(Rj, pj, pkf, interpret=True,
                                        impl="hybrid")
    assert abs(float(r0) - float(r1)) < 1e-5 * abs(float(r0))
    assert float(jnp.max(jnp.abs(J0 - J1))) < 1e-4 * float(
        jnp.max(jnp.abs(J0)) + 1e-30)
    assert float(jnp.max(jnp.abs(H0 - H1))) < 1e-4 * float(
        jnp.max(jnp.abs(H0)))


def test_hybrid_non_multiple_bw_window():
    """Wp above 512 and NOT a multiple of 512 (e.g. W=520 -> Wp=520)
    must pick a bw that divides Wp instead of tripping the block-shape
    assert (advisor round-4 high finding: packed_impl='auto' selects
    'hybrid' on TPU for every W >= 256, so any such window crashed at
    trace time)."""
    import numpy as np

    rng = np.random.default_rng(3)
    W, G = 520, 4
    C = jnp.zeros((128, W, 4, 4)).at[:G, :, 3, 3].set(5.0)
    C = C.at[:G, :, 0, 0].set(1.0).at[:G, :, 1, 1].set(1.0)
    f = factors.PlaneFactors.create(C.astype(jnp.float32))
    fr = factors.recenter_bodies(f)
    pkf = pk.pack_factors(fr)
    assert pkf.wp > 512 and pkf.wp % 512 != 0
    R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (W, 1, 1))
    p = jnp.asarray(rng.normal(size=(W, 3)) * 0.01, jnp.float32)
    import jax
    with jax.default_matmul_precision("float32"):
        r0, J0, H0 = pe.evaluate_packed(R, p, pkf, interpret=True,
                                        impl="xla")
        r1, J1, H1 = pe.evaluate_packed(R, p, pkf, interpret=True,
                                        impl="hybrid")
    assert abs(float(r0) - float(r1)) < 1e-5 * (abs(float(r0)) + 1e-30)
    assert float(jnp.max(jnp.abs(H0 - H1))) < 1e-4 * float(
        jnp.max(jnp.abs(H0)) + 1e-30)
