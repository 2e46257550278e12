"""Pallas TPU kernel: fused plane-moment accumulation (LEGACY).

SUPERSEDED by ops/pallas_evaluate.py, which fuses the same accumulation
(in the numerically superior two-pass centered form) plus the whole
Hessian assembly over a layout that persists across LM iterations.  Kept
because factors.residual_only(use_pallas=True) exposes it and its test
documents the round-1 repacking lesson; new code should use
pallas_evaluate / lm.damping_iter(backend='pallas').

Computes, per plane g:   Csum[g] = sum_w  T'_gw C_gw T'_gw^T
with T'_gw = [R_w | t_gw] (rotation shared per scan, translation varying
per (plane, scan) — the centered/body-recentered fast path of
ops/factors._plane_moment).

The XLA path materializes TC and TCT (G, W, 4, 4) intermediates
(~8 x 16 x G x W bytes of HBM traffic); this kernel keeps the whole
accumulation in VMEM registers and reads each input channel exactly once:
~(13 + 3) x G x W reads, a ~4x traffic cut on the residual path, which is
HBM-bound (the arithmetic is trivial).

Layout: channels-major with the PLANE axis on lanes —
  CH  (W, 10, G): symmetric moment channels (xx,xy,xz,yy,yz,zz, x,y,z, N)
  OFS (W, 3, G): effective translations t'_gw
  R   (W, 9): row-major rotations (read as scalars)
Output (10, G): accumulated world-moment channels.
G must be padded to a multiple of 128 (PlaneFactors already are).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(R_ref, ch_ref, ofs_ref, out_ref):
    W = ch_ref.shape[0]

    def body(w, acc):
        # rotation scalars
        r = [R_ref[w, k] for k in range(9)]
        # moment channels for this scan: (10, LANES)
        ch = ch_ref[w]
        pxx, pxy, pxz = ch[0], ch[1], ch[2]
        pyy, pyz, pzz = ch[3], ch[4], ch[5]
        vx, vy, vz = ch[6], ch[7], ch[8]
        n = ch[9]
        tx, ty, tz = ofs_ref[w, 0], ofs_ref[w, 1], ofs_ref[w, 2]

        # A = R P  (rows of R times symmetric P), 3x3 of lane vectors
        P = ((pxx, pxy, pxz), (pxy, pyy, pyz), (pxz, pyz, pzz))
        A = [[r[3 * i + 0] * P[0][j] + r[3 * i + 1] * P[1][j]
              + r[3 * i + 2] * P[2][j] for j in range(3)] for i in range(3)]
        # M = A R^T (symmetric; need upper 6)
        def M(i, j):
            return (A[i][0] * r[3 * j + 0] + A[i][1] * r[3 * j + 1]
                    + A[i][2] * r[3 * j + 2])

        # Rv
        gv = [r[3 * i + 0] * vx + r[3 * i + 1] * vy + r[3 * i + 2] * vz
              for i in range(3)]
        t = (tx, ty, tz)

        (axx, axy, axz, ayy, ayz, azz, ax, ay, az, an) = acc
        axx = axx + M(0, 0) + 2.0 * gv[0] * t[0] + n * t[0] * t[0]
        axy = axy + M(0, 1) + gv[0] * t[1] + gv[1] * t[0] + n * t[0] * t[1]
        axz = axz + M(0, 2) + gv[0] * t[2] + gv[2] * t[0] + n * t[0] * t[2]
        ayy = ayy + M(1, 1) + 2.0 * gv[1] * t[1] + n * t[1] * t[1]
        ayz = ayz + M(1, 2) + gv[1] * t[2] + gv[2] * t[1] + n * t[1] * t[2]
        azz = azz + M(2, 2) + 2.0 * gv[2] * t[2] + n * t[2] * t[2]
        ax = ax + gv[0] + n * t[0]
        ay = ay + gv[1] + n * t[1]
        az = az + gv[2] + n * t[2]
        an = an + n
        return (axx, axy, axz, ayy, ayz, azz, ax, ay, az, an)

    zero = jnp.zeros((LANES,), ch_ref.dtype)
    acc = jax.lax.fori_loop(0, W, body, tuple(zero for _ in range(10)))
    for k in range(10):
        out_ref[k] = acc[k]


@functools.partial(jax.jit, static_argnames=("interpret",))
def accumulate_moments(R9, CH, OFS, *, interpret: bool = False):
    """R9 (W, 9), CH (W, 10, G), OFS (W, 3, G) -> (10, G).

    G must be a multiple of 128.
    """
    W, _, G = CH.shape
    assert G % LANES == 0, "pad the plane axis to a multiple of 128"
    grid = (G // LANES,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, 9), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 10, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 3, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((10, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((10, G), CH.dtype),
        interpret=interpret,
    )(R9, CH, OFS)


def pack_inputs(T, f):
    """Build (R9, CH, OFS) from poses + PlaneFactors (centered layout)."""
    G, W = f.C.shape[:2]
    R = T[:, :3, :3]
    R9 = R.reshape(W, 9)
    C = f.C
    CH = jnp.stack(
        [C[..., 0, 0], C[..., 0, 1], C[..., 0, 2],
         C[..., 1, 1], C[..., 1, 2], C[..., 2, 2],
         C[..., 0, 3], C[..., 1, 3], C[..., 2, 3], C[..., 3, 3]],
        axis=-1,
    )                                   # (G, W, 10)
    CH = jnp.transpose(CH, (1, 2, 0))   # (W, 10, G)
    t_eff = (
        jnp.einsum("wab,gwb->gwa", R, f.body_centers)
        + T[None, :, :3, 3]
        - f.centers[:, None, :]
    )                                   # (G, W, 3)
    OFS = jnp.transpose(t_eff, (1, 2, 0))
    return R9, CH, OFS


def residual_moments(T, f, *, interpret: bool = False):
    """Csum channels -> (G, 4, 4) world moments (centered frame)."""
    R9, CH, OFS = pack_inputs(T, f)
    out = accumulate_moments(R9, CH, OFS, interpret=interpret)  # (10, G)
    G = out.shape[1]
    C = jnp.zeros((G, 4, 4), out.dtype)
    C = C.at[:, 0, 0].set(out[0])
    C = C.at[:, 0, 1].set(out[1]).at[:, 1, 0].set(out[1])
    C = C.at[:, 0, 2].set(out[2]).at[:, 2, 0].set(out[2])
    C = C.at[:, 1, 1].set(out[3])
    C = C.at[:, 1, 2].set(out[4]).at[:, 2, 1].set(out[4])
    C = C.at[:, 2, 2].set(out[5])
    C = C.at[:, 0, 3].set(out[6]).at[:, 3, 0].set(out[6])
    C = C.at[:, 1, 3].set(out[7]).at[:, 3, 1].set(out[7])
    C = C.at[:, 2, 3].set(out[8]).at[:, 3, 2].set(out[8])
    C = C.at[:, 3, 3].set(out[9])
    return C
