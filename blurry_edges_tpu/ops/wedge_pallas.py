"""Fused Pallas TPU kernel for the per-patch wedge chain:
params -> signed distance fields -> soft indicators -> Gram sums ->
Cayley-Hamilton ridge solve -> colors.

This is the hot per-patch math of the local-token stage (reference
utils/postprocessing_loss.py:43-112 executed 8,192x per image pair at
global_data_pre_cal.py:38-50 / blurry_edges_test.py:124-128), fused into one
VMEM-resident pass.

Layout: "lanes are patches". All (pixel, patch) fields live as (R*R, TP)
tiles - 441 sublanes x TP lanes - so every step is a full-width VPU op:
the distance/indicator chain is elementwise over (441, TP), the six Gram
entries and nine A^T y entries are sublane reductions to (1, TP), and the
3x3 Cayley-Hamilton inverse is scalar arithmetic on (1, TP) rows. Nothing
touches the MXU: the equivalent XLA formulation batches (3 x 441) @ (441 x 3)
matmuls whose tiny dims pad to the 128-wide systolic array.

Numerics match ops.wedge exactly (same formulas, f32); equality is asserted
in tests/test_wedge_pallas.py against the jnp reference path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 2.0 * math.pi


def _erf(x):
    """erf via the Abramowitz-Stegun 7.1.26 rational approximation (max abs
    error 1.5e-7, below float32 resolution of the downstream 10^(2 erf - 2)
    map). Mosaic has no native erf lowering."""
    sign = jnp.where(x < 0, -1.0, 1.0)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _wedge_colors_kernel(params_ref, pixels_ref, out_ref, *, R: int, w: float,
                         lambda_ridge: float):
    """params_ref: (10, TP); pixels_ref: (3, R*R, TP); out_ref: (9, TP) with
    entry (wedge k, channel c) at row k*3 + c."""
    N = R * R
    TP = params_ref.shape[1]

    # patch-frame coordinates per pixel row (reference utils/postprocessing_loss.py:15-17)
    # (tpu.iota only produces integers; convert after)
    pix = jax.lax.broadcasted_iota(jnp.int32, (N, TP), 0)
    step = 2.0 / (R - 1)
    x = -1.0 + jnp.mod(pix, R).astype(jnp.float32) * step
    y = -1.0 + (pix // R).astype(jnp.float32) * step

    def row(i):  # (1, TP) parameter row, broadcasts against (N, TP)
        return params_ref[i:i + 1, :]

    x0, y0, x1, y1 = row(0), row(1), row(2), row(3)
    th1 = jnp.mod(row(4), TWO_PI)
    ph1 = jnp.mod(row(5), TWO_PI)
    th2 = jnp.mod(row(6), TWO_PI)
    ph2 = jnp.mod(row(7), TWO_PI)

    def edge_dist(cx, cy, ang):
        d = -jnp.sin(ang) * (x - cx) + jnp.cos(ang) * (y - cy)
        ax = jnp.cos(ang) * (x - cx) + jnp.sin(ang) * (y - cy)
        soft = jnp.sqrt(d * d + (ax * w) ** 2) * jnp.where(d < 0, -1.0, 1.0)
        return jnp.where(ax < 0, soft, d)

    d11 = edge_dist(x0, y0, th1)
    d12 = edge_dist(x0, y0, th1 + ph1)
    d21 = edge_dist(x1, y1, th2)
    d22 = edge_dist(x1, y1, th2 + ph2)

    sgn1 = jnp.where(jnp.mod(ph1, TWO_PI) < math.pi, 1.0, -1.0)
    sgn2 = jnp.where(jnp.mod(ph2, TWO_PI) < math.pi, 1.0, -1.0)
    ind1 = sgn1 * jnp.where((sgn1 * d11 > 0) & (sgn1 * d12 < 0), 1.0, -1.0)
    ind2 = sgn2 * jnp.where((sgn2 * d21 >= 0) & (sgn2 * d22 <= 0), 1.0, -1.0)
    dist1 = jnp.minimum(jnp.abs(d11), jnp.abs(d12)) * ind1
    dist2 = jnp.minimum(jnp.abs(d21), jnp.abs(d22)) * ind2

    # etas from the raw coefficients (reference :88-89), then soft memberships
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    eta1 = 10.0 ** (_erf(row(8)) * 2.0 - 2.0)
    eta2 = 10.0 ** (_erf(row(9)) * 2.0 - 2.0)
    h1 = 0.5 * (1.0 + _erf(dist1 * (inv_sqrt2 / eta1)))
    h2 = 0.5 * (1.0 + _erf(dist2 * (inv_sqrt2 / eta2)))
    u0 = (1.0 - h1) * (1.0 - h2)
    u1 = h1 * (1.0 - h2)
    u2 = h2
    u = (u0, u1, u2)

    def rsum(v):  # sublane reduction -> (1, TP)
        return jnp.sum(v, axis=0, keepdims=True)

    g = {}
    for i in range(3):
        for j in range(i, 3):
            g[(i, j)] = rsum(u[i] * u[j])
    a00 = g[(0, 0)] + lambda_ridge
    a11 = g[(1, 1)] + lambda_ridge
    a22 = g[(2, 2)] + lambda_ridge
    a01, a02, a12 = g[(0, 1)], g[(0, 2)], g[(1, 2)]

    # Cayley-Hamilton inverse of the symmetric 3x3 (reference :100-112):
    # same trace-identity det/adjugate as ops.wedge.inverse_3x3.
    trA = a00 + a11 + a22
    # entries of A^2 needed for tr(A^2), tr(A^3) and the adjugate
    b00 = a00 * a00 + a01 * a01 + a02 * a02
    b11 = a01 * a01 + a11 * a11 + a12 * a12
    b22 = a02 * a02 + a12 * a12 + a22 * a22
    b01 = a00 * a01 + a01 * a11 + a02 * a12
    b02 = a00 * a02 + a01 * a12 + a02 * a22
    b12 = a01 * a02 + a11 * a12 + a12 * a22
    trA2 = b00 + b11 + b22
    trA3 = (b00 * a00 + b01 * a01 + b02 * a02
            + b01 * a01 + b11 * a11 + b12 * a12
            + b02 * a02 + b12 * a12 + b22 * a22)
    detA = (trA**3 - 3.0 * trA * trA2 + 2.0 * trA3) / 6.0
    coef = (trA * trA - trA2) * 0.5
    inv_det = 1.0 / detA
    m00 = (b00 - trA * a00 + coef) * inv_det
    m11 = (b11 - trA * a11 + coef) * inv_det
    m22 = (b22 - trA * a22 + coef) * inv_det
    m01 = (b01 - trA * a01) * inv_det
    m02 = (b02 - trA * a02) * inv_det
    m12 = (b12 - trA * a12) * inv_det
    M = ((m00, m01, m02), (m01, m11, m12), (m02, m12, m22))

    for c in range(3):
        yc = pixels_ref[c, :, :]
        t0 = rsum(u0 * yc)
        t1 = rsum(u1 * yc)
        t2 = rsum(u2 * yc)
        for k in range(3):
            out_ref[k * 3 + c, :] = (M[k][0] * t0 + M[k][1] * t1 + M[k][2] * t2)[0, :]


@functools.partial(jax.jit, static_argnames=("R", "w", "lambda_ridge", "tile",
                                             "interpret"))
def wedge_colors_pallas(params, pixels, R: int = 21, w: float = 1.0,
                        lambda_ridge: float = (5e-3 * 441) ** 2,
                        tile: int = 256, interpret: bool = False):
    """Fused colors for a batch of patches.

    params: (P, 10) raw local-stage outputs (angles wrapped in-kernel);
    pixels: (P, R, R, C) observed patches. Returns colors (P, 3, C).
    P is padded to a multiple of ``tile`` internally.
    """
    P, C = params.shape[0], pixels.shape[-1]
    assert C == 3, "kernel is specialized for 3-channel patches"
    N = R * R
    P_pad = -(-P // tile) * tile
    pt = jnp.zeros((10, P_pad), params.dtype).at[:, :P].set(params.T)
    px = jnp.zeros((3, N, P_pad), pixels.dtype).at[:, :, :P].set(
        pixels.reshape(P, N, 3).transpose(2, 1, 0))

    kernel = functools.partial(_wedge_colors_kernel, R=R, w=w,
                               lambda_ridge=lambda_ridge)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((9, P_pad), params.dtype),
        grid=(P_pad // tile,),
        in_specs=[
            pl.BlockSpec((10, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, N, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pt, px)
    return out[:, :P].T.reshape(P, 3, 3)
