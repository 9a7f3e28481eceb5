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


def _ch_inverse_rows(a00, a11, a22, a01, a02, a12):
    """Cayley-Hamilton inverse of a symmetric 3x3 held as (1, TP) entry rows
    (same trace-identity det/adjugate as ops.wedge.inverse_3x3). Returns the
    3x3 row tuple M."""
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
    return ((m00, m01, m02), (m01, m11, m12), (m02, m12, m22))


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
    M = _ch_inverse_rows(a00, a11, a22, a01, a02, a12)

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


# --------------------------------------------------------------------------
# Wide fused kernel: the FULL serving render chain per patch
# --------------------------------------------------------------------------

def _wedge_render_kernel(xy_ref, eta_ref, pix_ref, out_ref, *, R: int,
                         w: float, lambda_ridge: float, hard: bool,
                         rho_prime: float, delta: float, dfd_consts):
    """Whole per-patch serving render (reference blurry_edges_test.py:30-79 /
    utils/postprocessing_loss.py:43-117) in one VMEM pass.

    xy_ref: (8, TP) denormalized wedge geometry (x0,y0,x1,y1,th1,ph1,th2,ph2);
    eta_ref: (4, TP) blur levels (img1 w1, img1 w2, img2 w1, img2 w2);
    pix_ref: (6, N, TP) pair patches, plane img*3 + channel;
    out_ref: (15, N, TP) planes:
      0-5   rendered pair patches (joint-solve colors; img*3 + channel)
      6-8   sharpened render (eta = 1e-4)
      9-11  refocused render (eta = depth2sigma at rho_prime)
      12    boundary map (normalized gaussian of the visible-boundary field)
      13    per-pixel DfD depth
      14    wedge-assignment mask as float {0, 1, 2}
    """
    N = R * R
    TP = xy_ref.shape[1]
    numerator, den_const, den_root, intercept, s_cam = dfd_consts
    den_factor = den_root * den_root

    pix = jax.lax.broadcasted_iota(jnp.int32, (N, TP), 0)
    step = 2.0 / (R - 1)
    x = -1.0 + jnp.mod(pix, R).astype(jnp.float32) * step
    y = -1.0 + (pix // R).astype(jnp.float32) * step

    def row(ref, i):  # (1, TP) parameter row, broadcasts against (N, TP)
        return ref[i:i + 1, :]

    x0, y0, x1, y1 = row(xy_ref, 0), row(xy_ref, 1), row(xy_ref, 2), row(xy_ref, 3)
    th1, ph1, th2, ph2 = (row(xy_ref, 4), row(xy_ref, 5), row(xy_ref, 6),
                          row(xy_ref, 7))

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

    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def memberships(eta1, eta2):
        """dists -> (u0, u1, u2) soft wedge memberships (ops.wedge
        dists2indicators)."""
        h0 = 0.5 * (1.0 + _erf(dist1 * (inv_sqrt2 / eta1)))
        h1 = 0.5 * (1.0 + _erf(dist2 * (inv_sqrt2 / eta2)))
        return ((1.0 - h0) * (1.0 - h1), h0 * (1.0 - h1), h1)

    uA = memberships(row(eta_ref, 0), row(eta_ref, 1))   # image 1
    uB = memberships(row(eta_ref, 2), row(eta_ref, 3))   # image 2

    def rsum(v):  # sublane reduction -> (1, TP)
        return jnp.sum(v, axis=0, keepdims=True)

    # joint ridge solve across the pair (train/global_.render_pair_grid:66-71)
    g = {}
    for i in range(3):
        for j in range(i, 3):
            g[(i, j)] = rsum(uA[i] * uA[j]) + rsum(uB[i] * uB[j])
    M = _ch_inverse_rows(g[(0, 0)] + lambda_ridge, g[(1, 1)] + lambda_ridge,
                         g[(2, 2)] + lambda_ridge, g[(0, 1)], g[(0, 2)],
                         g[(1, 2)])
    colors = []
    for c in range(3):
        t = [rsum(uA[k] * pix_ref[c, :, :])
             + rsum(uB[k] * pix_ref[3 + c, :, :]) for k in range(3)]
        colors.append([M[k][0] * t[0] + M[k][1] * t[1] + M[k][2] * t[2]
                       for k in range(3)])  # colors[c][k]: (1, TP)

    def render(u, out_base):
        for c in range(3):
            out_ref[out_base + c, :, :] = (u[0] * colors[c][0]
                                           + u[1] * colors[c][1]
                                           + u[2] * colors[c][2])
    render(uA, 0)
    render(uB, 3)

    # boundary map: wedge 2 occludes wedge 1 (ops.wedge
    # boundary_distance_field_flat + normalized_gaussian)
    bdf = jnp.where(dist2 >= 0, dist2,
                    jnp.minimum(jnp.abs(dist1), jnp.abs(dist2)))
    out_ref[12, :, :] = jnp.exp(-(bdf * bdf) / (delta * delta))

    # analytic DfD depth per wedge (ops.dfd.DfDSolver.etas2depth, constants
    # baked) + wedge-assignment mask (ops.wedge.depth_masks_flat)
    def etas2depth(e1, e2):
        b = intercept
        sw = cw = math.sin(math.pi / 4.0)                 # theta_wng = pi/4
        sm, cm = math.sin(3 * math.pi / 4), math.cos(3 * math.pi / 4)
        cond1 = -sw * e1 + cw * (e2 - b)
        cond2 = -sm * (e1 - b) + cm * e2
        cond3 = -sw * (e1 - b) + cw * e2
        e11 = jnp.where(cond1 > 0, (e1 + e2 - b) / 2,
                        jnp.where(cond2 > 0, b + (e1 - e2 - b) / 2,
                                  jnp.where(cond3 < 0, b + (e1 + e2 - b) / 2, e1)))
        e22 = jnp.where(cond1 > 0, b + (e1 + e2 - b) / 2,
                        jnp.where(cond2 > 0, (e2 - e1 + b) / 2,
                                  jnp.where(cond3 < 0, (e1 + e2 - b) / 2, e2)))
        return numerator / (den_factor * (e11 * e11 - e22 * e22) + den_const)

    dep1 = etas2depth(row(eta_ref, 0), row(eta_ref, 2))   # (1, TP)
    dep2 = etas2depth(row(eta_ref, 1), row(eta_ref, 3))

    if hard:
        m1 = (dist1 > 0).astype(jnp.float32)
        m2 = (dist2 > 0).astype(jnp.float32) * 2.0
        mask = jnp.where(m2 == 2.0, m2, m1)
    else:
        g1 = jnp.exp(-(dist1 * dist1) / (0.07 * 0.07))
        g2 = jnp.exp(-(dist2 * dist2) / (0.07 * 0.07))
        m1 = (g1 > 0.5).astype(jnp.float32)
        m2 = (g2 > 0.5).astype(jnp.float32) * 2.0
        mask = jnp.where((m2 == 2.0) | (dist2 >= 0), m2, m1)
    out_ref[14, :, :] = mask
    out_ref[13, :, :] = jnp.where(mask == 1.0, dep1,
                                  jnp.where(mask == 2.0, dep2, 0.0))

    # sharpened render: both wedges at eta = 1e-4
    sharp = jnp.full((1, TP), 1e-4, jnp.float32)
    render(memberships(sharp, sharp), 6)

    # refocused render: eta from depth2sigma where the wedge owns any pixel
    any1 = rsum((mask == 1.0).astype(jnp.float32)) > 0    # (1, TP)
    any2 = rsum((mask == 2.0).astype(jnp.float32)) > 0

    def depth2sigma(depth):
        return jnp.abs((1.0 / depth - rho_prime) * s_cam + 1.0) / den_root

    sig1 = jnp.where(any1, depth2sigma(dep1), 1e-4)
    sig2 = jnp.where(any2, depth2sigma(dep2), 1e-4)
    render(memberships(sig1, sig2), 9)


@functools.partial(jax.jit, static_argnames=("R", "w", "lambda_ridge", "hard",
                                             "rho_prime", "delta",
                                             "dfd_consts", "tile",
                                             "interpret"))
def wedge_render_pallas(xy_angles, etas, img_patches, R: int = 21,
                        w: float = 1.0,
                        lambda_ridge: float = (5e-3 * 441) ** 2,
                        hard: bool = False, rho_prime: float = 10.39,
                        delta: float = 0.07, dfd_consts=None,
                        tile: int = 128, interpret: bool = False):
    """Fused full render chain for a batch of patches.

    xy_angles: (P, 8) denormalized geometry; etas: (P, 4) blur levels;
    img_patches: (P, 2, R, R, 3) pair patches; dfd_consts: the 5-tuple
    (numerator, denominator_constant, denominator_factor_root, intercept, s)
    from ops.dfd.DfDSolver.

    Returns a dict matching eval.pipeline.render_full's per-patch contract:
    patches (P,2,R,R,3), patches_shpd / patches_refoc (P,R,R,3),
    local_bndry / depth_map (P,R,R), depth_mask (P,R,R) int32.
    """
    assert dfd_consts is not None, "pass DfDSolver constants"
    P = xy_angles.shape[0]
    N = R * R
    P_pad = -(-P // tile) * tile
    xt = jnp.zeros((8, P_pad), xy_angles.dtype).at[:, :P].set(xy_angles.T)
    et = jnp.zeros((4, P_pad), etas.dtype).at[:, :P].set(etas.T)
    # eta rows divide; keep the padding away from 0
    et = et.at[:, P:].set(1.0)
    px = jnp.zeros((6, N, P_pad), img_patches.dtype).at[:, :, :P].set(
        img_patches.reshape(P, 2 * N, 3).transpose(2, 1, 0)
        .reshape(3, 2, N, P).transpose(1, 0, 2, 3).reshape(6, N, P))

    kernel = functools.partial(_wedge_render_kernel, R=R, w=w,
                               lambda_ridge=lambda_ridge, hard=hard,
                               rho_prime=rho_prime, delta=delta,
                               dfd_consts=dfd_consts)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((15, N, P_pad), jnp.float32),
        grid=(P_pad // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, N, tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((15, N, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xt, et, px)

    out = out[:, :, :P]                                    # (15, N, P)

    def grids(base, n_planes):
        v = out[base:base + n_planes]                      # (n, N, P)
        return v.transpose(2, 1, 0).reshape(P, R, R, n_planes)

    patches = jnp.stack([grids(0, 3), grids(3, 3)], axis=1)  # (P,2,R,R,3)
    return dict(
        patches=patches,
        patches_shpd=grids(6, 3),
        patches_refoc=grids(9, 3),
        local_bndry=out[12].T.reshape(P, R, R),
        depth_map=out[13].T.reshape(P, R, R),
        depth_mask=out[14].T.reshape(P, R, R).astype(jnp.int32),
    )
