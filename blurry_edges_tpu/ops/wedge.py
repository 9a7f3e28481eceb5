"""Differentiable wedge rasterizer + closed-form ridge color solver.

The "Blurry-Edges" patch parametrization: each R x R patch carries two
wedge-shaped boundaries, each given by a corner point (x, y) in the patch
frame [-1, 1]^2 plus a base angle theta and an opening angle phi, and per-wedge
blur levels eta. This module turns those parameters into signed-distance
fields, soft wedge-membership indicators, boundary-proximity maps, and solves a
per-patch 3-color ridge regression in closed form (Cayley-Hamilton 3x3
inverse).

Functional parity target: reference utils/postprocessing_loss.py:27-117
(params2dists :43-86, params2etas :88-89, dists2indicators :91-95,
normalized_gaussian :97-98, inverse_3by3 :100-112, ridge solve used at
local_training.py:36-45 and global_training.py:62-78). Everything here is pure
jnp with arbitrary leading batch dimensions so it vmaps/shards cleanly; the
fused Pallas kernel in ``wedge_pallas.py`` is the performance path and is
tested for equality against these definitions.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * math.pi


def make_patch_grid(R: int, dtype=jnp.float32):
    """Patch-frame coordinates: x varies along columns, y along rows, both in
    [-1, 1] (reference utils/postprocessing_loss.py:15-17).

    Returns (x, y), each of shape (R, R).
    """
    coords = jnp.linspace(-1.0, 1.0, R, dtype=dtype)
    y, x = jnp.meshgrid(coords, coords, indexing="ij")
    return x, y


def _dist_edge(x, y, cx, cy, angle):
    """Signed distance to the line through (cx, cy) with direction ``angle``
    (reference utils/postprocessing_loss.py:27-28)."""
    return -jnp.sin(angle) * (x - cx) + jnp.cos(angle) * (y - cy)


def _dist_axial(x, y, cx, cy, angle):
    """Signed coordinate along the ray direction (reference
    utils/postprocessing_loss.py:30-31)."""
    return jnp.cos(angle) * (x - cx) + jnp.sin(angle) * (y - cy)


def _soft_back_extension(d_edge, d_axial, w):
    """Behind the corner (axial < 0) blend the axial distance into the edge
    distance, keeping the sign of the edge side (reference
    utils/postprocessing_loss.py:67-78)."""
    sgn = jnp.where(d_edge < 0, -1.0, 1.0)
    soft = jnp.sqrt(d_edge**2 + (d_axial * w) ** 2) * sgn
    return jnp.where(d_axial < 0, soft, d_edge)


def params2dists(params, x, y, w: float = 1.0):
    """Signed distance fields of the two wedges.

    Args:
      params: (..., 8) = (x0, y0, x1, y1, theta1, phi1, theta2, phi2).
      x, y: patch grid, shape (R, R).
      w: back-side softening weight (reference utils/args.py:12).

    Returns:
      dists: (..., 2, R, R) signed distances (positive inside each wedge).

    Parity: reference utils/postprocessing_loss.py:43-86. Wedge 1 uses strict
    inequalities for the interior test, wedge 2 non-strict (:80-81).
    """
    p = params[..., None, None]  # broadcast against (R, R)
    x0, y0, x1, y1 = p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :], p[..., 3, :, :]
    th1, ph1, th2, ph2 = p[..., 4, :, :], p[..., 5, :, :], p[..., 6, :, :], p[..., 7, :, :]

    sgn1 = jnp.where(jnp.mod(ph1, TWO_PI) < math.pi, 1.0, -1.0)
    sgn2 = jnp.where(jnp.mod(ph2, TWO_PI) < math.pi, 1.0, -1.0)

    th1p = th1 + ph1
    th2p = th2 + ph2

    d11 = _soft_back_extension(_dist_edge(x, y, x0, y0, th1), _dist_axial(x, y, x0, y0, th1), w)
    d12 = _soft_back_extension(_dist_edge(x, y, x0, y0, th1p), _dist_axial(x, y, x0, y0, th1p), w)
    d21 = _soft_back_extension(_dist_edge(x, y, x1, y1, th2), _dist_axial(x, y, x1, y1, th2), w)
    d22 = _soft_back_extension(_dist_edge(x, y, x1, y1, th2p), _dist_axial(x, y, x1, y1, th2p), w)

    ind1 = sgn1 * jnp.where((sgn1 * d11 > 0) & (sgn1 * d12 < 0), 1.0, -1.0)
    ind2 = sgn2 * jnp.where((sgn2 * d21 >= 0) & (sgn2 * d22 <= 0), 1.0, -1.0)

    dist1 = jnp.minimum(jnp.abs(d11), jnp.abs(d12)) * ind1
    dist2 = jnp.minimum(jnp.abs(d21), jnp.abs(d22)) * ind2
    return jnp.stack([dist1, dist2], axis=-3)


def params2dists_flat(params, xf, yf, w: float = 1.0):
    """params2dists with the pixel axis flattened: params (..., 8),
    xf/yf (N,) flat patch coordinates -> (dist1, dist2), each (..., N).

    Identical math to params2dists; this layout keeps the minor dimension
    large (N = R*R = 441 -> one ~2% padded TPU tile row) where the (R, R[, C])
    form pads its tiny minor dims up to 42x, which dominates HBM traffic in
    the training backward.
    """
    def sel(i):
        return params[..., i, None]

    x0, y0, x1, y1 = sel(0), sel(1), sel(2), sel(3)
    th1, ph1, th2, ph2 = sel(4), sel(5), sel(6), sel(7)

    sgn1 = jnp.where(jnp.mod(ph1, TWO_PI) < math.pi, 1.0, -1.0)
    sgn2 = jnp.where(jnp.mod(ph2, TWO_PI) < math.pi, 1.0, -1.0)
    th1p = th1 + ph1
    th2p = th2 + ph2

    d11 = _soft_back_extension(_dist_edge(xf, yf, x0, y0, th1), _dist_axial(xf, yf, x0, y0, th1), w)
    d12 = _soft_back_extension(_dist_edge(xf, yf, x0, y0, th1p), _dist_axial(xf, yf, x0, y0, th1p), w)
    d21 = _soft_back_extension(_dist_edge(xf, yf, x1, y1, th2), _dist_axial(xf, yf, x1, y1, th2), w)
    d22 = _soft_back_extension(_dist_edge(xf, yf, x1, y1, th2p), _dist_axial(xf, yf, x1, y1, th2p), w)

    ind1 = sgn1 * jnp.where((sgn1 * d11 > 0) & (sgn1 * d12 < 0), 1.0, -1.0)
    ind2 = sgn2 * jnp.where((sgn2 * d21 >= 0) & (sgn2 * d22 <= 0), 1.0, -1.0)

    dist1 = jnp.minimum(jnp.abs(d11), jnp.abs(d12)) * ind1
    dist2 = jnp.minimum(jnp.abs(d21), jnp.abs(d22)) * ind2
    return dist1, dist2


def indicator_flat(d, eta):
    """Gaussian-CDF soft step on a flat distance field: d (..., N),
    eta (...,) or (..., 1) -> (..., N) (the per-wedge h of
    dists2indicators)."""
    if eta.ndim < d.ndim:
        eta = eta[..., None]
    return 0.5 * (1.0 + jax.lax.erf(d / (math.sqrt(2.0) * eta)))


def boundary_distance_field_flat(d1, d2):
    """boundary_distance_field on flat fields: wedge 2 occludes wedge 1."""
    return jnp.where(d2 >= 0, d2,
                     jnp.where(jnp.abs(d1) < jnp.abs(d2), jnp.abs(d1), jnp.abs(d2)))


def depth_masks_flat(d1, d2, hard: bool = False):
    """depth_masks on flat fields -> int32 (..., N)."""
    if hard:
        m1 = (d1 > 0).astype(jnp.int32)
        m2 = (d2 > 0).astype(jnp.int32) * 2
        return jnp.where(m2 == 2, m2, m1)
    m1 = (normalized_gaussian(d1) > 0.5).astype(jnp.int32)
    m2 = (normalized_gaussian(d2) > 0.5).astype(jnp.int32) * 2
    return jnp.where((m2 == 2) | (d2 >= 0), m2, m1)


def params2etas(coefs):
    """Blur-level map eta = 10^(2 erf(c) - 2) in (1e-4, 1) (reference
    utils/postprocessing_loss.py:88-89)."""
    return 10.0 ** (jax.lax.erf(coefs) * 2.0 - 2.0)


def dists2indicators(dists, etas):
    """Soft wedge memberships (u0, u1, u2) via the Gaussian CDF of the signed
    distances (reference utils/postprocessing_loss.py:91-95).

    Args:
      dists: (..., 2, R, R).
      etas: (..., 2) blur level per wedge.

    Returns:
      (..., 3, R, R) with u0 + u1 + u2 == 1.
    """
    h = 0.5 * (1.0 + jax.lax.erf(dists / (math.sqrt(2.0) * etas[..., None, None])))
    h0, h1 = h[..., 0, :, :], h[..., 1, :, :]
    return jnp.stack([(1.0 - h0) * (1.0 - h1), h0 * (1.0 - h1), h1], axis=-3)


def boundary_distance_field(dists):
    """Distance-to-nearest-visible-boundary field: wedge 2 occludes wedge 1
    (reference utils/postprocessing_loss handling at local_training.py:43-44,
    global_training.py:80-81).

    dists: (..., 2, R, R) -> (..., R, R)
    """
    d0, d1 = dists[..., 0, :, :], dists[..., 1, :, :]
    return jnp.where(d1 >= 0, d1,
                     jnp.where(jnp.abs(d0) < jnp.abs(d1), jnp.abs(d0), jnp.abs(d1)))


def normalized_gaussian(v, delta: float = 0.07):
    """Boundary-proximity bump (reference utils/postprocessing_loss.py:97-98)."""
    return jnp.exp(-(v**2) / delta**2)


def boundary_map(dists, delta: float = 0.07):
    """Soft boundary map of a patch from its wedge distance fields."""
    return normalized_gaussian(boundary_distance_field(dists), delta)


def depth_masks(dists, hard: bool = False):
    """Per-pixel wedge assignment for depth scatter: 0 = background (no depth),
    1 = wedge-1 boundary band / side, 2 = wedge-2.

    hard=False: near-boundary Gaussian band > 0.5 (reference
    global_training.py:84-86, blurry_edges_test.py:55-58).
    hard=True: wedge interior side dists > 0 ('--densify w';
    blurry_edges_test.py:50-53).
    """
    d0, d1 = dists[..., 0, :, :], dists[..., 1, :, :]
    if hard:
        m1 = (d0 > 0).astype(jnp.int32)
        m2 = (d1 > 0).astype(jnp.int32) * 2
        return jnp.where(m2 == 2, m2, m1)
    m1 = (normalized_gaussian(d0) > 0.5).astype(jnp.int32)
    m2 = (normalized_gaussian(d1) > 0.5).astype(jnp.int32) * 2
    return jnp.where((m2 == 2) | (d1 >= 0), m2, m1)


def inverse_3x3(A):
    """Closed-form inverse of a batch of 3x3 matrices via the Cayley-Hamilton
    trace identities (reference utils/postprocessing_loss.py:100-112):
    det = (tr(A)^3 - 3 tr(A) tr(A^2) + 2 tr(A^3)) / 6,
    adj = A^2 - tr(A) A + ((tr(A)^2 - tr(A^2)) / 2) I.

    A: (..., 3, 3) -> (..., 3, 3). No pivoting: callers guarantee
    conditioning via the ridge term.
    """
    hp = jax.lax.Precision.HIGHEST  # bf16-truncated matmuls would wreck the det
    trA = jnp.trace(A, axis1=-2, axis2=-1)
    A2 = jnp.matmul(A, A, precision=hp)
    trA2 = jnp.trace(A2, axis1=-2, axis2=-1)
    A3 = jnp.matmul(A2, A, precision=hp)
    trA3 = jnp.trace(A3, axis1=-2, axis2=-1)
    detA = (trA**3 - 3.0 * trA * trA2 + 2.0 * trA3) / 6.0
    eye = jnp.eye(3, dtype=A.dtype)
    adjA = A2 - trA[..., None, None] * A + ((trA**2 - trA2) / 2.0)[..., None, None] * eye
    return adjA / detA[..., None, None]


def solve_colors(wedges, pixels, lambda_ridge: float):
    """Closed-form ridge regression for the 3 wedge colors of a patch (or a
    joint solve across an image pair when the leading sample axis is stacked
    into N).

    Args:
      wedges: (..., N, 3) design matrix A - wedge memberships per pixel.
      pixels: (..., N, C) observed pixels y.
      lambda_ridge: (alpha_lambda * R^2)^2 (reference utils/postprocessing_loss.py:14).

    Returns:
      colors: (..., 3, C) = (A^T A + lambda I)^{-1} A^T y
      (reference local_training.py:36-40, global_training.py:62-67).

    The 3-column Gram products are unrolled into per-column reductions: a
    batched (3, N) x (N, 3) matmul pads both tiny dims to the 128-wide MXU
    tile and wastes ~99% of the systolic array; explicit multiply-reduce runs
    on the VPU at full utilization.
    """
    a = tuple(wedges[..., k] for k in range(3))  # each (..., N)
    gram = {}
    for i in range(3):
        for j in range(i, 3):
            gram[(i, j)] = jnp.sum(a[i] * a[j], axis=-1)
    At_A = jnp.stack([
        jnp.stack([gram[(min(i, j), max(i, j))] for j in range(3)], axis=-1)
        for i in range(3)], axis=-2)                                  # (..., 3, 3)
    At_y = jnp.stack([jnp.sum(a[i][..., None] * pixels, axis=-2)
                      for i in range(3)], axis=-2)                    # (..., 3, C)
    ridge = lambda_ridge * jnp.eye(3, dtype=wedges.dtype)
    inv = inverse_3x3(At_A + ridge)
    # (..., 3, 3) @ (..., 3, C) unrolled the same way
    return jnp.sum(inv[..., :, :, None] * At_y[..., None, :, :], axis=-2)


def render_patches(wedges, colors):
    """Composite the wedge memberships with their solved colors.

    Args:
      wedges: (..., 3, R, R).
      colors: (..., 3, C).

    Returns:
      (..., R, R, C) rendered patch (reference local_training.py:41,
      global_training.py:69-78). Unrolled over the 3 wedges: a k=3
      contraction would otherwise lower to an MXU matmul padded 3 -> 128.
    """
    return sum(wedges[..., k, :, :, None] * colors[..., k, None, None, :]
               for k in range(3))
