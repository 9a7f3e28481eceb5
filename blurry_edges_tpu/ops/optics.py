"""Thin-lens two-aperture defocus optics.

Parity target: reference utils/data_generator.py:16-24 - the kernel-sigma law
and the generalized-Gaussian PSF of order 2. The reference PSF has
data-dependent support k = ceil(3 sigma), which is not jittable; here the PSF
lives on a *fixed* (2K+1)^2 grid with the outside of the dynamic support
masked to zero. On integer coordinates the masked fixed-grid PSF is exactly
equal to the reference's dynamically-sized PSF (same formula, same
normalization over the same support), so blur results agree to float precision
while shapes stay static for XLA.

Order-2 generalized Gaussian == plain Gaussian == separable, and the square
support mask is separable too, so blur is implemented as two 1-D convolutions.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import CamConfig


def kernel_sigma(z, cam: CamConfig, mag: float):
    """Per-aperture PSF sigma (pixels) at depth z (m):
    |(1/z - rho_i) s + 1| * sigma_cam / (pixel_pitch * mag)
    (reference utils/data_generator.py:16-17).

    z: scalar or array; returns shape z.shape + (2,).
    """
    z = jnp.asarray(z)
    rhos = jnp.array([cam.rho_1, cam.rho_2], dtype=z.dtype)
    return jnp.abs((1.0 / z[..., None] - rhos) * cam.s + 1.0) * cam.sigma_cam / cam.pixel_pitch / mag


def max_kernel_halfwidth(cam: CamConfig, mag: float, z_range: Tuple[float, float]) -> int:
    """Static upper bound K on the dynamic support half-width k = ceil(3 sigma)
    over the depth range. sigma(z) is monotone in 1/z per aperture, so the max
    is attained at a range endpoint."""
    sig_max = 0.0
    for z in z_range:
        for rho in (cam.rho_1, cam.rho_2):
            sig_max = max(sig_max, abs((1.0 / z - rho) * cam.s + 1.0) * cam.sigma_cam / cam.pixel_pitch / mag)
    return int(math.ceil(3.0 * sig_max))


def _gaussian_1d(sigma, K: int, dtype=jnp.float32):
    """Masked 1-D Gaussian on the fixed grid [-K, K]: zero outside the dynamic
    support |x| <= k = ceil(3 sigma), matching reference
    utils/data_generator.py:19-24 on integer coordinates. Unnormalized."""
    sigma = jnp.maximum(sigma, 1e-6)
    k = jnp.ceil(sigma * 3.0)
    xs = jnp.arange(-K, K + 1, dtype=dtype)
    g = jnp.exp(-(xs**2) / (2.0 * sigma**2))
    return jnp.where(jnp.abs(xs) <= k, g, 0.0)


def gaussian_psf_bank(sigmas, K: int, dtype=jnp.float32):
    """2-D PSFs for a batch of sigmas on the fixed (2K+1)^2 grid, each
    normalized to sum 1 (reference utils/data_generator.py:19-24 with order=2).

    sigmas: (B,) -> (B, 2K+1, 2K+1).
    """
    g1 = jax.vmap(lambda s: _gaussian_1d(s, K, dtype))(jnp.asarray(sigmas, dtype=dtype))
    psf = g1[:, :, None] * g1[:, None, :]
    return psf / jnp.sum(psf, axis=(-2, -1), keepdims=True)


def blur_fixed_support(img, sigma, K: int):
    """Separable symmetric-padded blur of a single-channel or multi-channel
    image with the masked Gaussian of (traced) sigma.

    img: (H, W) or (H, W, C). Padding mode 'symmetric' mirrors scipy.ndimage
    ``mode='reflect'`` (reference train_val_data_generator.py:89). The kernel
    is symmetric, so scipy's true convolution equals correlation here.
    """
    g = _gaussian_1d(sigma, K, dtype=img.dtype)
    g = g / jnp.sum(g)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    x = jnp.pad(img, ((K, K), (K, K), (0, 0)), mode="symmetric")
    # rows: (1, H+2K, W+2K, C) conv with (2K+1, 1) depthwise kernel
    kern_r = jnp.tile(g[:, None, None, None], (1, 1, 1, C))  # HWIO, I=1 (depthwise)
    kern_c = jnp.tile(g[None, :, None, None], (1, 1, 1, C))
    # Precision.HIGHEST: default conv precision truncates operands to bf16,
    # which breaks numerical parity with the float64 reference blur.
    out = jax.lax.conv_general_dilated(
        x[None], kern_r, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST)
    out = jax.lax.conv_general_dilated(
        out, kern_c, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST)
    out = out[0]
    return out[..., 0] if squeeze else out
