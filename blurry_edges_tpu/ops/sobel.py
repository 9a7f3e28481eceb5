"""Sobel gradient-magnitude map.

Parity: reference utils/postprocessing_loss.py:19-20, 114-117 (valid-mode
correlation with the Sobel pair, per channel, then sqrt(gx^2 + gy^2 + 1e-8)).
The data generator's scipy version (train_val_data_generator.py:112-115) flips
the kernels (true convolution), but the magnitude is identical since
(-g)^2 == g^2, so this one implementation serves both call sites.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_SOBEL_X = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
_SOBEL_Y = jnp.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]])


def image_derivative(img, eps: float = 1e-8):
    """Sobel gradient magnitude, valid padding, channelwise.

    img: (..., H, W, C) -> (..., H-2, W-2, C).
    """
    lead = img.shape[:-3]
    H, W, C = img.shape[-3:]
    x = img.reshape((-1, H, W, C))
    dt = img.dtype
    kx = jnp.tile(_SOBEL_X.astype(dt)[:, :, None, None], (1, 1, 1, C))
    ky = jnp.tile(_SOBEL_Y.astype(dt)[:, :, None, None], (1, 1, 1, C))
    dn = ("NHWC", "HWIO", "NHWC")
    # Precision.HIGHEST keeps float32 operands un-truncated (default conv
    # precision rounds to bf16, off by ~1e-3).
    hp = jax.lax.Precision.HIGHEST
    gx = jax.lax.conv_general_dilated(x, kx, (1, 1), "VALID", dimension_numbers=dn,
                                      feature_group_count=C, precision=hp)
    gy = jax.lax.conv_general_dilated(x, ky, (1, 1), "VALID", dimension_numbers=dn,
                                      feature_group_count=C, precision=hp)
    out = jnp.sqrt(gx**2 + gy**2 + eps)
    return out.reshape(lead + (H - 2, W - 2, C))


@functools.lru_cache(maxsize=8)
def _sobel_flat_matrices(R: int):
    """Dense (R-2)^2 x R^2 matrices applying the valid-mode Sobel pair to a
    flattened R x R patch. As matmuls these run on the MXU with large,
    tile-friendly dims - the conv formulation on (..., R, R, C) patch stacks
    pads the tiny minor dims instead."""
    sx = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    sy = np.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]])
    O = R - 2
    Mx = np.zeros((O * O, R * R), np.float32)
    My = np.zeros_like(Mx)
    for i in range(O):
        for j in range(O):
            for di in range(3):
                for dj in range(3):
                    src = (i + di) * R + (j + dj)
                    Mx[i * O + j, src] = sx[di, dj]
                    My[i * O + j, src] = sy[di, dj]
    return Mx, My


def image_derivative_flat(p, R: int, eps: float = 1e-8):
    """Sobel gradient magnitude on flattened patches: p (..., R*R) ->
    (..., (R-2)*(R-2)). Numerically identical to image_derivative on the
    corresponding (R, R) patches (sqrt(gx^2 + gy^2 + eps), HIGHEST-precision
    contraction)."""
    Mx, My = _sobel_flat_matrices(R)
    hp = jax.lax.Precision.HIGHEST
    gx = jnp.einsum("...n,mn->...m", p, jnp.asarray(Mx, p.dtype), precision=hp)
    gy = jnp.einsum("...n,mn->...m", p, jnp.asarray(My, p.dtype), precision=hp)
    return jnp.sqrt(gx**2 + gy**2 + eps)
