"""Sobel gradient-magnitude map.

Parity: reference utils/postprocessing_loss.py:19-20, 114-117 (valid-mode
correlation with the Sobel pair, per channel, then sqrt(gx^2 + gy^2 + 1e-8)).
The data generator's scipy version (train_val_data_generator.py:112-115) flips
the kernels (true convolution), but the magnitude is identical since
(-g)^2 == g^2, so this one implementation serves both call sites.
"""

from __future__ import annotations

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
