"""Parameter packing / normalization transforms shared by the global stage's
producers and consumers.

Local-stage outputs are 10 raw parameters per patch; the global stage consumes
38 normalized features per patch token (2 images x 19) and emits 12 shared
parameters. Parity: reference global_data_pre_cal.py:20-30 (wrap + normalize),
global_training.py:141-145 (denormalize for training),
blurry_edges_test.py:124-138 (wrap/normalize/denormalize at inference).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .wedge import params2etas

PI = math.pi
TWO_PI = 2.0 * math.pi


def wrap_local_params(params):
    """Wrap the four angle channels of raw local-stage outputs into [0, 2pi)
    (reference global_data_pre_cal.py:21-25). params: (..., 10)."""
    return jnp.concatenate([params[..., :4],
                            jnp.mod(params[..., 4:8], TWO_PI),
                            params[..., 8:]], axis=-1)


def normalize_token_features(params, colors):
    """(wrapped local params (..., 10), solved colors (..., 3 wedges, C)) -> 19
    normalized features per patch per image: xy/3, (angles-pi)/pi,
    eta_coefs - 0.5, (colors-0.5)*2 (reference global_data_pre_cal.py:27-30).

    The 9 color features are CHANNEL-major (channel*3 + wedge): the reference
    permutes colors to (C, wedge) before flattening
    (global_data_pre_cal.py:47-50, blurry_edges_test.py:28/128).
    """
    colors_flat = jnp.swapaxes(colors, -1, -2).reshape(colors.shape[:-2] + (9,))
    return jnp.concatenate([
        params[..., :4] / 3.0,
        (params[..., 4:8] - PI) / PI,
        params[..., 8:10] - 0.5,
        (colors_flat - 0.5) * 2.0,
    ], axis=-1)


def denormalize_global_train(est):
    """Global-stage training-path denormalization (reference
    global_training.py:141-145): est (..., 12) ->
    (xy_angles (..., 8), etas (..., 4)) with etas already mapped through
    params2etas(coef + 0.5)."""
    xy = est[..., :4] * 3.0
    angles = jnp.mod((est[..., 4:8] + 1.0) * PI, TWO_PI)
    etas = params2etas(est[..., 8:] + 0.5)
    return jnp.concatenate([xy, angles], axis=-1), etas


def denormalize_global_eval(est):
    """Inference-path denormalization (reference blurry_edges_test.py:135-138):
    keeps eta *coefficients* (+0.5); the caller applies params2etas
    (blurry_edges_test.py:90)."""
    xy = est[..., :4] * 3.0
    angles = jnp.mod((est[..., 4:8] + 1.0) * PI, TWO_PI)
    eta_coefs = est[..., 8:] + 0.5
    return jnp.concatenate([xy, angles, eta_coefs], axis=-1)
