"""Equality of the fused Pallas wedge-colors kernel against the jnp reference
path (interpret mode on CPU; the compiled path is exercised on TPU by the
verify drives and bench)."""

import numpy as np
import numpy.testing as npt

import jax.numpy as jnp

from blurry_edges_tpu.config import PatchConfig
from blurry_edges_tpu.ops.params import wrap_local_params
from blurry_edges_tpu.ops.wedge_pallas import wedge_colors_pallas
from blurry_edges_tpu.train.global_precal import solve_patch_colors

import pytest  # noqa: E402

pytestmark = pytest.mark.slow

rng = np.random.default_rng(12)
PATCH = PatchConfig()


def test_pallas_colors_match_jnp():
    P = 40  # padded to one 256-tile internally
    params = rng.normal(scale=1.5, size=(P, 10)).astype(np.float32)
    pixels = rng.uniform(0, 1, size=(P, 21, 21, 3)).astype(np.float32)

    expected = solve_patch_colors(wrap_local_params(jnp.asarray(params)),
                                  jnp.asarray(pixels), PATCH)
    got = wedge_colors_pallas(jnp.asarray(params), jnp.asarray(pixels),
                              R=PATCH.R, w=PATCH.w,
                              lambda_ridge=PATCH.lambda_ridge, interpret=True)
    npt.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-3, atol=2e-4)


def test_pallas_colors_degenerate_params():
    # identical corners / zero opening: the ridge keeps everything finite
    params = np.zeros((8, 10), np.float32)
    params[:, 8:] = 2.0
    pixels = rng.uniform(0, 1, size=(8, 21, 21, 3)).astype(np.float32)
    got = wedge_colors_pallas(jnp.asarray(params), jnp.asarray(pixels),
                              interpret=True)
    assert np.isfinite(np.asarray(got)).all()
