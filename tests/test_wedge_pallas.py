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


def test_pallas_render_chain_matches_render_full():
    """The wide fused kernel (wedge_render_pallas) reproduces render_full —
    pair render with joint color solve, sharpened/refocused renders, boundary
    map, DfD depth + wedge mask — for both mask modes."""
    from blurry_edges_tpu.config import CamConfig, GridConfig
    from blurry_edges_tpu.eval.pipeline import render_full, render_full_pallas
    from blurry_edges_tpu.ops.dfd import DfDSolver
    from blurry_edges_tpu.ops.wedge import params2etas
    import blurry_edges_tpu.ops.wedge_pallas as wp

    B, Hp, Wp, R = 1, 3, 4, PATCH.R
    dfd = DfDSolver.from_config(CamConfig(), PATCH)
    xy = np.stack([
        rng.uniform(-0.8, 0.8, (B, Hp, Wp)), rng.uniform(-0.8, 0.8, (B, Hp, Wp)),
        rng.uniform(-0.8, 0.8, (B, Hp, Wp)), rng.uniform(-0.8, 0.8, (B, Hp, Wp)),
        rng.uniform(0, 2 * np.pi, (B, Hp, Wp)), rng.uniform(0, 2 * np.pi, (B, Hp, Wp)),
        rng.uniform(0, 2 * np.pi, (B, Hp, Wp)), rng.uniform(0, 2 * np.pi, (B, Hp, Wp)),
    ], axis=-1).astype(np.float32)
    etas = np.asarray(params2etas(
        jnp.asarray(rng.normal(scale=1.0, size=(B, Hp, Wp, 4)).astype(np.float32))))
    imgs = rng.uniform(0, 1, (B, 2, Hp, Wp, R, R, 3)).astype(np.float32)

    # route the kernel through interpret mode (CPU test tier)
    orig = wp.wedge_render_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    wp.wedge_render_pallas = interp
    try:
        for hard in (False, True):
            want = render_full(jnp.asarray(xy), jnp.asarray(etas),
                               jnp.asarray(imgs), PATCH, dfd, 10.39, hard)
            got = render_full_pallas(jnp.asarray(xy), jnp.asarray(etas),
                                     jnp.asarray(imgs), PATCH, dfd, 10.39, hard)
            assert set(got) == set(want)
            for k in want:
                a, b = np.asarray(want[k]), np.asarray(got[k])
                assert a.shape == b.shape, k
                if k == "depth_mask":
                    # integer assignment: only knife-edge threshold pixels may
                    # flip under the kernel's erf approximation
                    assert np.mean(a != b) < 1e-3, (k, np.mean(a != b))
                    continue
                d = np.abs(a - b)
                scale = max(1.0, np.abs(a).max())
                assert np.quantile(d, 0.999) < 1e-3 * scale, (k, np.quantile(d, 0.999))
                # depth planes inherit mask flips on isolated pixels
                assert np.mean(d > 0.01 * scale) < 2e-3, (k, np.mean(d > 0.01 * scale))
    finally:
        wp.wedge_render_pallas = orig


def test_pallas_render_chain_degenerate():
    """Degenerate geometry (all-zero corners/angles) stays finite through the
    joint solve, DfD projection and refocus sigma."""
    from blurry_edges_tpu.config import CamConfig
    from blurry_edges_tpu.ops.dfd import DfDSolver
    from blurry_edges_tpu.ops.wedge_pallas import wedge_render_pallas

    P, R = 8, PATCH.R
    dfd = DfDSolver.from_config(CamConfig(), PATCH)
    out = wedge_render_pallas(
        jnp.zeros((P, 8)), jnp.full((P, 4), 0.01),
        jnp.asarray(rng.uniform(0, 1, (P, 2, R, R, 3)).astype(np.float32)),
        R=R, w=PATCH.w, lambda_ridge=PATCH.lambda_ridge,
        dfd_consts=(dfd.numerator, dfd.denominator_constant,
                    dfd.denominator_factor_root, dfd.intercept, dfd.s),
        interpret=True)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
