"""The flat-layout global loss (TPU-tile-friendly (L, R*R) fields, MXU Sobel)
must reproduce the gridded reference-parity implementation exactly: same
terms, same depth sum/count, same gradients."""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.flatten_util
import jax.numpy as jnp

from blurry_edges_tpu.config import CamConfig, GridConfig, PatchConfig
from blurry_edges_tpu.ops.dfd import DfDSolver
from blurry_edges_tpu.ops.sobel import image_derivative, image_derivative_flat
from blurry_edges_tpu.train import global_ as tg

pytestmark = pytest.mark.slow

rng = np.random.default_rng(40)
H = 29
GRID = GridConfig(H=H, W=H)
PATCH = PatchConfig()
DFD = DfDSolver.from_config(CamConfig(), PATCH)


def _inputs(B, rng=rng):
    L = GRID.num_tokens
    bd = np.zeros((B, H, H), np.float32)
    bd[:, ::5, :] = 0.95
    est = rng.normal(scale=0.3, size=(B, L, 12)).astype(np.float32)
    return (jnp.asarray(est),
            jnp.asarray(rng.uniform(0, 1, (B, 2, H, H, 3)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, (B, 2, H, H, 3)).astype(np.float32)),
            jnp.asarray(rng.integers(0, 10, (B, H, H)).astype(np.float32)),
            jnp.asarray(rng.uniform(-1, 1, (B, 2, H - 2, H - 2, 3)).astype(np.float32)),
            jnp.asarray(bd))


def test_sobel_flat_matches_conv():
    R = 21
    p = jnp.asarray(rng.uniform(0, 1, (17, R, R)).astype(np.float32))
    want = image_derivative(p[..., None])[..., 0].reshape(17, (R - 2) ** 2)
    got = image_derivative_flat(p.reshape(17, R * R), R)
    npt.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_flat_terms_match_gridded():
    args = _inputs(3)
    t_g, S_g, N_g = tg.global_loss_terms_gridded(*args, PATCH, GRID, DFD)
    t_f, S_f, N_f = tg.global_loss_terms(*args, PATCH, GRID, DFD)
    npt.assert_allclose(np.asarray(t_f), np.asarray(t_g), rtol=2e-4, atol=1e-7)
    npt.assert_allclose(float(S_f), float(S_g), rtol=2e-4)
    assert float(N_f) == float(N_g)


def test_flat_terms_match_gridded_hard_mask():
    """The 'w'-variant depth objective (hard wedge-side masks) must agree
    between layouts too, and actually change the depth term vs soft masks."""
    args = _inputs(3, rng=np.random.default_rng(40))
    t_g, S_g, N_g = tg.global_loss_terms_gridded(*args, PATCH, GRID, DFD,
                                                 hard_mask=True)
    t_f, S_f, N_f = tg.global_loss_terms(*args, PATCH, GRID, DFD,
                                         hard_mask=True)
    npt.assert_allclose(np.asarray(t_f), np.asarray(t_g), rtol=2e-4, atol=1e-7)
    npt.assert_allclose(float(S_f), float(S_g), rtol=2e-4)
    assert float(N_f) == float(N_g)
    _, S_soft, N_soft = tg.global_loss_terms(*args, PATCH, GRID, DFD)
    assert float(N_f) != float(N_soft) or float(S_f) != float(S_soft)


def test_flat_grads_match_gridded():
    args = _inputs(2)
    gammas = jnp.asarray(rng.uniform(0.1, 1.0, 7).astype(np.float32))

    def loss(est, impl):
        t, S, N = impl(est, *args[1:], PATCH, GRID, DFD)
        return jnp.sum(gammas[:6] * t) + gammas[6] * S / N

    g_g = jax.grad(lambda e: loss(e, tg.global_loss_terms_gridded))(args[0])
    g_f = jax.grad(lambda e: loss(e, tg.global_loss_terms))(args[0])
    a = np.asarray(g_f).ravel()
    b = np.asarray(g_g).ravel()
    # same math, different op order; the eta cascade amplifies last-ulp noise,
    # so bound direction + norm
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 1e-3
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999999, cos
