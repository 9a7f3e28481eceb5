"""Layered defocus rendering parity: render_layer vs the reference's
key-point blend (reference test_data_generator.py:87-110) re-derived with
scipy as the spec, plus whole-sample sanity for the procedural test set."""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu.config import CamConfig
from blurry_edges_tpu.data import realistic_gen as rg
from blurry_edges_tpu.ops import optics

rng = np.random.default_rng(11)
CAM = CamConfig()
K = optics.max_kernel_halfwidth(CAM, 4.0, (0.75, 1.18))


def scipy_render_layer(depth_map, key_pts, img_sharp, mask):
    """Spec transliteration with scipy (float64)."""
    from scipy.ndimage import convolve

    def kernel(sigma, order=2):
        sigma = max(sigma, 1e-6)
        k = int(np.ceil(abs(sigma) * 3))
        x, y = np.meshgrid(np.linspace(-k, k, 2 * k + 1), np.linspace(-k, k, 2 * k + 1))
        psf = np.exp(-np.power((x**2 + y**2) / (2 * sigma**2), order / 2))
        return psf / psf.sum()

    H, W = depth_map.shape
    n = len(key_pts)
    diff = key_pts[1] - key_pts[0]
    img_out = np.zeros((2, H, W, 3))
    mask_out = np.zeros((2, H, W))
    for jj, depth in enumerate(key_pts):
        rhos = np.array([CAM.rho_1, CAM.rho_2])
        sigmas = np.abs((1 / depth - rhos) * CAM.s + 1) * CAM.sigma_cam / CAM.pixel_pitch / 4.0
        m_last = (depth_map <= depth - diff) & (depth_map > depth)
        m_next = (depth_map <= depth) & (depth_map > depth + diff)
        if jj == 0:
            w = (depth_map > depth).astype(float) + (depth_map - depth - diff) / (-diff) * m_next
        elif jj == n - 1:
            w = (depth - diff - depth_map) / (-diff) * m_last + (depth_map <= depth).astype(float)
        else:
            w = (depth - diff - depth_map) / (-diff) * m_last + (depth_map - depth - diff) / (-diff) * m_next
        for ii, s in enumerate(sigmas):
            kk = kernel(s)
            if mask is not None:
                mask_out[ii] += convolve(mask.astype(float), kk, mode="reflect") * w
            img_out[ii] += convolve(img_sharp, kk[:, :, None], mode="reflect") * w[:, :, None]
    return (img_out, mask_out.clip(0, 1)) if mask is not None else (img_out, None)


def test_render_layer_parity():
    H = W = 40
    depth = rng.uniform(0.8, 1.1, size=(H, W))
    img = rng.uniform(0, 255, size=(H, W, 3))
    mask = rng.uniform(size=(H, W)) < 0.4
    key_pts = np.linspace(depth.max(), depth.min(), 7)

    ours_img, ours_mask = rg.render_layer(
        jnp.asarray(depth, jnp.float32), jnp.asarray(key_pts, jnp.float32),
        jnp.asarray(img, jnp.float32), jnp.asarray(mask), CAM, 4.0, K)
    exp_img, exp_mask = scipy_render_layer(depth, key_pts, img, mask)
    npt.assert_allclose(np.asarray(ours_img), exp_img, rtol=1e-3, atol=5e-2)
    npt.assert_allclose(np.asarray(ours_mask), exp_mask, rtol=1e-3, atol=1e-4)


def test_render_layer_weight_partition():
    """Interpolation weights must sum to 1 everywhere -> blurring a constant
    image returns the constant."""
    H = W = 32
    depth = jnp.asarray(rng.uniform(0.8, 1.1, size=(H, W)), jnp.float32)
    key_pts = jnp.linspace(depth.max(), depth.min(), 11)
    img = jnp.ones((H, W, 3), jnp.float32) * 100.0
    out, _ = rg.render_layer(depth, key_pts, img, None, CAM, 4.0, K)
    npt.assert_allclose(np.asarray(out), 100.0, rtol=1e-3)


def test_synth_sample_sanity():
    img, depth = jax.jit(lambda k: rg.synth_sample(
        k, H=48, W=48, z_lo=0.75, z_hi=1.18, cam=CAM, mag=4.0, K=K,
        n_interval=20))(jax.random.PRNGKey(1))
    img, depth = np.asarray(img), np.asarray(depth)
    assert img.shape == (2, 48, 48, 3) and depth.shape == (48, 48)
    assert np.isfinite(img).all()
    assert img.min() >= -1e-3 and img.max() <= 255.0 + 1e-3
    assert (depth >= 0.75 - 1e-5).all() and (depth <= 1.18 + 1e-5).all()
