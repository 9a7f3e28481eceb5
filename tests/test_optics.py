"""Tests for the optics module (PSF law, fixed-support blur, Sobel)."""

import numpy as np
import numpy.testing as npt
import pytest

import jax.numpy as jnp

from blurry_edges_tpu.config import CamConfig
from blurry_edges_tpu.ops import optics, sobel

from . import oracle

rng = np.random.default_rng(3)
CAM = CamConfig()


class TestProperties:
    def test_kernel_sigma_range(self):
        K = optics.max_kernel_halfwidth(CAM, 4.0, (0.75, 1.18))
        assert K == 17  # max sigma ~5.53 at z=1.18, rho=10.0
        z = jnp.linspace(0.75, 1.18, 32)
        sig = np.asarray(optics.kernel_sigma(z, CAM, 4.0))
        assert sig.shape == (32, 2)
        assert (3 * sig <= K + 1e-6).all()

    def test_psf_normalized(self):
        psfs = np.asarray(optics.gaussian_psf_bank(jnp.array([1.5, 3.0, 5.5]), K=17))
        npt.assert_allclose(psfs.sum(axis=(1, 2)), 1.0, atol=1e-6)
        # support mask: sigma=1.5 -> k=5; values outside must be exactly zero
        assert psfs[0, 0, 0] == 0.0 and psfs[0, 17, 17] > 0

    def test_blur_preserves_mean_interiorly(self):
        img = jnp.ones((64, 64))
        out = np.asarray(optics.blur_fixed_support(img, jnp.asarray(3.0), K=17))
        npt.assert_allclose(out, 1.0, atol=1e-5)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
class TestOracleParity:
    @classmethod
    def setup_class(cls):
        dg = oracle.load_module("utils/data_generator.py", "ref_data_generator")
        cls.ref = dg.DataGenerator(oracle.make_args())

    def test_kernel_sigma(self):
        for z in (0.75, 0.9, 1.18):
            theirs = self.ref.get_kernel_sigma(z)
            ours = np.asarray(optics.kernel_sigma(jnp.asarray(z), CAM, 4.0))
            # reference computes in float64; ours is float32 on device
            npt.assert_allclose(ours, theirs, rtol=1e-4)

    def test_psf_matches_reference(self):
        K = 17
        for s in (1.34, 2.0, 4.2, 5.5):
            theirs = self.ref.get_blur_kernel(s)  # (2k+1, 2k+1)
            k = theirs.shape[0] // 2
            ours = np.asarray(optics.gaussian_psf_bank(jnp.array([s]), K=K))[0]
            npt.assert_allclose(ours[K - k:K + k + 1, K - k:K + k + 1], theirs, rtol=1e-5, atol=1e-8)
            # everything outside the dynamic support is zero
            total = ours.sum()
            inside = ours[K - k:K + k + 1, K - k:K + k + 1].sum()
            npt.assert_allclose(total, inside, atol=1e-6)  # one f32 ulp of reduction-order noise

    def test_blur_matches_scipy(self):
        from scipy.ndimage import convolve
        img = rng.uniform(0, 255, size=(80, 80)).astype(np.float64)
        for s in (1.5, 3.7, 5.5):
            kernel = self.ref.get_blur_kernel(s)
            theirs = convolve(img, kernel, mode="reflect")
            ours = np.asarray(optics.blur_fixed_support(
                jnp.asarray(img, dtype=jnp.float32), jnp.asarray(s), K=17))
            npt.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-2)

    def test_sobel_matches_reference(self):
        import torch
        ppl = oracle.load_module("utils/postprocessing_loss.py", "ref_ppl2")

        class LocalPP(ppl.PostProcessLocalBase):
            def forward(self):  # pragma: no cover
                raise NotImplementedError

        pp = LocalPP(oracle.make_args(), torch.device("cpu"))
        img = rng.uniform(0, 1, size=(4, 21, 21, 3)).astype(np.float32)
        ours = np.asarray(sobel.image_derivative(jnp.asarray(img)))
        theirs = pp.get_image_derivative(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()
        npt.assert_allclose(ours.transpose(0, 3, 1, 2), theirs, rtol=1e-4, atol=1e-5)
