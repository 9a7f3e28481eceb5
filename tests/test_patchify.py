"""Tests for unfold/fold (blurry_edges_tpu.ops.patchify)."""

import numpy as np
import numpy.testing as npt
import pytest

import jax.numpy as jnp

from blurry_edges_tpu.ops import patchify

from . import oracle

rng = np.random.default_rng(2)


class TestProperties:
    def test_unfold_matches_slicing(self):
        img = rng.normal(size=(2, 49, 49, 3)).astype(np.float32)
        R, stride = 21, 2
        out = np.asarray(patchify.unfold(jnp.asarray(img), R, stride))
        Hp = (49 - R) // stride + 1
        assert out.shape == (2, Hp, Hp, R, R, 3)
        for i in (0, 5, Hp - 1):
            for j in (0, 7, Hp - 1):
                npt.assert_array_equal(
                    out[:, i, j],
                    img[:, i * stride:i * stride + R, j * stride:j * stride + R, :])

    def test_fold_unfold_identity(self):
        img = rng.normal(size=(2, 49, 49, 3)).astype(np.float32)
        R, stride = 21, 2
        patches = patchify.unfold(jnp.asarray(img), R, stride)
        folded = patchify.fold(patches, 49, 49, stride)
        count = patchify.fold_count(49, 49, R, stride)
        npt.assert_allclose(np.asarray(folded) / np.asarray(count)[None, :, :, None],
                            img, rtol=1e-5, atol=1e-5)

    def test_fold_count_147(self):
        # The 147x147 / R=21 / stride=2 production grid
        count = np.asarray(patchify.fold_count(147, 147, 21, 2))
        assert count.shape == (147, 147)
        assert count.max() == 121.0  # ceil(21/2)^2 interior overlap
        assert count.min() == 1.0


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
class TestOracleParity:
    def test_fold_matches_torch(self):
        import torch
        R, stride, H = 21, 2, 49
        Hp = (H - R) // stride + 1
        patches = rng.normal(size=(1, Hp, Hp, R, R, 3)).astype(np.float32)
        ours = np.asarray(patchify.fold(jnp.asarray(patches), H, H, stride))
        # torch Fold expects (N, C*R*R, L) with (C, R, R) feature ordering and
        # L = Hp*Wp row-major
        tp = torch.from_numpy(patches.transpose(0, 5, 3, 4, 1, 2).reshape(1, 3 * R * R, Hp * Hp))
        theirs = torch.nn.Fold(output_size=[H, H], kernel_size=R, stride=stride)(tp).numpy()
        npt.assert_allclose(ours.transpose(0, 3, 1, 2), theirs, rtol=1e-5, atol=1e-5)

    def test_num_patches_matches_torch(self):
        import torch
        H, R, stride = 147, 21, 2
        Hp = (H - R) // stride + 1
        theirs = torch.nn.Fold(output_size=[H, H], kernel_size=R, stride=stride)(
            torch.ones(1, R**2, Hp * Hp)).view(H, H).numpy()
        ours = np.asarray(patchify.fold_count(H, H, R, stride))
        npt.assert_allclose(ours, theirs, rtol=0, atol=0)
