"""On-device synthetic shape generator: morphology parity with scipy, noise
model semantics, and whole-sample sanity."""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu.data.shapes_gen import (ShapeGenConfig, add_photon_noise,
                                              synthesize_image)
from blurry_edges_tpu.ops.morphology import (dilate_cross, dilate_full,
                                             dilate_full_n, distance_transform_l1,
                                             distance_transform_l1_bfs)

pytestmark = pytest.mark.slow

rng = np.random.default_rng(10)


class TestMorphology:
    def test_dilations_match_scipy(self):
        from scipy.ndimage import binary_dilation, generate_binary_structure
        m = rng.uniform(size=(40, 40)) < 0.03
        npt.assert_array_equal(
            np.asarray(dilate_cross(jnp.asarray(m))),
            binary_dilation(m, generate_binary_structure(2, 1)))
        npt.assert_array_equal(
            np.asarray(dilate_full(jnp.asarray(m))),
            binary_dilation(m, generate_binary_structure(2, 2)))
        npt.assert_array_equal(
            np.asarray(dilate_full_n(jnp.asarray(m), 11)),
            binary_dilation(m, generate_binary_structure(2, 2), iterations=11))

    def test_distance_transform_matches_reference_bfs(self):
        """Spec: reference train_val_data_generator.py:98-109 - iterated
        4-connected dilation ring labeling."""
        from scipy.ndimage import binary_dilation, generate_binary_structure
        struct = generate_binary_structure(2, 1)
        m = rng.uniform(size=(31, 31)) < 0.02
        m[0, 0] = True  # guarantee nonempty
        expected = -np.ones((31, 31))
        expected[m] = 0
        dist, prev = 0, m.copy()
        while (expected == -1).any():
            dist += 1
            curr = binary_dilation(prev, structure=struct)
            expected[curr & ~prev] = dist
            prev = curr
        ours = np.asarray(distance_transform_l1(jnp.asarray(m), max_iters=62))
        npt.assert_array_equal(ours, expected)
        bfs = np.asarray(distance_transform_l1_bfs(jnp.asarray(m), max_iters=62))
        npt.assert_array_equal(bfs, expected)

    def test_distance_transform_scan_vs_bfs_random(self):
        for seed in range(5):
            r = np.random.default_rng(seed)
            m = r.uniform(size=(37, 53)) < 0.01
            m[3, 7] = True
            fast = np.asarray(distance_transform_l1(jnp.asarray(m)))
            slow = np.asarray(distance_transform_l1_bfs(jnp.asarray(m), max_iters=90))
            npt.assert_array_equal(fast, slow)

    def test_distance_transform_empty_mask(self):
        # reference: empty boundary -> all ones (dist_blank * -1)
        ours = np.asarray(distance_transform_l1(jnp.zeros((9, 9), bool), max_iters=18))
        npt.assert_array_equal(ours, np.ones((9, 9)))


class TestSynthesis:
    @classmethod
    def setup_class(cls):
        cfg = ShapeGenConfig(H=77, W=77)  # smaller for CPU test speed
        cls.cfg = cfg
        cls.out = jax.jit(lambda k: synthesize_image(k, cfg))(jax.random.PRNGKey(42))

    def test_shapes_and_ranges(self):
        o = self.out
        cfg = self.cfg
        assert o["imgs"].shape == (2, cfg.H, cfg.W, 3)
        imgs = np.asarray(o["imgs"])
        assert imgs.min() >= 0 and imgs.max() <= 255
        npt.assert_array_equal(imgs, np.round(imgs))  # reference rounds (:111)
        d = np.asarray(o["image_depth"])
        assert cfg.z_lo <= d.min() and d.max() <= cfg.z_hi + 1e-6

    def test_boundary_consistency(self):
        o = self.out
        b_loc = np.asarray(o["boundary_loc"])
        b_dist = np.asarray(o["boundary_dist"])
        assert (b_loc > 0).any(), "an image with 15+ shapes must have boundaries"
        npt.assert_array_equal(b_dist[b_loc > 0], 0.0)
        assert (b_dist[b_loc == 0] > 0).all()
        b_dep = np.asarray(o["boundary_depth"])
        vals = b_dep[b_dep > 0]
        assert vals.size > 0
        assert (vals >= self.cfg.z_lo - 1e-6).all() and (vals <= self.cfg.z_hi + 1e-6).all()

    def test_derivative_maps(self):
        deri = np.asarray(self.out["deri"])
        assert deri.shape == (2, self.cfg.H, self.cfg.W, 3)
        assert (deri >= 0).all()


class TestNoise:
    def test_noise_semantics(self):
        imgs = jnp.asarray(rng.uniform(0, 255, size=(2, 32, 32, 3)).astype(np.float32))
        alpha = 190.0
        gt, ny = jax.jit(lambda k: add_photon_noise(k, imgs, alpha, 2.0))(
            jax.random.PRNGKey(0))
        gt, ny = np.asarray(gt), np.asarray(ny)
        npt.assert_allclose(gt, np.asarray(imgs) / 255 * alpha, rtol=1e-6)
        npt.assert_array_equal(ny, np.round(ny))  # integral after clip+round
        assert ny.min() >= 0 and ny.max() <= alpha
        # shot noise is unbiased: mean of noisy ~ clean
        assert abs(ny.mean() - gt.mean()) < 2.0
