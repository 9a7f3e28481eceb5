"""Parity and property tests for the wedge rasterizer / ridge color solver
(blurry_edges_tpu.ops.wedge) against closed forms and the reference oracle."""

import numpy as np
import pytest

import jax.numpy as jnp
import numpy.testing as npt

from blurry_edges_tpu.ops import wedge

from . import oracle

pytestmark = pytest.mark.slow

R = 21
LAMBDA = (5e-3 * R**2) ** 2
rng = np.random.default_rng(0)


def rand_params(*lead):
    """Random plausible patch parameters (..., 10)."""
    xy = rng.uniform(-1.5, 1.5, size=lead + (4,))
    angles = rng.uniform(0, 2 * np.pi, size=lead + (4,))
    etac = rng.uniform(-1.0, 1.5, size=lead + (2,))
    return np.concatenate([xy, angles, etac], axis=-1).astype(np.float32)


X, Y = wedge.make_patch_grid(R)


class TestProperties:
    def test_grid_orientation(self):
        # x varies along columns, y along rows, both [-1, 1]
        npt.assert_allclose(np.asarray(X)[0], np.linspace(-1, 1, R), atol=1e-6)
        npt.assert_allclose(np.asarray(Y)[:, 0], np.linspace(-1, 1, R), atol=1e-6)

    def test_indicators_partition_unity(self):
        p = rand_params(64)
        dists = wedge.params2dists(p[:, :8], X, Y)
        etas = wedge.params2etas(p[:, 8:])
        u = wedge.dists2indicators(dists, etas)
        npt.assert_allclose(np.asarray(u.sum(axis=-3)), 1.0, atol=1e-5)
        assert (np.asarray(u) > -1e-6).all()

    def test_etas_range(self):
        c = jnp.linspace(-5, 5, 101)
        etas = np.asarray(wedge.params2etas(c))
        assert etas.min() >= 10**-4 - 1e-9 and etas.max() <= 1.0 + 1e-6

    def test_inverse_3x3_vs_linalg(self):
        M = rng.normal(size=(128, 3, 3)).astype(np.float32)
        M = M @ np.swapaxes(M, -1, -2) + 3 * np.eye(3, dtype=np.float32)
        inv = np.asarray(wedge.inverse_3x3(jnp.asarray(M)))
        npt.assert_allclose(inv, np.linalg.inv(M), rtol=2e-3, atol=2e-4)

    def test_half_plane_wedge(self):
        # A wedge with corner far left, theta=0 (ray +x), phi=pi/2:
        # interior is the quadrant above the x-axis (y > y0) and left of x... rely on
        # sign conventions: dist4edge(theta=0) = y - y0, so for phi in (0, pi),
        # points with y > y0 (and inside the opening) get positive distance.
        params = jnp.array([[-3.0, 0.0, -3.0, 0.0, 0.0, np.pi / 2, 0.0, np.pi / 2]])
        dists = np.asarray(wedge.params2dists(params, X, Y))
        # On the grid (corner far outside), edge theta=0 through y=0 dominates:
        # rows with y > 0 positive, rows with y < 0 negative.
        assert (dists[0, 0, Y > 0.05] > 0).all()
        assert (dists[0, 0, Y < -0.05] < 0).all()

    def test_ridge_solve_recovers_colors(self):
        # With crisp wedges and clean renders, the ridge solve must recover colors.
        p = rand_params(32)
        p[:, 8:] = -2.0  # erf(-2) ~ -1 -> eta ~ 1e-4: crisp wedges
        dists = wedge.params2dists(jnp.asarray(p[:, :8]), X, Y)
        etas = wedge.params2etas(jnp.asarray(p[:, 8:]))
        u = wedge.dists2indicators(dists, etas)
        true_colors = jnp.asarray(rng.uniform(0.2, 0.8, size=(32, 3, 3)).astype(np.float32))
        patch = wedge.render_patches(u, true_colors)
        A = jnp.moveaxis(u, -3, -1).reshape(32, R * R, 3)
        yv = patch.reshape(32, R * R, 3)
        colors = wedge.solve_colors(A, yv, LAMBDA)
        # ridge shrinks towards zero: compare against ridge-regularized closed form
        expected = np.linalg.solve(
            np.asarray(A).transpose(0, 2, 1) @ np.asarray(A) + LAMBDA * np.eye(3),
            np.asarray(A).transpose(0, 2, 1) @ np.asarray(yv))
        npt.assert_allclose(np.asarray(colors), expected, rtol=5e-3, atol=5e-3)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
class TestOracleParity:
    @classmethod
    def setup_class(cls):
        import torch
        cls.torch = torch
        ppl = oracle.load_module("utils/postprocessing_loss.py", "ref_ppl")
        args = oracle.make_args(batch_size=16)

        class LocalPP(ppl.PostProcessLocalBase):
            def forward(self):  # pragma: no cover - abstract satisfaction
                raise NotImplementedError

        class GlobalPP(ppl.PostProcessGlobalBase):
            def forward(self):  # pragma: no cover
                raise NotImplementedError

        cls.local_pp = LocalPP(args, torch.device("cpu"))
        cls.global_pp = GlobalPP(oracle.make_args(batch_size=2, img_size=[49, 49]),
                                 torch.device("cpu"))

    def test_params2dists_local(self):
        p = rand_params(16)
        ours = np.asarray(wedge.params2dists(jnp.asarray(p[:, :8]), X, Y))
        theirs = self.local_pp.params2dists(self.torch.from_numpy(p[:, :8])).numpy()
        npt.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_params2etas(self):
        c = rand_params(16)[:, 8:]
        ours = np.asarray(wedge.params2etas(jnp.asarray(c)))
        theirs = self.local_pp.params2etas(self.torch.from_numpy(c)).numpy()
        npt.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)

    def test_dists2indicators(self):
        p = rand_params(16)
        dists = wedge.params2dists(jnp.asarray(p[:, :8]), X, Y)
        etas = wedge.params2etas(jnp.asarray(p[:, 8:]))
        ours = np.asarray(wedge.dists2indicators(dists, etas))
        t = self.torch
        td = t.from_numpy(np.asarray(dists))
        te = t.from_numpy(np.asarray(etas))
        theirs = self.local_pp.dists2indicators(td, te).numpy()
        npt.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)

    def test_boundary_field_and_map(self):
        p = rand_params(16)
        dists = wedge.params2dists(jnp.asarray(p[:, :8]), X, Y)
        ours = np.asarray(wedge.boundary_map(dists))
        t = self.torch
        td = t.from_numpy(np.asarray(dists))
        dB = t.where(td[:, 1] >= 0, td[:, 1],
                     t.where(t.abs(td[:, 0]) < t.abs(td[:, 1]), t.abs(td[:, 0]), t.abs(td[:, 1])))
        theirs = self.local_pp.normalized_gaussian(dB).numpy()
        npt.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)

    def test_inverse_3x3_vs_oracle(self):
        M = rng.normal(size=(16, 3, 3)).astype(np.float32)
        M = M @ np.swapaxes(M, -1, -2) + LAMBDA * np.eye(3, dtype=np.float32)
        ours = np.asarray(wedge.inverse_3x3(jnp.asarray(M)))
        theirs = self.local_pp.inverse_3by3(self.torch.from_numpy(M)).numpy()
        npt.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)

    def test_full_local_color_solve(self):
        """End-to-end: params + noisy patch -> colors, vs the reference chain
        (reference local_training.py:32-45)."""
        t = self.torch
        p = rand_params(16)
        img = rng.uniform(0, 1, size=(16, R, R, 3)).astype(np.float32)

        dists = wedge.params2dists(jnp.asarray(p[:, :8]), X, Y)
        etas = wedge.params2etas(jnp.asarray(p[:, 8:]))
        u = wedge.dists2indicators(dists, etas)
        A = jnp.moveaxis(u, -3, -1).reshape(16, R * R, 3)
        yv = jnp.asarray(img).reshape(16, R * R, 3)
        ours_colors = wedge.solve_colors(A, yv, LAMBDA)
        ours_patch = np.asarray(wedge.render_patches(u, ours_colors))

        pp = self.local_pp
        tdists = pp.params2dists(t.from_numpy(p[:, :8]))
        tetas = pp.params2etas(t.from_numpy(p[:, 8:]))
        tw = pp.dists2indicators(tdists, tetas)
        tA = tw.permute(0, 2, 3, 1).reshape(16, -1, 3)
        ty = t.from_numpy(img).reshape(16, -1, 3)
        tcolors = t.matmul(pp.inverse_3by3(t.matmul(tA.permute(0, 2, 1), tA) + pp.ridge),
                           t.matmul(tA.permute(0, 2, 1), ty))
        tpatch = (tw.unsqueeze(1) * tcolors.permute(0, 2, 1).unsqueeze(-1).unsqueeze(-1)).sum(dim=2)

        npt.assert_allclose(np.asarray(ours_colors), tcolors.numpy(), rtol=2e-3, atol=2e-3)
        npt.assert_allclose(ours_patch.transpose(0, 3, 1, 2), tpatch.numpy(), rtol=2e-3, atol=2e-3)

    def test_params2dists_global_grid(self):
        """Grid-shaped broadcast parity: (B, Hp, Wp, 8) vs reference
        (B, 8, Hp, Wp) layout (reference utils/postprocessing_loss.py:130-150)."""
        B, Hp, Wp = 2, 15, 15
        p = rand_params(B, Hp, Wp)
        ours = np.asarray(wedge.params2dists(jnp.asarray(p[..., :8]), X, Y))  # (B,Hp,Wp,2,R,R)
        tp = self.torch.from_numpy(p[..., :8].transpose(0, 3, 1, 2))  # (B,8,Hp,Wp)
        theirs = self.global_pp.params2dists(tp).numpy()  # (B,2,R,R,Hp,Wp)
        npt.assert_allclose(ours, theirs.transpose(0, 4, 5, 1, 2, 3), rtol=1e-4, atol=1e-5)

    def test_depth_masks(self):
        p = rand_params(16)
        dists = wedge.params2dists(jnp.asarray(p[:, :8]), X, Y)
        t = self.torch
        td = t.from_numpy(np.asarray(dists))
        # soft variant (reference global_training.py:84-86)
        ours = np.asarray(wedge.depth_masks(dists, hard=False))
        g = self.local_pp.normalized_gaussian
        m1 = (g(td[:, 0]) > 0.5).to(t.int32)
        m2 = (g(td[:, 1]) > 0.5).to(t.int32) * 2
        theirs = t.where((m2 == 2) | (td[:, 1] >= 0), m2, m1).numpy()
        npt.assert_array_equal(ours, theirs)
        # hard variant (reference blurry_edges_test.py:50-53)
        ours_h = np.asarray(wedge.depth_masks(dists, hard=True))
        m1 = (td[:, 0] > 0).to(t.int32)
        m2 = (td[:, 1] > 0).to(t.int32) * 2
        theirs_h = t.where(m2 == 2, m2, m1).numpy()
        npt.assert_array_equal(ours_h, theirs_h)
