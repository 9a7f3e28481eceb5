"""Parity tests for the analytic DfD solver (blurry_edges_tpu.ops.dfd)."""

import numpy as np
import numpy.testing as npt
import pytest

import jax.numpy as jnp

from blurry_edges_tpu.config import CamConfig, PatchConfig
from blurry_edges_tpu.ops.dfd import DfDSolver

from . import oracle

rng = np.random.default_rng(1)
SOLVER = DfDSolver.from_config(CamConfig(), PatchConfig())


class TestProperties:
    def test_roundtrip_on_curve(self):
        """depth -> (sigma1, sigma2) via depth2sigma at the true apertures lies on
        the valid DfD curve, so etas2depth must invert it."""
        z = jnp.linspace(0.76, 1.17, 64)
        cam = CamConfig()
        eta1 = SOLVER.depth2sigma(z, cam.rho_1)
        eta2 = SOLVER.depth2sigma(z, cam.rho_2)
        z_rec = SOLVER.etas2depth(eta1, eta2)
        npt.assert_allclose(np.asarray(z_rec), np.asarray(z), rtol=1e-3)

    def test_elementwise_shapes(self):
        e1 = jnp.asarray(rng.uniform(1e-4, 1, size=(4, 7)).astype(np.float32))
        e2 = jnp.asarray(rng.uniform(1e-4, 1, size=(4, 7)).astype(np.float32))
        assert SOLVER.etas2depth(e1, e2).shape == (4, 7)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
class TestOracleParity:
    @classmethod
    def setup_class(cls):
        import torch
        cls.torch = torch
        de = oracle.load_module("utils/depth_etas.py", "ref_depth_etas")
        cls.ref = de.DepthEtas(oracle.make_args(), torch.device("cpu"))

    def test_etas2depth(self):
        e1 = rng.uniform(1e-4, 1.0, size=(512,)).astype(np.float32)
        e2 = rng.uniform(1e-4, 1.0, size=(512,)).astype(np.float32)
        ours = np.asarray(SOLVER.etas2depth(jnp.asarray(e1), jnp.asarray(e2)))
        theirs = self.ref.etas2depth(self.torch.from_numpy(e1), self.torch.from_numpy(e2)).numpy()
        npt.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_depth2sigma(self):
        z = rng.uniform(0.75, 1.18, size=(512,)).astype(np.float32)
        ours = np.asarray(SOLVER.depth2sigma(jnp.asarray(z), 10.39))
        theirs = self.ref.depth2sigma(self.torch.from_numpy(z), 10.39).numpy()
        npt.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)
