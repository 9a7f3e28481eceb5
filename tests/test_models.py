"""Architecture-parity tests: the Flax models must reproduce the reference
PyTorch models' forward pass bit-for-bit (up to float32 rounding) through the
torch->flax weight converter. This pins down BatchNorm semantics, padding,
pooling, flatten order, positional encoding, and transformer wiring."""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu import models
from blurry_edges_tpu.utils import torch_convert as tc

from . import oracle

pytestmark = pytest.mark.slow

rng = np.random.default_rng(4)


def test_local_stage_shapes():
    m = models.LocalStage()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 21, 21, 3)))
    out = m.apply(variables, jnp.zeros((2, 21, 21, 3)), train=False)
    assert out.shape == (2, 10)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert 6e6 < n_params < 9e6  # ~7.2 M (reference models/local_stage.py)


def test_global_stage_shapes():
    m = models.GlobalStage()
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 38)))
    out = m.apply(variables, jnp.zeros((1, 64, 38)), train=False)
    assert out.shape == (1, 64, 12)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert 0.8e6 < n_params < 1.5e6  # ~1.1 M


def test_unet_shapes():
    m = models.UNet()
    x = jnp.zeros((1, 147, 147, 1))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x, train=False)
    assert out.shape == (1, 147, 147, 1)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
class TestTorchParity:
    @classmethod
    def setup_class(cls):
        import torch
        cls.torch = torch
        torch.manual_seed(0)

    def _warm_bn(self, tm, x):
        """Run a few train-mode passes so running stats are nontrivial."""
        tm.train()
        with self.torch.no_grad():
            for _ in range(3):
                tm(x + self.torch.randn_like(x) * 0.1)
        tm.eval()

    def test_local_stage_forward_parity(self):
        t = self.torch
        ref = oracle.load_module("models/local_stage.py", "ref_local_stage")
        tm = ref.LocalStage()
        x = t.from_numpy(rng.uniform(0, 1, size=(8, 3, 21, 21)).astype(np.float32))
        self._warm_bn(tm, x)
        with t.no_grad():
            expected = tm(x).numpy()

        params, stats = tc.convert_local_stage(tc.state_dict_to_numpy(tm.state_dict()))
        m = models.LocalStage()
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        with jax.default_matmul_precision("highest"):
            out = m.apply({"params": jax.tree.map(jnp.asarray, params),
                           "batch_stats": jax.tree.map(jnp.asarray, stats)},
                          xj, train=False)
        npt.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-4)

    def test_global_stage_forward_parity(self):
        t = self.torch
        ref = oracle.load_module("models/global_stage.py", "ref_global_stage")
        tm = ref.GlobalStage(in_parameter_size=38, out_parameter_size=12)
        tm.eval()
        L = 256
        x = t.from_numpy(rng.normal(scale=0.3, size=(2, L, 38)).astype(np.float32))
        with t.no_grad():
            expected = tm(x).numpy()

        params = tc.convert_global_stage(tc.state_dict_to_numpy(tm.state_dict()))
        m = models.GlobalStage()
        with jax.default_matmul_precision("highest"):
            out = m.apply({"params": jax.tree.map(jnp.asarray, params)},
                          jnp.asarray(x.numpy()), train=False)
        npt.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-4)

    def test_positional_encoding_parity(self):
        t = self.torch
        ref = oracle.load_module("models/global_stage.py", "ref_global_stage2")
        pe_ref = ref.PositionalEncoding(d_model=128, max_len=64, stride=2).pe.numpy()[0]
        pe_ours = models.sincos_2d_positional_encoding(128, 64, 2)
        # float32 trig rounding: observed max abs diff ~4e-6
        npt.assert_allclose(pe_ours, pe_ref, rtol=1e-4, atol=1e-5)

    def test_unet_forward_parity(self):
        t = self.torch
        ref = oracle.load_module("models/depth_completion_unet.py", "ref_unet")
        tm = ref.UNet(n_channels=1, n_classes=1, bilinear=False)
        x = t.from_numpy(rng.uniform(0.75, 1.18, size=(1, 1, 57, 57)).astype(np.float32))
        self._warm_bn(tm, x)
        with t.no_grad():
            expected = tm(x).numpy()

        params, stats = tc.convert_unet(tc.state_dict_to_numpy(tm.state_dict()))
        m = models.UNet()
        xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
        with jax.default_matmul_precision("highest"):
            out = m.apply({"params": jax.tree.map(jnp.asarray, params),
                           "batch_stats": jax.tree.map(jnp.asarray, stats)},
                          xj, train=False)
        npt.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), expected,
                            rtol=1e-3, atol=1e-3)
