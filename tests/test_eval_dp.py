"""--dp_devices on the 147x147 eval path: run_eval with a data mesh must
score every image with the same per-image protocol as the single-device loop
(groups of D images sharded one-per-device, reference protocol otherwise
unchanged; reference blurry_edges_test.py:102-172 is single-device only)."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu import models
from blurry_edges_tpu.config import GridConfig
from blurry_edges_tpu.eval.pipeline import InferenceModules
import blurry_edges_tpu.eval.pipeline as pipe

pytestmark = pytest.mark.slow

rng = np.random.default_rng(23)
H = 49
GRID = GridConfig(H=H, W=H)
N_IMGS = 6  # with D=4: one full group + a padded remainder group


class _TinyDS:
    """Six fixed random pairs (test-set protocol shapes at H=49)."""

    _imgs = rng.uniform(0, 1, size=(N_IMGS, 2, H, H, 3)).astype(np.float32)
    _gt = np.full((H, H), 0.9, np.float32)

    def __init__(self, path):
        pass

    def __len__(self):
        return N_IMGS

    def __getitem__(self, j):
        return self._imgs[j], self._gt


def _mods():
    key = jax.random.PRNGKey(0)
    local = models.LocalStage()
    glob = models.GlobalStage()
    return InferenceModules(
        local_model=local, local_vars=local.init(key, jnp.zeros((1, 21, 21, 3))),
        global_model=glob,
        global_vars=glob.init(key, jnp.zeros((1, GRID.num_tokens, 38))))


def _args(dp):
    return types.SimpleNamespace(
        data_path="unused", densify="w", rho_prime=10.39, crop=10,
        R=21, stride=2, img_size=[H, H], w=1.0, alpha_lambda=5e-3, mag=4.0,
        dp_devices=dp,
        cam_params={"s": 0.1104, "rho_1": 10.0, "rho_2": 10.2,
                    "sigma_cam": 0.003, "pixel_pitch": 5.86e-6})


def test_run_eval_dp_matches_single(monkeypatch, capsys):
    from blurry_edges_tpu.data import datasets as ds_mod

    monkeypatch.setattr(ds_mod, "TestDataset", _TinyDS)
    mods = _mods()

    res_single = pipe.run_eval(_args(0), modules=mods)
    out_single = capsys.readouterr().out
    res_dp = pipe.run_eval(_args(4), modules=mods)
    out_dp = capsys.readouterr().out

    # every image scored in both runs (densify='w' thresholds at 0.0, so
    # random-init weights still produce predictions everywhere)
    for out in (out_single, out_dp):
        assert f"Image pair #{N_IMGS - 1}:" in out
        assert "empty predictions" not in out

    # same protocol, vmap-reassociation float noise only
    for k in ("delta1", "delta2", "delta3", "rmse", "absrel"):
        np.testing.assert_allclose(res_dp[k], res_single[k], rtol=5e-2,
                                   atol=5e-3, err_msg=k)
    assert np.isfinite(res_dp["pairs_per_sec"])
