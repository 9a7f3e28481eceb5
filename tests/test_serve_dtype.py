"""--serve_dtype bfloat16: the serving pipeline must run end-to-end with
bfloat16 compute (params stay float32, activations/matmuls bf16 on the MXU)
and stay close to the float32 path. The reference has no reduced-precision
serving mode (blurry_edges_test.py:102-172 is float32 throughout); this is a
TPU-native extension measured in METRICS.md (1.21x single-pair on v5e)."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu import models
from blurry_edges_tpu.config import GridConfig
from blurry_edges_tpu.eval.pipeline import InferenceModules
import blurry_edges_tpu.eval.pipeline as pipe

rng = np.random.default_rng(31)
H = 49
GRID = GridConfig(H=H, W=H)
N_IMGS = 2


class _TinyDS:
    _imgs = rng.uniform(0, 1, size=(N_IMGS, 2, H, H, 3)).astype(np.float32)
    _gt = np.full((H, H), 0.9, np.float32)

    def __init__(self, path):
        pass

    def __len__(self):
        return N_IMGS

    def __getitem__(self, j):
        return self._imgs[j], self._gt


def _mods(dtype):
    key = jax.random.PRNGKey(0)
    local = models.LocalStage(dtype=dtype)
    glob = models.GlobalStage(dtype=dtype)
    # identical float32 params for both dtypes: init with a float32 template
    f_local = models.LocalStage()
    f_glob = models.GlobalStage()
    return InferenceModules(
        local_model=local,
        local_vars=f_local.init(key, jnp.zeros((1, 21, 21, 3))),
        global_model=glob,
        global_vars=f_glob.init(key, jnp.zeros((1, GRID.num_tokens, 38))))


def _args():
    return types.SimpleNamespace(
        data_path="unused", densify="w", rho_prime=10.39, crop=10,
        R=21, stride=2, img_size=[H, H], w=1.0, alpha_lambda=5e-3, mag=4.0,
        dp_devices=0,
        cam_params={"s": 0.1104, "rho_1": 10.0, "rho_2": 10.2,
                    "sigma_cam": 0.003, "pixel_pitch": 5.86e-6})


def test_params_stay_float32_under_bf16_modules():
    """load_inference_modules keeps checkpoints float32; only module compute
    dtype changes with --serve_dtype (utils/weights.py)."""
    mods = _mods(jnp.bfloat16)
    leaves = jax.tree.leaves(mods.local_vars) + jax.tree.leaves(mods.global_vars)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert mods.local_model.dtype == jnp.bfloat16
    assert mods.global_model.dtype == jnp.bfloat16


@pytest.mark.slow
def test_bf16_pipeline_runs_and_tracks_f32(monkeypatch, capsys):
    from blurry_edges_tpu.data import datasets as ds_mod

    monkeypatch.setattr(ds_mod, "TestDataset", _TinyDS)

    res_f32 = pipe.run_eval(_args(), modules=_mods(jnp.float32))
    capsys.readouterr()
    res_bf16 = pipe.run_eval(_args(), modules=_mods(jnp.bfloat16))
    out = capsys.readouterr().out

    assert f"Image pair #{N_IMGS - 1}:" in out
    assert "empty predictions" not in out
    for k in ("delta1", "delta2", "delta3", "rmse", "absrel"):
        assert np.isfinite(res_bf16[k]), k
        # bf16 is confined to the NN forwards (analytics stay f32), so the
        # only drift is bf16 rounding of the regressed wedge params; steep
        # wedge indicators can still flip individual pixels, hence the
        # moderate (not tight) tolerance
        np.testing.assert_allclose(res_bf16[k], res_f32[k], rtol=0.25,
                                   atol=0.05, err_msg=k)


@pytest.mark.slow
def test_bf16_nn_boundary_is_exact():
    """Tight anchor for the f32 NN-boundary design (round-4 advisor finding:
    the loose metric tolerances above can't catch a future cast removal).
    The designed invariant: with --serve_dtype bfloat16, ONLY the two NN
    forwards run bf16 — everything after the cast at the global-stage output
    (wedge fields, indicators, color solve, DfD, folds, the 0.05 threshold)
    is float32. So the bf16 estimator must agree EXACTLY (bit-level) with an
    oracle that takes the same bf16 NN outputs, casts them to float32, and
    runs the f32 analytic chain. If bf16 ever leaks past the boundary, the
    analytic values quantize and the exact match breaks immediately.

    (A count-based anchor was tried first: at random init the NN outputs sit
    near zero where bf16 rounding is relatively huge, so threshold coverage
    differs wildly between serve dtypes — 16 vs 26 of 2401 pixels on this
    draw — and any count bound is either vacuous or flaky.)"""
    from blurry_edges_tpu.config import CamConfig, PatchConfig
    from blurry_edges_tpu.ops import params2etas, unfold
    from blurry_edges_tpu.ops.dfd import DfDSolver
    from blurry_edges_tpu.ops.params import denormalize_global_eval
    from blurry_edges_tpu.train.global_precal import local_tokens

    patch_cfg = PatchConfig()
    cam = CamConfig()
    mods = _mods(jnp.bfloat16)
    img = jnp.asarray(_TinyDS._imgs[0])

    got = pipe.make_depth_estimator(mods, patch_cfg, GRID, cam,
                                    densify=None)(img)
    assert got["confidence"].dtype == jnp.float32
    assert got["depth_final"].dtype == jnp.float32

    @jax.jit
    def oracle(img_ny):
        # the SAME bf16 NN forwards...
        tokens, _ = local_tokens(mods.local_model, mods.local_vars, img_ny,
                                 patch_cfg, GRID, False)
        src = tokens.transpose(1, 0, 2).reshape(1, GRID.num_tokens, 38)
        est = mods.global_model.apply(mods.global_vars, src, train=False)
        # ...cast at the boundary, then a PURE float32 analytic chain
        est = est.astype(jnp.float32)
        Hp, Wp = GRID.H_patches, GRID.W_patches
        den = denormalize_global_eval(est).reshape(1, Hp, Wp, 12)
        dfd = DfDSolver.from_config(cam, patch_cfg)
        img_patches = unfold(img_ny, GRID.R, GRID.stride)[None]
        rend = pipe.render_full(den[..., :8], params2etas(den[..., 8:]),
                                img_patches, patch_cfg, dfd, 10.39, False)
        out = pipe.fold_outputs(rend, GRID, jnp.float32)
        out["depth_final"] = jnp.where(out["confidence"] > 0.05,
                                       out["global_depth"], 0.0)
        return out

    want = oracle(img)
    for k in ("confidence", "global_depth", "depth_final"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]),
                                      err_msg=k)
