"""Densify (depth-completion) training: sparse-input synthesis and a UNet
overfit smoke test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu.models import UNet
from blurry_edges_tpu.train import densify

pytestmark = pytest.mark.slow


def test_make_sparse_from_gt():
    H = 48
    depth = jnp.full((H, H), 0.9)
    bndry = jnp.zeros((H, H)).at[20, :].set(255.0)
    sparse, mask = densify.make_sparse_from_gt(jax.random.PRNGKey(0), depth, bndry)
    sparse, mask = np.asarray(sparse), np.asarray(mask)
    assert mask.any() and not mask.all()
    # revealed pixels hug the boundary row
    rows = np.where(mask.any(axis=1))[0]
    assert rows.min() >= 9 and rows.max() <= 31
    # values near gt (2% multiplicative noise)
    vals = sparse[mask]
    assert np.abs(vals - 0.9).max() < 0.9 * 0.12
    assert (sparse[~mask] == 0).all()


def test_unet_overfit_smoke():
    H = 32
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.uniform(0.75, 1.18, size=(2, H, H)).astype(np.float32))
    sparse = target * (jnp.asarray(rng.uniform(size=(2, H, H))) > 0.7)

    model = UNet()
    state, tx = densify.init_state(model, jax.random.PRNGKey(0), lr=1e-3, H=H, W=H)
    train_step, eval_step = densify.make_steps(model, tx)
    losses = []
    for _ in range(4):
        state, loss = train_step(state, sparse, target)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert np.isfinite(float(eval_step(state, sparse, target)))


def test_pipeline_sparse_depths_chunking(monkeypatch):
    """Contract of the pipeline-sourced sparse-map generator: chunked batched
    estimation with static-shape tail padding, the (B, 1, H, W) -> (B, H, W)
    fold-batch-dim squeeze, sample ordering, and first-execution retry with a
    halved chunk (the x16 program OOMs one v5e chip's HBM at compile)."""
    import types

    from blurry_edges_tpu.data import datasets as ds_mod
    from blurry_edges_tpu.eval import pipeline as pipe_mod

    H = W = 147
    n_total = 5

    class FakeDS:
        def __init__(self, *a, **k):
            pass

        def __len__(self):
            return n_total

        def batch(self, idx):
            return {"img_ny": np.broadcast_to(
                np.asarray(idx, np.float32)[:, None, None, None, None],
                (len(idx), 2, H, W, 3)).copy()}

    built = {"n": 0}

    def fake_make(mods, patch_cfg, grid, cam, densify=None, **kw):
        built["n"] += 1
        fail_first = built["n"] == 1

        def estimate(imgs):
            if fail_first:
                raise RuntimeError("simulated compile OOM")
            # per-sample depth = encoded sample index, with the estimator's
            # real output layout (B, 1, H, W)
            return {"depth_final": np.broadcast_to(
                np.asarray(imgs)[:, 0, 0, 0, 0][:, None, None, None],
                (imgs.shape[0], 1, H, W))}

        return estimate

    monkeypatch.setattr(ds_mod, "ShapeDataset", FakeDS)
    monkeypatch.setattr(pipe_mod, "make_batched_depth_estimator", fake_make)

    args = types.SimpleNamespace(data_path="/nonexistent", R=21, stride=2,
                                 img_size=[H, W], w=1.0, alpha_lambda=5e-3,
                                 mag=4.0,
                                 cam_params={"s": 0.1104, "rho_1": 10.0,
                                             "rho_2": 10.2, "sigma_cam": 0.003,
                                             "pixel_pitch": 5.86e-6})
    out = densify._pipeline_sparse_depths(args, "val", modules=object(),
                                          chunk=4)
    # first estimator failed at its first execution -> rebuilt at chunk=2
    assert built["n"] == 2
    assert out.shape == (n_total, H, W)
    # ordering preserved, tail padding trimmed (5 = 2 + 2 + (1 + pad 1))
    np.testing.assert_allclose(out[:, 0, 0], np.arange(n_total, dtype=np.float32))


def test_realistic_sparse_pairs(monkeypatch, tmp_path):
    """The realistic-source branch: images normalized by alpha feed the
    batched estimator; targets are the set's dense depth_maps; sample order
    and shapes survive the chunked drive."""
    import types

    from blurry_edges_tpu.eval import pipeline as pipe_mod

    H = W = 147
    n = 5
    rng = np.random.default_rng(0)
    img_ny = np.broadcast_to(
        np.arange(n, dtype=np.float32)[:, None, None, None, None],
        (n, 2, H, W, 3)).copy()
    alphas = np.full((n,), 2.0, np.float32)
    depth_maps = rng.uniform(0.75, 1.18, size=(n, H, W)).astype(np.float32)
    np.save(tmp_path / "images_ny.npy", img_ny)
    np.save(tmp_path / "alphas.npy", alphas)
    np.save(tmp_path / "depth_maps.npy", depth_maps)

    seen = []

    def fake_make(mods, patch_cfg, grid, cam, densify=None, **kw):
        def estimate(imgs):
            seen.append(np.asarray(imgs))
            # echo the (alpha-normalized) sample id into the depth output
            return {"depth_final": np.broadcast_to(
                np.asarray(imgs)[:, 0, 0, 0, 0][:, None, None, None],
                (imgs.shape[0], 1, H, W))}

        return estimate

    monkeypatch.setattr(pipe_mod, "make_batched_depth_estimator", fake_make)
    args = types.SimpleNamespace(data_path="/nonexistent", R=21, stride=2,
                                 img_size=[H, W], w=1.0, alpha_lambda=5e-3,
                                 mag=4.0,
                                 cam_params={"s": 0.1104, "rho_1": 10.0,
                                             "rho_2": 10.2, "sigma_cam": 0.003,
                                             "pixel_pitch": 5.86e-6})
    sparse, target = densify._realistic_sparse_pairs(
        args, str(tmp_path), modules=object(), chunk=4)
    assert sparse.shape == (n, H, W) and target.shape == (n, H, W)
    np.testing.assert_allclose(target, depth_maps)
    # alpha normalization happened (ids halved), order preserved
    np.testing.assert_allclose(sparse[:, 0, 0],
                               np.arange(n, dtype=np.float32) / 2.0)
