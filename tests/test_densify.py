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
