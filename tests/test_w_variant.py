"""w-variant global-stage training: hard wedge-side depth masks.

The reference distributes ``pretrained_global_stage_w.pth`` with no trainer;
our ``--w_variant`` trains the depth term on the HARD wedge-side assignment
(``dists > 0`` interior, wedge-2 precedence) that ``--densify w`` consumes at
inference (reference blurry_edges_test.py:47-58), instead of the soft
near-boundary band the shared stage uses (reference global_training.py:84-86).
"""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu.config import CamConfig, GridConfig, PatchConfig
from blurry_edges_tpu.models import GlobalStage
from blurry_edges_tpu.ops import depth_masks
from blurry_edges_tpu.ops.dfd import DfDSolver
from blurry_edges_tpu.ops.wedge import depth_masks_flat
from blurry_edges_tpu.train import global_ as tg
from blurry_edges_tpu.train import schedules


def test_hard_mask_semantics():
    rng = np.random.default_rng(0)
    dists = jnp.asarray(rng.normal(scale=2.0, size=(4, 2, 7, 7)).astype(np.float32))
    hard = np.asarray(depth_masks(dists, hard=True))
    d0, d1 = np.asarray(dists)[:, 0], np.asarray(dists)[:, 1]
    # wedge-2 interior wins, then wedge-1 interior, else background
    expect = np.where(d1 > 0, 2, np.where(d0 > 0, 1, 0))
    npt.assert_array_equal(hard, expect)
    # and it is NOT the soft near-boundary band
    soft = np.asarray(depth_masks(dists, hard=False))
    assert (hard != soft).any()


def test_hard_mask_flat_matches_gridded():
    rng = np.random.default_rng(1)
    dists = jnp.asarray(rng.normal(scale=2.0, size=(3, 2, 5, 5)).astype(np.float32))
    gridded = np.asarray(depth_masks(dists, hard=True))
    flat = np.asarray(depth_masks_flat(dists[..., 0, :, :].reshape(3, 25),
                                       dists[..., 1, :, :].reshape(3, 25),
                                       hard=True))
    npt.assert_array_equal(gridded.reshape(3, 25), flat)


@pytest.mark.slow
def test_w_variant_step_changes_objective():
    """One tiny train step with hard_mask on/off: both finite, losses differ
    (proves --w_variant actually rewires the depth term)."""
    H = 29  # 5x5 patch grid, 25 tokens
    grid = GridConfig(H=H, W=H)
    patch_cfg = PatchConfig()
    dfd = DfDSolver.from_config(CamConfig(), patch_cfg)
    model = GlobalStage()
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(2)
    B = 2
    bd = np.zeros((B, H, H), np.float32)
    bd[:, ::5, :] = 0.9
    batch = {
        "input_param": rng.normal(scale=0.3, size=(B, 2, grid.num_tokens, 19)).astype(np.float32),
        "img_ny": rng.uniform(0, 1, (B, 2, H, H, 3)).astype(np.float32),
        "img_gt": rng.uniform(0, 1, (B, 2, H, H, 3)).astype(np.float32),
        "bndry_dist": rng.integers(0, 10, (B, H, H)).astype(np.float32),
        "deri": rng.uniform(0, 1, (B, 2, H - 2, H - 2, 3)).astype(np.float32),
        "bndry_depth": bd,
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    gammas = tg.gammas_to_array(schedules.final_gamma(
        {k: (1.0, 0.5, 0.1) for k in tg.GAMMA_ORDER}))

    losses = {}
    for hard in (False, True):
        state, tx = tg.init_state(model, key, lr=1e-4, L=grid.num_tokens)
        train_step, _ = tg.make_steps(model, tx, patch_cfg, grid, dfd,
                                      hard_mask=hard)
        _, loss = train_step(state, batch, gammas, jax.random.PRNGKey(1))
        losses[hard] = float(loss)
        assert np.isfinite(losses[hard])
    assert losses[True] != losses[False]
