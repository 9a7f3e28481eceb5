"""Train-state snapshot / resume round-trip."""

import numpy as np
import numpy.testing as npt

import jax
import jax.numpy as jnp

from blurry_edges_tpu.config import PatchConfig
from blurry_edges_tpu.models import LocalStage
from blurry_edges_tpu.train import local as tl
from blurry_edges_tpu.train.resume import load_train_snapshot, save_train_snapshot
from blurry_edges_tpu.train.schedules import PlateauScheduler

import pytest  # noqa: E402

pytestmark = pytest.mark.slow


def test_snapshot_roundtrip(tmp_path):
    model = LocalStage()
    patch = PatchConfig()
    state, tx = tl.init_state(model, jax.random.PRNGKey(0), patch, lr=1e-3)
    train_step, _ = tl.make_steps(model, tx, patch)
    rng = np.random.default_rng(0)
    batch = {
        "img_ny": jnp.asarray(rng.uniform(0, 1, (4, 21, 21, 3)).astype(np.float32)),
        "img_gt": jnp.asarray(rng.uniform(0, 1, (4, 21, 21, 3)).astype(np.float32)),
        "bndry_dist": jnp.asarray(rng.integers(0, 10, (4, 21, 21)).astype(np.float32)),
        "deri": jnp.asarray(rng.uniform(0, 1, (4, 19, 19, 3)).astype(np.float32)),
    }
    state, _ = train_step(state, batch, jnp.asarray((0.0, 0.0), jnp.float32))
    sched = PlateauScheduler(lr=1e-3, factor=0.9, patience=3, min_lr=1e-4,
                             best=0.5, num_bad=1)

    path = str(tmp_path / "snap")
    save_train_snapshot(path, state, epoch=7, sched=sched, best_loss=0.4, best_epoch=5)

    fresh, _ = tl.init_state(model, jax.random.PRNGKey(1), patch, lr=1e-3)
    restored = load_train_snapshot(path, fresh,
                                   PlateauScheduler(lr=1e-3, factor=0.9, patience=3,
                                                    min_lr=1e-4))
    assert restored is not None
    rstate, next_epoch, rsched, best_loss, best_epoch = restored
    assert next_epoch == 8 and best_epoch == 5
    assert np.isclose(best_loss, 0.4)
    assert rsched.best == 0.5 and rsched.num_bad == 1 and rsched.patience == 3
    assert int(rstate.step) == int(state.step)
    for (pa, a), (pb, b) in zip(jax.tree.leaves_with_path(state.params),
                                jax.tree.leaves_with_path(rstate.params)):
        npt.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(rstate.opt_state)):
        npt.assert_array_equal(np.asarray(a), np.asarray(b))


def test_no_snapshot_returns_none(tmp_path):
    model = LocalStage()
    state, _ = tl.init_state(model, jax.random.PRNGKey(0), PatchConfig(), lr=1e-3)
    assert load_train_snapshot(str(tmp_path / "missing"), state,
                               PlateauScheduler(1e-3, 0.9, 2, 1e-4)) is None
