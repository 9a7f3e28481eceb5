"""Local training: loss parity with the reference composite loss, and a
smoke test that a few optimizer steps run and reduce the loss."""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu.config import PatchConfig
from blurry_edges_tpu.models import LocalStage
from blurry_edges_tpu.train import local as tl

from . import oracle

pytestmark = pytest.mark.slow

rng = np.random.default_rng(6)
R = 21
PATCH = PatchConfig()


def make_batch(B):
    return {
        "img_ny": rng.uniform(0, 1, size=(B, R, R, 3)).astype(np.float32),
        "img_gt": rng.uniform(0, 1, size=(B, R, R, 3)).astype(np.float32),
        "bndry_dist": rng.integers(0, 15, size=(B, R, R)).astype(np.float32),
        "deri": rng.uniform(0, 1, size=(B, R - 2, R - 2, 3)).astype(np.float32),
    }


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
def test_local_loss_parity():
    """Full three-term loss vs the reference formulation (reference
    local_training.py:32-52) assembled from the oracle's primitives."""
    import torch
    ppl = oracle.load_module("utils/postprocessing_loss.py", "ref_ppl3")

    B = 16

    class PP(ppl.PostProcessLocalBase):
        def forward(self):  # pragma: no cover
            raise NotImplementedError

    pp = PP(oracle.make_args(batch_size=B), torch.device("cpu"))
    batch = make_batch(B)
    est = rng.normal(scale=1.5, size=(B, 10)).astype(np.float32)
    betas = (0.001, 0.0005)

    ours = float(tl.local_loss(jnp.asarray(est), jnp.asarray(batch["img_ny"]),
                               jnp.asarray(batch["img_gt"]), jnp.asarray(batch["bndry_dist"]),
                               jnp.asarray(batch["deri"]), PATCH, betas))

    t = torch
    te = t.from_numpy(est.copy())
    te[:, 4:8] = t.remainder(te[:, 4:8], 2 * t.pi)
    dists = pp.params2dists(te[:, :8])
    etas = pp.params2etas(te[:, 8:])
    w = pp.dists2indicators(dists, etas)
    A = w.permute(0, 2, 3, 1).reshape(B, -1, 3)
    y = t.from_numpy(batch["img_ny"]).reshape(B, -1, 3)
    colors = t.matmul(pp.inverse_3by3(t.matmul(A.permute(0, 2, 1), A) + pp.ridge),
                      t.matmul(A.permute(0, 2, 1), y)).permute(0, 2, 1)
    patches = (w.unsqueeze(1) * colors.unsqueeze(-1).unsqueeze(-1)).sum(dim=2)
    dists_B = t.where(dists[:, 1] >= 0, dists[:, 1],
                      t.where(t.abs(dists[:, 0]) < t.abs(dists[:, 1]),
                              t.abs(dists[:, 0]), t.abs(dists[:, 1])))
    bmap = pp.normalized_gaussian(dists_B)
    gt = t.from_numpy(batch["img_gt"])
    loss_ref = (((gt - patches.permute(0, 2, 3, 1)) ** 2).sum(-1).mean()
                + betas[0] * ((t.from_numpy(batch["bndry_dist"]) * bmap) ** 2).mean()
                + betas[1] * ((t.from_numpy(batch["deri"]).permute(0, 3, 1, 2)
                               - pp.get_image_derivative(patches)) ** 2).sum(1).mean())
    npt.assert_allclose(ours, float(loss_ref), rtol=2e-3)


def test_train_steps_reduce_loss():
    model = LocalStage()
    state, tx = tl.init_state(model, jax.random.PRNGKey(0), PATCH, lr=1e-3)
    train_step, eval_step = tl.make_steps(model, tx, PATCH)
    batch = {k: jnp.asarray(v) for k, v in make_batch(16).items()}
    betas = jnp.asarray((0.0, 0.0), jnp.float32)

    losses = []
    for _ in range(5):
        state, loss = train_step(state, batch, betas)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # overfits a fixed batch

    val = float(eval_step(state, batch, betas))
    assert np.isfinite(val)


def test_set_lr_no_recompile():
    model = LocalStage()
    state, tx = tl.init_state(model, jax.random.PRNGKey(0), PATCH, lr=1e-3)
    assert np.isclose(tl.current_lr(state.opt_state), 1e-3)
    state = state.replace(opt_state=tl.set_lr(state.opt_state, 5e-4))
    assert np.isclose(tl.current_lr(state.opt_state), 5e-4)


def test_xavier_reinit_only_matrices():
    model = LocalStage()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, R, R, 3)))
    new = tl.xavier_reinit(v["params"], jax.random.PRNGKey(1))
    flat_old = jax.tree.leaves_with_path(v["params"])
    flat_new = dict(jax.tree.leaves_with_path(new))
    for path, old in flat_old:
        nw = flat_new[path]
        if old.ndim > 1:
            assert not np.allclose(np.asarray(old), np.asarray(nw))
        else:
            npt.assert_array_equal(np.asarray(old), np.asarray(nw))
