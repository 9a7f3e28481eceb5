"""Global training: 7-term loss parity with the reference GlobalLoss oracle,
token packing parity, and an optimizer smoke test."""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu.config import CamConfig, GridConfig, PatchConfig
from blurry_edges_tpu.models import GlobalStage
from blurry_edges_tpu.ops.dfd import DfDSolver
from blurry_edges_tpu.train import global_ as tg
from blurry_edges_tpu.train import schedules

from . import oracle

pytestmark = pytest.mark.slow

rng = np.random.default_rng(7)

B, H, R, STRIDE = 2, 49, 21, 2
GRID = GridConfig(H=H, W=H, R=R, stride=STRIDE)
PATCH = PatchConfig()
DFD = DfDSolver.from_config(CamConfig(), PATCH)
L = GRID.num_tokens

GAMMA_RANGES = {
    "color": (1.0, 0.1, 0.1), "color_cons": (0.2, 0.1, 0.05),
    "bndry_cons": (0.05, 0.05, 0.02), "smthns": (0.005, 0.1, 0.002),
    "smthns_cons": (0.005, 0.1, 0.002), "bndry_loc": (0.0001, 0.05, 0.0001),
    "depth": (0.0001, 0.05, 0.5),
}


def make_batch():
    bndry_depth = np.zeros((B, H, H), np.float32)
    ring = rng.uniform(0, 1, size=(B, H, H)) < 0.08
    bndry_depth[ring] = rng.uniform(0.75, 1.18, size=int(ring.sum()))
    return {
        "input_param": rng.normal(scale=0.3, size=(B, 2, L, 19)).astype(np.float32),
        "img_ny": rng.uniform(0, 1, size=(B, 2, H, H, 3)).astype(np.float32),
        "img_gt": rng.uniform(0, 1, size=(B, 2, H, H, 3)).astype(np.float32),
        "bndry_dist": rng.integers(0, 20, size=(B, H, H)).astype(np.float32),
        "deri": rng.uniform(0, 1, size=(B, 2, H - 2, H - 2, 3)).astype(np.float32),
        "bndry_depth": bndry_depth,
    }


def test_tokens_from_params_src():
    ps = rng.normal(size=(3, 2, 10, 19)).astype(np.float32)
    out = np.asarray(tg.tokens_from_params_src(jnp.asarray(ps)))
    assert out.shape == (3, 10, 38)
    npt.assert_array_equal(out[1, 4, :19], ps[1, 0, 4])
    npt.assert_array_equal(out[1, 4, 19:], ps[1, 1, 4])


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
def test_global_loss_parity():
    import torch

    gt_mod = oracle.load_top_level("global_training.py", "ref_global_training")
    de_mod = oracle.load_module("utils/depth_etas.py", "ref_de2")

    args = oracle.make_args(batch_size=B, img_size=[H, H],
                            gamma_color=list(GAMMA_RANGES["color"]),
                            gamma_color_cons=list(GAMMA_RANGES["color_cons"]),
                            gamma_bndry_cons=list(GAMMA_RANGES["bndry_cons"]),
                            gamma_smthns=list(GAMMA_RANGES["smthns"]),
                            gamma_smthns_cons=list(GAMMA_RANGES["smthns_cons"]),
                            gamma_bndry_loc=list(GAMMA_RANGES["bndry_loc"]),
                            gamma_depth=list(GAMMA_RANGES["depth"]),
                            dynamic_epoch=[30, 100, 200])
    device = torch.device("cpu")
    criteria = gt_mod.GlobalLoss(args, de_mod.DepthEtas(args, device), device)
    criteria.final_gamma()

    batch = make_batch()
    est = rng.normal(scale=0.3, size=(B, L, 12)).astype(np.float32)

    gammas = tg.gammas_to_array(schedules.final_gamma(GAMMA_RANGES))
    ours = float(tg.global_loss(
        jnp.asarray(est), jnp.asarray(batch["img_ny"]), jnp.asarray(batch["img_gt"]),
        jnp.asarray(batch["bndry_dist"]), jnp.asarray(batch["deri"]),
        jnp.asarray(batch["bndry_depth"]), gammas, PATCH, GRID, DFD))

    t = torch
    theirs = float(criteria(
        t.from_numpy(est.copy()), t.from_numpy(batch["img_ny"]),
        t.from_numpy(batch["img_gt"]), t.from_numpy(batch["bndry_dist"]),
        t.from_numpy(batch["deri"]), t.from_numpy(batch["bndry_depth"])))
    npt.assert_allclose(ours, theirs, rtol=5e-3)


def test_global_train_steps_run():
    model = GlobalStage()
    state, tx = tg.init_state(model, jax.random.PRNGKey(0), lr=1e-4, L=L)
    train_step, eval_step = tg.make_steps(model, tx, PATCH, GRID, DFD)
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    gammas = tg.gammas_to_array(schedules.final_gamma(GAMMA_RANGES))

    losses = []
    for i in range(3):
        state, loss = train_step(state, batch, gammas, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    val = float(eval_step(state, batch, gammas))
    assert np.isfinite(val)
