"""Local-stage training harness.

Parity with reference local_training.py:10-122: AdamW lr 6e-5 batch 64,
xavier-normal re-init of dim>1 params, global-norm grad clip 1.0, the
three-term loss (color MSE + beta_loc * boundary-localization +
beta_smthns * Sobel smoothness) with betas ramping linearly over the first
dynamic_epoch epochs, ReduceLROnPlateau(factor .9, min 10%) with patience
2 + 3*floor(log2(epoch+1)), per-epoch val loss at final betas, best-val
checkpointing, text log + loss-curve artifacts.

Faithfully reproduced quirk: the reference's training step solves wedge
colors on the *clean* image (criteria(est, img_gt, img_gt, ...) at
local_training.py:105) while validation solves on the noisy image (:61).

TPU-first mechanics: one jitted train step (model fwd + wedge render + ridge
solve + loss + grads + optimizer), whole batches device_put in one transfer,
LR injected through optax.inject_hyperparams so the plateau scheduler never
recompiles.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..config import PatchConfig
from ..models import LocalStage
from ..ops import (boundary_map, dists2indicators, make_patch_grid, params2dists,
                   params2etas, render_patches, solve_colors)
from ..ops.sobel import image_derivative

TWO_PI = 2.0 * math.pi


class TrainState(struct.PyTreeNode):
    params: dict
    batch_stats: dict
    opt_state: tuple
    step: jnp.ndarray


def make_optimizer(lr: float):
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.inject_hyperparams(optax.adamw)(learning_rate=lr))


def set_lr(opt_state, lr: float):
    """Swap the injected learning rate without recompiling."""
    ih = opt_state[1]
    hp = dict(ih.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return (opt_state[0], ih._replace(hyperparams=hp))


def current_lr(opt_state) -> float:
    return float(opt_state[1].hyperparams["learning_rate"])


def xavier_reinit(params, key):
    """Re-initialize every rank>1 parameter with Xavier normal (reference
    local_training.py:83-85). Biases and norm scales keep their defaults."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    init = jax.nn.initializers.xavier_normal()

    def reinit(leaf, k):
        if leaf.ndim > 1:
            # glorot over (receptive_field..., in, out) matches torch fan calc
            return init(k, leaf.shape, leaf.dtype)
        return leaf

    return jax.tree.unflatten(treedef, [reinit(l, k) for l, k in zip(leaves, keys)])


def local_loss(est, img_for_colors, img_gt, bndry_dist, deri,
               patch: PatchConfig, betas: Tuple):
    """The three local loss terms (reference local_training.py:32-52).

    est: (B, 10); images: (B, R, R, 3); bndry_dist: (B, R, R);
    deri: (B, R-2, R-2, 3); betas = (beta_bndry_loc, beta_smthns) traced.
    """
    x, y = make_patch_grid(patch.R, est.dtype)
    est = jnp.concatenate([est[:, :4], jnp.mod(est[:, 4:8], TWO_PI), est[:, 8:]], axis=1)
    dists = params2dists(est[:, :8], x, y, patch.w)
    etas = params2etas(est[:, 8:])
    wedges = dists2indicators(dists, etas)
    B = est.shape[0]
    A = jnp.moveaxis(wedges, -3, -1).reshape(B, patch.R**2, 3)
    colors = solve_colors(A, img_for_colors.reshape(B, patch.R**2, 3), patch.lambda_ridge)
    patches = render_patches(wedges, colors)
    bmap = boundary_map(dists)

    color_term = jnp.mean(jnp.sum((img_gt - patches) ** 2, axis=-1))
    loc_term = jnp.mean((bndry_dist * bmap) ** 2)
    smth_term = jnp.mean(jnp.sum((deri - image_derivative(patches)) ** 2, axis=-1))
    return color_term + betas[0] * loc_term + betas[1] * smth_term


def make_step_fns(model: LocalStage, tx, patch: PatchConfig):
    """Un-jitted train/eval step implementations (jit or scan them)."""

    def train_step(state: TrainState, batch, betas):
        def loss_fn(params):
            est, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["img_ny"], train=True, mutable=["batch_stats"])
            # reference quirk: colors solved on the clean image during training
            loss = local_loss(est, batch["img_gt"], batch["img_gt"],
                              batch["bndry_dist"], batch["deri"], patch, betas)
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, batch_stats=new_stats,
                             opt_state=new_opt, step=state.step + 1), loss

    def eval_step(state: TrainState, batch, betas):
        est = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                          batch["img_ny"], train=False)
        return local_loss(est, batch["img_ny"], batch["img_gt"],
                          batch["bndry_dist"], batch["deri"], patch, betas)

    return train_step, eval_step


def make_steps(model: LocalStage, tx, patch: PatchConfig):
    """Jitted per-batch train and eval steps."""
    train_step, eval_step = make_step_fns(model, tx, patch)
    return jax.jit(train_step), jax.jit(eval_step)


def make_epoch_steps(model: LocalStage, tx, patch: PatchConfig, batch_size: int):
    """Whole-epoch train/eval as single jitted programs: a lax.scan over
    device-resident batches. One dispatch per epoch instead of one per step -
    essential when host<->device dispatch latency (tunneled TPU) rivals the
    ~1 ms step compute."""
    train_step, eval_step = make_step_fns(model, tx, patch)

    @functools.partial(jax.jit, donate_argnums=0)
    def epoch_train(state: TrainState, data, perm, betas):
        nb = perm.shape[0] // batch_size
        idx = perm[:nb * batch_size].reshape(nb, batch_size)

        def step(st, i):
            batch = {k: v[i] for k, v in data.items()}
            st, loss = train_step(st, batch, betas)
            return st, loss

        state, losses = jax.lax.scan(step, state, idx)
        return state, jnp.mean(losses)

    @jax.jit
    def epoch_eval(state: TrainState, data, betas):
        n = next(iter(data.values())).shape[0]
        nb = n // batch_size
        idx = jnp.arange(nb * batch_size).reshape(nb, batch_size)

        def step(_, i):
            batch = {k: v[i] for k, v in data.items()}
            return None, eval_step(state, batch, betas)

        _, losses = jax.lax.scan(step, None, idx)
        return jnp.mean(losses)

    return epoch_train, epoch_eval


def init_state(model: LocalStage, key, patch: PatchConfig, lr: float) -> Tuple[TrainState, object]:
    k_init, k_xavier = jax.random.split(key)
    variables = model.init(k_init, jnp.zeros((1, patch.R, patch.R, 3)))
    params = xavier_reinit(variables["params"], k_xavier)
    tx = make_optimizer(lr)
    state = TrainState(params=params, batch_stats=variables["batch_stats"],
                       opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))
    return state, tx


def run_local_training(args, snapshot_every: int = 25, resume: bool = True,
                       mesh=None) -> None:
    """CLI-level harness (reference local_training.py:68-122), plus full
    train-state snapshot/resume every ``snapshot_every`` epochs (a capability
    the reference lacks).

    ``mesh``: optional jax.sharding.Mesh with a 'data' axis. The dataset is
    sharded across it on the sample axis and parameters are replicated; the
    jitted epoch scan then runs SPMD with XLA inserting the gradient psum
    over ICI (reference hot loop local_training.py:99-118, scaled per
    SURVEY.md section 2.2)."""
    from tqdm import tqdm

    from ..config import patch_from_args
    from ..data.datasets import ShapeDataset
    from ..utils.io import TrainLogger, create_directory, show_curve
    from ..utils.seeding import set_seed
    from . import schedules
    from .checkpoint import save_checkpoint
    from .resume import load_train_snapshot, save_train_snapshot

    key = set_seed(1869)
    create_directory(args.log_path, overwrite=False)
    patch = patch_from_args(args)

    ds_train = ShapeDataset(args.data_path, train=True, mode="local")
    ds_val = ShapeDataset(args.data_path, train=False, mode="local")
    # the full normalized patch set fits on device (~100 MB at reference
    # scale): one transfer, then every epoch is a single jitted scan
    data_train = {k: jnp.asarray(v)
                  for k, v in ds_train.batch(np.arange(len(ds_train))).items()}
    data_val = {k: jnp.asarray(v)
                for k, v in ds_val.batch(np.arange(len(ds_val))).items()}

    model = LocalStage()
    state, tx = init_state(model, key, patch, args.learning_rate)
    if mesh is not None:
        from ..parallel import replicate, shard_batch
        data_train = shard_batch(data_train, mesh)
        data_val = shard_batch(data_val, mesh)
        state = state.replace(params=replicate(state.params, mesh),
                              batch_stats=replicate(state.batch_stats, mesh),
                              opt_state=replicate(state.opt_state, mesh))
    epoch_train, epoch_eval = make_epoch_steps(model, tx, patch, args.batch_size)
    sched = schedules.PlateauScheduler(lr=args.learning_rate, factor=0.9, patience=2,
                                       min_lr=args.learning_rate * 0.1)

    final_betas = (args.beta_bndry_loc, args.beta_smthns)
    best_loss, best_epoch, start_epoch = np.inf, 0, 0
    snap_path = f"{args.model_path}/last_exp_local_stage"
    if resume:
        snap = load_train_snapshot(snap_path, state, sched)
        if snap is not None:
            state, start_epoch, sched, best_loss, best_epoch = snap
    curve = np.zeros((args.epoch_num,), dtype=float)
    logger = TrainLogger(f"{args.log_path}/exp_local_stage_training.txt", args)

    for epoch in tqdm(range(start_epoch, args.epoch_num)):
        betas = jnp.asarray(schedules.beta_schedule(
            epoch, args.dynamic_epoch, *final_betas), jnp.float32)
        key, kp = jax.random.split(key)
        perm = jax.random.permutation(kp, len(ds_train))
        state, _ = epoch_train(state, data_train, perm, betas)
        curve[epoch] = float(epoch_eval(state, data_val,
                                        jnp.asarray(final_betas, jnp.float32)))

        lr = sched.step(curve[epoch])
        sched.patience = schedules.local_patience(epoch)
        state = state.replace(opt_state=set_lr(state.opt_state, lr))

        logger.epoch(epoch, curve[epoch], sched.patience, lr)
        if curve[epoch] < best_loss:
            best_loss, best_epoch = curve[epoch], epoch
            save_checkpoint(f"{args.model_path}/best_run_exp_local_stage",
                            {"params": state.params, "batch_stats": state.batch_stats})
        if snapshot_every and (epoch + 1) % snapshot_every == 0:
            save_train_snapshot(snap_path, state, epoch, sched, best_loss, best_epoch)

    np.save(f"{args.log_path}/loss_curve_exp_local_stage.npy", curve)
    show_curve(args.log_path, curve, "loss_curve_exp_local_stage")
    logger.footer(best_epoch, best_loss)
    logger.close()
