"""Depth-completion (densify 'pp') U-Net training.

The reference uses a pretrained UNet at inference
(blurry_edges_test.py:193-198, weights pretrained_depth_completion_pp.pth) but
ships NO training script for it (SURVEY.md C11) - this module fills that gap.

Two ways to build (sparse depth -> dense depth) training pairs:

1. ``pipeline`` - the faithful option: run the trained local + global stages
   over the basic-shape train/val images and use the confidence-thresholded
   folded depth maps as inputs, the generator's dense image_depths as targets.
2. ``simulated`` - self-contained: synthesize the pipeline's sparsity pattern
   directly from ground truth (depth revealed only on a randomized
   dilated-boundary band, plus dropout and noise), so the densifier can train
   before/without the other stages.

Either pipeline-sourced set can additionally be MIXED with realistic-generator
scenes (``realistic_dirs``): the shapes set has piecewise-constant depth, while
the eval protocol's scenes (reference test_data_generator.py:123-133) are two
planar depth ramps - a UNet trained on constants alone systematically flattens
ramps. Mixing freshly-seeded realistic scenes (same generator as the test set,
different PRNG stream) closes that domain gap without touching test data.

Training: AdamW, global-norm clip 1.0, masked-MSE on valid pixels, plateau LR,
best-val checkpoint to pretrained-weights naming parity
(best_run_exp_depth_completion_pp).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models import UNet
from .local import TrainState, make_optimizer, set_lr


def make_sparse_from_gt(key, image_depth, boundary_loc, z_range=(0.75, 1.18)):
    """Simulate the pipeline's sparse-depth observation pattern from ground
    truth: depth visible only on a dilated boundary band (random width 3-10 px,
    mimicking the fold of near-boundary patch depths), random pixel dropout,
    and small multiplicative noise.

    image_depth / boundary_loc: (H, W). Returns (sparse (H, W), valid mask)."""
    from ..ops.morphology import distance_transform_l1

    k1, k2, k3 = jax.random.split(key, 3)
    # random band width 3..10 px: threshold the L1 distance field at the
    # sampled width (keeps shapes static for jit)
    width = jax.random.randint(k1, (), 3, 11).astype(jnp.float32)
    dist = distance_transform_l1(boundary_loc > 0,
                                 max_iters=boundary_loc.shape[0] + boundary_loc.shape[1])
    band = dist <= width
    keep = jax.random.uniform(k2, image_depth.shape) > 0.15
    noise = 1.0 + 0.02 * jax.random.normal(k3, image_depth.shape)
    sparse = jnp.where(band & keep, image_depth * noise, 0.0)
    return jnp.clip(sparse, 0.0, z_range[1]), band & keep


def masked_mse(pred, target):
    """MSE over all pixels (the dense target is defined everywhere for the
    synthetic shape data)."""
    return jnp.mean((pred - target) ** 2)


def grad_matching(pred, target):
    """First-difference gradient-matching penalty. On the eval protocol's
    planar-ramp scenes (reference test_data_generator.py:123-133) a UNet
    trained on plain MSE systematically flattens the ramp away from the
    sparse boundary band (its gradient decays to zero where there is no
    input); matching the target's spatial gradient pushes the ramp's slope
    through the extrapolated regions."""
    dpy = pred[:, 1:, :] - pred[:, :-1, :]
    dty = target[:, 1:, :] - target[:, :-1, :]
    dpx = pred[:, :, 1:] - pred[:, :, :-1]
    dtx = target[:, :, 1:] - target[:, :, :-1]
    return jnp.mean((dpy - dty) ** 2) + jnp.mean((dpx - dtx) ** 2)


def _rand_flips(key, sparse, target):
    """Per-sample independent horizontal/vertical flips (geometry-only
    augmentation: the task is equivariant to image flips)."""
    kf = jax.random.bernoulli(key, 0.5, (sparse.shape[0], 2))

    def flip_one(fl, sp, tg):
        sp = jnp.where(fl[0], sp[::-1, :], sp)
        tg = jnp.where(fl[0], tg[::-1, :], tg)
        sp = jnp.where(fl[1], sp[:, ::-1], sp)
        tg = jnp.where(fl[1], tg[:, ::-1], tg)
        return sp, tg

    return jax.vmap(flip_one)(kf, sparse, target)


def make_steps(model: UNet, tx, grad_loss_w: float = 0.0,
               augment: bool = False):
    @jax.jit
    def train_step(state: TrainState, sparse, target, key=None):
        if augment:
            if key is None:
                raise ValueError("augment=True requires a PRNG key per step")
            sparse, target = _rand_flips(key, sparse, target)

        def loss_fn(params):
            pred, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                sparse[..., None], train=True, mutable=["batch_stats"])
            loss = masked_mse(pred[..., 0], target)
            if grad_loss_w:
                loss = loss + grad_loss_w * grad_matching(pred[..., 0], target)
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, batch_stats=new_stats,
                             opt_state=new_opt, step=state.step + 1), loss

    @jax.jit
    def eval_step(state: TrainState, sparse, target):
        # validation stays plain MSE: checkpoint selection measures the same
        # quantity whether or not auxiliary train terms are enabled
        pred = model.apply({"params": state.params, "batch_stats": state.batch_stats},
                           sparse[..., None], train=False)
        return masked_mse(pred[..., 0], target)

    return train_step, eval_step


def init_state(model: UNet, key, lr: float, H: int, W: int) -> Tuple[TrainState, object]:
    variables = model.init(key, jnp.zeros((1, H, W, 1)))
    tx = make_optimizer(lr)
    return TrainState(params=variables["params"], batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]),
                      step=jnp.zeros((), jnp.int32)), tx


def run_densify_training(args, epochs: int = 100, batch_size: int = 8,
                         lr: float = 1e-4, source: str = "simulated",
                         modules=None, max_samples=None,
                         realistic_dirs=None, grad_loss_w: float = 0.0,
                         augment: bool = False) -> None:
    """Train the densifier on the basic-shape train/val set.

    ``max_samples``: optional (n_train, n_val) cap. The pipeline-sourced
    sparse maps cost one full three-stage inference per image; capping keeps
    sparse-map generation bounded (the UNet regresses a dense map from a
    147x147 sparse observation - a few thousand samples saturate it).

    ``realistic_dirs``: optional (train_dir, val_dir) of realistic-generator
    sets (images_ny/alphas/depth_maps schema). Requires ``modules`` (the
    sparse inputs come from the trained pipeline); the realistic pairs are
    concatenated onto whichever shapes-sourced set ``source`` selected.
    """
    from tqdm import tqdm

    from ..utils.io import TrainLogger, create_directory, show_curve
    from ..utils.seeding import set_seed
    from .checkpoint import save_checkpoint
    from .schedules import PlateauScheduler

    key = set_seed(1869)
    create_directory(args.log_path, overwrite=False)

    caps = dict(zip(("train", "val"), max_samples)) if max_samples else {}
    depths = {p: np.load(f"{args.data_path}/image_depths_{p}.npy")
              .astype(np.float32)[:caps.get(p)] for p in ("train", "val")}
    bnds = {p: np.load(f"{args.data_path}/boundary_locations_{p}.npy")
            .astype(np.float32)[:caps.get(p)] for p in ("train", "val")}
    H, W = depths["train"].shape[1:]

    if source == "pipeline":
        sparse_maps = {p: _pipeline_sparse_depths(args, p, modules, caps.get(p))
                       for p in ("train", "val")}
    else:
        sparse_maps = None

    if realistic_dirs is not None:
        assert source == "pipeline" and modules is not None, \
            "realistic_dirs needs the trained pipeline (source='pipeline')"
        for p, d in zip(("train", "val"), realistic_dirs):
            r_sparse, r_depth = _realistic_sparse_pairs(args, d, modules)
            print(f"densify: +{len(r_depth)} realistic {p} pairs from {d}",
                  flush=True)
            sparse_maps[p] = np.concatenate([sparse_maps[p], r_sparse])
            depths[p] = np.concatenate([depths[p], r_depth])

    model = UNet()
    state, tx = init_state(model, key, lr, H, W)
    train_step, eval_step = make_steps(model, tx, grad_loss_w=grad_loss_w,
                                       augment=augment)
    sched = PlateauScheduler(lr=lr, factor=0.9, patience=5, min_lr=lr * 0.1)
    sparse_fn = jax.jit(jax.vmap(make_sparse_from_gt))

    def batches(part, shuffle, seed):
        n = depths[part].shape[0]
        rng = np.random.default_rng(seed)
        order = rng.permutation(n) if shuffle else np.arange(n)
        for s in range(0, n - batch_size + 1, batch_size):
            yield order[s:s + batch_size]

    best, best_epoch = np.inf, 0
    curve = np.zeros(epochs)
    logger = TrainLogger(f"{args.log_path}/exp_depth_completion_training.txt", args)
    for epoch in tqdm(range(epochs)):
        for idx in batches("train", True, 1869 + epoch):
            tgt = jnp.asarray(depths["train"][idx])
            if sparse_maps is not None:
                sp = jnp.asarray(sparse_maps["train"][idx])
            else:
                key, kb = jax.random.split(key)
                sp, _ = sparse_fn(jax.random.split(kb, batch_size),
                                  tgt, jnp.asarray(bnds["train"][idx]))
            key, ks = jax.random.split(key)
            state, _ = train_step(state, sp, tgt, ks)

        val, nv = 0.0, 0
        for idx in batches("val", False, 0):
            tgt = jnp.asarray(depths["val"][idx])
            if sparse_maps is not None:
                sp = jnp.asarray(sparse_maps["val"][idx])
            else:
                kb = jax.random.PRNGKey(idx[0])
                sp, _ = sparse_fn(jax.random.split(kb, batch_size),
                                  tgt, jnp.asarray(bnds["val"][idx]))
            val += float(eval_step(state, sp, tgt))
            nv += 1
        curve[epoch] = val / max(nv, 1)
        lr_now = sched.step(curve[epoch])
        state = state.replace(opt_state=set_lr(state.opt_state, lr_now))
        logger.epoch(epoch, curve[epoch], sched.patience, lr_now)
        if curve[epoch] < best:
            best, best_epoch = curve[epoch], epoch
            save_checkpoint(f"{args.model_path}/best_run_exp_depth_completion_pp",
                            {"params": state.params, "batch_stats": state.batch_stats})

    np.save(f"{args.log_path}/loss_curve_exp_depth_completion.npy", curve)
    show_curve(args.log_path, curve, "loss_curve_exp_depth_completion")
    logger.footer(best_epoch, best)
    logger.close()


def _pipeline_sparse_depths(args, part: str, modules, n=None,
                            chunk: int = 8) -> np.ndarray:
    """Run the trained local+global pipeline over the shape images to produce
    the faithful confidence-thresholded sparse depth inputs.

    ``chunk`` is the batched-estimator size. The x16 program's compile-time
    HBM estimate exceeds one v5e chip (17.56G > 15.75G, observed); 8 fits.
    On a compile/runtime failure the first time a chunk size is executed, the
    size is halved and generation restarts (at most a couple of recompiles).
    """
    from ..data.datasets import ShapeDataset

    assert modules is not None, "source='pipeline' needs trained InferenceModules"
    ds = ShapeDataset(args.data_path, train=part == "train", mode="global_pre")
    total = len(ds) if n is None else min(n, len(ds))
    return _sparse_from_batches(args, lambda idx: ds.batch(idx)["img_ny"],
                                total, modules, chunk)


def _realistic_sparse_pairs(args, data_dir: str, modules,
                            chunk: int = 8):
    """(sparse inputs, dense targets) from a realistic-generator set: inputs
    are the trained pipeline's confidence-thresholded folded depths over the
    set's noisy image pairs, targets the generator's dense planar-ramp
    depth_maps (reference test_data_generator.py:123-133 statistics)."""
    from ..data.datasets import TestDataset

    ds = TestDataset(data_dir)
    depths = ds.depth_map.astype(np.float32)
    a = ds.alpha.reshape((-1,) + (1,) * (ds.img_ny.ndim - 1))
    imgs = (ds.img_ny / a).astype(np.float32)
    sparse = _sparse_from_batches(args, lambda idx: imgs[idx], len(ds),
                                  modules, chunk)
    return sparse, depths


def _sparse_from_batches(args, get_batch, total: int, modules,
                         chunk: int = 8) -> np.ndarray:
    """Chunked batched-estimator driver shared by the shapes and realistic
    sparse-map sources; see _pipeline_sparse_depths for the retry rationale."""
    from ..config import cam_from_args, grid_from_args, patch_from_args
    from ..eval import pipeline as _pipeline

    if total == 0:
        grid = grid_from_args(args)
        return np.zeros((0, grid.H, grid.W), np.float32)

    def _is_oom(exc) -> bool:
        # only memory/compile-resource failures earn a halved-chunk retry;
        # a genuine bug (shape/dtype/bad weights) must surface immediately,
        # not after three multi-minute recompiles through the TPU tunnel
        msg = str(exc)
        return any(s in msg for s in ("RESOURCE_EXHAUSTED", "Out of memory",
                                      "out of memory", "OOM", "Allocator"))

    while True:
        estimate = _pipeline.make_batched_depth_estimator(
            modules, patch_from_args(args), grid_from_args(args),
            cam_from_args(args), densify=None)
        out = []
        try:
            for s in range(0, total, chunk):
                idx = np.arange(s, min(s + chunk, total))
                imgs = get_batch(idx)
                # keep the jitted program's batch shape static: pad the tail
                pad = chunk - len(idx)
                if pad:
                    imgs = np.concatenate([imgs, imgs[-1:].repeat(pad, 0)])
                # depth_final is (B, 1, H, W): the per-image fold keeps its
                # singleton batch dim under vmap — drop it
                depth = np.asarray(estimate(jnp.asarray(imgs))["depth_final"])[:, 0]
                out.append(depth[:len(idx)])
            return np.concatenate(out)
        except Exception as exc:
            if out or chunk <= 1 or not _is_oom(exc):
                raise  # mid-run or non-OOM failure: real error, surface it
            chunk //= 2
            print(f"sparse-map estimator hit a resource limit at first "
                  f"execution; retrying with chunk={chunk}", flush=True)
