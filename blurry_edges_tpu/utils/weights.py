"""Weight loading for the inference pipelines.

Resolution order per stage (reference filename conventions,
blurry_edges_test.py:183-198):
1. orbax checkpoint directory  <model_path>/<name>          (our training output)
2. torch state_dict            <model_path>/<name>.pth      (reference weights,
   converted on the fly via utils.torch_convert)
3. seeded random init          (when allow_random=True; lets pipelines and
   benchmarks run without trained weights)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .. import models
from ..config import GridConfig
from . import torch_convert as tc


def _to_jnp(tree):
    return jax.tree.map(jnp.asarray, tree)


def _load_stage(model_path: str, names, convert_fn, init_fn, allow_random: bool):
    """Try each candidate name in priority order; for EACH name, an orbax
    checkpoint dir is tried before a torch .pth state_dict. Resolution is
    per-name so a reference ``pretrained_*.pth`` dropped into model_path
    outranks the committed ``best_run_*`` training checkpoints (the names
    tuples list the reference filenames first)."""
    from ..train.checkpoint import checkpoint_exists, load_checkpoint

    if isinstance(names, str):
        names = (names,)
    for name in names:
        ckpt_dir = os.path.join(model_path, name)
        if checkpoint_exists(ckpt_dir):
            return _to_jnp(load_checkpoint(ckpt_dir))
        pth = os.path.join(model_path, f"{name}.pth")
        if os.path.exists(pth):
            converted = convert_fn(tc.load_pth(pth))
            if isinstance(converted, tuple):
                return {"params": _to_jnp(converted[0]), "batch_stats": _to_jnp(converted[1])}
            return {"params": _to_jnp(converted)}
    if allow_random:
        return init_fn()
    raise FileNotFoundError(f"no weights for any of {names} under {model_path}")


def load_inference_modules(args, densify=None, allow_random: bool = False,
                           big: bool = False):
    from ..eval.pipeline import InferenceModules

    grid = GridConfig(H=args.img_size[0], W=args.img_size[1], R=args.R,
                      stride=getattr(args, "stride", 2))
    key = jax.random.PRNGKey(0)
    dtype = (jnp.bfloat16 if getattr(args, "serve_dtype", "float32") == "bfloat16"
             else jnp.float32)
    local = models.LocalStage(dtype=dtype)
    glob = models.GlobalStage(dtype=dtype)

    local_vars = _load_stage(
        args.model_path,
        ("pretrained_local_stage", "best_run_exp_local_stage"),
        tc.convert_local_stage,
        lambda: local.init(key, jnp.zeros((1, args.R, args.R, 3))), allow_random)

    # densify 'w' uses its own global-stage weights (blurry_edges_test.py:186-191);
    # fall back to the shared trained checkpoint when no w-variant exists
    if densify == "w":
        gnames = ("pretrained_global_stage_w", "best_run_exp_global_stage_w",
                  "pretrained_global_stage", "best_run_exp_global_stage")
    elif big:
        # The block-tiled path has its own blessed stage: extended full-image
        # training (round 4b) improved the 147x147 rows but regressed
        # block-edge statistics (isolation run runs/r5/logs/eval_big_oldw.txt:
        # delta1 0.241 pre-extension vs 0.101 extended on the same big set).
        # Like the reference's per-mode w weights (blurry_edges_test.py:186-191),
        # big prefers its own checkpoint and falls back to the shared stage.
        gnames = ("pretrained_global_stage_big", "best_run_exp_global_stage_big",
                  "pretrained_global_stage", "best_run_exp_global_stage")
    else:
        gnames = ("pretrained_global_stage", "best_run_exp_global_stage")
    global_vars = _load_stage(
        args.model_path, gnames, tc.convert_global_stage,
        lambda: glob.init(key, jnp.zeros((1, grid.num_tokens, 38))), allow_random)

    unet_model, unet_vars = None, None
    if densify == "pp":
        unet_model = models.UNet(dtype=dtype)
        unet_vars = _load_stage(
            args.model_path,
            ("pretrained_depth_completion_pp", "best_run_exp_depth_completion_pp"),
            tc.convert_unet,
            lambda: unet_model.init(key, jnp.zeros((1, grid.H, grid.W, 1))),
            allow_random)

    return InferenceModules(local_model=local, local_vars=local_vars,
                            global_model=glob, global_vars=global_vars,
                            unet_model=unet_model, unet_vars=unet_vars)
