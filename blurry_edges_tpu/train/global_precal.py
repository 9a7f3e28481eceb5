"""Global pre-calculation: cache the frozen local stage's per-patch parameters
+ solved colors as normalized global-stage input tokens.

Parity: reference global_data_pre_cal.py:10-70 - per image pair, unfold into
2 * Hp * Wp patches (stride 2), run the local CNN, wrap angles, solve wedge
colors per patch on the noisy patches, normalize to 19 features, and save
params_src_{train,val}.npy of shape (N, 2, Hp*Wp, 19).

TPU-first: the whole per-pair chain (unfold -> CNN over 8,192 patches ->
wedge render -> ridge solve -> normalize) is one jitted function, vmapped over
a device batch of image pairs (the reference loops pairs with batch_size=1).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GridConfig, PatchConfig
from ..models import LocalStage
from ..ops import (dists2indicators, make_patch_grid, params2dists, params2etas,
                   solve_colors, unfold)
from ..ops.params import normalize_token_features, wrap_local_params


def use_pallas_default() -> bool:
    """Auto policy for the fused Pallas colors kernel: OFF by default.

    Measured on the round-3 toolchain (runs/r3/profile_serving.py, TPU v5e):
    local_tokens with XLA colors 55.8 ms vs 81.3 ms with the Pallas kernel -
    XLA's fusion of the wedge chain into the surrounding program now beats
    the hand kernel, which forces a materialization boundary at its call.
    The kernel stays available (equality-tested) via use_pallas=True."""
    return False


def solve_patch_colors(params, patch_pixels, patch_cfg: PatchConfig,
                       use_pallas: bool = False):
    """Per-patch ridge color solve from wrapped local params (reference
    global_data_pre_cal.py:38-50).

    params: (..., 10); patch_pixels: (..., R, R, 3) -> colors (..., 3, 3).

    use_pallas routes through the fused VMEM kernel
    (ops.wedge_pallas.wedge_colors_pallas, equality-tested against this path).
    """
    if use_pallas:
        from ..ops.wedge_pallas import wedge_colors_pallas

        lead = params.shape[:-1]
        colors = wedge_colors_pallas(
            params.reshape(-1, 10),
            patch_pixels.reshape((-1,) + patch_pixels.shape[-3:]),
            R=patch_cfg.R, w=patch_cfg.w, lambda_ridge=patch_cfg.lambda_ridge)
        return colors.reshape(lead + (3, 3))
    # flat (..., N = R*R) layout throughout: the gridded (R, R[, 3]) form
    # carries up to 42x TPU tile padding on its tiny minor dims, and the
    # (441, 3)-shaped gram matmuls pad both MXU dims; the unrolled
    # multiply-reduce over one ~2%-padded tile row is what the training loss
    # uses (train/global_.py flat path, equality-tested there)
    from ..ops.wedge import indicator_flat, inverse_3x3, params2dists_flat

    R = patch_cfg.R
    coords = jnp.linspace(-1.0, 1.0, R, dtype=params.dtype)
    yg, xg = jnp.meshgrid(coords, coords, indexing="ij")
    d1, d2 = params2dists_flat(params[..., :8], xg.reshape(-1), yg.reshape(-1),
                               patch_cfg.w)                  # (..., N)
    etas = params2etas(params[..., 8:])
    h1 = indicator_flat(d1, etas[..., 0])
    h2 = indicator_flat(d2, etas[..., 1])
    U = jnp.stack([(1.0 - h1) * (1.0 - h2), h1 * (1.0 - h2), h2],
                  axis=-2)                                   # (..., 3, N)
    yv = jnp.moveaxis(
        patch_pixels.reshape(patch_pixels.shape[:-3] + (R * R, 3)), -1, -2)
    gram = {}
    for i in range(3):
        for j in range(i, 3):
            gram[(i, j)] = jnp.sum(U[..., i, :] * U[..., j, :], axis=-1)
    At_A = jnp.stack([
        jnp.stack([gram[(min(i, j), max(i, j))] for j in range(3)], axis=-1)
        for i in range(3)], axis=-2)                         # (..., 3, 3)
    At_y = jnp.stack([
        jnp.stack([jnp.sum(U[..., k, :] * yv[..., c, :], axis=-1)
                   for c in range(3)], axis=-1)
        for k in range(3)], axis=-2)                         # (..., 3k, 3c)
    ridge = patch_cfg.lambda_ridge * jnp.eye(3, dtype=params.dtype)
    inv = inverse_3x3(At_A + ridge)
    return jnp.sum(inv[..., :, :, None] * At_y[..., None, :, :], axis=-2)


def local_tokens(model: LocalStage, variables, img_pair, patch_cfg: PatchConfig,
                 grid: GridConfig, use_pallas: bool = False):
    """One image pair -> (2, Hp*Wp, 19) normalized global-stage tokens and the
    wrapped raw params (2, Hp*Wp, 10).

    img_pair: (2, H, W, 3), already alpha-normalized.
    """
    Hp, Wp, L = grid.H_patches, grid.W_patches, grid.num_tokens
    patches = unfold(img_pair, grid.R, grid.stride)          # (2, Hp, Wp, R, R, 3)
    flat = patches.reshape(2 * L, grid.R, grid.R, 3)
    # The CNN may run reduced precision (--serve_dtype bfloat16); the analytic
    # chain downstream (wedge rasterize -> 3x3 Cayley-Hamilton ridge solve) is
    # precision-sensitive, so its inputs are always promoted back to float32.
    est = model.apply(variables, flat, train=False).astype(jnp.float32)  # (2L, 10)
    params = wrap_local_params(est)
    colors = solve_patch_colors(params, flat, patch_cfg, use_pallas)  # (2L, 3, 3)
    tokens = normalize_token_features(params, colors)        # (2L, 19)
    return tokens.reshape(2, L, 19), params.reshape(2, L, 10)


def make_precal_fn(model: LocalStage, patch_cfg: PatchConfig, grid: GridConfig,
                   use_pallas: bool = None):
    """Jitted, image-batch-vmapped precal: (variables, (B, 2, H, W, 3)) ->
    (B, 2, Hp*Wp, 19)."""
    if use_pallas is None:
        use_pallas = use_pallas_default()

    @jax.jit
    def fn(variables, img_pairs):
        return jax.vmap(
            lambda p: local_tokens(model, variables, p, patch_cfg, grid,
                                   use_pallas)[0]
        )(img_pairs)

    return fn


def run_global_precal(args, device_batch: int = 8) -> None:
    """CLI harness (reference global_data_pre_cal.py:52-70)."""
    from tqdm import tqdm

    from ..config import grid_from_args, patch_from_args
    from ..data.datasets import ShapeDataset
    from .checkpoint import checkpoint_exists, load_checkpoint

    patch_cfg = patch_from_args(args)
    grid = grid_from_args(args)
    model = LocalStage()
    names = ("pretrained_local_stage", "best_run_exp_local_stage")
    paths = [f"{args.model_path}/{n}" for n in names]
    path = next((p for p in paths if checkpoint_exists(p)), paths[0])
    ckpt = load_checkpoint(path)
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    fn = make_precal_fn(model, patch_cfg, grid)

    for train, part in ((True, "train"), (False, "val")):
        ds = ShapeDataset(args.data_path, train=train, mode="global_pre")
        n = len(ds)
        out = np.zeros((n, 2, grid.num_tokens, 19), dtype=np.float32)
        for s in tqdm(range(0, n, device_batch), desc=f"precal {part}"):
            e = min(n, s + device_batch)
            batch = ds.batch(np.arange(s, e))["img_ny"]
            out[s:e] = np.asarray(fn(variables, jnp.asarray(batch)))
        np.save(f"{args.data_path}/params_src_{part}.npy", out)
