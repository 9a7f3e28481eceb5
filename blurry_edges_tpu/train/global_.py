"""Global-stage training harness: the 7-term patch-grid loss and its optimizer
loop.

Parity with reference global_training.py:11-225: shared wedge geometry + per-
image blur levels rendered over the whole 64x64 patch grid, a joint ridge
color solve across the image pair, DfD depth supervision on near-boundary
pixels, color / boundary / smoothness consistency terms against the
stop-gradient folded global maps, the two-phase gamma schedule, AdamW lr 1e-4
batch 8, grad clip 1.0, ReduceLROnPlateau(factor .975, patience 5, min 50%)
stepped only after epoch >= dynamic_epoch[1], best-val checkpointing, seed
1898. Training solves colors on the clean images while validation solves on
the noisy ones (reference :210 vs :166) - reproduced.

Layouts are grid-leading NHWC: params (B, Hp, Wp, k), fields
(B, [2,] Hp, Wp, R, R[, C]), so every wedge op broadcasts directly and XLA
sees one fused patch-grid program per step.
"""

from __future__ import annotations

import math
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..config import GridConfig, PatchConfig
from ..models import GlobalStage
from ..ops import (boundary_map, depth_masks, dists2indicators, fold, fold_count,
                   inverse_3x3, make_patch_grid, normalized_gaussian, params2dists,
                   render_patches, solve_colors, unfold)
from ..ops.dfd import DfDSolver
from ..ops.params import denormalize_global_train
from ..ops.sobel import image_derivative, image_derivative_flat
from .local import TrainState, make_optimizer, set_lr, xavier_reinit

GAMMA_ORDER = ("color", "color_cons", "bndry_cons", "smthns", "smthns_cons",
               "bndry_loc", "depth")


def gammas_to_array(g: Dict[str, float]) -> jnp.ndarray:
    return jnp.asarray([g[k] for k in GAMMA_ORDER], jnp.float32)


def render_pair_grid(xy_angles, etas, img_patches, patch_cfg: PatchConfig):
    """Shared geometry + per-image blur -> rendered pair patches with a joint
    color solve (reference global_training.py:62-78).

    xy_angles: (B, Hp, Wp, 8); etas: (B, Hp, Wp, 4) ordered
    (img1 wedge1, img1 wedge2, img2 wedge1, img2 wedge2);
    img_patches: (B, 2, Hp, Wp, R, R, 3).

    Returns (patches (B,2,Hp,Wp,R,R,3), wedges_pair (B,2,Hp,Wp,3,R,R),
    colors (B,Hp,Wp,3,3), dists (B,Hp,Wp,2,R,R)).
    """
    R = patch_cfg.R
    x, y = make_patch_grid(R, xy_angles.dtype)
    dists = params2dists(xy_angles, x, y, patch_cfg.w)
    w1 = dists2indicators(dists, etas[..., 0:2])
    w2 = dists2indicators(dists, etas[..., 2:4])
    wedges_pair = jnp.stack([w1, w2], axis=1)              # (B,2,Hp,Wp,3,R,R)

    # joint ridge solve across the pair: design matrix stacks both images' pixels
    A = jnp.moveaxis(wedges_pair, -3, -1)                  # (B,2,Hp,Wp,R,R,3)
    A = jnp.moveaxis(A, 1, 3)                              # (B,Hp,Wp,2,R,R,3)
    A = A.reshape(A.shape[:3] + (2 * R * R, 3))
    yv = jnp.moveaxis(img_patches, 1, 3).reshape(A.shape[:3] + (2 * R * R, 3))
    colors = solve_colors(A, yv, patch_cfg.lambda_ridge)   # (B,Hp,Wp,3,3)

    patches = render_patches(wedges_pair, colors[:, None])  # (B,2,Hp,Wp,R,R,3)
    return patches, wedges_pair, colors, dists


def depth_from_etas(etas, dists, dfd: DfDSolver, hard_mask: bool = False):
    """Per-patch DfD depth map + wedge-assignment mask (reference
    global_training.py:84-90)."""
    d1 = dfd.etas2depth(etas[..., 0], etas[..., 2])        # (B,Hp,Wp)
    d2 = dfd.etas2depth(etas[..., 1], etas[..., 3])
    mask = depth_masks(dists, hard=hard_mask)              # (B,Hp,Wp,R,R) int
    depth = jnp.where(mask == 1, d1[..., None, None],
                      jnp.where(mask == 2, d2[..., None, None], 0.0))
    return depth, mask, d1, d2


def _fold_mean(patches_rrc, H, W, stride, count):
    """fold + overlap normalization; patches (..., Hp, Wp, R, R, C)."""
    lead = patches_rrc.shape[:-5]
    flat = patches_rrc.reshape((-1,) + patches_rrc.shape[-5:])
    out = fold(flat, H, W, stride) / count[None, :, :, None]
    return out.reshape(lead + (H, W, patches_rrc.shape[-1]))


def global_loss_terms_gridded(est, img_for_colors, img_gt, bndry_dist, deri, bndry_depth,
                              patch_cfg: PatchConfig, grid: GridConfig, dfd: DfDSolver,
                              hard_mask: bool = False):
    """The loss terms of reference global_training.py:93-157, unweighted.

    Returns (terms (6,) - the per-batch means of color, color_cons,
    bndry_cons, smthns, smthns_cons, bndry_loc - plus depth_S, depth_N:
    the masked squared-error sum and mask count of the depth term, kept
    un-divided so chunked/accumulated evaluation composes exactly:
    batch means of equal-size chunks average, and the depth ratio is
    sum(S)/sum(N)).

    est: (B, L, 12) raw global-stage outputs; images (B, 2, H, W, 3);
    bndry_dist / bndry_depth: (B, H, W); deri: (B, 2, H-2, W-2, 3).
    """
    B = est.shape[0]
    Hp, Wp, R, H, W, stride = (grid.H_patches, grid.W_patches, grid.R,
                               grid.H, grid.W, grid.stride)
    est = est.reshape(B, Hp, Wp, 12)
    xy_angles, etas = denormalize_global_train(est)

    img_patches = unfold(img_for_colors.reshape(B * 2, H, W, 3), R, stride)
    img_patches = img_patches.reshape(B, 2, Hp, Wp, R, R, 3)
    gt_patches = unfold(img_gt.reshape(B * 2, H, W, 3), R, stride)
    gt_patches = gt_patches.reshape(B, 2, Hp, Wp, R, R, 3)

    patches, _, _, dists = render_pair_grid(xy_angles, etas, img_patches, patch_cfg)
    local_bndry = boundary_map(dists)                       # (B,Hp,Wp,R,R)
    depth_map, depth_mask, _, _ = depth_from_etas(etas, dists, dfd,
                                                  hard_mask=hard_mask)

    count = fold_count(H, W, R, stride, est.dtype)
    global_image = jax.lax.stop_gradient(_fold_mean(patches, H, W, stride, count))
    global_bndry = jax.lax.stop_gradient(
        _fold_mean(local_bndry[..., None], H, W, stride, count))[..., 0]

    # 1) color (reference :130)
    t_color = jnp.mean(jnp.sum((gt_patches - patches) ** 2, axis=-1))

    # 2) color consistency vs detached folded pair (reference :95-99)
    gi_patches = unfold(global_image.reshape(B * 2, H, W, 3), R, stride)
    gi_patches = gi_patches.reshape(B, 2, Hp, Wp, R, R, 3)
    t_color_cons = jnp.mean(jnp.sum((patches - gi_patches) ** 2, axis=-1))

    # 3) boundary consistency vs detached folded boundary (reference :101-105)
    gb_patches = unfold(global_bndry[..., None], R, stride)[..., 0]
    t_bndry_cons = jnp.mean((local_bndry - gb_patches) ** 2)

    # 4-5) smoothness and smoothness consistency (reference :107-116)
    patches_deri = image_derivative(patches)                # (B,2,Hp,Wp,R-2,R-2,3)
    gt_deri_patches = unfold(deri.reshape(B * 2, H - 2, W - 2, 3), R - 2, stride)
    gt_deri_patches = gt_deri_patches.reshape(B, 2, Hp, Wp, R - 2, R - 2, 3)
    gi_deri = image_derivative(global_image.reshape(B * 2, H, W, 3))
    gi_deri_patches = unfold(gi_deri, R - 2, stride).reshape(B, 2, Hp, Wp, R - 2, R - 2, 3)
    t_smthns = jnp.mean(jnp.sum((patches_deri - gt_deri_patches) ** 2, axis=-1))
    t_smthns_cons = jnp.mean(jnp.sum((patches_deri - gi_deri_patches) ** 2, axis=-1))

    # 6) boundary localization with log2 distance weighting (reference :118-122)
    bd_patches = unfold(jnp.log2(bndry_dist + 1.0)[..., None], R, stride)[..., 0]
    t_bndry_loc = jnp.mean((bd_patches * local_bndry) ** 2)

    # 7) masked depth MSE on GT boundary-depth pixels (reference :124-128),
    # returned as (sum, count) so accumulation over chunks stays exact
    bdep_patches = unfold(bndry_depth[..., None], R, stride)[..., 0]
    dmask = jnp.where(bdep_patches == 0, 0.0,
                      jnp.where(depth_mask == 0, 0.0, 1.0))
    depth_S = jnp.sum(((depth_map - bdep_patches) * dmask) ** 2)
    depth_N = jnp.sum(dmask)

    terms = jnp.stack([t_color, t_color_cons, t_bndry_cons, t_smthns,
                       t_smthns_cons, t_bndry_loc])
    return terms, depth_S, depth_N


def global_loss_terms(est, img_for_colors, img_gt, bndry_dist, deri, bndry_depth,
                      patch_cfg: PatchConfig, grid: GridConfig, dfd: DfDSolver,
                      hard_mask: bool = False):
    """Flat-layout implementation of global_loss_terms_gridded (same
    reference semantics, global_training.py:93-157; equality-tested against
    the gridded form).

    ``hard_mask=True`` supervises the depth term on the hard wedge-side
    masks ('w'-variant; the masks the w-mode inference path consumes,
    reference blurry_edges_test.py:47-49) instead of the near-boundary
    Gaussian band. This trains the ``_w`` global-stage checkpoint the
    reference distributes but has no training script for.

    Every gradient-carrying field is carried as (..., L, N) with
    L = Hp*Wp = 4096 and N = R*R = 441 (or N2 = (R-2)^2) minor dims: one
    ~2%-padded TPU tile row. The (B, Hp, Wp, R, R, C) form of the gridded
    implementation pads its (21, 3) / (21, 21) minor dims up to 42x, which
    made the training backward HBM-traffic-bound (~3.6 s/step measured).
    Per-pixel Sobel terms run as dense (R*R -> (R-2)^2) MXU matmuls
    (ops.sobel.image_derivative_flat); folds/unfolds - forward-only data or
    stop-gradient consistency targets - relayout at the boundary.
    """
    from ..ops.patchify import unfold_flat_cm
    from ..ops.wedge import (boundary_distance_field_flat, depth_masks_flat,
                             indicator_flat, params2dists_flat)

    B = est.shape[0]
    Hp, Wp, R, H, W, stride = (grid.H_patches, grid.W_patches, grid.R,
                               grid.H, grid.W, grid.stride)
    L, N = Hp * Wp, R * R
    BL = B * L
    # collapse (B, L) into one leading axis: a leading dim of 1 (per-sample
    # grad-accum chunks) otherwise ends up minor in XLA's chosen layouts and
    # the whole wedge chain runs on (1, 128) tiles at 1/8 VPU utilization
    est = est.reshape(BL, 12)
    xy_angles, etas = denormalize_global_train(est)      # (BL,8), (BL,4)

    coords = jnp.linspace(-1.0, 1.0, R, dtype=est.dtype)
    yg, xg = jnp.meshgrid(coords, coords, indexing="ij")
    xf, yf = xg.reshape(-1), yg.reshape(-1)
    d1, d2 = params2dists_flat(xy_angles, xf, yf, patch_cfg.w)   # (BL,N)

    # per-image soft memberships, stacked (2, 3, BL, N)
    def memberships(e1, e2):
        h1 = indicator_flat(d1, e1)
        h2 = indicator_flat(d2, e2)
        return jnp.stack([(1.0 - h1) * (1.0 - h2), h1 * (1.0 - h2), h2], axis=0)

    U = jnp.stack([memberships(etas[..., 0], etas[..., 1]),
                   memberships(etas[..., 2], etas[..., 3])], axis=0)

    def unfold_flat(imgs, r):
        """(B, 2, h, w, C) -> (2, C, BL, r*r) channel-major flat patches."""
        pf = unfold_flat_cm(imgs.reshape((B * 2,) + imgs.shape[2:]), r, stride)
        pf = pf.reshape(B, 2, 3, L, r * r)
        return jnp.moveaxis(pf, 0, 2).reshape(2, 3, BL, r * r)

    def unfold_flat_1c(m, r=R):
        """(B, h, w) -> (BL, r*r)."""
        return unfold_flat_cm(m[..., None], r, stride).reshape(BL, r * r)

    y = unfold_flat(img_for_colors, R)                   # (2,C,BL,N)
    gt_patches = unfold_flat(img_gt, R)

    # joint ridge solve across the pair (reference global_training.py:62-67):
    # unrolled VPU multiply-reduce - a (3, 882) @ (882, 3) batched matmul
    # would pad both tiny dims onto the 128-wide MXU
    gram = {}
    for i in range(3):
        for j in range(i, 3):
            gram[(i, j)] = jnp.sum(U[:, i] * U[:, j], axis=(0, -1))
    At_A = jnp.stack([
        jnp.stack([gram[(min(i, j), max(i, j))] for j in range(3)], axis=-1)
        for i in range(3)], axis=-2)                     # (BL,3,3)
    At_y = jnp.stack([
        jnp.stack([jnp.sum(U[:, k] * y[:, c], axis=(0, -1))
                   for c in range(3)], axis=-1)
        for k in range(3)], axis=-2)                     # (BL,3k,3c)
    ridge = patch_cfg.lambda_ridge * jnp.eye(3, dtype=est.dtype)
    inv = inverse_3x3(At_A + ridge)
    colors = jnp.sum(inv[..., :, :, None] * At_y[..., None, :, :], axis=-2)

    # rendered pair patches (2,C,BL,N)
    patches = sum(
        U[:, k][:, None] * colors[..., k, :].T[None, :, :, None]
        for k in range(3))

    local_bndry = normalized_gaussian(boundary_distance_field_flat(d1, d2))  # (BL,N)

    dep1 = dfd.etas2depth(etas[..., 0], etas[..., 2])    # (BL,)
    dep2 = dfd.etas2depth(etas[..., 1], etas[..., 3])
    dmask = depth_masks_flat(d1, d2, hard=hard_mask)     # (BL,N) int
    depth_map = jnp.where(dmask == 1, dep1[..., None],
                          jnp.where(dmask == 2, dep2[..., None], 0.0))

    # stop-gradient folded global maps (reference :95-105), folded directly
    # on the flat layout (the gridded fold's (.., R, R, C) accumulator
    # carries 42.7x tile padding - a 3.45 GB HLO temp at production scale)
    from ..ops.patchify import fold_flat

    count = fold_count(H, W, R, stride, est.dtype)
    pg = jnp.transpose(jax.lax.stop_gradient(patches).reshape(2, 3, B, L, N),
                       (2, 0, 1, 3, 4)).reshape(B * 2 * 3, L, N)
    gi = fold_flat(pg, H, W, R, stride).reshape(B, 2, 3, H, W)
    global_image = jnp.moveaxis(gi, 2, -1).reshape(B * 2, H, W, 3) / count[:, :, None]
    bg = jax.lax.stop_gradient(local_bndry).reshape(B, L, N)
    global_bndry = fold_flat(bg, H, W, R, stride) / count        # (B,H,W)

    # 1) color (reference :130)
    t_color = jnp.mean(jnp.sum((gt_patches - patches) ** 2, axis=1))

    # 2) color consistency vs detached folded pair (reference :95-99)
    gi_patches = unfold_flat(global_image.reshape(B, 2, H, W, 3), R)
    t_color_cons = jnp.mean(jnp.sum((patches - gi_patches) ** 2, axis=1))

    # 3) boundary consistency (reference :101-105)
    gb_patches = unfold_flat_1c(global_bndry)
    t_bndry_cons = jnp.mean((local_bndry - gb_patches) ** 2)

    # 4-5) smoothness terms (reference :107-116) as flat MXU Sobel
    patches_deri = image_derivative_flat(patches, R)             # (2,C,BL,N2)
    gt_deri_patches = unfold_flat(deri, R - 2)
    gi_deri = image_derivative(global_image)                     # (B2,H-2,W-2,3)
    gi_deri_patches = unfold_flat(gi_deri.reshape(B, 2, H - 2, W - 2, 3), R - 2)
    t_smthns = jnp.mean(jnp.sum((patches_deri - gt_deri_patches) ** 2, axis=1))
    t_smthns_cons = jnp.mean(jnp.sum((patches_deri - gi_deri_patches) ** 2, axis=1))

    # 6) boundary localization (reference :118-122)
    bd = unfold_flat_1c(jnp.log2(bndry_dist + 1.0))
    t_bndry_loc = jnp.mean((bd * local_bndry) ** 2)

    # 7) masked depth (reference :124-128), as (sum, count)
    bdep = unfold_flat_1c(bndry_depth)
    dmask_f = jnp.where(bdep == 0, 0.0, jnp.where(dmask == 0, 0.0, 1.0))
    depth_S = jnp.sum(((depth_map - bdep) * dmask_f) ** 2)
    depth_N = jnp.sum(dmask_f)

    terms = jnp.stack([t_color, t_color_cons, t_bndry_cons, t_smthns,
                       t_smthns_cons, t_bndry_loc])
    return terms, depth_S, depth_N


def global_loss(est, img_for_colors, img_gt, bndry_dist, deri, bndry_depth,
                gammas, patch_cfg: PatchConfig, grid: GridConfig, dfd: DfDSolver,
                hard_mask: bool = False):
    """The weighted 7-term loss (reference global_training.py:130-139);
    gammas: (7,) in GAMMA_ORDER."""
    terms, depth_S, depth_N = global_loss_terms(
        est, img_for_colors, img_gt, bndry_dist, deri, bndry_depth,
        patch_cfg, grid, dfd, hard_mask=hard_mask)
    return jnp.sum(gammas[:6] * terms) + gammas[6] * depth_S / depth_N


def tokens_from_params_src(params_src):
    """params_src (B, 2, L, 19) -> global-stage input (B, L, 38) (reference
    global_training.py:208 permute+flatten)."""
    B, _, L, F = params_src.shape
    return jnp.moveaxis(params_src, 1, 2).reshape(B, L, 2 * F)


def expand_compact_batch(batch):
    """Decompress a compact device-resident batch into the loss inputs.

    The global train/val arrays are ~19 GB as float32 at reference scale -
    too big for a 16 GB HBM next to activations. But every big array is
    losslessly reconstructible from integer data:
      - imgs_u8 (B,2,H,W,3) uint8: the clean images' photon counts; the
        alpha-normalized clean image is exactly imgs_u8/255 (the generator's
        img_gt = imgs/255*alpha, reference train_val_data_generator.py:177).
      - deri: the Sobel operator is linear, so the dataset's derivative map
        (sobel(imgs)/255 center crop) equals image_derivative(img_gt/alpha).
      - ny_u8 uint8: noisy photon counts (integers in [0, alpha], alpha<=200).
      - bndry_dist uint16: integer L1 boundary distances (max H+W).
    Batches that are already expanded pass through unchanged.
    """
    if "imgs_u8" not in batch:
        return batch
    img_gt = batch["imgs_u8"].astype(jnp.float32) / 255.0      # (B,2,H,W,3)
    B, _, H, W, _ = img_gt.shape
    deri = image_derivative(img_gt.reshape(B * 2, H, W, 3)).reshape(
        B, 2, H - 2, W - 2, 3)
    out = {"input_param": batch["input_param"].astype(jnp.float32), "img_gt": img_gt,
           "bndry_dist": batch["bndry_dist"].astype(jnp.float32),
           "deri": deri, "bndry_depth": batch["bndry_depth"]}
    if "ny_u8" in batch:
        a = batch["alpha"].reshape((-1,) + (1,) * 4)
        out["img_ny"] = batch["ny_u8"].astype(jnp.float32) / a
    return out


def compact_arrays(ds, include_ny: bool):
    """Host-side: ShapeDataset(mode='global') -> compact numpy arrays for
    expand_compact_batch (uint8 photon counts, uint16 distances; the
    derivative maps are dropped entirely and recomputed on device)."""
    a = ds.alpha.reshape((-1,) + (1,) * (ds.img_gt.ndim - 1)).astype(np.float32)
    out = {"input_param": ds.input_param,
           "imgs_u8": np.round(ds.img_gt / a * 255.0).astype(np.uint8),
           "bndry_dist": ds.bndry_dist.astype(np.uint16),
           "bndry_depth": ds.bndry_depth}
    if include_ny:
        out["ny_u8"] = np.round(ds.img_ny).astype(np.uint8)
        out["alpha"] = ds.alpha.astype(np.float32)
    return out


def make_step_fns(model: GlobalStage, tx, patch_cfg: PatchConfig, grid: GridConfig,
                  dfd: DfDSolver, grad_accum: int = 1, hard_mask: bool = False):
    """Un-jitted step implementations (jit or scan them). Batches may be
    either expanded loss inputs or the compact device-resident form.

    grad_accum > 1 splits the batch into that many chunks and accumulates
    the loss (and hence gradient) over a remat'd lax.scan. The result is
    EXACT batch semantics - terms 1-6 are equal-size chunk means averaged,
    the depth term composes as sum(S)/sum(N), and the mask count N carries no
    gradient - while peak activation memory drops by ~grad_accum x. At
    reference scale (batch 8 over a 64x64 patch grid) the full-batch backward
    plus the device-resident training set does not fit a 16 GB HBM; per-sample
    accumulation (grad_accum = batch) does, with the per-chunk program still
    wide enough (4,096 patches x 441 px) to fill the TPU.
    """

    def _loss_parts(params, batch, gammas, dropout_key, train: bool):
        rngs = {"dropout": dropout_key} if train else None
        est = model.apply({"params": params},
                          tokens_from_params_src(batch["input_param"]),
                          train=train, rngs=rngs)
        img_colors = batch["img_gt"] if train else batch["img_ny"]
        terms, S, N = global_loss_terms(
            est, img_colors, batch["img_gt"], batch["bndry_dist"],
            batch["deri"], batch["bndry_depth"], patch_cfg, grid, dfd,
            hard_mask=hard_mask)
        return terms, S, N

    def _loss(params, batch, gammas, dropout_key, train: bool):
        # HIGHEST precision everywhere: keeps transformer matmul operands in
        # f32 (parity with the torch reference, which never truncates to
        # bf16) AND stops XLA from hoisting a bf16 convert of the ENTIRE
        # device-resident params_src out of the epoch scan (a measured
        # 2.32 GB HLO temp)
        with jax.default_matmul_precision("highest"):
            return _loss_inner(params, batch, gammas, dropout_key, train)

    def _loss_inner(params, batch, gammas, dropout_key, train: bool):
        batch = expand_compact_batch(batch)
        if grad_accum <= 1:
            terms, S, N = _loss_parts(params, batch, gammas, dropout_key, train)
            return jnp.sum(gammas[:6] * terms) + gammas[6] * S / N
        B = batch["input_param"].shape[0]
        assert B % grad_accum == 0, (B, grad_accum)
        chunks = jax.tree.map(
            lambda v: v.reshape((grad_accum, B // grad_accum) + v.shape[1:]), batch)

        def body(carry, inp):
            i, chunk = inp
            terms, S, N = _loss_parts(params, chunk, gammas,
                                      jax.random.fold_in(dropout_key, i), train)
            acc_t, acc_S, acc_N = carry
            return (acc_t + terms, acc_S + S, acc_N + N), None

        (t_sum, S, N), _ = jax.lax.scan(
            jax.checkpoint(body), (jnp.zeros((6,)), 0.0, 0.0),
            (jnp.arange(grad_accum), chunks))
        return jnp.sum(gammas[:6] * (t_sum / grad_accum)) + gammas[6] * S / N

    def train_step(state: TrainState, batch, gammas, dropout_key):
        # reference quirk: colors solved on clean images during training (:210)
        loss, grads = jax.value_and_grad(_loss)(state.params, batch, gammas,
                                                dropout_key, True)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=new_opt,
                             step=state.step + 1), loss

    def eval_step(state: TrainState, batch, gammas):
        return _loss(state.params, batch, gammas, jax.random.PRNGKey(0), False)

    return train_step, eval_step


def make_steps(model: GlobalStage, tx, patch_cfg: PatchConfig, grid: GridConfig,
               dfd: DfDSolver, grad_accum: int = 1, hard_mask: bool = False):
    train_step, eval_step = make_step_fns(model, tx, patch_cfg, grid, dfd,
                                          grad_accum, hard_mask=hard_mask)
    return jax.jit(train_step), jax.jit(eval_step)


def load_global_compact(data_path: str, train: bool, subset: int = 0,
                        include_ny: bool = False) -> Dict[str, np.ndarray]:
    """mmap-sliced production loader -> compact arrays for
    expand_compact_batch.

    Reads ONLY the arrays the compact form needs (the 3.9 GB derivative maps
    are skipped entirely - the Sobel operator is linear, so they are
    recomputed on device from the uint8 images) and converts to uint8 in
    1000-sample chunks, so host peak memory is ~2x the compact size instead
    of the ~19 GB the float32 ShapeDataset load materializes (the silent
    multi-minute startup that made round-2 marathons undiagnosable).
    """
    part = "train" if train else "val"
    mm = lambda name: np.load(f"{data_path}/{name}_{part}.npy", mmap_mode="r")
    n_total = mm("alphas").shape[0]
    n = min(subset, n_total) if subset else n_total
    alpha = np.asarray(mm("alphas")[:n]).astype(np.float32)

    def to_u8(name, scale_by_alpha):
        src = mm(name)
        out = np.empty((n,) + src.shape[1:], np.uint8)
        for s in range(0, n, 1000):
            e = min(n, s + 1000)
            chunk = np.asarray(src[s:e], dtype=np.float32)
            if scale_by_alpha:
                a = alpha[s:e].reshape((-1,) + (1,) * (src.ndim - 1))
                chunk = chunk / a * 255.0
            out[s:e] = np.round(chunk).astype(np.uint8)
        return out

    out = {"input_param": np.asarray(mm("params_src")[:n], dtype=np.float32),
           "imgs_u8": to_u8("images_gt", scale_by_alpha=True),
           "bndry_dist": np.asarray(mm("boundary_distances")[:n]).astype(np.uint16),
           "bndry_depth": np.asarray(mm("boundary_depths")[:n], dtype=np.float32)}
    if include_ny:
        out["ny_u8"] = to_u8("images_ny", scale_by_alpha=False)
        out["alpha"] = alpha
    return out


def init_state(model: GlobalStage, key, lr: float, L: int) -> Tuple[TrainState, object]:
    k_init, k_xavier = jax.random.split(key)
    variables = model.init(k_init, jnp.zeros((1, L, model.in_parameter_size)))
    params = xavier_reinit(variables["params"], k_xavier)
    tx = make_optimizer(lr)
    return TrainState(params=params, batch_stats={}, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32)), tx


def gamma_ranges_from_args(args) -> Dict[str, tuple]:
    return {"color": tuple(args.gamma_color),
            "color_cons": tuple(args.gamma_color_cons),
            "bndry_cons": tuple(args.gamma_bndry_cons),
            "smthns": tuple(args.gamma_smthns),
            "smthns_cons": tuple(args.gamma_smthns_cons),
            "bndry_loc": tuple(args.gamma_bndry_loc),
            "depth": tuple(args.gamma_depth)}


def run_global_training(args, snapshot_every: int = None, resume: bool = True,
                        mesh=None) -> None:
    """CLI harness (reference global_training.py:173-225), engineered to
    survive a flaky single-chip TPU runtime:

    - compact device-resident train set (uint8 images + bf16 tokens),
      per-step dispatch: ONE short XLA execution per optimizer step (the
      whole-epoch scan was killed mid-execution by the runtime in round 2);
    - a per-step heartbeat (epoch, step, loss, wall-time) flushed to
      ``<log_path>/global_steps.log`` so any stall is diagnosable;
    - step-granular full train-state snapshots every ``snapshot_steps``
      optimizer steps with MID-epoch resume (epoch, step, running loss sum;
      the shuffle permutation is re-derived from the epoch index), so a
      runtime kill costs at most snapshot_steps * step_time;
    - a ``--time_budget_s`` clean exit (snapshot + return), letting a
      supervisor loop bound runs without SIGKILL;
    - ``--skip_val`` / ``--val_batches`` time-boxing flags (checkpoint
      selection semantics are stated in the log header when they deviate
      from the reference's best-val rule).

    ``snapshot_every`` (in optimizer STEPS; None = take --snapshot_steps from
    args) and ``mesh`` (optional jax.sharding.Mesh with a 'data' axis: sample
    axis sharded, params replicated, gradient psum over ICI) keep the round-2
    call signature for the DP harness tests.
    """
    import os
    import time

    from ..config import cam_from_args, grid_from_args, patch_from_args
    from ..utils.io import TrainLogger, create_directory, show_curve
    from ..utils.seeding import set_seed
    from . import schedules
    from .checkpoint import save_checkpoint
    from .resume import load_step_snapshot, save_step_snapshot

    key = set_seed(1898, deterministic=True)
    create_directory(args.log_path, overwrite=False)
    patch_cfg = patch_from_args(args)
    grid = grid_from_args(args)
    dfd = DfDSolver.from_config(cam_from_args(args), patch_cfg)
    if snapshot_every is None:
        snapshot_every = getattr(args, "snapshot_steps", 50)
    time_budget = getattr(args, "time_budget_s", 0)
    skip_val = getattr(args, "skip_val", False)
    val_batches = getattr(args, "val_batches", 0) or None
    # --w_variant: train the hard-wedge-side-mask depth objective and save
    # under the reference's *_w checkpoint names (blurry_edges_test.py:186-191)
    w_variant = getattr(args, "w_variant", False)
    exp = "exp_global_stage_w" if w_variant else "exp_global_stage"
    t_start = time.time()

    def say(msg):
        print(f"[global +{time.time() - t_start:7.1f}s] {msg}", flush=True)

    subset = getattr(args, "train_subset", 0)
    compact_train = load_global_compact(args.data_path, train=True, subset=subset)
    compact_val = load_global_compact(args.data_path, train=False, include_ny=True)
    n_train = compact_train["input_param"].shape[0]
    n_val = compact_val["input_param"].shape[0]
    say(f"data loaded: {n_train} train ({'subset' if subset else 'full'}), "
        f"{n_val} val, compact "
        f"{sum(v.nbytes for v in compact_train.values()) / 1e9:.2f} GB train")

    # train set on device: params_src rests bf16 (token features normalized
    # to ~[-1,1]; the ~0.4% quantization sits at the data's own noise floor),
    # images as uint8 photon counts - decompressed in-step on device
    t0 = time.time()
    data_train = {k: jnp.asarray(v, dtype=jnp.bfloat16 if k == "input_param"
                                 else None)
                  for k, v in compact_train.items()}
    if mesh is not None:
        from ..parallel import shard_batch
        data_train = shard_batch(data_train, mesh)
    jax.block_until_ready(data_train)
    say(f"train set resident on device ({time.time() - t0:.1f}s transfer)")
    del compact_train

    def put_batch(batch_np):
        if mesh is not None:
            from ..parallel import shard_batch
            return shard_batch(batch_np, mesh)
        return {k: jnp.asarray(v) for k, v in batch_np.items()}

    model = GlobalStage(in_parameter_size=args.input_size,
                        out_parameter_size=args.output_size,
                        attn_impl=getattr(args, "attn_impl", "xla"))
    state, tx = init_state(model, key, args.learning_rate, grid.num_tokens)
    init_from = getattr(args, "init_from", None)
    if init_from:
        # warm start (e.g. fine-tune the w-variant objective from the trained
        # shared checkpoint); optimizer/scheduler state starts fresh
        from .checkpoint import load_checkpoint
        state = state.replace(params=jax.tree.map(
            jnp.asarray, load_checkpoint(init_from)["params"]))
        say(f"params warm-started from {init_from}")
    if mesh is not None:
        from ..parallel import replicate
        state = state.replace(params=replicate(state.params, mesh),
                              opt_state=replicate(state.opt_state, mesh))
    # gradient accumulation at production grid size: the full batch-8
    # backward over a 64x64 patch grid does not fit HBM next to the resident
    # training set (semantics are exact - see make_step_fns). Chunks of 2
    # measured best; chunk size >= 2 also sidesteps XLA's distinct batch-1
    # matmul algorithm (test_grad_accum numerics note).
    grad_accum = args.batch_size // 2 if grid.num_tokens >= 4096 else 1
    _tstep, _estep = make_step_fns(model, tx, patch_cfg, grid, dfd, grad_accum,
                                   hard_mask=w_variant)
    import functools as _ft

    @_ft.partial(jax.jit, donate_argnums=0)
    def device_step(state, data, idx, gammas, dkey):
        batch = {k: v[idx] for k, v in data.items()}
        return _tstep(state, batch, gammas, dkey)

    eval_step = jax.jit(_estep)

    def eval_sweep(state, gammas, max_batches=None):
        nb = n_val // args.batch_size
        if max_batches:
            nb = min(nb, max_batches)
        total = 0.0
        for b in range(nb):
            sl = slice(b * args.batch_size, (b + 1) * args.batch_size)
            batch = put_batch({k: v[sl] for k, v in compact_val.items()})
            total += float(eval_step(state, batch, gammas))
        return total / max(nb, 1)

    sched = schedules.PlateauScheduler(lr=args.learning_rate, factor=0.975,
                                       patience=5, min_lr=args.learning_rate * 0.5)
    ranges = gamma_ranges_from_args(args)
    final_g = gammas_to_array(schedules.final_gamma(ranges))
    nb_train = n_train // args.batch_size

    best_loss, best_epoch = np.inf, 0
    start_epoch, start_step, loss_sum, loss_count = 0, 0, 0.0, 0
    snap_path = f"{args.model_path}/last_{exp}"
    curve_path = f"{args.log_path}/loss_curve_{exp}.npy"
    curve = np.zeros((args.epoch_num,), dtype=float)
    if os.path.exists(curve_path):
        prev = np.load(curve_path)
        curve[:min(len(prev), len(curve))] = prev[:len(curve)]
    resumed = False
    if resume:
        snap = load_step_snapshot(snap_path, state, sched)
        if snap is not None:
            state, sched, mid = snap
            start_epoch, start_step = mid["epoch"], mid["step"]
            loss_sum, loss_count = mid["loss_sum"], mid["loss_count"]
            best_loss, best_epoch = mid["best_loss"], mid["best_epoch"]
            resumed = True
            say(f"RESUMED at epoch {start_epoch} step {start_step} "
                f"(best {best_loss:.6f} @ {best_epoch})")

    logger = TrainLogger(f"{args.log_path}/{exp}_training.txt",
                         args, append=resumed)
    steplog = open(f"{args.log_path}/global_steps.log", "a")
    if skip_val:
        say("NOTE: --skip_val: loss curve / best-checkpoint selection uses the "
            "mean TRAIN loss (deviation from reference best-VAL semantics, "
            "global_training.py:216-219)")

    def take_snapshot(epoch, step):
        save_step_snapshot(snap_path, state, sched, epoch=epoch, step=step,
                           loss_sum=loss_sum, loss_count=loss_count,
                           best_loss=best_loss, best_epoch=best_epoch)

    stop = False
    for epoch in range(start_epoch, args.epoch_num):
        gammas = gammas_to_array(
            schedules.gamma_schedule(epoch, args.dynamic_epoch, ranges))
        perm = np.random.default_rng(1898 + 7919 * epoch).permutation(n_train)
        first = start_step if epoch == start_epoch else 0
        for b in range(first, nb_train):
            idx = jnp.asarray(perm[b * args.batch_size:(b + 1) * args.batch_size])
            kd = jax.random.fold_in(jax.random.fold_in(key, epoch), b)
            t0 = time.time()
            state, l = device_step(state, data_train, idx, gammas, kd)
            l = float(l)  # blocks; per-step sync keeps the heartbeat honest
            dt = time.time() - t0
            loss_sum += l
            loss_count += 1
            steplog.write(f"{epoch:4d} {b:5d} {l:.6f} {dt:7.3f}s\n")
            steplog.flush()
            if b == first or (b + 1) % 25 == 0:
                say(f"epoch {epoch} step {b + 1}/{nb_train} "
                    f"loss {l:.5f} ({dt:.2f}s/step)")
            if snapshot_every and (b + 1) % snapshot_every == 0:
                take_snapshot(epoch, b + 1)
            if time_budget and time.time() - t_start > time_budget:
                say(f"time budget {time_budget}s reached at epoch {epoch} "
                    f"step {b + 1}; snapshotting and exiting cleanly")
                take_snapshot(epoch, b + 1)
                np.save(curve_path, curve)
                stop = True
                break
        if stop:
            break
        tr_loss = loss_sum / max(loss_count, 1)
        loss_sum, loss_count = 0.0, 0
        if skip_val:
            curve[epoch] = tr_loss
        else:
            t0 = time.time()
            curve[epoch] = eval_sweep(state, final_g, val_batches)
            say(f"epoch {epoch} train {tr_loss:.6f} val {curve[epoch]:.6f} "
                f"({time.time() - t0:.1f}s val sweep)")
        logger.epoch(epoch, curve[epoch], sched.patience, sched.lr)
        if curve[epoch] < best_loss:
            best_loss, best_epoch = curve[epoch], epoch
            save_checkpoint(f"{args.model_path}/best_run_{exp}",
                            {"params": state.params})
        # LR scheduler only active after the second schedule phase begins
        # (reference global_training.py:220-221)
        if epoch >= args.dynamic_epoch[1]:
            lr = sched.step(curve[epoch])
            state = state.replace(opt_state=set_lr(state.opt_state, lr))
        take_snapshot(epoch + 1, 0)
        np.save(curve_path, curve)

    steplog.close()
    if not stop:
        np.save(curve_path, curve)
        show_curve(args.log_path, curve, f"loss_curve_{exp}")
        logger.footer(best_epoch, best_loss)
        # completion marker for supervisor retry loops
        done = "done_global_w" if w_variant else "done_global"
        with open(f"{args.model_path}/{done}", "w") as f:
            f.write(f"best {best_loss:.8f} @ epoch {best_epoch}\n")
    logger.close()
