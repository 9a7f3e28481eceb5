"""Full inference pipeline: image pair -> dense depth map + confidence +
restored / sharpened / refocused renders + boundary map.

Parity: reference blurry_edges_test.py:12-203. The reference's timed region
(unfold -> 8,192 local-CNN forwards -> per-image color solve -> global
transformer -> full wedge render with DfD depth -> folds -> densify,
blurry_edges_test.py:117-145) is here ONE jitted function - a single XLA
program per image pair with no host round-trips, which is where the TPU
speedup comes from.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CamConfig, GridConfig, PatchConfig
from ..models import GlobalStage, LocalStage, UNet
from ..ops import (boundary_map, depth_masks, dists2indicators, fold,
                   fold_count, make_patch_grid, params2dists, params2etas,
                   render_patches, solve_colors, unfold)
from ..ops.dfd import DfDSolver
from ..ops.params import (denormalize_global_eval, normalize_token_features,
                          wrap_local_params)


@dataclasses.dataclass
class InferenceModules:
    """Models + weights for the three-stage pipeline."""

    local_model: LocalStage
    local_vars: dict
    global_model: GlobalStage
    global_vars: dict
    unet_model: Optional[UNet] = None
    unet_vars: Optional[dict] = None


def render_full(xy_angles, etas, img_patches, patch_cfg: PatchConfig,
                dfd: DfDSolver, rho_prime: float, hard_mask: bool):
    """The colors_only=False render (reference blurry_edges_test.py:30-79):
    pair patches with a joint color solve, sharpened (eta=1e-4) and refocused
    (eta from depth2sigma at rho_prime) renders, boundary map, DfD depth and
    wedge-assignment mask.

    xy_angles: (B, Hp, Wp, 8); etas: (B, Hp, Wp, 4);
    img_patches: (B, 2, Hp, Wp, R, R, 3).
    """
    from ..train.global_ import depth_from_etas, render_pair_grid

    patches, _, colors, dists = render_pair_grid(xy_angles, etas, img_patches, patch_cfg)
    local_bndry = boundary_map(dists)
    depth_map, depth_mask, d1, d2 = depth_from_etas(etas, dists, dfd, hard_mask=hard_mask)

    wedges_shpd = dists2indicators(dists, jnp.full(etas[..., :2].shape, 1e-4, etas.dtype))
    patches_shpd = render_patches(wedges_shpd, colors)

    any1 = jnp.sum((depth_mask == 1), axis=(-2, -1)) > 0   # (B, Hp, Wp)
    any2 = jnp.sum((depth_mask == 2), axis=(-2, -1)) > 0
    sig1 = jnp.where(any1, dfd.depth2sigma(d1, rho_prime), 1e-4)
    sig2 = jnp.where(any2, dfd.depth2sigma(d2, rho_prime), 1e-4)
    wedges_refoc = dists2indicators(dists, jnp.stack([sig1, sig2], axis=-1))
    patches_refoc = render_patches(wedges_refoc, colors)

    return dict(patches=patches, patches_shpd=patches_shpd,
                patches_refoc=patches_refoc, local_bndry=local_bndry,
                depth_map=depth_map, depth_mask=depth_mask)


def render_full_pallas(xy_angles, etas, img_patches, patch_cfg: PatchConfig,
                       dfd: DfDSolver, rho_prime: float, hard_mask: bool):
    """render_full via the wide fused Pallas kernel
    (ops.wedge_pallas.wedge_render_pallas): the whole per-patch chain —
    distance fields, indicators, joint color solve, pair/sharpened/refocused
    renders, boundary map, DfD depth + mask — in one VMEM pass, against
    XLA's fusion of the same math (equality-tested,
    tests/test_wedge_pallas.py)."""
    from ..ops.wedge_pallas import wedge_render_pallas

    R = patch_cfg.R
    B, Hp, Wp = xy_angles.shape[:3]
    P = B * Hp * Wp
    imgs = jnp.moveaxis(img_patches, 1, 3).reshape(P, 2, R, R, 3)
    out = wedge_render_pallas(
        xy_angles.reshape(P, 8), etas.reshape(P, 4), imgs, R=R,
        w=patch_cfg.w, lambda_ridge=patch_cfg.lambda_ridge, hard=hard_mask,
        rho_prime=rho_prime,
        dfd_consts=(dfd.numerator, dfd.denominator_constant,
                    dfd.denominator_factor_root, dfd.intercept, dfd.s))
    shp = (B, Hp, Wp)
    return dict(
        patches=jnp.moveaxis(out["patches"].reshape(shp + (2, R, R, 3)), 3, 1),
        patches_shpd=out["patches_shpd"].reshape(shp + (R, R, 3)),
        patches_refoc=out["patches_refoc"].reshape(shp + (R, R, 3)),
        local_bndry=out["local_bndry"].reshape(shp + (R, R)),
        depth_map=out["depth_map"].reshape(shp + (R, R)),
        depth_mask=out["depth_mask"].reshape(shp + (R, R)))


def fold_outputs(rend, grid: GridConfig, dtype=jnp.float32):
    """Overlap-add all rendered patch grids into global maps (reference
    blurry_edges_test.py:95-100 and utils/postprocessing_loss.py:146-173)."""
    H, W, R, stride = grid.H, grid.W, grid.R, grid.stride
    count = fold_count(H, W, R, stride, dtype)

    def fmean(p):  # (..., Hp, Wp, R, R, C)
        lead = p.shape[:-5]
        out = fold(p.reshape((-1,) + p.shape[-5:]), H, W, stride)
        return out.reshape(lead + out.shape[1:]) / count[:, :, None]

    global_image = fmean(rend["patches"])                        # (B,2,H,W,3)
    global_shpd = fmean(rend["patches_shpd"])                    # (B,H,W,3)
    global_refoc = fmean(rend["patches_refoc"])
    global_bndry = fmean(rend["local_bndry"][..., None])[..., 0]  # (B,H,W)

    dm = rend["depth_mask"]
    num_depth = fold((dm > 0).astype(dtype)[..., None].reshape((-1,) + dm.shape[-4:] + (1,)),
                     H, W, stride)[..., 0]                        # (B,H,W)
    confidence = num_depth / count
    depth_sum = fold(rend["depth_map"][..., None].reshape((-1,) + dm.shape[-4:] + (1,)),
                     H, W, stride)[..., 0]
    global_depth = depth_sum / jnp.where(num_depth > 0, num_depth, 1.0)

    return dict(global_image=global_image, global_shpd=global_shpd,
                global_refoc=global_refoc, global_bndry=global_bndry,
                global_depth=global_depth, confidence=confidence)


def _make_estimate_fn(mods: InferenceModules, patch_cfg: PatchConfig,
                      grid: GridConfig, cam: CamConfig,
                      densify: Optional[str], rho_prime: float,
                      use_pallas: Optional[bool] = None) -> Callable:
    from ..train.global_precal import local_tokens, use_pallas_default

    if use_pallas is None:
        use_pallas = use_pallas_default()
    # use_pallas values: False = plain XLA; True = fused colors kernel in the
    # local-token stage; "render" = XLA local tokens + the WIDE fused
    # render-chain kernel (render_full_pallas) for the global render
    wide = use_pallas == "render"
    tokens_pallas = use_pallas is True
    dfd = DfDSolver.from_config(cam, patch_cfg)
    Hp, Wp, L, R = grid.H_patches, grid.W_patches, grid.num_tokens, grid.R
    hard = densify == "w"
    depth_thres = 0.0 if densify == "w" else 0.05

    def estimate(img_ny):
        """img_ny: (2, H, W, 3), alpha-normalized."""
        tokens, _ = local_tokens(mods.local_model, mods.local_vars, img_ny,
                                 patch_cfg, grid, tokens_pallas)  # (2, L, 19)
        src = tokens.transpose(1, 0, 2).reshape(1, L, 38)
        # Reduced-precision serving (--serve_dtype bfloat16) is confined to the
        # two NN forwards (the MXU FLOPs); the analytic wedge/DfD/fold chain
        # and the 0.05 confidence threshold stay float32 — bf16's ~3 decimal
        # digits cost threshold coverage there (METRICS.md bf16 note).
        est = mods.global_model.apply(mods.global_vars, src,
                                      train=False).astype(jnp.float32)
        den = denormalize_global_eval(est).reshape(1, Hp, Wp, 12)
        xy_angles = den[..., :8]
        etas = params2etas(den[..., 8:])                          # (1,Hp,Wp,4)

        img_patches = unfold(img_ny, R, grid.stride)[None]        # (1,2,Hp,Wp,R,R,3)
        rfull = render_full_pallas if wide else render_full
        rend = rfull(xy_angles, etas, img_patches, patch_cfg, dfd,
                     rho_prime, hard)
        out = fold_outputs(rend, grid, img_ny.dtype)

        if densify == "pp":
            dense = mods.unet_model.apply(mods.unet_vars,
                                          out["global_depth"][..., None],
                                          train=False)[..., 0]
            out["depth_final"] = dense.astype(jnp.float32)
        else:
            out["depth_final"] = jnp.where(out["confidence"] > depth_thres,
                                           out["global_depth"], 0.0)
        return out

    return estimate


def make_depth_estimator(mods: InferenceModules, patch_cfg: PatchConfig,
                         grid: GridConfig, cam: CamConfig,
                         densify: Optional[str] = None,
                         rho_prime: float = 10.39,
                         use_pallas: Optional[bool] = None) -> Callable:
    """Build the single jitted image-pair -> maps function (the reference's
    timed region, blurry_edges_test.py:117-145).

    use_pallas: None = the measured auto policy (global_precal.
    use_pallas_default); True = fused wedge-colors kernel in the local-token
    stage; "render" = the WIDE fused render-chain kernel for the global
    render (ops.wedge_pallas.wedge_render_pallas); False = plain XLA."""
    return jax.jit(_make_estimate_fn(mods, patch_cfg, grid, cam, densify,
                                     rho_prime, use_pallas))


def make_batched_depth_estimator(mods: InferenceModules, patch_cfg: PatchConfig,
                                 grid: GridConfig, cam: CamConfig,
                                 densify: Optional[str] = None,
                                 rho_prime: float = 10.39,
                                 use_pallas: Optional[bool] = None) -> Callable:
    """Throughput variant: (B, 2, H, W, 3) -> maps with leading batch axis,
    one jitted vmapped program. Shard the batch axis over a 'data' mesh for
    multi-chip serving (blurry_edges_tpu.parallel)."""
    fn = _make_estimate_fn(mods, patch_cfg, grid, cam, densify, rho_prime,
                           use_pallas)
    return jax.jit(jax.vmap(fn))


def run_eval(args, modules: InferenceModules, visualizer=None, max_images=None,
             profile_dir: Optional[str] = None) -> dict:
    """Dataset evaluation loop with per-image metrics, wall-clock timing of
    the jitted region, and dataset averages (reference
    blurry_edges_test.py:102-172). ``profile_dir`` captures a jax.profiler
    trace of the timed loop (the reference only has wall-clock prints,
    SURVEY.md section 5.1)."""
    from ..config import cam_from_args, grid_from_args, patch_from_args
    from ..data.datasets import TestDataset
    from .metrics import eval_depth

    patch_cfg = patch_from_args(args)
    grid = grid_from_args(args)
    cam = cam_from_args(args)
    ds = TestDataset(args.data_path)
    n = len(ds) if max_images is None else min(max_images, len(ds))

    # --dp_devices > 1: evaluate in data-parallel groups of D images, the
    # batch axis sharded over a 'data' mesh (one pair per device). Per-image
    # metrics are identical; the reported s/pair becomes group-time / D.
    D = int(getattr(args, "dp_devices", 0) or 0)
    if D > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import make_mesh

        mesh = make_mesh(D)
        shard = NamedSharding(mesh, P("data"))
        batched = make_batched_depth_estimator(
            modules, patch_cfg, grid, cam, densify=args.densify,
            rho_prime=args.rho_prime)
        estimate = lambda imgs: batched(jax.device_put(imgs, shard))  # noqa: E731
    else:
        D = 1
        estimate = make_depth_estimator(modules, patch_cfg, grid, cam,
                                        densify=args.densify,
                                        rho_prime=args.rho_prime)

    # compile outside the timed region (the reference pays this on image #0)
    img0, _ = ds[0]
    warm = jnp.asarray(np.repeat(img0[None], D, 0)) if D > 1 else jnp.asarray(img0)
    jax.block_until_ready(estimate(warm))

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    totals = np.zeros(5)
    total_time = 0.0
    n_scored = 0

    def _score(j, img_ny, gt_depth, out, dt):
        """Per-image scoring + prints shared by the single and DP loops.
        Returns True if the image produced scorable predictions."""
        nonlocal totals, total_time, n_scored
        total_time += dt

        depth = np.asarray(out["depth_final"])
        msk = depth > 0.0
        inner = msk[:, args.crop:-args.crop, args.crop:-args.crop] \
            if args.crop > 0 else msk
        if not inner.any():
            # zero predicted pixels: the reference's masked metrics are 0/0
            # (undefined) here; exclude the image from the average instead of
            # poisoning it with nan, and say so
            print(f"Image pair #{j}: no predicted pixels above threshold; "
                  f"excluded from averages, time ={dt: .3f} s", flush=True)
            return False
        m = eval_depth(depth, gt_depth[None], msk, crop=args.crop)
        totals += np.asarray(m)
        n_scored += 1
        print(f"Image pair #{j}: delta1 ={m[0]: .3f}, delta2 ={m[1]: .3f}, "
              f"delta3 ={m[2]: .3f}, RMSE ={m[3]: .3f} cm, AbsRel ={m[4]: .3f} cm, "
              f"time ={dt: .3f} s", flush=True)
        if visualizer is not None:
            visualizer(j, img_ny, gt_depth, {k: np.asarray(v) for k, v in out.items()})
        return True

    if D > 1:
        for g0 in range(0, n, D):
            idx = list(range(g0, min(g0 + D, n)))
            items = [ds[j] for j in idx]
            imgs = np.stack([im for im, _ in items])
            if len(idx) < D:  # pad the last group to the mesh size
                imgs = np.concatenate(
                    [imgs, np.repeat(imgs[-1:], D - len(idx), 0)])
            t0 = time.time()
            out = estimate(jnp.asarray(imgs))
            jax.block_until_ready(out)
            dt = (time.time() - t0) / D
            for i, j in enumerate(idx):
                _score(j, items[i][0], items[i][1],
                       {k: v[i] for k, v in out.items()}, dt)
    else:
        for j in range(n):
            img_ny, gt_depth = ds[j]
            t0 = time.time()
            out = estimate(jnp.asarray(img_ny))
            jax.block_until_ready(out)
            _score(j, img_ny, gt_depth, out, time.time() - t0)

    if profile_dir:
        jax.profiler.stop_trace()

    if n_scored < n:
        print(f"\n{n - n_scored}/{n} images had empty predictions and were "
              f"excluded from the metric averages", flush=True)
    avg = totals / max(n_scored, 1)
    # when images were excluded, the subset basis must travel with the number
    # itself, not only in the note above (a reader/parser taking this line in
    # isolation would otherwise mistake a K-of-N average for a full-set one)
    basis = f" (over {n_scored}/{n} scored images)" if n_scored < n else ""
    print(f"\nAverage running time:{total_time / n: .3f} s")
    print(f"Average metrics for whole dataset: delta1 ={avg[0]: .3f}, "
          f"delta2 ={avg[1]: .3f}, delta3 ={avg[2]: .3f}, RMSE ={avg[3]: .3f} cm, "
          f"AbsRel ={avg[4]: .3f} cm{basis}", flush=True)
    return dict(delta1=avg[0], delta2=avg[1], delta3=avg[2], rmse=avg[3],
                absrel=avg[4], avg_time=total_time / n,
                pairs_per_sec=n / total_time)
