"""Block-tiled large-image inference (587x587 and other 147+4x sizes).

Parity: reference blurry_edges_test_big.py:12-241 - the big image is cut into
147x147 blocks at block_stride = img - R + stride - 2*stride*n_margin_patch,
each block runs the full local->global->render pipeline, n_margin_patch
border patches are discarded on interior block edges, and the kept patch
outputs are stitched into the full patch-grid buffers before one global fold.

TPU-first: the reference runs its 36 blocks in a serial Python double loop
(its hottest eval path, SURVEY.md section 3.5); here all blocks run as ONE
vmapped program and the margin-discard stitch is a single static gather, so
the whole big-image pipeline is one jitted call.
"""

from __future__ import annotations

import time
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CamConfig, GridConfig, PatchConfig
from ..ops import params2etas, unfold
from ..ops.dfd import DfDSolver
from ..ops.params import denormalize_global_eval
from .pipeline import (InferenceModules, fold_outputs, render_full,
                       render_full_pallas)


def block_geometry(img_size, big_img_size, R: int, stride: int, n_margin: int):
    """Block stride / count (reference blurry_edges_test_big.py:116-117)."""
    img = np.array(img_size)
    big = np.array(big_img_size)
    block_stride = (img - R + stride - 2 * stride * n_margin).astype(int)
    n_block = np.ceil((big - R - 2 * stride * n_margin + stride) / block_stride).astype(int)
    return tuple(block_stride), tuple(n_block)


def stitch_maps(Hp_local: int, Hp_big: int, n_blocks: int, n_margin: int
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Static source maps for the margin-discard stitch: for each full-grid
    patch row I, which block row and which local patch row supply it.
    Replicates the reference's sequential overwrite bookkeeping
    (blurry_edges_test_big.py:166-183) exactly, including edge blocks keeping
    their outer margins."""
    src_block = np.zeros(Hp_big, dtype=np.int32)
    src_local = np.zeros(Hp_big, dtype=np.int32)
    keep = Hp_local - 2 * n_margin
    for i in range(n_blocks):
        v_s = 1 if i == 0 else 0
        v_e = 1 if i == n_blocks - 1 else 0
        V_s = i * keep + (1 - v_s) * n_margin
        V_e = (i + 1) * keep + (1 + v_e) * n_margin
        V_s_l = (1 - v_s) * n_margin
        V_e_l = (v_e - 1) * n_margin + Hp_local
        rows = np.arange(V_s, V_e)
        src_block[rows] = i
        src_local[rows] = np.arange(V_s_l, V_e_l)
    return src_block, src_local


def make_big_depth_estimator(mods: InferenceModules, patch_cfg: PatchConfig,
                             block_grid: GridConfig, big_grid: GridConfig,
                             cam: CamConfig, n_margin: int,
                             rho_prime: float = 10.39, depth_thres: float = 0.05,
                             mesh=None, block_chunk: int = 4,
                             use_pallas=None):
    """One jitted (2, Hbig, Wbig, 3) -> global maps function.

    ``mesh``: optional jax.sharding.Mesh with a 'data' axis. The block grid -
    the reference's only spatial-scaling structure (serial double loop,
    blurry_edges_test_big.py:142-183) - is sharded across the mesh with
    jax.shard_map: every device runs its share of blocks locally (halo
    handling stays within a block, which overlaps its neighbours on read),
    and the only cross-shard communication is gathering the kept patch
    outputs for the margin-discard stitch + global fold (SURVEY.md
    sections 2.2 / 5.8).

    ``block_chunk``: blocks mapped per lax.map step (vmapped inside the
    scan). 1 = pure-sequential (round-3 behavior, one block of activations
    live at a time); the default 4 trades ~4 blocks' conv activations of
    peak HBM for cross-block batching of the MXU work (a full x8-batched
    147-pipeline fit one v5e in round 3, so 4 single-block cores are well
    inside budget).

    ``use_pallas``: "render" routes each block's render chain through the
    wide fused Pallas kernel (eval.pipeline.render_full_pallas); None/False
    keep plain XLA fusion (the measured default, METRICS.md perf notes)."""
    from ..train.global_precal import local_tokens

    dfd = DfDSolver.from_config(cam, patch_cfg)
    R, stride = patch_cfg.R, block_grid.stride
    Hp, Wp, L = block_grid.H_patches, block_grid.W_patches, block_grid.num_tokens
    HpB, WpB = big_grid.H_patches, big_grid.W_patches
    (bs0, bs1), (nb0, nb1) = block_geometry(
        (block_grid.H, block_grid.W), (big_grid.H, big_grid.W), R, stride, n_margin)
    assert (nb0 - 1) * bs0 + block_grid.H == big_grid.H, "big size must tile exactly (147+4x)"

    vb, vl = stitch_maps(Hp, HpB, nb0, n_margin)
    hb, hl = stitch_maps(Wp, WpB, nb1, n_margin)
    idx_block = jnp.asarray(vb[:, None] * nb1 + hb[None, :])   # (HpB, WpB)
    idx_vloc = jnp.asarray(vl[:, None])                         # (HpB, 1)
    idx_hloc = jnp.asarray(hl[None, :])                         # (1, WpB)

    def block_core(block_img):
        """(2, 147, 147, 3) -> per-block patch-grid outputs with (Hp, Wp)
        leading (the section 3.4 core, reference blurry_edges_test_big.py:144-165).

        Trailing feature dims are flattened: the accumulated (nB, Hp, Wp, ...)
        stacks would otherwise carry TPU tile padding on tiny minor dims like
        (21, 3) - a 7x HBM expansion that OOMs a 16 GB chip."""
        tokens, _ = local_tokens(mods.local_model, mods.local_vars, block_img,
                                 patch_cfg, block_grid)
        src = tokens.transpose(1, 0, 2).reshape(1, L, 38)
        # bf16 serving stops at the NN boundary; analytics stay f32 (see
        # eval/pipeline.py same cast).
        est = mods.global_model.apply(mods.global_vars, src,
                                      train=False).astype(jnp.float32)
        den = denormalize_global_eval(est).reshape(1, Hp, Wp, 12)
        img_patches = unfold(block_img, R, stride)[None]
        rfull = render_full_pallas if use_pallas == "render" else render_full
        rend = rfull(den[..., :8], params2etas(den[..., 8:]), img_patches,
                     patch_cfg, dfd, rho_prime, hard_mask=False)
        flat = lambda v: v.reshape(Hp, Wp, -1)
        return dict(
            patches=flat(jnp.moveaxis(rend["patches"][0], 0, 2)),  # (Hp,Wp,2RR3)
            patches_shpd=flat(rend["patches_shpd"][0]),            # (Hp,Wp,RR3)
            patches_refoc=flat(rend["patches_refoc"][0]),
            local_bndry=flat(rend["local_bndry"][0]),              # (Hp,Wp,RR)
            depth_map=flat(rend["depth_map"][0]),
            depth_mask=flat(rend["depth_mask"][0]))

    @jax.jit
    def estimate(img_ny):
        """img_ny: (2, Hbig, Wbig, 3) alpha-normalized."""
        blocks = jnp.stack([
            img_ny[:, iv * bs0:iv * bs0 + block_grid.H,
                   ih * bs1:ih * bs1 + block_grid.W, :]
            for iv in range(nb0) for ih in range(nb1)])        # (nB,2,147,147,3)
        # lax.map, not vmap: all blocks at once would push nB * 8,192 patches
        # through the local CNN in one batch (~33 GB of conv activations at
        # 6x6 blocks); chunked mapping (batch_size=block_chunk) keeps peak
        # memory at a few blocks while the whole loop stays a single XLA
        # program. With a mesh, the block axis is sharded: each device maps
        # over its own blocks.
        bsz = block_chunk if block_chunk and block_chunk > 1 else None
        if mesh is not None and mesh.size > 1:
            from jax.sharding import PartitionSpec as P

            D = mesh.size
            nB = blocks.shape[0]
            pad = (-nB) % D
            per_dev = (nB + pad) // D
            bsz_dev = min(bsz, per_dev) if bsz else None
            blocks_p = jnp.pad(blocks, ((0, pad),) + ((0, 0),) * 4)
            shard_fn = jax.shard_map(
                lambda blk: jax.lax.map(block_core, blk, batch_size=bsz_dev),
                mesh=mesh, in_specs=P("data"), out_specs=P("data"))
            outs = {k: v[:nB] for k, v in shard_fn(blocks_p).items()}
        else:
            outs = jax.lax.map(block_core, blocks, batch_size=bsz)
        st = {k: v[idx_block, idx_vloc, idx_hloc]
              for k, v in outs.items()}                        # (HpB,WpB,flat)
        rend = dict(
            patches=jnp.moveaxis(
                st["patches"].reshape(HpB, WpB, 2, R, R, 3), 2, 0)[None],
            patches_shpd=st["patches_shpd"].reshape(HpB, WpB, R, R, 3)[None],
            patches_refoc=st["patches_refoc"].reshape(HpB, WpB, R, R, 3)[None],
            local_bndry=st["local_bndry"].reshape(HpB, WpB, R, R)[None],
            depth_map=st["depth_map"].reshape(HpB, WpB, R, R)[None],
            depth_mask=st["depth_mask"].reshape(HpB, WpB, R, R)[None])
        out = fold_outputs(rend, big_grid, img_ny.dtype)
        out["depth_final"] = jnp.where(out["confidence"] > depth_thres,
                                       out["global_depth"], 0.0)
        return out

    return estimate


def run_eval_big(args, modules: InferenceModules, visualizer=None,
                 max_images=None) -> dict:
    """Dataset loop for the big path (reference blurry_edges_test_big.py:113-220)."""
    from ..config import cam_from_args, grid_from_args, patch_from_args
    from ..data.datasets import TestDataset
    from .metrics import eval_depth

    patch_cfg = patch_from_args(args)
    block_grid = grid_from_args(args, big=False)
    big_grid = grid_from_args(args, big=True)
    mesh = None
    if getattr(args, "dp_devices", 0) and args.dp_devices > 1:
        from ..parallel import make_mesh
        mesh = make_mesh(args.dp_devices)
    estimate = make_big_depth_estimator(modules, patch_cfg, block_grid, big_grid,
                                        cam_from_args(args), args.n_margin_patch,
                                        rho_prime=args.rho_prime, mesh=mesh,
                                        block_chunk=getattr(args, "block_chunk", 4))
    ds = TestDataset(args.data_path)
    n = len(ds) if max_images is None else min(max_images, len(ds))

    img0, _ = ds[0]
    jax.block_until_ready(estimate(jnp.asarray(img0)))

    totals = np.zeros(5)
    total_time = 0.0
    n_scored = 0
    for j in range(n):
        img_ny, gt_depth = ds[j]
        t0 = time.time()
        out = estimate(jnp.asarray(img_ny))
        jax.block_until_ready(out)
        dt = time.time() - t0
        total_time += dt
        depth = np.asarray(out["depth_final"])
        msk = depth > 0.0
        inner = msk[:, args.crop:-args.crop, args.crop:-args.crop] \
            if args.crop > 0 else msk
        if not inner.any():
            # zero predicted pixels: masked metrics are 0/0 (undefined);
            # exclude from the average rather than poisoning it with nan
            print(f"Image pair #{j}: no predicted pixels above threshold; "
                  f"excluded from averages, time ={dt: .3f} s", flush=True)
            continue
        m = eval_depth(depth, gt_depth[None], msk, crop=args.crop)
        totals += np.asarray(m)
        n_scored += 1
        print(f"Image pair #{j}: delta1 ={m[0]: .3f}, delta2 ={m[1]: .3f}, "
              f"delta3 ={m[2]: .3f}, RMSE ={m[3]: .3f} cm, AbsRel ={m[4]: .3f} cm, "
              f"time ={dt: .3f} s", flush=True)
        if visualizer is not None:
            visualizer(j, img_ny, gt_depth, {k: np.asarray(v) for k, v in out.items()})

    if n_scored < n:
        print(f"\n{n - n_scored}/{n} images had empty predictions and were "
              f"excluded from the metric averages", flush=True)
    avg = totals / max(n_scored, 1)
    # subset basis travels with the summary line itself (see pipeline.py)
    basis = f" (over {n_scored}/{n} scored images)" if n_scored < n else ""
    print(f"\nAverage running time:{total_time / n: .3f} s")
    print(f"Average metrics for whole dataset: delta1 ={avg[0]: .3f}, "
          f"delta2 ={avg[1]: .3f}, delta3 ={avg[2]: .3f}, RMSE ={avg[3]: .3f} cm, "
          f"AbsRel ={avg[4]: .3f} cm{basis}", flush=True)
    return dict(delta1=avg[0], delta2=avg[1], delta3=avg[2], rmse=avg[3],
                absrel=avg[4], avg_time=total_time / n, pairs_per_sec=n / total_time)
