"""Subprocess torch oracle for the block-tiled big-image path.

Deliberate, labeled transliteration of the reference's block loop
(blurry_edges_test_big.py:113-189) as a test-oracle spec, run at reduced
geometry (49x49 blocks with 2-margin-patch halos over a 71x71 image -> 2x2
blocks). Runs ONLY torch in a spawned child (torch + XLA-CPU thread pools
deadlock in one process).
"""

import numpy as np

BH, BIGH, R, STRIDE, NMARGIN = 49, 71, 21, 2, 2


def compute(img: np.ndarray):
    import torch

    from . import oracle

    t = torch
    nn = torch.nn
    torch.manual_seed(3)
    torch.set_num_threads(4)
    dev = t.device("cpu")

    ref_local = oracle.load_module("models/local_stage.py", "big_ls")
    ref_global = oracle.load_module("models/global_stage.py", "big_gs")
    btb = oracle.load_top_level("blurry_edges_test_big.py", "big_btb")
    de = oracle.load_module("utils/depth_etas.py", "big_de")

    tlocal = ref_local.LocalStage()
    x = torch.randn(8, 3, R, R)
    tlocal.train()
    with torch.no_grad():
        for _ in range(3):
            tlocal(x)
    tlocal.eval()
    tglobal = ref_global.GlobalStage(in_parameter_size=38, out_parameter_size=12)
    tglobal.eval()

    args = oracle.make_args(batch_size=1, img_size=[BH, BH],
                            big_img_size=[BIGH, BIGH], stride=STRIDE,
                            rho_prime=10.39, densify=None,
                            n_margin_patch=NMARGIN)
    helper = btb.PostProcess(args, de.DepthEtas(args, dev), dev)

    block_stride = tuple((np.array(args.img_size) - args.R + args.stride
                          - args.stride * args.n_margin_patch * 2).astype(np.int64))
    n_block = tuple(np.ceil((np.array(args.big_img_size) - args.R
                             - args.stride * args.n_margin_patch * 2 + args.stride)
                            / np.array(block_stride)).astype(np.int64))
    H_patches = int(np.floor((args.big_img_size[0] - args.R) / args.stride) + 1)
    W_patches = int(np.floor((args.big_img_size[1] - args.R) / args.stride) + 1)
    num_patches = nn.Fold(output_size=list(args.big_img_size), kernel_size=args.R,
                          stride=args.stride)(
        torch.ones(1, args.R ** 2, H_patches * W_patches)).view(*args.big_img_size)

    img_ny = t.from_numpy(img[None])  # (1, 2, H, W, 3)
    with t.no_grad():
        blocks = nn.Unfold(args.img_size, stride=block_stride)(
            img_ny.flatten(0, 1).permute(0, 3, 1, 2)).view(2, 3, *args.img_size, *n_block)
        full_patches = torch.zeros((2, 3, R, R, H_patches, W_patches))
        full_patches_shpd = torch.zeros((3, R, R, H_patches, W_patches))
        full_patches_refoc = torch.zeros((3, R, R, H_patches, W_patches))
        full_local_boundaries = torch.zeros((R, R, H_patches, W_patches))
        full_depth_map = torch.zeros((R, R, H_patches, W_patches))
        full_depth_mask = torch.zeros((R, R, H_patches, W_patches))
        for i_v in range(n_block[0]):
            for i_h in range(n_block[1]):
                t_img = blocks[..., i_v, i_h]
                img_patches = nn.Unfold(R, stride=args.stride)(t_img).view(
                    2, 3, R, R, helper.H_patches, helper.W_patches)
                vec = img_patches.permute(0, 4, 5, 1, 2, 3).reshape(
                    2 * helper.H_patches * helper.W_patches, 3, R, R)
                params_est = tlocal(vec.to(torch.float32))
                params = params_est.view(2, helper.H_patches, helper.W_patches, 10)\
                    .flatten(start_dim=1, end_dim=2).detach()
                xy = params[..., :4]
                angles = torch.remainder(params[..., 4:8], 2 * torch.pi)
                etas_coef = params[..., 8:]
                params = torch.cat([xy, angles, etas_coef], dim=-1)
                colors = helper(params, img_patches, colors_only=True)\
                    .flatten(start_dim=3, end_dim=4).flatten(start_dim=1, end_dim=2)\
                    .permute(0, 2, 1)
                pm = torch.cat([xy / 3, (angles - torch.pi) / torch.pi,
                                etas_coef - 0.5, (colors - 0.5) * 2],
                               dim=-1).unsqueeze(0).permute(0, 2, 1, 3).flatten(2, 3)
                params = tglobal(pm)
                est = torch.cat([params[:, :, :4] * 3,
                                 torch.remainder((params[:, :, 4:8] + 1) * torch.pi,
                                                 2 * torch.pi),
                                 params[:, :, 8:] + 0.5], dim=-1)
                (patches, patches_shpd, patches_refoc, local_boundaries,
                 depth_map, depth_mask) = helper(est, img_patches, colors_only=False)
                v_s = 1 if i_v == 0 else 0
                v_e = 1 if i_v == n_block[0] - 1 else 0
                h_s = 1 if i_h == 0 else 0
                h_e = 1 if i_h == n_block[1] - 1 else 0
                nm = args.n_margin_patch
                V_s = i_v * (helper.H_patches - 2 * nm) + (1 - v_s) * nm
                V_e = (i_v + 1) * (helper.H_patches - 2 * nm) + (1 + v_e) * nm
                H_s = i_h * (helper.W_patches - 2 * nm) + (1 - h_s) * nm
                H_e = (i_h + 1) * (helper.W_patches - 2 * nm) + (1 + h_e) * nm
                V_s_l = (1 - v_s) * nm
                V_e_l = (v_e - 1) * nm + helper.H_patches
                H_s_l = (1 - h_s) * nm
                H_e_l = (h_e - 1) * nm + helper.W_patches
                full_patches[:, :, :, :, V_s:V_e, H_s:H_e] = \
                    patches.clone()[0, :, :, :, :, V_s_l:V_e_l, H_s_l:H_e_l]
                full_patches_shpd[:, :, :, V_s:V_e, H_s:H_e] = \
                    patches_shpd.clone()[0, :, :, :, V_s_l:V_e_l, H_s_l:H_e_l]
                full_patches_refoc[:, :, :, V_s:V_e, H_s:H_e] = \
                    patches_refoc.clone()[0, :, :, :, V_s_l:V_e_l, H_s_l:H_e_l]
                full_local_boundaries[:, :, V_s:V_e, H_s:H_e] = \
                    local_boundaries.clone()[0, 0, :, :, V_s_l:V_e_l, H_s_l:H_e_l]
                full_depth_map[:, :, V_s:V_e, H_s:H_e] = \
                    depth_map.clone()[0, :, :, V_s_l:V_e_l, H_s_l:H_e_l]
                full_depth_mask[:, :, V_s:V_e, H_s:H_e] = \
                    depth_mask.clone()[0, :, :, V_s_l:V_e_l, H_s_l:H_e_l]

        col_est = btb.local2global_color(args, num_patches, full_patches)
        col_shpd = btb.local2global_color(args, num_patches, full_patches_shpd, pair=False)
        col_refoc = btb.local2global_color(args, num_patches, full_patches_refoc, pair=False)
        bndry_est = btb.local2global_bndry(args, num_patches, full_local_boundaries)
        global_depth_map, confidence_map = btb.local2global_depth(
            args, H_patches, W_patches, num_patches, full_depth_map, full_depth_mask)
        depth_final = np.where(confidence_map > 0.05, global_depth_map,
                               np.zeros_like(global_depth_map))

    sd_local = {k: v.detach().cpu().numpy() for k, v in tlocal.state_dict().items()}
    sd_global = {k: v.detach().cpu().numpy() for k, v in tglobal.state_dict().items()}
    return sd_local, sd_global, dict(
        global_image=np.asarray(col_est), global_shpd=np.asarray(col_shpd),
        global_refoc=np.asarray(col_refoc), global_bndry=np.asarray(bndry_est),
        global_depth=np.asarray(global_depth_map),
        confidence=np.asarray(confidence_map), depth_final=np.asarray(depth_final))


def main(conn, img):
    try:
        conn.send(("ok", compute(img)))
    except Exception as e:  # pragma: no cover
        import traceback
        conn.send(("err", f"{e}\n{traceback.format_exc()}"))
    finally:
        conn.close()
