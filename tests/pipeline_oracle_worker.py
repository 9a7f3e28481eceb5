"""Subprocess worker for the end-to-end inference parity test.

Runs ONLY torch (never jax): builds seeded reference models, replicates the
reference's timed inference region (blurry_edges_test.py:119-144), and returns
the state_dicts plus the six global maps. Isolated in a spawned child because
torch's and XLA-CPU's thread pools deadlock when both run in one process
(observed futex hangs in tf_XLAEigen + python threads).
"""

import numpy as np

H, R, STRIDE = 49, 21, 2


def compute(img: np.ndarray, densifies, img_h: int = H, est_denorm=None):
    import torch

    from . import oracle

    t = torch
    nn = torch.nn
    torch.manual_seed(3)
    torch.set_num_threads(4)

    ref_local = oracle.load_module("models/local_stage.py", "ref_ls_worker")
    ref_global = oracle.load_module("models/global_stage.py", "ref_gs_worker")
    bet = oracle.load_top_level("blurry_edges_test.py", "ref_bet_worker")
    de = oracle.load_module("utils/depth_etas.py", "ref_de_worker")

    tlocal = ref_local.LocalStage()
    x = torch.randn(8, 3, R, R)
    tlocal.train()
    with torch.no_grad():
        for _ in range(3):
            tlocal(x)
    tlocal.eval()
    tglobal = ref_global.GlobalStage(in_parameter_size=38, out_parameter_size=12)
    tglobal.eval()

    results = {}
    for densify in densifies:
        args = oracle.make_args(batch_size=1, img_size=[img_h, img_h], stride=STRIDE,
                                rho_prime=10.39, densify=densify)
        helper = bet.PostProcess(args, de.DepthEtas(args, t.device("cpu")),
                                 t.device("cpu"))
        Hp = helper.H_patches
        with t.no_grad():
            timg = t.from_numpy(img[None]).flatten(0, 1).permute(0, 3, 1, 2)
            img_patches = nn.Unfold(R, stride=STRIDE)(timg).view(2, 3, R, R, Hp, Hp)
            if est_denorm is not None:
                # structured-parity mode: bypass the networks and drive the
                # render/fold chain with fixed denormalized parameters
                est = t.from_numpy(est_denorm)
                col, col_shpd, col_refoc, bndry, gdepth, conf = helper(
                    est, img_patches, colors_only=False)
                results[str(densify)] = dict(
                    global_image=np.asarray(col), global_shpd=np.asarray(col_shpd),
                    global_refoc=np.asarray(col_refoc), global_bndry=np.asarray(bndry),
                    global_depth=np.asarray(gdepth), confidence=np.asarray(conf))
                continue
            vec = img_patches.permute(0, 4, 5, 1, 2, 3).reshape(2 * Hp * Hp, 3, R, R)
            params_est = tlocal(vec.to(t.float32))
            params = params_est.view(2, Hp, Hp, 10).flatten(start_dim=1, end_dim=2).detach()
            xy = params[:, :, :4]
            angles = t.remainder(params[:, :, 4:8], 2 * t.pi)
            etas_coef = params[:, :, 8:]
            params = t.cat([xy, angles, etas_coef], dim=2)
            colors = helper(params, img_patches, colors_only=True)
            colors = colors.flatten(start_dim=3, end_dim=4).flatten(
                start_dim=1, end_dim=2).permute(0, 2, 1)
            pm = t.cat([xy / 3, (angles - t.pi) / t.pi, etas_coef - 0.5,
                        (colors - 0.5) * 2], dim=2).unsqueeze(0).permute(0, 2, 1, 3).flatten(2, 3)
            params = tglobal(pm)
            est = t.cat([params[:, :, :4] * 3,
                         t.remainder((params[:, :, 4:8] + 1) * t.pi, 2 * t.pi),
                         params[:, :, 8:] + 0.5], dim=2)
            col, col_shpd, col_refoc, bndry, gdepth, conf = helper(
                est, img_patches, colors_only=False)
        entry = dict(
            global_image=np.asarray(col), global_shpd=np.asarray(col_shpd),
            global_refoc=np.asarray(col_refoc), global_bndry=np.asarray(bndry),
            global_depth=np.asarray(gdepth), confidence=np.asarray(conf))
        if densify == "pp":
            # composed pp path (reference blurry_edges_test.py:141-142):
            # the UNet densifies the raw folded depth map
            unet_mod = oracle.load_module("models/depth_completion_unet.py",
                                          "ref_unet_worker")
            tunet = unet_mod.UNet(1, 1, bilinear=False)
            tunet.eval()
            with t.no_grad():
                dense = tunet(t.from_numpy(np.asarray(gdepth)).unsqueeze(1))
            entry["depth_final"] = dense.squeeze(1).numpy()
            entry["unet_sd"] = {k: v.detach().cpu().numpy()
                                for k, v in tunet.state_dict().items()}
        results[str(densify)] = entry

    sd_local = {k: v.detach().cpu().numpy() for k, v in tlocal.state_dict().items()}
    sd_global = {k: v.detach().cpu().numpy() for k, v in tglobal.state_dict().items()}
    return sd_local, sd_global, results


def main(conn, img, img_h=H, densifies=(None, "w"), est_denorm=None):
    try:
        conn.send(("ok", compute(img, list(densifies), img_h, est_denorm)))
    except Exception as e:  # pragma: no cover
        import traceback
        conn.send(("err", f"{e}\n{traceback.format_exc()}"))
    finally:
        conn.close()
