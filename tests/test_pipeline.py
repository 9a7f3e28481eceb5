"""End-to-end inference parity: the full jitted pipeline (local CNN -> token
normalize -> global transformer -> wedge render -> DfD -> folds -> densify)
against the reference blurry_edges_test.py chain with identical (converted)
weights and identical input.

The torch oracle runs in a spawned subprocess: torch's and XLA-CPU's thread
pools deadlock intermittently when sharing a process (futex hangs observed in
tf_XLAEigen + python threads)."""

import multiprocessing as mp

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu.config import CamConfig, GridConfig, PatchConfig
from blurry_edges_tpu.eval.pipeline import InferenceModules, make_depth_estimator
from blurry_edges_tpu import models
from blurry_edges_tpu.utils import torch_convert as tc

from . import oracle
from .pipeline_oracle_worker import H, R, STRIDE, main as worker_main

pytestmark = pytest.mark.slow

rng = np.random.default_rng(8)

GRID = GridConfig(H=H, W=H, R=R, stride=STRIDE)
PATCH = PatchConfig()
CAM = CamConfig()


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
class TestInferenceParity:
    @classmethod
    def setup_class(cls):
        cls.img = rng.uniform(0, 1, size=(2, H, H, 3)).astype(np.float32)

        ctx = mp.get_context("spawn")
        parent, child = ctx.Pipe()
        proc = ctx.Process(target=worker_main, args=(child, cls.img))
        proc.start()
        status, payload = parent.recv()
        proc.join(timeout=60)
        assert status == "ok", payload
        sd_local, sd_global, cls.ref_outputs = payload

        lp, ls = tc.convert_local_stage(sd_local)
        gp = tc.convert_global_stage(sd_global)
        cls.mods = InferenceModules(
            local_model=models.LocalStage(),
            local_vars={"params": jax.tree.map(jnp.asarray, lp),
                        "batch_stats": jax.tree.map(jnp.asarray, ls)},
            global_model=models.GlobalStage(),
            global_vars={"params": jax.tree.map(jnp.asarray, gp)})

    @pytest.mark.parametrize("densify", [None, "w"])
    def test_full_pipeline_parity(self, densify):
        estimate = make_depth_estimator(self.mods, PATCH, GRID, CAM,
                                        densify=densify, rho_prime=10.39)
        with jax.default_matmul_precision("highest"):
            ours = estimate(jnp.asarray(self.img))
        theirs = self.ref_outputs[str(densify)]

        npt.assert_allclose(np.asarray(ours["global_image"]).transpose(0, 1, 4, 2, 3),
                            theirs["global_image"], rtol=5e-3, atol=5e-3)
        npt.assert_allclose(np.asarray(ours["global_shpd"]).transpose(0, 3, 1, 2),
                            theirs["global_shpd"], rtol=5e-3, atol=5e-3)
        npt.assert_allclose(np.asarray(ours["global_refoc"]).transpose(0, 3, 1, 2),
                            theirs["global_refoc"], rtol=5e-3, atol=2e-2)
        npt.assert_allclose(np.asarray(ours["global_bndry"]),
                            theirs["global_bndry"][:, 0], rtol=5e-3, atol=5e-3)
        # depth / confidence involve hard thresholds: tiny float diffs can flip
        # borderline pixels, so require agreement on 99% of pixels
        dd = np.abs(np.asarray(ours["global_depth"]) - theirs["global_depth"])
        assert np.quantile(dd, 0.99) < 5e-3, (densify, np.quantile(dd, 0.99))
        cd = np.abs(np.asarray(ours["confidence"]) - theirs["confidence"])
        assert np.quantile(cd, 0.99) < 5e-3, (densify, np.quantile(cd, 0.99))

        # final densified map: threshold semantics
        thres = 0.0 if densify == "w" else 0.05
        exp_final = np.where(theirs["confidence"] > thres,
                             theirs["global_depth"], 0.0)
        fd = np.abs(np.asarray(ours["depth_final"]) - exp_final)
        assert np.quantile(fd, 0.99) < 5e-3


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
def test_pp_composed_path_parity():
    """--densify pp composed path with converted UNet weights (reference
    blurry_edges_test.py:141-142: the UNet densifies the raw folded depth)."""
    img = rng.uniform(0, 1, size=(2, H, H, 3)).astype(np.float32)

    ctx = mp.get_context("spawn")
    parent, child = ctx.Pipe()
    proc = ctx.Process(target=worker_main, args=(child, img, H, ("pp",)))
    proc.start()
    status, payload = parent.recv()
    proc.join(timeout=120)
    assert status == "ok", payload
    sd_local, sd_global, outputs = payload
    theirs = outputs["pp"]

    lp, ls = tc.convert_local_stage(sd_local)
    gp = tc.convert_global_stage(sd_global)
    up, us = tc.convert_unet(theirs["unet_sd"])
    mods = InferenceModules(
        local_model=models.LocalStage(),
        local_vars={"params": jax.tree.map(jnp.asarray, lp),
                    "batch_stats": jax.tree.map(jnp.asarray, ls)},
        global_model=models.GlobalStage(),
        global_vars={"params": jax.tree.map(jnp.asarray, gp)},
        unet_model=models.UNet(),
        unet_vars={"params": jax.tree.map(jnp.asarray, up),
                   "batch_stats": jax.tree.map(jnp.asarray, us)})

    estimate = make_depth_estimator(mods, PATCH, GRID, CAM, densify="pp",
                                    rho_prime=10.39)
    with jax.default_matmul_precision("highest"):
        ours = estimate(jnp.asarray(img))

    fd = np.abs(np.asarray(ours["depth_final"]) - theirs["depth_final"])
    assert np.quantile(fd, 0.99) < 5e-3, np.quantile(fd, 0.99)


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
def test_full_pipeline_parity_production_147():
    """Full-scale 147x147 / 64x64-grid / 4,096-token parity (the production
    configuration of reference blurry_edges_test.py; the PE slicing, fold
    normalizer, and stitch paths are all shape-dependent so the 49x49 case
    alone does not pin them down)."""
    HP = 147
    grid = GridConfig(H=HP, W=HP, R=R, stride=STRIDE)
    img = rng.uniform(0, 1, size=(2, HP, HP, 3)).astype(np.float32)

    ctx = mp.get_context("spawn")
    parent, child = ctx.Pipe()
    proc = ctx.Process(target=worker_main, args=(child, img, HP, (None,)))
    proc.start()
    status, payload = parent.recv()
    proc.join(timeout=600)
    assert status == "ok", payload
    sd_local, sd_global, outputs = payload
    theirs = outputs["None"]

    lp, ls = tc.convert_local_stage(sd_local)
    gp = tc.convert_global_stage(sd_global)
    mods = InferenceModules(
        local_model=models.LocalStage(),
        local_vars={"params": jax.tree.map(jnp.asarray, lp),
                    "batch_stats": jax.tree.map(jnp.asarray, ls)},
        global_model=models.GlobalStage(),
        global_vars={"params": jax.tree.map(jnp.asarray, gp)})

    estimate = make_depth_estimator(mods, PATCH, grid, CAM, densify=None,
                                    rho_prime=10.39)
    with jax.default_matmul_precision("highest"):
        ours = estimate(jnp.asarray(img))

    npt.assert_allclose(np.asarray(ours["global_image"]).transpose(0, 1, 4, 2, 3),
                        theirs["global_image"], rtol=5e-3, atol=5e-3)
    npt.assert_allclose(np.asarray(ours["global_bndry"]),
                        theirs["global_bndry"][:, 0], rtol=5e-3, atol=5e-3)
    dd = np.abs(np.asarray(ours["global_depth"]) - theirs["global_depth"])
    assert np.quantile(dd, 0.99) < 5e-3, np.quantile(dd, 0.99)
    cd = np.abs(np.asarray(ours["confidence"]) - theirs["confidence"])
    assert np.quantile(cd, 0.99) < 5e-3, np.quantile(cd, 0.99)
    exp_final = np.where(theirs["confidence"] > 0.05, theirs["global_depth"], 0.0)
    fd = np.abs(np.asarray(ours["depth_final"]) - exp_final)
    assert np.quantile(fd, 0.99) < 5e-3


@pytest.mark.skipif(not oracle.available(), reason="reference oracle unavailable")
@pytest.mark.parametrize("densify", [None, "w"])
def test_structured_params_exact_maps(densify):
    """VERDICT item: a fixed, non-random parameter set (crisp, well-separated
    wedges) through the render/DfD/fold chain - the thresholded maps
    (depth-valid mask, confidence gating, wedge assignment) must match the
    oracle pixel-for-pixel, closing the 1%-of-pixels blind spot of the
    random-weight tests."""
    import math

    from blurry_edges_tpu.ops import params2etas, unfold
    from blurry_edges_tpu.ops.dfd import DfDSolver
    from blurry_edges_tpu.eval.pipeline import fold_outputs, render_full

    L = GRID.num_tokens  # 15x15 = 225
    ii = np.arange(L, dtype=np.float32)
    est = np.zeros((1, L, 12), np.float32)
    est[0, :, 0] = 0.35 * np.cos(0.37 * ii)          # x0
    est[0, :, 1] = 0.30 * np.sin(0.29 * ii)          # y0
    est[0, :, 2] = -0.25 + 0.1 * np.cos(0.53 * ii)   # x1
    est[0, :, 3] = 0.2 * np.sin(0.41 * ii)           # y1
    est[0, :, 4] = 0.3 + 0.013 * ii                  # theta1
    est[0, :, 5] = 2.0                               # phi1 (< pi: interior +)
    est[0, :, 6] = 4.0 - 0.009 * ii                  # theta2
    est[0, :, 7] = 1.5                               # phi2
    est[0, :, 8:] = 0.15                             # eta coefs -> eta ~ 1.5e-2

    # deterministic structured image: two smooth color ramps
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32) / H
    img = np.stack([np.stack([xx, yy, 0.5 * (xx + yy)], -1),
                    np.stack([yy, 0.5 + 0.3 * xx, xx], -1)])  # (2,H,H,3)

    ctx = mp.get_context("spawn")
    parent, child = ctx.Pipe()
    proc = ctx.Process(target=worker_main,
                       args=(child, img, H, (densify,), est))
    proc.start()
    status, payload = parent.recv()
    proc.join(timeout=120)
    assert status == "ok", payload
    theirs = payload[2][str(densify)]

    dfd = DfDSolver.from_config(CAM, PATCH)
    Hp = GRID.H_patches
    xy_angles = jnp.asarray(est[..., :8]).reshape(1, Hp, Hp, 8)
    etas = params2etas(jnp.asarray(est[..., 8:]).reshape(1, Hp, Hp, 4))
    img_patches = unfold(jnp.asarray(img), GRID.R, GRID.stride)[None]

    with jax.default_matmul_precision("highest"):
        rend = jax.jit(lambda xa, e, ip: fold_outputs(
            render_full(xa, e, ip, PATCH, dfd, 10.39, densify == "w"), GRID)
        )(xy_angles, etas, img_patches)

    # continuous maps: tight tolerance
    npt.assert_allclose(np.asarray(rend["global_image"]).transpose(0, 1, 4, 2, 3),
                        theirs["global_image"], rtol=1e-4, atol=1e-4)
    npt.assert_allclose(np.asarray(rend["global_bndry"]),
                        theirs["global_bndry"][:, 0], rtol=1e-4, atol=1e-4)
    npt.assert_allclose(np.asarray(rend["confidence"]), theirs["confidence"],
                        rtol=1e-4, atol=1e-6)
    npt.assert_allclose(np.asarray(rend["global_depth"]), theirs["global_depth"],
                        rtol=1e-4, atol=1e-5)

    # thresholded maps: pixel-for-pixel exact
    thres = 0.0 if densify == "w" else 0.05
    ours_valid = np.asarray(rend["confidence"]) > thres
    theirs_valid = theirs["confidence"] > thres
    npt.assert_array_equal(ours_valid, theirs_valid)
    ours_final = np.where(ours_valid, np.asarray(rend["global_depth"]), 0.0)
    theirs_final = np.where(theirs_valid, theirs["global_depth"], 0.0)
    npt.assert_array_equal(ours_final == 0.0, theirs_final == 0.0)
