"""Round-3 harness surfaces: the flat-layout serving color solve, the
mmap-sliced compact dataset loader, and step-granular snapshot/resume."""

import numpy as np
import numpy.testing as npt
import pytest

import jax
import jax.numpy as jnp

from blurry_edges_tpu.config import PatchConfig

rng = np.random.default_rng(3)


def test_solve_patch_colors_flat_matches_gridded():
    """The flat-layout rewrite must reproduce the gridded ridge solve exactly
    (reference semantics global_data_pre_cal.py:38-50)."""
    from blurry_edges_tpu.ops import (dists2indicators, make_patch_grid,
                                      params2dists, params2etas, solve_colors)
    from blurry_edges_tpu.train.global_precal import solve_patch_colors

    patch_cfg = PatchConfig()
    params = jnp.asarray(np.concatenate([
        rng.uniform(-1, 1, (64, 4)), rng.uniform(0, 2 * np.pi, (64, 4)),
        rng.uniform(0, 1, (64, 2))], axis=1).astype(np.float32))
    pixels = jnp.asarray(rng.uniform(0, 1, (64, 21, 21, 3)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        x, y = make_patch_grid(21, params.dtype)
        dists = params2dists(params[..., :8], x, y, patch_cfg.w)
        wedges = dists2indicators(dists, params2etas(params[..., 8:]))
        A = jnp.moveaxis(wedges, -3, -1).reshape(wedges.shape[:-3] + (441, 3))
        yv = pixels.reshape(pixels.shape[:-3] + (441, 3))
        old = solve_colors(A, yv, patch_cfg.lambda_ridge)
        new = solve_patch_colors(params, pixels, patch_cfg, use_pallas=False)
    npt.assert_allclose(np.asarray(new), np.asarray(old), atol=2e-5)


def _write_global_npy(path, n=6, H=29):
    path.mkdir(parents=True, exist_ok=True)
    L = ((H - 21) // 2 + 1) ** 2
    alphas = rng.uniform(180, 200, (n,)).astype(np.float32)
    a = alphas[:, None, None, None, None]
    imgs = rng.integers(0, 256, (n, 2, H, H, 3)).astype(np.float32)
    np.save(path / "images_gt_val.npy", (imgs / 255.0 * a).astype(np.float32))
    np.save(path / "images_ny_val.npy",
            np.clip(imgs / 255.0 * a + rng.normal(0, 2, imgs.shape), 0, 200)
            .round().astype(np.float32))
    np.save(path / "alphas_val.npy", alphas)
    np.save(path / "params_src_val.npy",
            rng.normal(scale=0.3, size=(n, 2, L, 19)).astype(np.float32))
    np.save(path / "boundary_distances_val.npy",
            rng.integers(0, 10, (n, H, H)).astype(np.float32))
    np.save(path / "boundary_depths_val.npy",
            rng.uniform(0, 1.18, (n, H, H)).astype(np.float32))
    return imgs, alphas


def test_load_global_compact_roundtrip(tmp_path):
    """The mmap loader must reproduce the exact uint8 photon counts and pass
    subset caps through."""
    from blurry_edges_tpu.train.global_ import load_global_compact

    imgs, alphas = _write_global_npy(tmp_path)
    out = load_global_compact(str(tmp_path), train=False, include_ny=True)
    npt.assert_array_equal(out["imgs_u8"], imgs.astype(np.uint8))
    npt.assert_array_equal(out["alpha"], alphas)
    assert out["bndry_dist"].dtype == np.uint16
    assert out["input_param"].shape[0] == 6
    capped = load_global_compact(str(tmp_path), train=False, subset=3)
    assert capped["input_param"].shape[0] == 3
    assert "ny_u8" not in capped


def test_step_snapshot_roundtrip(tmp_path):
    """save_step_snapshot / load_step_snapshot must restore params, optimizer
    state, scheduler, and the mid-epoch cursor exactly."""
    import optax

    from blurry_edges_tpu.train.local import TrainState
    from blurry_edges_tpu.train.resume import (load_step_snapshot,
                                               save_step_snapshot)
    from blurry_edges_tpu.train.schedules import PlateauScheduler

    params = {"w": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))}
    tx = optax.adamw(1e-3)
    state = TrainState(params=params, batch_stats={}, opt_state=tx.init(params),
                       step=jnp.asarray(17, jnp.int32))
    sched = PlateauScheduler(lr=2e-4, factor=0.9, patience=3, min_lr=1e-5,
                             best=0.5, num_bad=2)
    path = str(tmp_path / "snap")
    save_step_snapshot(path, state, sched, epoch=4, step=9, loss_sum=1.25,
                       loss_count=9, best_loss=0.375, best_epoch=2)

    fresh = TrainState(params=jax.tree.map(jnp.zeros_like, params),
                       batch_stats={},
                       opt_state=tx.init(params), step=jnp.asarray(0, jnp.int32))
    fresh_sched = PlateauScheduler(lr=1e-3, factor=0.9, patience=3, min_lr=1e-5)
    restored, rsched, mid = load_step_snapshot(path, fresh, fresh_sched)
    npt.assert_array_equal(np.asarray(restored.params["w"]),
                           np.asarray(params["w"]))
    assert int(restored.step) == 17
    assert mid == {"epoch": 4, "step": 9, "loss_sum": 1.25, "loss_count": 9,
                   "best_loss": 0.375, "best_epoch": 2}
    assert rsched.lr == pytest.approx(2e-4)
    assert rsched.best == pytest.approx(0.5)
    assert rsched.num_bad == 2
