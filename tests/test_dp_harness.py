"""Data parallelism wired into the production training harnesses: running
run_local_training / run_global_training over an 8-virtual-device 'data' mesh
must reproduce the single-device loss trajectory (the SPMD program is
semantically identical; only float reduction order may differ).

Reference hot loops being scaled: local_training.py:99-118,
global_training.py:204-221 (SURVEY.md section 2.2).
"""

import numpy as np
import pytest

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.parallel import make_mesh

pytestmark = pytest.mark.slow

rng = np.random.default_rng(77)

H = 29  # 5x5 patch grid
N_TRAIN, N_VAL = 16, 8
R = 21


def _write_local_dataset(path):
    path.mkdir(parents=True, exist_ok=True)
    for part, n in (("train", N_TRAIN), ("val", N_VAL)):
        alphas = rng.uniform(180, 200, (n,)).astype(np.float32)
        gt = rng.integers(0, 180, (n, R, R, 3)).astype(np.float32)
        np.save(path / f"patches_gt_{part}.npy", gt)
        np.save(path / f"patches_ny_{part}.npy",
                np.clip(gt + rng.normal(0, 2, gt.shape), 0, 200).round().astype(np.float32))
        np.save(path / f"alphas_{part}.npy", alphas)
        np.save(path / f"boundary_distances_{part}.npy",
                rng.integers(0, 10, (n, R, R)).astype(np.float32))
        np.save(path / f"derivative_maps_{part}.npy",
                rng.uniform(-1, 1, (n, R, R, 3)).astype(np.float32))


def _write_global_dataset(path):
    path.mkdir(parents=True, exist_ok=True)
    L = ((H - R) // 2 + 1) ** 2
    for part, n in (("train", N_TRAIN), ("val", N_VAL)):
        alphas = rng.uniform(180, 200, (n,)).astype(np.float32)
        a = alphas[:, None, None, None, None]
        imgs = rng.integers(0, 256, (n, 2, H, H, 3)).astype(np.float32)
        np.save(path / f"images_gt_{part}.npy", (imgs / 255.0 * a).astype(np.float32))
        np.save(path / f"images_ny_{part}.npy",
                np.clip(imgs / 255.0 * a + rng.normal(0, 2, imgs.shape), 0, 200)
                .round().astype(np.float32))
        np.save(path / f"alphas_{part}.npy", alphas)
        np.save(path / f"params_src_{part}.npy",
                rng.normal(scale=0.3, size=(n, 2, L, 19)).astype(np.float32))
        np.save(path / f"boundary_distances_{part}.npy",
                rng.integers(0, 10, (n, H, H)).astype(np.float32))
        np.save(path / f"derivative_maps_{part}.npy",
                rng.uniform(-1, 1, (n, 2, H, H, 3)).astype(np.float32))
        bd = np.zeros((n, H, H), np.float32)
        bd[:, ::7, :] = rng.uniform(0.75, 1.18)
        np.save(path / f"boundary_depths_{part}.npy", bd)


def _run_local(tmp_path, data_path, tag, mesh):
    from blurry_edges_tpu.train.local import run_local_training

    log = tmp_path / f"logs_{tag}"
    args = get_args("local_train", argv=[
        "--data_path", str(data_path), "--log_path", str(log),
        "--model_path", str(tmp_path / f"weights_{tag}"),
        "--epoch_num", "2", "--batch_size", "8"])
    run_local_training(args, snapshot_every=0, resume=False, mesh=mesh)
    return np.load(log / "loss_curve_exp_local_stage.npy")


def _run_global(tmp_path, data_path, tag, mesh):
    from blurry_edges_tpu.train.global_ import run_global_training

    log = tmp_path / f"glogs_{tag}"
    args = get_args("global_train", argv=[
        "--data_path", str(data_path), "--log_path", str(log),
        "--model_path", str(tmp_path / f"gweights_{tag}"),
        "--epoch_num", "2", "--batch_size", "8",
        "--img_size", str(H), str(H)])
    run_global_training(args, snapshot_every=0, resume=False, mesh=mesh)
    return np.load(log / "loss_curve_exp_global_stage.npy")


@pytest.mark.slow
def test_local_harness_dp_matches_single(tmp_path):
    data = tmp_path / "patches"
    _write_local_dataset(data)
    curve_single = _run_local(tmp_path, data, "single", None)
    curve_dp = _run_local(tmp_path, data, "dp", make_mesh(8))
    assert np.isfinite(curve_dp).all()
    np.testing.assert_allclose(curve_dp, curve_single, rtol=2e-3, atol=1e-5)


@pytest.mark.slow
def test_global_harness_dp_matches_single(tmp_path):
    data = tmp_path / "gdata"
    _write_global_dataset(data)
    curve_single = _run_global(tmp_path, data, "single", None)
    curve_dp = _run_global(tmp_path, data, "dp", make_mesh(8))
    assert np.isfinite(curve_dp).all()
    np.testing.assert_allclose(curve_dp, curve_single, rtol=2e-3, atol=1e-5)
