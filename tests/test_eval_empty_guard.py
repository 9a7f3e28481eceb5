"""run_eval must not let an image with zero predicted pixels (masked metrics
are 0/0) poison the dataset averages with nan; it excludes and reports it."""

import types

import numpy as np
import pytest

import blurry_edges_tpu.eval.pipeline as pipe


class _FakeDS:
    def __init__(self, path):
        pass

    def __len__(self):
        return 3

    def __getitem__(self, j):
        img = np.zeros((2, 147, 147, 3), np.float32)
        gt = np.full((147, 147), 0.9, np.float32)
        return img, gt


def test_run_eval_excludes_empty_predictions(monkeypatch, capsys, tmp_path):
    H = 147
    calls = {"j": 0}

    def fake_make(mods, patch_cfg, grid, cam, densify=None, rho_prime=10.39,
                  use_pallas=None):
        def estimate(img):
            j = calls["j"]
            calls["j"] += 1
            depth = np.zeros((1, H, H), np.float32)
            if j != 1:  # image index 0 of the loop (call 1 is warmup at j=0)
                depth[0, 50:60, 50:60] = 0.9
            return {"depth_final": depth}

        return estimate

    monkeypatch.setattr(pipe, "make_depth_estimator", fake_make)
    from blurry_edges_tpu.data import datasets as ds_mod
    monkeypatch.setattr(ds_mod, "TestDataset", _FakeDS)

    args = types.SimpleNamespace(
        data_path=str(tmp_path), densify=None, rho_prime=10.39, crop=10,
        R=21, stride=2, img_size=[H, H], w=1.0, alpha_lambda=5e-3, mag=4.0,
        dp_devices=0,
        cam_params={"s": 0.1104, "rho_1": 10.0, "rho_2": 10.2,
                    "sigma_cam": 0.003, "pixel_pitch": 5.86e-6})
    res = pipe.run_eval(args, modules=None)
    out = capsys.readouterr().out
    assert "excluded from averages" in out
    assert "1/3 images had empty predictions" in out
    # averages come from the 2 scored images and are finite, not nan
    assert np.isfinite([res["delta1"], res["rmse"], res["absrel"]]).all()
    assert res["delta1"] == pytest.approx(1.0)
