"""Exercise the COCO/Painting test-set generation branch (reference
test_data_generator.py:26-79) end-to-end on a synthetic fake-COCO fixture:
a minimal instances_val2017.json + tiny val2017 images + a painting dir,
through load_coco_foregrounds / load_painting_backgrounds and the full
generate_synthetic_data(source='coco') artifact writer."""

import json
import random

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.data.coco import SimpleCOCO
from blurry_edges_tpu.data.realistic_gen import (SyntheticRealisticDataGenerator,
                                                 load_coco_foregrounds,
                                                 load_painting_backgrounds)

IH, IW = 96, 128  # fake source image size
H = W = 48        # generated test-image size


def _write_fixture(root):
    """instances_val2017.json + val2017/ images + Painting/ images."""
    frgd = root / "coco"
    (frgd / "val2017").mkdir(parents=True)
    bkgd = root / "painting"
    bkgd.mkdir()

    rng = np.random.default_rng(3)
    images, annotations = [], []
    for i in range(2):
        name = f"img{i}.png"
        cv2.imwrite(str(frgd / "val2017" / name),
                    rng.integers(30, 220, (IH, IW, 3)).astype(np.uint8))
        images.append({"id": 10 + i, "file_name": name, "height": IH, "width": IW})
        # one large centered rectangle instance: single connected component;
        # the area field is what the >40000 gate reads (reference :47)
        x0, y0, x1, y1 = 20, 10, IW - 20, IH - 10
        annotations.append({
            "id": 100 + i, "image_id": 10 + i, "category_id": 1,
            "segmentation": [[x0, y0, x1, y0, x1, y1, x0, y1]],
            "area": 50000})
    with open(frgd / "instances_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "thing"}]}, f)

    for i in range(2):
        cv2.imwrite(str(bkgd / f"paint{i}.png"),
                    rng.integers(0, 255, (IH, IW, 3)).astype(np.uint8))
    return str(frgd) + "/", str(bkgd) + "/"


def _args(tmp_path, frgd, bkgd):
    return get_args("data_gen_test", argv=[
        "--data_path", str(tmp_path / "out"),
        "--frgd_path", frgd, "--bkgd_path", bkgd,
        "--num_sample_test", "2", "--img_size", str(H), str(W)])


def test_simple_coco_reader(tmp_path):
    frgd, _ = _write_fixture(tmp_path)
    coco = SimpleCOCO(frgd + "instances_val2017.json")
    assert coco.getCatIds(catNms="thing") == [1]
    assert coco.getImgIds(catIds=[1]) == [10, 11]
    ann_ids = coco.getAnnIds(10, catIds=[1])
    (ann,) = coco.loadAnns(ann_ids)
    mask = coco.annToMask(ann)
    assert mask.shape == (IH, IW)
    assert mask.sum() > 0.5 * IH * IW  # the big rectangle
    assert mask[0, 0] == 0


def test_simple_coco_uncompressed_rle():
    coco = SimpleCOCO.__new__(SimpleCOCO)
    coco.imgs = {1: {"id": 1, "height": 3, "width": 2}}
    # column-major runs: 2 zeros, 3 ones, 1 zero
    ann = {"image_id": 1, "segmentation": {"counts": [2, 3, 1], "size": [3, 2]}}
    mask = coco.annToMask(ann)
    expected = np.array([[0, 1], [0, 1], [1, 0]], np.uint8)
    np.testing.assert_array_equal(mask, expected)


def test_load_foregrounds_and_backgrounds(tmp_path):
    frgd, bkgd = _write_fixture(tmp_path)
    random.seed(0)
    np.random.seed(0)
    args = _args(tmp_path, frgd, bkgd)
    masks, objs = load_coco_foregrounds(args, (H, W), 2)
    assert masks.shape == (2, H, W) and objs.shape == (2, H, W, 3)
    assert masks.any(axis=(1, 2)).all()  # every sample got an instance
    bgs = load_painting_backgrounds(args, (H, W), 2)
    assert bgs.shape == (2, H, W, 3)
    assert (bgs > 0).any()


def test_generate_coco_test_set(tmp_path):
    frgd, bkgd = _write_fixture(tmp_path)
    random.seed(0)
    np.random.seed(0)
    args = _args(tmp_path, frgd, bkgd)
    gen = SyntheticRealisticDataGenerator(args, source="coco", n_interval=6)
    gen.generate_synthetic_data()

    out = tmp_path / "out"
    gt = np.load(out / "images_gt.npy")
    ny = np.load(out / "images_ny.npy")
    depth = np.load(out / "depth_maps.npy")
    alphas = np.load(out / "alphas.npy")
    assert gt.shape == ny.shape == (2, 2, H, W, 3)
    assert depth.shape == (2, H, W) and alphas.shape == (2,)
    for a in (gt, ny, depth, alphas):
        assert np.isfinite(a).all()
    assert depth.min() >= args.Z_range[0] - 1e-5
    assert depth.max() <= args.Z_range[1] + 1e-5
    # noisy images are integer photon counts within [0, alpha]
    assert (ny >= 0).all() and (ny <= alphas.max() + 1e-3).all()
