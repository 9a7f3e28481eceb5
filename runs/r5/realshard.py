"""Real-texture eval shard (round 5, VERDICT r4 item 6).

The reference protocol textures its layered-defocus test scenes with
photographic content: MS-COCO instance crops as foregrounds and Painting-
dataset images as backgrounds (reference test_data_generator.py:26-79).
Neither dataset is fetchable in this environment (zero egress), so the
committed accuracy rows use the procedural-texture fallback. This script
builds a small shard whose TEXTURES are real photographs, exercising the
repo's actual COCO branch (data/realistic_gen.py load_coco_foregrounds /
load_painting_backgrounds + SimpleCOCO reader) end to end:

* Photos: the freely-licensed sample images bundled with installed packages -
  scikit-learn's china.jpg and flower.jpg (shipped in sklearn.datasets,
  CC-BY per sklearn docs) and matplotlib's grace_hopper.jpg (a public-domain
  U.S. government photograph). Random crops/flips of these provide texture
  variety for both foregrounds and backgrounds.
* Masks: procedural single-component polygons written as COCO annotations.
  This mirrors the reference's geometry source (COCO instance outlines) in
  spirit only - the paper's mask SHAPES are object silhouettes; what this
  shard restores is the photographic TEXTURE statistics (natural gradients,
  edges inside regions, non-uniform albedo), which is what the procedural
  fallback lacks.

Output: a standard test-set dir (images_gt/ny, depth_maps, alphas) evaluable
by blurry_edges_test.py, plus the COCO-format source fixture for inspection.
"""

import json
import math
import os
import random
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

ROOT = os.environ.get("BE_R5_ROOT", "runs/r5")
SRC = f"{ROOT}/data/realshard_src"
OUT = os.environ.get("BE_REALSHARD_OUT", f"{ROOT}/data/data_test_real")
N_PAIRS = int(os.environ.get("BE_REALSHARD_N", "24"))
N_SOURCES = 16
CROP_H, CROP_W = 320, 420


def load_photos():
    import cv2
    import matplotlib
    from sklearn.datasets import load_sample_images

    photos = [img[..., ::-1] for img in load_sample_images().images]  # RGB->BGR
    hopper = cv2.imread(os.path.join(os.path.dirname(matplotlib.__file__),
                                     "mpl-data", "sample_data",
                                     "grace_hopper.jpg"))
    if hopper is not None:
        photos.append(hopper)
    return [np.ascontiguousarray(p, dtype=np.uint8) for p in photos]


def random_crop(rng, photo):
    H, W = photo.shape[:2]
    y = rng.integers(0, max(1, H - CROP_H))
    x = rng.integers(0, max(1, W - CROP_W))
    crop = photo[y:y + CROP_H, x:x + CROP_W]
    if rng.random() < 0.5:
        crop = crop[:, ::-1]
    if rng.random() < 0.5:
        crop = crop[::-1, :]
    return np.ascontiguousarray(crop)


def blob_polygon(rng, cx, cy, r_base, n_pts=24):
    """Single-component star-convex polygon (random radial perturbation)."""
    angles = np.linspace(0.0, 2.0 * math.pi, n_pts, endpoint=False)
    radii = r_base * (0.7 + 0.6 * rng.random(n_pts))
    xs = cx + radii * np.cos(angles)
    ys = cy + radii * np.sin(angles)
    poly = []
    for x, y in zip(xs, ys):
        poly += [float(np.clip(x, 0, CROP_W - 1)), float(np.clip(y, 0, CROP_H - 1))]
    return poly


def write_fixture():
    import cv2

    rng = np.random.default_rng(4242)
    photos = load_photos()
    frgd = f"{SRC}/coco"
    bkgd = f"{SRC}/painting"
    os.makedirs(f"{frgd}/val2017", exist_ok=True)
    os.makedirs(bkgd, exist_ok=True)

    images, annotations = [], []
    for i in range(N_SOURCES):
        crop = random_crop(rng, photos[i % len(photos)])
        name = f"real{i:03d}.png"
        cv2.imwrite(f"{frgd}/val2017/{name}", crop)
        images.append({"id": i, "file_name": name,
                       "height": CROP_H, "width": CROP_W})
        poly = blob_polygon(rng, CROP_W // 2 + rng.integers(-40, 41),
                            CROP_H // 2 + rng.integers(-30, 31),
                            r_base=110 + rng.integers(0, 30))
        annotations.append({"id": 1000 + i, "image_id": i, "category_id": 1,
                            "segmentation": [poly],
                            "area": 50000})  # clears the reference's >40000 gate
    with open(f"{frgd}/instances_val2017.json", "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "photo_blob"}]}, f)

    for i in range(N_SOURCES):
        crop = random_crop(rng, photos[(i + 1) % len(photos)])
        cv2.imwrite(f"{bkgd}/paint{i:03d}.png", crop)
    return frgd + "/", bkgd + "/"


def main():
    if os.path.exists(f"{OUT}/alphas.npy"):
        print("real-texture shard already complete", flush=True)
        return
    from blurry_edges_tpu.config import get_args
    from blurry_edges_tpu.data.realistic_gen import SyntheticRealisticDataGenerator

    frgd, bkgd = write_fixture()
    random.seed(4242)       # load_coco_foregrounds draws with stdlib random
    np.random.seed(4242)    # load_painting_backgrounds draws with np.random
    args = get_args("data_gen_test", argv=[
        "--data_path", OUT, "--frgd_path", frgd, "--bkgd_path", bkgd,
        "--num_sample_test", str(N_PAIRS)])
    SyntheticRealisticDataGenerator(
        args, big=False, source="coco", seed=4242).generate_synthetic_data()
    print(f"real-texture shard complete: {N_PAIRS} pairs in {OUT}", flush=True)


if __name__ == "__main__":
    main()
