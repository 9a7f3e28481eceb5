"""Minimal self-contained COCO instance-annotation reader.

The reference consumes MS-COCO through pycocotools (reference
test_data_generator.py:26-68: COCO(), getCatIds, getImgIds, getAnnIds,
loadAnns, loadImgs, annToMask). pycocotools is a C extension that may be
absent; this module implements exactly the subset the test-set generator
needs in pure python + cv2 polygon rasterization, with the same call
surface, so ``load_coco_foregrounds`` works either way.

Supported segmentation formats: polygon lists and uncompressed RLE
({'counts': [...], 'size': [h, w]}). Compressed RLE strings need
pycocotools and raise a clear error.
"""

from __future__ import annotations

import json
from collections import defaultdict

import numpy as np


class SimpleCOCO:
    """pycocotools.coco.COCO drop-in for the subset used by
    load_coco_foregrounds."""

    def __init__(self, annotation_file: str):
        with open(annotation_file) as f:
            d = json.load(f)
        self.cats = {c["id"]: c for c in d.get("categories", [])}
        self.imgs = {i["id"]: i for i in d.get("images", [])}
        self.anns = {a["id"]: a for a in d.get("annotations", [])}
        self._img_to_anns = defaultdict(list)
        self._cat_to_imgs = defaultdict(set)
        for a in d.get("annotations", []):
            self._img_to_anns[a["image_id"]].append(a)
            self._cat_to_imgs[a["category_id"]].add(a["image_id"])

    def loadCats(self, ids):
        return [self.cats[i] for i in ids]

    def getCatIds(self, catNms=None):
        if catNms is None:
            return sorted(self.cats)
        if isinstance(catNms, str):
            catNms = [catNms]
        return [i for i, c in sorted(self.cats.items()) if c["name"] in catNms]

    def getImgIds(self, catIds=None):
        if not catIds:
            return sorted(self.imgs)
        ids = set(self.imgs)
        for c in catIds:
            ids &= self._cat_to_imgs[c]
        return sorted(ids)

    def getAnnIds(self, imgIds, catIds=None):
        if not isinstance(imgIds, (list, tuple)):
            imgIds = [imgIds]
        out = []
        for i in imgIds:
            for a in self._img_to_anns[i]:
                if not catIds or a["category_id"] in catIds:
                    out.append(a["id"])
        return out

    def loadAnns(self, ids):
        return [self.anns[i] for i in ids]

    def loadImgs(self, ids):
        if not isinstance(ids, (list, tuple)):
            ids = [ids]
        return [self.imgs[i] for i in ids]

    def annToMask(self, ann) -> np.ndarray:
        info = self.imgs[ann["image_id"]]
        h, w = info["height"], info["width"]
        seg = ann["segmentation"]
        if isinstance(seg, list):  # polygon(s)
            import cv2

            mask = np.zeros((h, w), np.uint8)
            for poly in seg:
                pts = np.asarray(poly, np.float64).reshape(-1, 2)
                cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
            return mask
        if isinstance(seg, dict) and isinstance(seg.get("counts"), list):
            # uncompressed RLE, column-major per the COCO spec
            mask = np.zeros(h * w, np.uint8)
            pos, val = 0, 0
            for run in seg["counts"]:
                if val:
                    mask[pos:pos + run] = 1
                pos += run
                val ^= 1
            return mask.reshape((w, h)).T
        raise ValueError("compressed RLE segmentation needs pycocotools")


def open_coco(annotation_file: str):
    """Prefer pycocotools when importable (handles compressed RLE), else the
    built-in reader."""
    try:
        from pycocotools.coco import COCO  # type: ignore

        return COCO(annotation_file)
    except ImportError:
        return SimpleCOCO(annotation_file)
