"""Realistic-texture test-set generator.

Parity: reference test_data_generator.py:10-176 - foreground objects over
painting backgrounds, two random planar depth ramps, layered defocus
rendering with 151 depth key-points per layer (blur each key-point with its
sigma, blend by per-pixel linear weights, composite foreground over background
with the blurred foreground mask), then the same Poisson + read-noise model.
Saves images_gt / images_ny / depth_maps / alphas .npy.

Sources:
- COCO foregrounds + painting backgrounds (reference :26-79) when
  pycocotools and the datasets are present (host-side IO, offline prep).
- A self-contained procedural fallback (band-limited noise textures +
  random-ellipse masks) so the full eval pipeline and benchmarks run without
  external datasets.

The layered renderer itself is jittable (lax.scan over key-points, batched
separable blurs) and vmapped over samples - the reference's second-hottest
CPU loop moved on-device.
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CamConfig
from ..ops import optics
from .shapes_gen import add_photon_noise


def render_layer(depth_map, key_pts, img_sharp, mask, cam: CamConfig,
                 mag: float, K: int):
    """Depth-varying defocus of one layer (reference test_data_generator.py:
    87-110): for each of the n+1 descending depth key-points, blur the sharp
    layer with that depth's per-aperture sigma and accumulate with per-pixel
    linear interpolation weights.

    depth_map: (H, W); key_pts: (n+1,) descending; img_sharp: (H, W, 3);
    mask: (H, W) or None. Returns (img_blurred (2, H, W, 3),
    mask_blurred (2, H, W) or None).
    """
    H, W = depth_map.shape
    n_pts = key_pts.shape[0]
    diff = key_pts[1] - key_pts[0]  # negative
    has_mask = mask is not None
    mask_f = mask.astype(jnp.float32) if has_mask else jnp.zeros((H, W), jnp.float32)

    def weight_at(jj, depth):
        m_last = (depth_map <= depth - diff) & (depth_map > depth)
        m_next = (depth_map <= depth) & (depth_map > depth + diff)
        w_first = (depth_map > depth).astype(jnp.float32) \
            + (depth_map - depth - diff) / (-diff) * m_next
        w_last = (depth - diff - depth_map) / (-diff) * m_last \
            + (depth_map <= depth).astype(jnp.float32)
        w_mid = (depth - diff - depth_map) / (-diff) * m_last \
            + (depth_map - depth - diff) / (-diff) * m_next
        return jnp.where(jj == 0, w_first, jnp.where(jj == n_pts - 1, w_last, w_mid))

    def step(carry, inp):
        img_acc, mask_acc = carry
        jj, depth = inp
        w = weight_at(jj, depth)
        sigmas = optics.kernel_sigma(depth, cam, mag)  # (2,)
        img_b = jnp.stack([optics.blur_fixed_support(img_sharp, sigmas[i], K)
                           for i in range(2)])
        img_acc = img_acc + img_b * w[None, :, :, None]
        if has_mask:
            mask_b = jnp.stack([optics.blur_fixed_support(mask_f, sigmas[i], K)
                                for i in range(2)])
            mask_acc = mask_acc + mask_b * w[None]
        return (img_acc, mask_acc), None

    init = (jnp.zeros((2, H, W, 3), jnp.float32), jnp.zeros((2, H, W), jnp.float32))
    (img_out, mask_out), _ = jax.lax.scan(
        step, init, (jnp.arange(n_pts, dtype=jnp.float32), key_pts))
    if has_mask:
        return img_out, jnp.clip(mask_out, 0.0, 1.0)
    return img_out, None


def render_image(depth_bkgd, depth_frgd, frgd_mask, bkgd_obj, frgd_obj,
                 cam: CamConfig, mag: float, K: int, n_interval: int = 150):
    """Two-layer composite (reference test_data_generator.py:112-121)."""
    fg_depths = jnp.where(frgd_mask, depth_frgd, jnp.nan)
    bk_pts = jnp.linspace(depth_bkgd.max(), depth_bkgd.min(), n_interval + 1)
    fg_pts = jnp.linspace(jnp.nanmax(fg_depths), jnp.nanmin(fg_depths), n_interval + 1)
    img_bk, _ = render_layer(depth_bkgd, bk_pts, bkgd_obj, None, cam, mag, K)
    img_fg, mask_fg = render_layer(depth_frgd, fg_pts, frgd_obj, frgd_mask, cam, mag, K)
    return img_bk * (1.0 - mask_fg[..., None]) + img_fg


def planar_depths(key, H: int, W: int, z_lo: float, z_hi: float):
    """Random fg/bg planar depth ramps (reference test_data_generator.py:
    123-133): four sorted-descending relative key depths, two random tilt
    angles, per-plane normalization to its key-point interval."""
    k1, k2 = jax.random.split(key)
    rel = jnp.sort(jax.random.uniform(k1, (4,)))[::-1]  # [bg1, bg2, fg1, fg2]
    angles = jax.random.uniform(k2, (2,)) * 2 * math.pi
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    ox, oy = W // 2, H // 2
    modi = (-jnp.sin(angles)[:, None, None] * (xs - ox)[None]
            + jnp.cos(angles)[:, None, None] * (ys - oy)[None])

    def norm(m, hi, lo):
        return (m - m.min()) / (m.max() - m.min()) * (hi - lo) + lo

    d_bk_n = norm(modi[0], rel[0], rel[1])
    d_fg_n = norm(modi[1], rel[2], rel[3])
    real = lambda dn: (z_hi - z_lo) * dn + z_lo
    return real(d_bk_n), real(d_fg_n), d_bk_n, d_fg_n


def noise_texture(key, H: int, W: int):
    """Band-limited procedural texture in [0, 255]: three octaves of
    bicubic-upsampled uniform noise, per-channel."""
    keys = jax.random.split(key, 3)
    out = jnp.zeros((H, W, 3))
    for k, res, amp in zip(keys, (6, 16, 48), (0.6, 0.3, 0.1)):
        low = jax.random.uniform(k, (res, res, 3))
        out = out + amp * jax.image.resize(low, (H, W, 3), method="bicubic")
    out = out - out.min()
    return out / out.max() * 255.0


def ellipse_mask(key, H: int, W: int):
    """Random centered-ish rotated ellipse covering >~15% of the image - the
    procedural stand-in for a large single-component COCO instance mask
    (reference requires area > 40000 on ~VGA images, :47-49)."""
    k1, k2, k3 = jax.random.split(key, 3)
    c = jax.random.uniform(k1, (2,), minval=0.35, maxval=0.65) * jnp.array([W, H])
    ab = jax.random.uniform(k2, (2,), minval=0.22, maxval=0.42) * jnp.array([W, H])
    th = jax.random.uniform(k3, ()) * math.pi
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    u = jnp.cos(th) * (xs - c[0]) + jnp.sin(th) * (ys - c[1])
    v = -jnp.sin(th) * (xs - c[0]) + jnp.cos(th) * (ys - c[1])
    return (u / ab[0]) ** 2 + (v / ab[1]) ** 2 <= 1.0


def synth_sample(key, H: int, W: int, z_lo: float, z_hi: float, cam: CamConfig,
                 mag: float, K: int, n_interval: int = 150):
    """One procedural test sample: (img_clean (2, H, W, 3) in [0, 255],
    depth (H, W))."""
    k_mask, k_fg, k_bk, k_depth = jax.random.split(key, 4)
    frgd_mask = ellipse_mask(k_mask, H, W)
    frgd_obj = noise_texture(k_fg, H, W) * frgd_mask[..., None]
    bkgd_obj = noise_texture(k_bk, H, W)
    d_bk, d_fg, d_bk_n, d_fg_n = planar_depths(k_depth, H, W, z_lo, z_hi)
    depth_n = jnp.where(frgd_mask, d_fg_n, d_bk_n)
    depth = (z_hi - z_lo) * depth_n + z_lo
    img = render_image(d_bk, d_fg, frgd_mask, bkgd_obj, frgd_obj, cam, mag, K,
                       n_interval)
    return img, depth


class SyntheticRealisticDataGenerator:
    """Host orchestrator writing the reference's test-set artifacts
    (reference test_data_generator.py:138-164). source='synthetic' uses the
    procedural fallback; source='coco' uses MS-COCO + Painting data when
    available."""

    def __init__(self, args, big: bool = False, source: str = "synthetic",
                 n_interval: int = 150, seed: int = 1869):
        self.args = args
        self.H, self.W = (args.big_img_size if big else args.img_size)
        self.cam = CamConfig(**args.cam_params) if isinstance(args.cam_params, dict) \
            else args.cam_params
        self.mag = args.mag
        self.z_lo, self.z_hi = args.Z_range
        self.alpha = args.alpha
        self.sigma = args.sigma
        self.num_sample = args.num_sample_test
        self.n_interval = n_interval
        self.source = source
        self.K = optics.max_kernel_halfwidth(self.cam, self.mag, (self.z_lo, self.z_hi))
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _coco_layers(self, i, masks, fgs, bgs):
        frgd_mask = jnp.asarray(masks[i])
        frgd_obj = jnp.asarray(fgs[i], jnp.float32)
        bkgd_obj = jnp.asarray(bgs[i], jnp.float32)
        d_bk, d_fg, d_bk_n, d_fg_n = planar_depths(
            self._next_key(), self.H, self.W, self.z_lo, self.z_hi)
        depth_n = jnp.where(frgd_mask, d_fg_n, d_bk_n)
        depth = (self.z_hi - self.z_lo) * depth_n + self.z_lo
        img = render_image(d_bk, d_fg, frgd_mask, bkgd_obj, frgd_obj,
                           self.cam, self.mag, self.K, self.n_interval)
        return img, depth

    def generate_synthetic_data(self) -> None:
        out_dir = self.args.data_path
        os.makedirs(out_dir, exist_ok=True)
        H, W, n = self.H, self.W, self.num_sample

        if self.source == "coco":
            masks, fgs = load_coco_foregrounds(self.args, (H, W), n)
            bgs = load_painting_backgrounds(self.args, (H, W), n)
            sample = lambda i: self._coco_layers(i, masks, fgs, bgs)
        else:
            fn = jax.jit(functools.partial(
                synth_sample, H=H, W=W, z_lo=self.z_lo, z_hi=self.z_hi,
                cam=self.cam, mag=self.mag, K=self.K, n_interval=self.n_interval))
            sample = lambda i: fn(self._next_key())

        images_gt = np.zeros((n, 2, H, W, 3), np.float32)
        images_ny = np.zeros_like(images_gt)
        depth_maps = np.zeros((n, H, W), np.float32)
        self._key, ka = jax.random.split(self._key)
        alphas = np.asarray(jax.random.uniform(
            ka, (n,), minval=float(self.alpha[0]), maxval=float(self.alpha[1])))

        noise_fn = jax.jit(lambda k, im, a: add_photon_noise(k, im, a, self.sigma))
        for i in range(n):
            img_clean, depth = sample(i)
            gt, ny = noise_fn(self._next_key(), img_clean, alphas[i])
            images_gt[i] = np.asarray(gt)
            images_ny[i] = np.asarray(ny)
            depth_maps[i] = np.asarray(depth)

        np.save(f"{out_dir}/images_gt.npy", images_gt)
        np.save(f"{out_dir}/images_ny.npy", images_ny)
        np.save(f"{out_dir}/depth_maps.npy", depth_maps)
        np.save(f"{out_dir}/alphas.npy", alphas)


def load_coco_foregrounds(args, image_size, n):
    """Host-side COCO instance-mask foregrounds (reference
    test_data_generator.py:26-68). Uses pycocotools when present, else the
    built-in SimpleCOCO reader (data/coco.py)."""
    import random

    import cv2
    from scipy.ndimage import label

    from .coco import open_coco

    H, W = image_size
    masks = np.zeros((n, H, W), dtype=bool)
    objs = np.zeros((n, H, W, 3), dtype=np.float64)
    coco = open_coco(f"{args.frgd_path}instances_val2017.json")
    cat_names = [c["name"] for c in coco.loadCats(coco.getCatIds())]
    for i in range(n):
        while True:
            cat = random.choice(cat_names)
            cat_id = coco.getCatIds(catNms=cat)
            img_ids = coco.getImgIds(catIds=cat_id)
            if not img_ids:
                continue
            img_id = random.choice(img_ids)
            anns = coco.loadAnns(coco.getAnnIds(img_id, catIds=cat_id))
            ann = random.choice(anns)
            if ann["area"] < 40000:
                continue
            mask = coco.annToMask(ann)
            if label(mask)[1] != 1:
                continue
            img_info = coco.loadImgs(img_id)[0]
            arr = cv2.imread(f"{args.frgd_path}val2017/{img_info['file_name']}")
            if arr is None or arr.ndim == 2:
                continue
            obj = arr * mask[:, :, None]
            scale = max(image_size) / min(mask.shape)
            rs = lambda a: cv2.resize(a, (int(round(a.shape[1] * scale)),
                                          int(round(a.shape[0] * scale))))
            mask_r, obj_r = rs(mask), rs(obj)
            cy, cx = mask_r.shape[0] // 2, mask_r.shape[1] // 2
            masks[i] = mask_r[cy - H // 2:cy - H // 2 + H, cx - W // 2:cx - W // 2 + W]
            objs[i] = obj_r[cy - H // 2:cy - H // 2 + H, cx - W // 2:cx - W // 2 + W]
            break
    return masks, objs


def load_painting_backgrounds(args, image_size, n):
    """Host-side painting backgrounds (reference test_data_generator.py:70-79)."""
    import cv2

    H, W = image_size
    files = os.listdir(args.bkgd_path)
    out = np.zeros((n, H, W, 3), dtype=np.float64)
    for i in range(n):
        obj = cv2.imread(f"{args.bkgd_path}{files[np.random.randint(len(files))]}")
        scale = max(image_size) / min(obj.shape[:2])
        obj = cv2.resize(obj, (int(round(obj.shape[1] * scale)),
                               int(round(obj.shape[0] * scale))))
        cy, cx = obj.shape[0] // 2, obj.shape[1] // 2
        out[i] = obj[cy - H // 2:cy - H // 2 + H, cx - W // 2:cx - W // 2 + W]
    return out
