"""On-device synthetic basic-shape data generator.

Functional rebuild of reference train_val_data_generator.py:7-297 designed
TPU-first: instead of per-shape cv2 rasterization + scipy convolutions in a
Python loop (the reference's hottest CPU path, SURVEY.md section 3.1), shapes
are rasterized analytically from signed-distance functions, all shapes' defocus
blurs run as one batched separable convolution, compositing is a lax.scan in
painter's order, and the boundary-distance transform is a lax.while_loop of
4-connected dilations. The whole per-image pipeline is jit + vmap over sample
batches.

Artifacts written match the reference's .npy interchange schema (names and
shapes; dtype float32 instead of float64):
  images_{aif,gt,ny}_{part}.npy, boundary_locations_{part}.npy,
  image_depths_{part}.npy, boundary_depths_{part}.npy,
  boundary_distances_{part}.npy, derivative_maps_{part}.npy, alphas_{part}.npy
  and the patches/ set (reference train_val_data_generator.py:158-163,
  183-185, 267-275).
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CamConfig
from ..ops import optics
from ..ops.morphology import dilate_full, dilate_full_n, distance_transform_l1
from ..ops.sobel import image_derivative
from ..utils.io import create_directory


@dataclasses.dataclass(frozen=True)
class ShapeGenConfig:
    """Static generation parameters (reference utils/args.py:18-25)."""

    H: int = 147
    W: int = 147
    R: int = 21
    num_shape_lo: int = 15
    num_shape_hi: int = 26  # exclusive
    z_lo: float = 0.75
    z_hi: float = 1.18
    alpha_lo: float = 180.0
    alpha_hi: float = 200.0
    sigma_read: float = 2.0
    mag: float = 4.0
    cam: CamConfig = CamConfig()
    # Cap on boundary-distance-transform iterations (None = H + W, the
    # saturating default for 147x147 scenes). Large-scene generation (the
    # block-view fine-tune set, 587x587) caps this at 294 so the distance
    # field saturates with the same semantics the 147x147 training scenes
    # have, instead of running a 1174-iteration dilation loop.
    dist_max_iters: "int | None" = None

    @property
    def max_shapes(self) -> int:
        return self.num_shape_hi - 1

    @property
    def max_size(self) -> float:
        return max(self.H, self.W) * 0.8  # reference train_val_data_generator.py:54

    @property
    def K(self) -> int:
        return optics.max_kernel_halfwidth(self.cam, self.mag, (self.z_lo, self.z_hi))


def _pixel_grid(H: int, W: int):
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return xs, ys


def _circle_sdf(xs, ys, cx, cy, radius):
    # cv2.circle uses integer center/radius (reference :58-61)
    return jnp.hypot(xs - jnp.floor(cx), ys - jnp.floor(cy)) - jnp.floor(radius)


def _rect_sdf(xs, ys, cx, cy, w, h, angle_deg):
    """Oriented-box SDF matching cv2.boxPoints(((cx,cy),(w,h),angle)) fills
    (reference :63-69)."""
    a = angle_deg * (math.pi / 180.0)
    u = jnp.cos(a) * (xs - cx) + jnp.sin(a) * (ys - cy)
    v = -jnp.sin(a) * (xs - cx) + jnp.cos(a) * (ys - cy)
    return jnp.maximum(jnp.abs(u) - w / 2.0, jnp.abs(v) - h / 2.0)


def _segment_dist(xs, ys, ax, ay, bx, by):
    abx, aby = bx - ax, by - ay
    apx, apy = xs - ax, ys - ay
    t = jnp.clip((apx * abx + apy * aby) / (abx**2 + aby**2 + 1e-12), 0.0, 1.0)
    return jnp.hypot(apx - t * abx, apy - t * aby)


def _triangle_fields(xs, ys, vx, vy):
    """(inside, outline-distance) for the triangle with vertices (vx[i], vy[i])
    (reference :71-76: three polar vertices around the center)."""
    def edge(i, j):
        return (vx[j] - vx[i]) * (ys - vy[i]) - (vy[j] - vy[i]) * (xs - vx[i])

    s0, s1, s2 = edge(0, 1), edge(1, 2), edge(2, 0)
    inside = ((s0 >= 0) & (s1 >= 0) & (s2 >= 0)) | ((s0 <= 0) & (s1 <= 0) & (s2 <= 0))
    d = jnp.minimum(jnp.minimum(
        _segment_dist(xs, ys, vx[0], vy[0], vx[1], vy[1]),
        _segment_dist(xs, ys, vx[1], vy[1], vx[2], vy[2])),
        _segment_dist(xs, ys, vx[2], vy[2], vx[0], vy[0]))
    return inside, d


def _rasterize_slot(shape_type, center, circle_r, rect_whd, tri_raaa, cfg: ShapeGenConfig):
    """One shape slot -> (fill, ring) float 0/1 maps of shape (H, W).

    fill is the filled interior (cv2 thickness=-1), ring the ~1px outline
    (cv2 thickness=1)."""
    xs, ys = _pixel_grid(cfg.H, cfg.W)
    cx, cy = center[0], center[1]

    circ = _circle_sdf(xs, ys, cx, cy, circle_r)
    rect = _rect_sdf(xs, ys, cx, cy, rect_whd[0], rect_whd[1], rect_whd[2])
    tvx = cx + tri_raaa[0] * jnp.cos(tri_raaa[1:])
    tvy = cy + tri_raaa[0] * jnp.sin(tri_raaa[1:])
    tri_in, tri_d = _triangle_fields(xs, ys, jnp.floor(tvx), jnp.floor(tvy))

    fill = jnp.where(shape_type == 0, circ <= 0.0,
                     jnp.where(shape_type == 1, rect <= 0.0, tri_in))
    ring = jnp.where(shape_type == 0, jnp.abs(circ) <= 0.5,
                     jnp.where(shape_type == 1, jnp.abs(rect) <= 0.5, tri_d <= 0.5))
    return fill.astype(jnp.float32), ring.astype(jnp.float32)


def synthesize_image(key, cfg: ShapeGenConfig):
    """One synthetic sample, fully on device (reference
    train_val_data_generator.py:31-116).

    Returns dict with imgs (2, H, W, 3) in [0, 255] rounded, img_aif (H, W, 3)
    in [0, 1], boundary_loc / image_depth / boundary_depth / boundary_dist
    (H, W), deri (2, H, W, 3).
    """
    S = cfg.max_shapes
    kx = jax.random.split(key, 9)

    num_obj = jax.random.randint(kx[0], (), cfg.num_shape_lo, cfg.num_shape_hi)
    active = (jnp.arange(S) < num_obj)

    bg_color = jax.random.randint(kx[1], (3,), 0, 255).astype(jnp.float32)
    shape_type = jax.random.randint(kx[2], (S,), 0, 3)
    colors = jax.random.randint(kx[3], (S, 3), 0, 255).astype(jnp.float32)
    # depths sorted descending: painter's back-to-front (reference :46-48)
    z = jnp.sort(jax.random.uniform(kx[4], (S,), minval=cfg.z_lo, maxval=cfg.z_hi))[::-1]
    center = jax.random.uniform(kx[5], (S, 2)) * jnp.array([cfg.W, cfg.H], jnp.float32)
    circle_r = jax.random.randint(kx[6], (S,), 0, int(cfg.max_size / 2)).astype(jnp.float32)
    rect_whd = jax.random.uniform(kx[7], (S, 3)) * jnp.array(
        [cfg.max_size, cfg.max_size, 180.0], jnp.float32)
    tri_raaa = jax.random.uniform(kx[8], (S, 4)) * jnp.array(
        [cfg.max_size, 2 * math.pi, 2 * math.pi, 2 * math.pi], jnp.float32)

    # 1) rasterize all slots at once
    fills, rings = jax.vmap(
        lambda t, c, r, rw, tr: _rasterize_slot(t, c, r, rw, tr, cfg)
    )(shape_type, center, circle_r, rect_whd, tri_raaa)
    act = active.astype(jnp.float32)[:, None, None]
    fills = fills * act
    rings = rings * act

    # 2) all defocus blurs as one batched separable conv: (S, 2) blur jobs
    sigmas = optics.kernel_sigma(z, cfg.cam, cfg.mag)  # (S, 2)
    masks255 = fills * 255.0

    def blur_one(mask, sigma):
        return optics.blur_fixed_support(mask, sigma, cfg.K)

    blurred = jax.vmap(lambda m, ss: jax.vmap(lambda s: blur_one(m, s))(ss))(
        masks255, sigmas)  # (S, 2, H, W)

    # 3) painter's-order composite (reference :77-96)
    fill_dil = dilate_full(fills > 0)
    ring_dil = dilate_full(rings > 0).astype(jnp.float32)

    imgs0 = jnp.ones((2, cfg.H, cfg.W, 3), jnp.float32) * bg_color
    aif0 = jnp.ones((cfg.H, cfg.W, 3), jnp.float32) * bg_color
    state0 = (imgs0, aif0,
              jnp.zeros((cfg.H, cfg.W), jnp.float32),            # boundary_loc
              jnp.full((cfg.H, cfg.W), cfg.z_hi, jnp.float32),   # image_depth
              jnp.zeros((cfg.H, cfg.W), jnp.float32))            # boundary_depth

    def composite(state, slot):
        imgs, aif, b_loc, i_dep, b_dep = state
        fill, ring, blur2, fdil, rdil, zi, col = slot
        i_dep = jnp.where(fill > 0, zi, i_dep)
        b_dep = jnp.where(fdil, rdil * zi, b_dep)
        w = (blur2 / 255.0)[..., None]                            # (2, H, W, 1)
        imgs = w * col + (1.0 - w) * imgs
        b_loc = jnp.where(fill > 0, ring * 255.0, b_loc)
        aif = jnp.where((fill > 0)[..., None], col, aif)
        return (imgs, aif, b_loc, i_dep, b_dep), None

    (imgs, aif, b_loc, i_dep, b_dep), _ = jax.lax.scan(
        composite, state0, (fills, rings, blurred, fill_dil, ring_dil, z, colors))

    # 4) distance transform + rounding + Sobel maps (reference :98-115)
    b_dist = distance_transform_l1(
        b_loc > 0, max_iters=cfg.dist_max_iters or (cfg.H + cfg.W))
    imgs = jnp.round(imgs)
    padded = jnp.pad(imgs, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="symmetric")
    deri = image_derivative(padded) / 255.0  # same-size as scipy mode='reflect'

    return dict(imgs=imgs, img_aif=aif / 255.0, boundary_loc=b_loc,
                image_depth=i_dep, boundary_depth=b_dep,
                boundary_dist=b_dist, deri=deri)


def add_photon_noise(key, imgs, alpha, sigma_read: float):
    """Photon-limited imaging model (reference train_val_data_generator.py:
    165-185): scale to alpha photons, Poisson shot noise + Gaussian read noise,
    clip to [0, alpha], round.

    imgs: (..., H, W, 3) in [0, 255]; alpha scalar per call.
    Returns (img_gt, img_ny).
    """
    k1, k2 = jax.random.split(key)
    img_gt = imgs / 255.0 * alpha
    ny = (jax.random.poisson(k1, img_gt).astype(jnp.float32)
          + sigma_read * jax.random.normal(k2, img_gt.shape))
    return img_gt, jnp.round(jnp.clip(ny, 0.0, alpha))


@functools.partial(jax.jit, static_argnums=(1,))
def _gen_batch(keys, cfg: ShapeGenConfig):
    return jax.vmap(lambda k: synthesize_image(k, cfg))(keys)


@functools.partial(jax.jit, static_argnums=(3,))
def _noise_batch(keys, imgs, alphas, sigma_read: float):
    return jax.vmap(lambda k, im, a: add_photon_noise(k, im, a, sigma_read))(
        keys, imgs, alphas)


@functools.partial(jax.jit, static_argnums=(1,))
def _patch_dist_batch(patch_bndry, max_iters: int):
    return jax.vmap(lambda m: distance_transform_l1(m > 0, max_iters))(patch_bndry)


@functools.partial(jax.jit, static_argnums=(1,))
def _candidate_batch(bndry_loc, n_iter: int):
    """Dilate boundary maps by half_R+1 (8-connected) and mask off the margin
    (reference train_val_data_generator.py:231-235)."""
    H, W = bndry_loc.shape[-2:]
    half = (n_iter - 1)
    dil = dilate_full_n(bndry_loc > 0, n_iter)
    margin = jnp.zeros((H, W), bool).at[half:-half, half:-half].set(True)
    return dil & margin


class SyntheticShapeDataGenerator:
    """Host orchestrator with the reference's three-phase API
    (generate_synthetic_data / add_noise / crop_patch, reference
    train_val_data_generator.py:118-275). Device compute runs in batches;
    host only samples the global patch-candidate choice and writes .npy."""

    def __init__(self, args, previews: bool = False, device_batch: int = 50):
        self.cfg = ShapeGenConfig(
            H=args.img_size[0], W=args.img_size[1], R=args.R,
            num_shape_lo=args.num_shape[0], num_shape_hi=args.num_shape[1],
            z_lo=args.Z_range[0], z_hi=args.Z_range[1],
            alpha_lo=args.alpha[0], alpha_hi=args.alpha[1],
            sigma_read=args.sigma, mag=args.mag)
        self.data_path = args.data_path
        self.num_sample_train = args.num_sample_train
        self.num_sample_val = args.num_sample_val
        self.previews = previews
        self.device_batch = device_batch
        self._key = jax.random.PRNGKey(getattr(args, "seed", 1869))

    def _next_keys(self, n):
        self._key, sub = jax.random.split(self._key)
        return jax.random.split(sub, n)

    def generate_synthetic_data(self, train: bool = True) -> None:
        cfg = self.cfg
        n = self.num_sample_train if train else self.num_sample_val
        part = "train" if train else "val"
        os.makedirs(self.data_path, exist_ok=True)

        outs = {k: [] for k in ("imgs", "img_aif", "boundary_loc", "image_depth",
                                "boundary_depth", "boundary_dist", "deri")}
        for s in range(0, n, self.device_batch):
            b = min(self.device_batch, n - s)
            batch = _gen_batch(self._next_keys(b), cfg)
            for k, v in batch.items():
                outs[k].append(np.asarray(v, dtype=np.float32))
        cat = {k: np.concatenate(v, axis=0) for k, v in outs.items()}

        self.images = cat["imgs"]
        self.images_aif = cat["img_aif"]
        self.boundary_locations = cat["boundary_loc"]
        self.image_depths = cat["image_depth"]
        self.boundary_depths = cat["boundary_depth"]
        self.boundary_distances = cat["boundary_dist"]
        self.derivative_maps = cat["deri"]

        np.save(f"{self.data_path}/images_aif_{part}.npy", self.images_aif)
        np.save(f"{self.data_path}/boundary_locations_{part}.npy", self.boundary_locations)
        np.save(f"{self.data_path}/image_depths_{part}.npy", self.image_depths)
        np.save(f"{self.data_path}/boundary_depths_{part}.npy", self.boundary_depths)
        np.save(f"{self.data_path}/boundary_distances_{part}.npy", self.boundary_distances)
        np.save(f"{self.data_path}/derivative_maps_{part}.npy", self.derivative_maps)
        if self.previews:
            self._write_previews(part)

    def add_noise(self, train: bool = True) -> None:
        cfg = self.cfg
        n = self.images.shape[0]
        part = "train" if train else "val"
        self._key, ka = jax.random.split(self._key)
        self.alpha_list = np.asarray(
            jax.random.uniform(ka, (n,), minval=cfg.alpha_lo, maxval=cfg.alpha_hi))
        gt_all, ny_all = [], []
        for s in range(0, n, self.device_batch):
            e = min(n, s + self.device_batch)
            gt, ny = _noise_batch(self._next_keys(e - s),
                                  jnp.asarray(self.images[s:e]),
                                  jnp.asarray(self.alpha_list[s:e]), cfg.sigma_read)
            gt_all.append(np.asarray(gt, np.float32))
            ny_all.append(np.asarray(ny, np.float32))
        self.images_gt = np.concatenate(gt_all, axis=0)
        self.images_ny = np.concatenate(ny_all, axis=0)
        np.save(f"{self.data_path}/alphas_{part}.npy", self.alpha_list)
        np.save(f"{self.data_path}/images_gt_{part}.npy", self.images_gt)
        np.save(f"{self.data_path}/images_ny_{part}.npy", self.images_ny)

    def crop_patch(self, train: bool = True) -> None:
        """Boundary-centered 21x21 patch set (reference
        train_val_data_generator.py:187-275): global without-replacement draw
        over all dilated-boundary pixels, per-patch L1 distance transform."""
        cfg = self.cfg
        R, half = cfg.R, cfg.R // 2
        n_img = self.images_gt.shape[0]
        n_patch = (self.num_sample_train if train else self.num_sample_val) * 2
        part = "train" if train else "val"
        pdir = f"{self.data_path}/patches"
        os.makedirs(pdir, exist_ok=True)

        cand_chunks = []
        for s in range(0, n_img, self.device_batch):
            e = min(n_img, s + self.device_batch)
            cand_chunks.append(np.asarray(_candidate_batch(
                jnp.asarray(self.boundary_locations[s:e]), half + 1)))
        candidates = np.concatenate(cand_chunks, axis=0)

        cn, ch, cw = np.where(candidates)
        sel = np.random.choice(cn.shape[0], n_patch, replace=False)
        img_ind = np.random.randint(0, 2, size=n_patch)
        nn, hh, ww = cn[sel], ch[sel], cw[sel]

        def crop(arr, per_aperture: bool):
            out = np.empty((n_patch,) + ((R, R) + arr.shape[3 + per_aperture:]),
                           dtype=np.float32)
            for i in range(n_patch):
                hs, ws = hh[i] - half, ww[i] - half
                src = arr[nn[i], img_ind[i]] if per_aperture else arr[nn[i]]
                out[i] = src[hs:hs + R, ws:ws + R]
            return out

        patches = {
            "patches_aif": crop(self.images_aif, False),
            "patches_gt": crop(self.images_gt, True),
            "patches_ny": crop(self.images_ny, True),
            "boundary_locations": crop(self.boundary_locations, False),
            "image_depths": crop(self.image_depths, False),
            "boundary_depths": crop(self.boundary_depths, False),
            "derivative_maps": crop(self.derivative_maps, True),
        }
        # per-patch distance transform, batched on device (reference :238-250)
        bd = []
        for s in range(0, n_patch, 2048):
            e = min(n_patch, s + 2048)
            bd.append(np.asarray(_patch_dist_batch(
                jnp.asarray(patches["boundary_locations"][s:e]), 2 * R)))
        patches["boundary_distances"] = np.concatenate(bd, axis=0)

        for name, arr in patches.items():
            np.save(f"{pdir}/{name}_{part}.npy", arr)
        np.save(f"{pdir}/alphas_{part}.npy", self.alpha_list[nn].astype(np.float32))

    def _write_previews(self, part: str) -> None:
        """PNG previews of intermediate maps (reference :147-157); needs cv2."""
        try:
            import cv2
        except ImportError:
            return
        vis = f"{self.data_path}/{part}"
        create_directory(vis)
        lo = 1.25 * self.cfg.z_lo - 0.25 * self.cfg.z_hi
        rng = 1.25 * (self.cfg.z_hi - self.cfg.z_lo)
        for i in range(min(20, self.images.shape[0])):
            cv2.imwrite(f"{vis}/aif_{i}.png", (self.images_aif[i] * 255).astype(np.uint8))
            cv2.imwrite(f"{vis}/boundary_{i}.png", self.boundary_locations[i].astype(np.uint8))
            cv2.imwrite(f"{vis}/depth_{i}.png",
                        (((self.image_depths[i] - lo) / rng) * 255).astype(np.uint8))
            for ii in range(2):
                cv2.imwrite(f"{vis}/clean_{i}_{ii}.png", self.images[i, ii].astype(np.uint8))
