"""10-panel result canvas: noisy inputs, restored pair, sharpened, refocused,
confidence heatmap, boundary map, GT + estimated depth with a rainbow colorbar.

Parity: reference utils/visualization.py:5-64 (same panel layout, rainbow LUT
over [0.73, 1.18] m with invalid pixels blacked out, green confidence LUT,
nearest-neighbor upscale). Host-side; requires cv2 and degrades to a no-op
without it.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
    HAS_CV2 = True
except ImportError:  # pragma: no cover
    HAS_CV2 = False


class Visualizer:
    def __init__(self, rho_prime: float, img_size: int = 147, gap_v: int = 20,
                 gap_h: int = 5, scale: int = 10, fontsize_scale: float = 0.35):
        self.rho_prime = rho_prime
        self.s = img_size
        self.gv = gap_v
        self.gh = gap_h
        self.sc = scale
        self.fs = fontsize_scale
        if HAS_CV2:
            self.canvas_blank = self._blank_canvas()
            self.green_lut = np.zeros((256, 1, 3), dtype=np.uint8)
            self.green_lut[:, 0, 1] = np.arange(256)

    def _put(self, canvas, text, x, y, shrink=1.0):
        cv2.putText(canvas, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX,
                    self.fs * self.sc * shrink, (0, 0, 0), self.sc)

    def _blank_canvas(self):
        s, gv, gh, sc = self.s, self.gv, self.gh, self.sc
        grad = (np.linspace(1, 0, 1000)[:, None] * 0.43 + 0.02) / 0.45
        bar = cv2.applyColorMap((grad * 255).clip(0, 255).astype(np.uint8),
                                cv2.COLORMAP_RAINBOW)
        bar = cv2.resize(bar, (gh * 2 * sc, (s * 2 + gv) * sc),
                         interpolation=cv2.INTER_NEAREST)
        # uint8 from the start: cv2 >= 5 putText asserts CV_8U
        canvas = np.full(((s * 2 + gv * 3) * sc, (s * 5 + gh * 5 + 40) * sc, 3),
                         255, dtype=np.uint8)
        canvas[gv * sc:(s * 2 + gv * 2) * sc,
               (s * 5 + gh * 5) * sc:(s * 5 + gh * 7) * sc, :] = bar
        self._put(canvas, "75", (s * 5 + int(gh * 8)) * sc, (s * 2 + int(gv * 1.9)) * sc)
        self._put(canvas, "118", (s * 5 + int(gh * 7.6)) * sc, int(gv * 1.6) * sc)
        self._put(canvas, "cm", (s * 5 + int(gh * 7.6)) * sc, int(gv * 0.7) * sc)
        row1, row2 = int(gv * 0.7) * sc, (s + int(gv * 1.7)) * sc
        self._put(canvas, "Noisy input 1", 0, row1)
        self._put(canvas, "Noisy input 2", 0, (s + gv + int(gv * 0.7)) * sc)
        self._put(canvas, "Restored colormap 1", (s + gh) * sc, row1)
        self._put(canvas, "Restored colormap 2", (s + gh) * sc, row2)
        self._put(canvas, "Sharpened colormap", (s * 2 + gh * 2) * sc, row1)
        self._put(canvas, "Refocused colormap *", (s * 2 + gh * 2) * sc, row2)
        self._put(canvas, f"* Refocused with a reference of optical power: {self.rho_prime}",
                  (s * 2 + gh * 2) * sc, (s * 2 + int(gv * 2.7)) * sc, shrink=0.8)
        self._put(canvas, "Confidence map", (s * 3 + gh * 3) * sc, row1)
        self._put(canvas, "Estimated boundary map", (s * 3 + gh * 3) * sc, row2)
        self._put(canvas, "Ground truth depth map", (s * 4 + gh * 4) * sc, row1)
        self._put(canvas, "Estimated depth map", (s * 4 + gh * 4) * sc, row2)
        return canvas

    def _depth_heat(self, z):
        heat = cv2.applyColorMap(((z - 0.73) / 0.45 * 255).clip(0, 255).astype(np.uint8),
                                 cv2.COLORMAP_RAINBOW)
        # invalid (z=0 -> LUT red end) painted black (reference
        # utils/visualization.py:50-51)
        inv = (heat[:, :, 0] == 0) & (heat[:, :, 1] == 0) & (heat[:, :, 2] == 255)
        heat[inv] = 0
        return heat

    def visualize(self, I1, I2, C1, C2, C_shpd, C_refoc, F, B, Z_gt, Z):
        if not HAS_CV2:  # pragma: no cover
            return None
        s, gv, gh, sc = self.s, self.gv, self.gh, self.sc

        def up(im):
            im = np.asarray(im, np.float64).clip(0, 255).astype(np.uint8)
            return cv2.resize(im, (s * sc, s * sc), interpolation=cv2.INTER_NEAREST)
        conf = cv2.applyColorMap((F * 255).clip(0, 255).astype(np.uint8), self.green_lut)
        canvas = self.canvas_blank.copy()
        r1 = slice(gv * sc, (s + gv) * sc)
        r2 = slice((s + gv * 2) * sc, (s * 2 + gv * 2) * sc)
        col = lambda k: slice((s * k + gh * k) * sc, (s * (k + 1) + gh * k) * sc)
        canvas[r1, col(0)] = up(I1 * 255)
        canvas[r2, col(0)] = up(I2 * 255)
        canvas[r1, col(1)] = up(C1 * 255)
        canvas[r2, col(1)] = up(C2 * 255)
        canvas[r1, col(2)] = up(C_shpd * 255)
        canvas[r2, col(2)] = up(C_refoc * 255)
        canvas[r1, col(3)] = up(conf)
        canvas[r2, col(3)] = up((B * 255).clip(0, 255))[:, :, None]
        canvas[r1, col(4)] = up(self._depth_heat(Z_gt))
        canvas[r2, col(4)] = up(self._depth_heat(Z))
        return canvas


def make_file_visualizer(args, big: bool = False):
    """Callback for run_eval: writes the canvas per image (reference
    blurry_edges_test.py:157-167)."""
    import os

    if not HAS_CV2:  # pragma: no cover
        return None
    sub = "visualizations_big" if big else "visualizations"
    outdir = f"{args.log_path}/{sub}"
    os.makedirs(outdir, exist_ok=True)
    size = args.big_img_size[0] if big else args.img_size[0]
    vis = Visualizer(args.rho_prime, img_size=size, scale=2 if big else 10)
    # --vis_max N caps how many pairs get the ~22 MP 10-panel canvas (the
    # reference writes every pair, blurry_edges_test.py:157-167; on the
    # tunneled chip PNG encode can rival the jitted inference itself)
    vis_max = getattr(args, "vis_max", 0) or None

    def cb(j, img_ny, gt_depth, out):
        if vis_max is not None and j >= vis_max:
            return
        canvas = vis.visualize(
            img_ny[0], img_ny[1],
            out["global_image"][0, 0], out["global_image"][0, 1],
            out["global_shpd"][0], out["global_refoc"][0],
            out["confidence"][0], out["global_bndry"][0],
            gt_depth, out["depth_final"][0])
        cv2.imwrite(f"{outdir}/{j}.png", canvas)

    return cb
