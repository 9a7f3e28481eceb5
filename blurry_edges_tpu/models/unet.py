"""Depth-completion U-Net: sparse (confidence-masked) global depth map in,
dense depth map out.

Architectural parity with reference models/depth_completion_unet.py:8-121
(4-down/4-up, 64..1024 channels, transposed-conv upsampling, double
conv+BN+ReLU blocks, centered padding when skip sizes mismatch on odd
resolutions). ~31 M params. NHWC.

The reference ships only inference for this model (its training script is
absent); blurry_edges_tpu.train.densify fills that gap.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class DoubleConv(nn.Module):
    """(conv3x3 no-bias -> BN -> ReLU) x 2 (reference
    models/depth_completion_unet.py:8-27)."""

    features: int
    mid_features: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_features or self.features
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(x)
        return nn.relu(x)


def _center_pad_to(x, target_h: int, target_w: int):
    """Pad H/W symmetrically to match a skip connection on odd sizes
    (reference models/depth_completion_unet.py:57-63)."""
    dh, dw = target_h - x.shape[1], target_w - x.shape[2]
    return jnp.pad(x, ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)))


class Up(nn.Module):
    """Transposed-conv 2x upsample, concat skip, double conv (reference
    models/depth_completion_unet.py:43-67, bilinear=False branch)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = nn.ConvTranspose(x.shape[-1] // 2, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up")(x)
        x = _center_pad_to(x, skip.shape[1], skip.shape[2])
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.features, dtype=self.dtype, name="conv")(x, train)


class UNet(nn.Module):
    """(B, H, W, n_channels) -> (B, H, W, n_classes). For the 147x147 depth
    maps the encoder path is 147 -> 73 -> 36 -> 18 -> 9 (floor maxpool-2)."""

    n_channels: int = 1
    n_classes: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        down = lambda v: nn.max_pool(v, (2, 2), strides=(2, 2), padding="VALID")
        x1 = DoubleConv(64, dtype=self.dtype, name="inc")(x, train)
        x2 = DoubleConv(128, dtype=self.dtype, name="down1")(down(x1), train)
        x3 = DoubleConv(256, dtype=self.dtype, name="down2")(down(x2), train)
        x4 = DoubleConv(512, dtype=self.dtype, name="down3")(down(x3), train)
        x5 = DoubleConv(1024, dtype=self.dtype, name="down4")(down(x4), train)
        y = Up(512, dtype=self.dtype, name="up1")(x5, x4, train)
        y = Up(256, dtype=self.dtype, name="up2")(y, x3, train)
        y = Up(128, dtype=self.dtype, name="up3")(y, x2, train)
        y = Up(64, dtype=self.dtype, name="up4")(y, x1, train)
        return nn.Conv(self.n_classes, (1, 1), dtype=self.dtype, name="outc")(y)
