"""Local-stage CNN: (B, 21, 21, 3) noisy patch -> 10 Blurry-Edges parameters
(x0, y0, x1, y1, theta1, phi1, theta2, phi2, eta-coef1, eta-coef2).

Architectural parity with reference models/local_stage.py:4-73 (ResNet-ish
trunk with the Smish activation, BatchNorm, two 3/2 maxpools + one 2/2, four
residual stages of widths 96/256/384/256, FC head 3*3*256 -> 1024 -> 10),
re-expressed NHWC for TPU. ~7.2 M parameters.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def smish(x):
    """Smish(x) = x * tanh(log(1 + sigmoid(x))) (reference models/local_stage.py:4-6)."""
    return x * jnp.tanh(jnp.log1p(nn.sigmoid(x)))


class ResidualBlock(nn.Module):
    """Two 3x3 conv+BN with a Smish between, additive skip (1x1 conv+BN
    projection when widths change), Smish after the sum (reference
    models/local_stage.py:8-28)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = smish(y)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(y)
        if x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="proj_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                                    name="proj_bn")(residual)
        return smish(y + residual)


class LocalStage(nn.Module):
    """Input (B, R, R, 3) NHWC, output (B, output_dim).

    Spatial plan for R=21: conv7 (21) -> pool3/2 (11) -> stage 96 -> pool3/2 (6)
    -> stages 256/384/256 -> pool2/2 (3) -> flatten -> 1024 -> output_dim
    (reference models/local_stage.py:30-73).
    """

    widths: Sequence[int] = (96, 256, 384, 256)
    output_dim: int = 10
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(64, (7, 7), padding=3, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(y)
        y = smish(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        y = ResidualBlock(self.widths[0], dtype=self.dtype, name="layer0")(y, train)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        y = ResidualBlock(self.widths[1], dtype=self.dtype, name="layer1")(y, train)
        y = ResidualBlock(self.widths[2], dtype=self.dtype, name="layer2")(y, train)
        y = ResidualBlock(self.widths[3], dtype=self.dtype, name="layer3")(y, train)
        y = nn.max_pool(y, (2, 2), strides=(2, 2), padding="VALID")
        y = y.reshape((y.shape[0], -1))  # NHWC flatten: (H, W, C) order
        y = nn.Dense(1024, dtype=self.dtype, name="fc1")(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="fc_bn")(y)
        y = smish(y)
        return nn.Dense(self.output_dim, dtype=self.dtype, name="fc2")(y)
