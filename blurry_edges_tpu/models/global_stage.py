"""Global-stage transformer: one token per patch of the Hp x Wp grid
(4,096 tokens at 147x147 / R=21 / stride=2), 38 input features (2 images x 19
normalized local features), 12 outputs (4 shared corner coords, 4 shared
angles, 2 eta-coefs per image).

Architectural parity with reference models/global_stage.py:6-38: linear
38 -> 128 projection, fixed 2-D sinusoidal positional encoding over a
max_len x max_len grid scaled by the patch stride, 8 post-norm transformer
encoder layers (d_model 128, 8 heads, FFN 256 relu, dropout 0.1,
LayerNorm eps 1e-5, final encoder norm), linear 128 -> 12 head. ~1.1 M params.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax.numpy as jnp


def flash_attention_fn(query, key, value, bias=None, mask=None, **unused):
    """Drop-in ``attention_fn`` for flax MultiHeadDotProductAttention backed by
    the Pallas TPU flash-attention kernel (param tree unchanged).

    At L=4096 tokens the XLA path materializes the (B, heads, L, L) attention
    probabilities - ~0.5 GB per layer per sample in f32, re-read by softmax
    and the A@V matmul, and recomputed under remat in the backward; HBM
    traffic on those probs dominates the training step. The flash kernel
    tiles QK^T/softmax/AV through VMEM and never writes the probs to HBM.

    Operands run in bf16 (the kernel accumulates in f32); attention-
    probability dropout is NOT applied on this path - the training harness
    keeps the residual/FFN dropouts, which at these scales regularize
    equivalently (documented training-recipe deviation from the torch
    reference's p=0.1 prob dropout).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    del bias, mask
    depth = query.shape[-1]
    # f32 operands: this toolchain's Mosaic rejects the bf16 tpu.matmul the
    # kernel emits ("Bad lhs type"); the win is probs never touching HBM,
    # not operand width
    q, k, v = (jnp.moveaxis(t.astype(jnp.float32), -2, -3)
               for t in (query, key, value))            # (B, H, L, D)
    out = flash_attention(q, k, v, sm_scale=1.0 / float(np.sqrt(depth)))
    return jnp.moveaxis(out, -3, -2).astype(query.dtype)


def sincos_2d_positional_encoding(d_model: int, max_len: int, stride: int) -> np.ndarray:
    """Fixed 2-D sin/cos table, (max_len * max_len, d_model): the first half of
    the feature dim encodes the row position, the second half the column, each
    with interleaved sin/cos at geometrically-spaced frequencies (reference
    models/global_stage.py:6-20). Positions are scaled by the patch stride.
    """
    d_half = d_model // 2
    position = np.linspace(0, (max_len - 1) * stride, max_len)
    div_term = np.exp(np.arange(0, d_half, 2) * (-2.0 * np.log(10000.0) / d_model))
    pe = np.zeros((max_len, max_len, d_model), dtype=np.float32)
    pe[:, :, 0:d_half:2] = np.sin(position[:, None, None] * div_term[None, None, :])
    pe[:, :, 1:d_half:2] = np.cos(position[:, None, None] * div_term[None, None, :])
    pe[:, :, d_half:d_model:2] = np.sin(position[None, :, None] * div_term[None, None, :])
    pe[:, :, d_half + 1:d_model:2] = np.cos(position[None, :, None] * div_term[None, None, :])
    return pe.reshape(max_len * max_len, d_model)


class EncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (torch nn.TransformerEncoderLayer
    with norm_first=False semantics): x = LN(x + Drop(SelfAttn(x)));
    x = LN(x + Drop(W2 Drop(relu(W1 x)))). Attention-probability dropout
    matches the layer dropout rate."""

    d_model: int = 128
    nhead: int = 8
    dim_feedforward: int = 256
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        extra = ({"attention_fn": flash_attention_fn, "dropout_rate": 0.0}
                 if self.attn_impl == "flash" else
                 {"dropout_rate": self.dropout})
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            out_features=self.d_model,
            deterministic=not train, dtype=self.dtype, name="self_attn",
            **extra)(x, x)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm1")(x + attn)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="norm2")(x + h)


class GlobalStage(nn.Module):
    """Input (B, L, in_parameter_size) with L <= max_len**2 tokens in row-major
    patch-grid order; output (B, L, out_parameter_size)."""

    max_len: int = 64
    stride: int = 2
    in_parameter_size: int = 38
    out_parameter_size: int = 12
    d_model: int = 128
    nhead: int = 8
    num_encoder_layers: int = 8
    dim_feedforward: int = 256
    dropout: float = 0.1
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"  # 'xla' (f32, torch-parity) | 'flash' (Pallas, bf16)

    @nn.compact
    def __call__(self, src, train: bool = False):
        pe = jnp.asarray(sincos_2d_positional_encoding(self.d_model, self.max_len, self.stride),
                         dtype=self.dtype)
        x = nn.Dense(self.d_model, dtype=self.dtype, name="in_proj")(src)
        x = x + pe[None, :x.shape[1], :]
        # remat per layer: the (heads, L, L) attention probabilities are
        # ~537 MB per layer per sample at L=4096 f32; without remat the
        # backward holds all 8 layers' probs (~4.3 GB/sample) as residuals,
        # which blows HBM in training. Checkpointing each layer bounds
        # backward liveness to one layer; forward and inference cost are
        # unchanged (checkpoint is identity in the primal).
        layer_cls = nn.remat(EncoderLayer, static_argnums=(2,))
        for i in range(self.num_encoder_layers):
            x = layer_cls(self.d_model, self.nhead, self.dim_feedforward,
                          self.dropout, self.layer_norm_eps, dtype=self.dtype,
                          attn_impl=self.attn_impl, name=f"layer{i}")(x, train)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, dtype=self.dtype, name="final_norm")(x)
        return nn.Dense(self.out_parameter_size, dtype=self.dtype, name="generator")(x)
