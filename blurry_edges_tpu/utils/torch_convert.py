"""PyTorch reference checkpoint -> Flax parameter tree converter.

The reference publishes pretrained weights as torch ``state_dict`` .pth files
(loaded at reference blurry_edges_test.py:183-195 and
global_data_pre_cal.py:64: pretrained_local_stage.pth,
pretrained_global_stage[_w].pth, pretrained_depth_completion_pp.pth). This
module maps those name/layout conventions onto our NHWC Flax models so users
can migrate reference checkpoints, and so tests can assert bitwise-level
architecture parity between the torch and Flax model definitions.

Input is a plain ``{name: np.ndarray}`` dict (call ``state_dict_to_numpy`` on
a torch state_dict first; torch itself is only needed for .pth IO).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


Array = np.ndarray
TreeDict = Dict[str, dict]


def state_dict_to_numpy(state_dict) -> Dict[str, Array]:
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}


def load_pth(path: str) -> Dict[str, Array]:
    import torch  # local import: torch is only required for .pth IO

    return state_dict_to_numpy(torch.load(path, map_location="cpu"))


def _conv(sd, name) -> dict:
    """torch Conv2d (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    out = {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _conv_transpose(sd, name) -> dict:
    """torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose (kh, kw, I, O).

    flax ConvTranspose (transpose_kernel=False) uses the mirrored spatial
    orientation relative to torch, so the kernel is flipped along both spatial
    axes (verified numerically: flipped matches torch to 1e-7, unflipped is
    off by O(1))."""
    w = sd[f"{name}.weight"][:, :, ::-1, ::-1]
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1)),
            "bias": sd[f"{name}.bias"]}


def _dense(sd, name) -> dict:
    """torch Linear (O, I) -> flax (I, O)."""
    return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}


def _bn(sd, name) -> Tuple[dict, dict]:
    """torch BatchNorm -> flax (params, batch_stats)."""
    params = {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}
    stats = {"mean": sd[f"{name}.running_mean"], "var": sd[f"{name}.running_var"]}
    return params, stats


def _layernorm(sd, name) -> dict:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _residual_block(sd, prefix) -> Tuple[dict, dict]:
    params, stats = {}, {}
    params["conv1"] = _conv(sd, f"{prefix}.conv1.0")
    params["bn1"], stats["bn1"] = _bn(sd, f"{prefix}.conv1.1")
    params["conv2"] = _conv(sd, f"{prefix}.conv2.0")
    params["bn2"], stats["bn2"] = _bn(sd, f"{prefix}.conv2.1")
    if f"{prefix}.downsample.0.weight" in sd:
        params["proj_conv"] = _conv(sd, f"{prefix}.downsample.0")
        params["proj_bn"], stats["proj_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return params, stats


def convert_local_stage(sd: Dict[str, Array]) -> Tuple[TreeDict, TreeDict]:
    """Reference LocalStage state_dict -> (params, batch_stats) for
    blurry_edges_tpu.models.LocalStage.

    The FC input is a flatten of the (3, 3, 256) feature map: torch flattens
    channel-major (C, H, W), flax flattens NHWC (H, W, C), so the first Dense
    kernel's input rows are permuted accordingly.
    """
    params: TreeDict = {}
    stats: TreeDict = {}
    params["conv1"] = _conv(sd, "conv1.0")
    params["bn1"], stats["bn1"] = _bn(sd, "conv1.1")
    for k in range(4):
        p, s = _residual_block(sd, f"layer{k}.0")
        params[f"layer{k}"] = p
        stats[f"layer{k}"] = s

    w = sd["fc.1.weight"]  # (1024, 2304) with input index c*9 + i*3 + j
    C, Hs, Ws = 256, 3, 3
    # flax input index order (i, j, c) -> torch column c*Hs*Ws + i*Ws + j
    ii, jj, cc = np.meshgrid(np.arange(Hs), np.arange(Ws), np.arange(C), indexing="ij")
    perm = (cc * Hs * Ws + ii * Ws + jj).reshape(-1)
    params["fc1"] = {"kernel": w[:, perm].T, "bias": sd["fc.1.bias"]}
    params["fc_bn"], stats["fc_bn"] = _bn(sd, "fc.2")
    params["fc2"] = _dense(sd, "fc.4")
    return params, stats


def _attention(sd, prefix, d_model=128, nhead=8) -> dict:
    """torch nn.MultiheadAttention packed qkv -> flax MultiHeadDotProductAttention."""
    hd = d_model // nhead
    w = sd[f"{prefix}.in_proj_weight"]  # (3*d, d)
    b = sd[f"{prefix}.in_proj_bias"]
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * d_model:(i + 1) * d_model]  # (d_out, d_in)
        out[name] = {
            "kernel": wi.T.reshape(d_model, nhead, hd),
            "bias": b[i * d_model:(i + 1) * d_model].reshape(nhead, hd),
        }
    wo = sd[f"{prefix}.out_proj.weight"]  # (d, d): out = W @ concat_heads
    out["out"] = {"kernel": wo.T.reshape(nhead, hd, d_model),
                  "bias": sd[f"{prefix}.out_proj.bias"]}
    return out


def convert_global_stage(sd: Dict[str, Array], num_layers: int = 8) -> TreeDict:
    """Reference GlobalStage state_dict -> params for
    blurry_edges_tpu.models.GlobalStage (no batch stats; LayerNorm only)."""
    params: TreeDict = {"in_proj": _dense(sd, "in_src_projection")}
    for i in range(num_layers):
        p = f"encoder.layers.{i}"
        params[f"layer{i}"] = {
            "self_attn": _attention(sd, f"{p}.self_attn"),
            "linear1": _dense(sd, f"{p}.linear1"),
            "linear2": _dense(sd, f"{p}.linear2"),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
        }
    params["final_norm"] = _layernorm(sd, "encoder.norm")
    params["generator"] = _dense(sd, "generator")
    return params


def _double_conv(sd, prefix) -> Tuple[dict, dict]:
    params, stats = {}, {}
    params["conv1"] = _conv(sd, f"{prefix}.0")
    params["bn1"], stats["bn1"] = _bn(sd, f"{prefix}.1")
    params["conv2"] = _conv(sd, f"{prefix}.3")
    params["bn2"], stats["bn2"] = _bn(sd, f"{prefix}.4")
    return params, stats


def convert_unet(sd: Dict[str, Array]) -> Tuple[TreeDict, TreeDict]:
    """Reference depth-completion UNet state_dict -> (params, batch_stats) for
    blurry_edges_tpu.models.UNet."""
    params: TreeDict = {}
    stats: TreeDict = {}
    params["inc"], stats["inc"] = _double_conv(sd, "inc.double_conv")
    for k in range(1, 5):
        params[f"down{k}"], stats[f"down{k}"] = _double_conv(sd, f"down{k}.maxpool_conv.1.double_conv")
    for k in range(1, 5):
        p, s = _double_conv(sd, f"up{k}.conv.double_conv")
        params[f"up{k}"] = {"up": _conv_transpose(sd, f"up{k}.up"), "conv": p}
        stats[f"up{k}"] = {"conv": s}
    params["outc"] = _conv(sd, "outc.conv")
    return params, stats
