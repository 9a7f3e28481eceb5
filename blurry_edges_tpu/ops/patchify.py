"""Patch extraction (unfold / im2col) and overlap-add (fold / col2im).

The reference uses torch.nn.Unfold/Fold CUDA kernels everywhere
(global_data_pre_cal.py:17, blurry_edges_test.py:120,
utils/postprocessing_loss.py:139-173). Here unfold is
``lax.conv_general_dilated_patches`` and fold is a stride-residue
decomposition: patch offsets (di, dj) are grouped by (di % s, dj % s); within
one residue class every offset lands on a disjoint output sub-grid shifted by
(di // s, dj // s), so fold is a sum of statically-shifted slices - pure VPU
adds, no scatter and no giant identity-kernel convolution (the naive
transposed-conv lowering burns R^2 x more MXU FLOPs than needed and dominated
the inference profile).

Canonical patch layout: (N, Hp, Wp, R, R, C) - batch, patch-grid row/col,
in-patch row/col, channel. NHWC throughout (TPU-friendly).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def unfold(img, R: int, stride: int):
    """Extract all R x R patches at the given stride.

    img: (N, H, W, C) -> (N, Hp, Wp, R, R, C) with
    Hp = floor((H - R) / stride) + 1 (reference
    utils/postprocessing_loss.py:135-137 / torch.nn.Unfold semantics).
    """
    N, H, W, C = img.shape
    # Precision.HIGHEST: the underlying identity-kernel conv must not truncate
    # operand values to bf16 (pure data movement must be exact).
    patches = lax.conv_general_dilated_patches(
        img, (R, R), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST)
    Hp, Wp = patches.shape[1], patches.shape[2]
    # feature dim ordering of conv_general_dilated_patches is (C, R, R)
    patches = patches.reshape(N, Hp, Wp, C, R, R)
    return jnp.transpose(patches, (0, 1, 2, 4, 5, 3))


def unfold_flat_cm(img, R: int, stride: int):
    """Channel-major FLAT unfold via static strided slices:
    img (N, H, W, C) -> (N, C, Hp*Wp, R*R).

    Identical values to :func:`unfold` (pixel (di, dj) of patch (i, j) is
    img[:, i*stride + di, j*stride + dj]); implemented as ONE static gather
    on the flattened spatial axis instead of an identity-kernel conv. The
    conv lowering burns MXU cycles on a 99.9%-zeros dense kernel and lands in
    tiny-minor-dim layouts (measured 26-51 ms per conv-unfold inside the
    global training step's chunk loop); the gather is pure data movement into
    a (..., Hp*Wp, R*R) buffer whose minor dims tile cleanly. Note the
    gather's transpose (scatter-add) is slow - use only where no gradient
    flows through the unfold (true everywhere in the global loss: inputs are
    data or stop-gradient maps).
    """
    import numpy as np

    N, H, W, C = img.shape
    Hp = (H - R) // stride + 1
    Wp = (W - R) // stride + 1
    ii = (np.arange(Hp) * stride)[:, None, None, None] + np.arange(R)[None, None, :, None]
    jj = (np.arange(Wp) * stride)[None, :, None, None] + np.arange(R)[None, None, None, :]
    pos = (ii * W + jj).reshape(-1)                        # (L * R*R,)
    flat = jnp.moveaxis(img, -1, 1).reshape(N, C, H * W)
    out = jnp.take(flat, jnp.asarray(pos), axis=2)
    return out.reshape(N, C, Hp * Wp, R * R)


def fold_flat(patches, H: int, W: int, R: int, stride: int):
    """Overlap-add on FLAT patches: (M, Hp*Wp, R*R) -> (M, H, W).

    Exact adjoint of :func:`unfold_flat_cm` per leading row (same values as
    :func:`fold` on the corresponding gridded patches). Works directly on the
    (L, R*R)-minor layout: per patch offset it slices one minor column and
    accumulates (M, Hp, Wp) slabs, so no (.., R, R, C)-shaped temp ever
    exists - the gridded fold's accumulator picks up 42.7x TPU tile padding
    (a measured 3.45 GB HLO temp at production scale inside the global
    training step).
    """
    M, L, RR = patches.shape
    Hp = (H - R) // stride + 1
    Wp = (W - R) // stride + 1
    assert L == Hp * Wp and RR == R * R
    s = stride
    out = jnp.zeros((M, H, W), patches.dtype)
    for a in range(min(s, R)):
        for b in range(min(s, R)):
            Ka = len(range(a, R, s))
            Kb = len(range(b, R, s))
            rows = (H - 1 - a) // s + 1
            cols = (W - 1 - b) // s + 1
            acc = jnp.zeros((M, max(Hp + Ka - 1, rows), max(Wp + Kb - 1, cols)),
                            patches.dtype)
            for k in range(Ka):
                for l in range(Kb):
                    off = (a + s * k) * R + (b + s * l)
                    acc = acc.at[:, k:k + Hp, l:l + Wp].add(
                        patches[:, :, off].reshape(M, Hp, Wp))
            out = out.at[:, a::s, b::s].set(acc[:, :rows, :cols])
    return out


def fold(patches, H: int, W: int, stride: int):
    """Overlap-add of patches back into an image - exact adjoint of
    :func:`unfold` (torch.nn.Fold semantics; reference
    utils/postprocessing_loss.py:139-173).

    patches: (N, Hp, Wp, R, R, C) -> (N, H, W, C). Callers divide by
    :func:`fold_count` where mean-overlap normalization is wanted.
    """
    N, Hp, Wp, R, R2, C = patches.shape
    assert R == R2
    s = stride
    out = jnp.zeros((N, H, W, C), patches.dtype)
    for a in range(min(s, R)):
        for b in range(min(s, R)):
            # offsets di = a + s*k land on output rows y = s*(i + k) + a
            Ka = len(range(a, R, s))
            Kb = len(range(b, R, s))
            rows = (H - 1 - a) // s + 1  # sub-grid rows inside H
            cols = (W - 1 - b) // s + 1
            acc = jnp.zeros((N, max(Hp + Ka - 1, rows), max(Wp + Kb - 1, cols), C),
                            patches.dtype)
            for k in range(Ka):
                for l in range(Kb):
                    acc = acc.at[:, k:k + Hp, l:l + Wp, :].add(
                        patches[:, :, :, a + s * k, b + s * l, :])
            out = out.at[:, a::s, b::s, :].set(acc[:, :rows, :cols, :])
    return out


def fold_count(H: int, W: int, R: int, stride: int, dtype=jnp.float32):
    """Overlap count per output pixel: fold of all-ones patches (reference
    utils/postprocessing_loss.py:139-144 ``num_patches``). Shape (H, W)."""
    Hp = (H - R) // stride + 1
    Wp = (W - R) // stride + 1
    ones = jnp.ones((1, Hp, Wp, R, R, 1), dtype=dtype)
    return fold(ones, H, W, stride)[0, :, :, 0]
