"""Binary morphology on-device: dilation and the iterated-dilation (BFS)
distance transform.

The reference uses scipy.ndimage.binary_dilation with 4- and 8-connected
structuring elements (train_val_data_generator.py:77-78, 98-109, 238-250,
generate_binary_structure(2,1) = cross, (2,2) = full 3x3). Here dilation is a
max-pool with the matching footprint and the distance transform is a
lax.while_loop, both jittable and vmappable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def dilate_cross(mask):
    """One 4-connected binary dilation (scipy generate_binary_structure(2,1)).
    mask: (..., H, W) bool."""
    m = mask
    up = jnp.pad(m[..., 1:, :], [(0, 0)] * (m.ndim - 2) + [(0, 1), (0, 0)])
    dn = jnp.pad(m[..., :-1, :], [(0, 0)] * (m.ndim - 2) + [(1, 0), (0, 0)])
    lf = jnp.pad(m[..., :, 1:], [(0, 0)] * (m.ndim - 2) + [(0, 0), (0, 1)])
    rt = jnp.pad(m[..., :, :-1], [(0, 0)] * (m.ndim - 2) + [(0, 0), (1, 0)])
    return m | up | dn | lf | rt


def dilate_full(mask):
    """One 8-connected binary dilation (scipy generate_binary_structure(2,2)).
    mask: (..., H, W) bool."""
    H, W = mask.shape[-2:]
    x = mask.reshape((-1, H, W)).astype(jnp.float32)
    out = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3), (1, 1, 1),
                            [(0, 0), (1, 1), (1, 1)])
    return (out > 0).reshape(mask.shape)


def dilate_full_n(mask, n: int):
    """n iterations of 8-connected dilation (== one dilation with a
    (2n+1)^2 square footprint, done as a single max-pool)."""
    H, W = mask.shape[-2:]
    x = mask.reshape((-1, H, W)).astype(jnp.float32)
    k = 2 * n + 1
    out = lax.reduce_window(x, -jnp.inf, lax.max, (1, k, k), (1, 1, 1),
                            [(0, 0), (n, n), (n, n)])
    return (out > 0).reshape(mask.shape)


def distance_transform_l1(boundary_mask, max_iters: int):
    """BFS (city-block / L1) distance to the boundary set via iterated
    4-connected dilation (reference train_val_data_generator.py:98-109,
    238-250): boundary pixels get 0, each dilation ring k gets distance k.
    If the mask is empty, the whole map is +1 (the reference's
    ``dist_blank *= -1`` fallback).

    boundary_mask: (H, W) bool -> (H, W) float32.
    """
    dist0 = jnp.where(boundary_mask, 0.0, -1.0)

    def cond(state):
        k, dist, _ = state
        return jnp.any(dist == -1.0) & (k < max_iters)

    def body(state):
        k, dist, front = state
        new_front = dilate_cross(front)
        dist = jnp.where(new_front & (dist == -1.0), k + 1.0, dist)
        return k + 1.0, dist, new_front

    _, dist, _ = lax.while_loop(cond, body, (0.0, dist0, boundary_mask))
    has_any = jnp.any(boundary_mask)
    return jnp.where(has_any, dist, 1.0)
