"""Device mesh + sharding helpers.

The reference is single-device (SURVEY.md section 2.2: no torch.distributed /
DDP / NCCL anywhere); the TPU-native scaling story is SPMD over a
jax.sharding.Mesh. The primary axis is ``data``: batches of image pairs (and
the 8,192-patch axis inside a pair folds into it via vmapped pipelines). The
models are small (1-31 M params) so parameters stay replicated; XLA inserts
the gradient psum over ICI automatically when a jitted train step consumes a
data-sharded batch with replicated params.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.array(devices[:n]), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for batches."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Put a host batch (dict or array) on the mesh, sharded on axis 0."""
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a parameter tree across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
