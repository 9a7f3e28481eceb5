"""Determinism helpers.

The reference seeds python/numpy/torch and flips cuDNN/cuBLAS determinism
switches (reference utils/util_func.py:8-21). In JAX, computations are
deterministic by construction given explicit PRNG keys; this module only
centralizes key derivation and host-side RNG seeding for the data pipeline.
"""

from __future__ import annotations

import os
import random

import numpy as np

import jax


def set_seed(seed: int, deterministic: bool = False) -> jax.Array:
    """Seed host-side RNGs and return the root JAX PRNG key.

    ``deterministic`` is accepted for parity with the reference signature; JAX
    on TPU is already run-to-run deterministic for a fixed program + key.
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    del deterministic
    return jax.random.PRNGKey(seed)
