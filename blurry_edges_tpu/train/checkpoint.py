"""Checkpointing via orbax: best-val model snapshots (the reference saves bare
torch state_dicts, local_training.py:115-118) plus full train-state save /
resume, which the reference lacks (SURVEY.md section 5.3-5.4)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any) -> None:
    """Save an arbitrary pytree (params / batch_stats / opt_state / counters)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, tree), force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=jax.tree.map(np.asarray, target))
    return ckptr.restore(path)


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(os.path.abspath(path))
