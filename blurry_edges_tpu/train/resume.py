"""Periodic full-train-state snapshots + resume.

The reference keeps only best-val model weights - a crash loses all optimizer
and scheduler state and restarts from scratch (SURVEY.md section 5.3-5.4).
Here every training harness can snapshot {params, batch_stats, opt_state,
epoch, scheduler, best} and resume exactly where it stopped.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax

from .checkpoint import checkpoint_exists, load_checkpoint, save_checkpoint
from .schedules import PlateauScheduler


def save_train_snapshot(path: str, state, epoch: int, sched: PlateauScheduler,
                        best_loss: float, best_epoch: int) -> None:
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "counters": {
            "step": state.step,
            "epoch": np.int64(epoch),
            "best_loss": np.float64(best_loss),
            "best_epoch": np.int64(best_epoch),
        },
        "sched": {k: np.float64(v) for k, v in dataclasses.asdict(sched).items()},
    }
    save_checkpoint(path, tree)


def save_step_snapshot(path: str, state, sched: PlateauScheduler, *,
                       epoch: int, step: int, loss_sum: float, loss_count: int,
                       best_loss: float, best_epoch: int) -> None:
    """Step-granular snapshot: resumes MID-epoch at (epoch, step) with the
    running train-loss accumulator, so a runtime kill costs at most
    ``snapshot_steps`` optimizer steps (round-2 failure mode: every marathon
    died mid-epoch and epoch-granular snapshots never fired)."""
    tree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "mid": {
            "step_total": state.step,
            "epoch": np.int64(epoch),
            "step": np.int64(step),
            "loss_sum": np.float64(loss_sum),
            "loss_count": np.int64(loss_count),
            "best_loss": np.float64(best_loss),
            "best_epoch": np.int64(best_epoch),
        },
        "sched": {k: np.float64(v) for k, v in dataclasses.asdict(sched).items()},
    }
    save_checkpoint(path, tree)


def load_step_snapshot(path: str, state, sched: PlateauScheduler):
    """Restore (state, sched, mid-dict) from a step snapshot, or None.

    A snapshot written by the older epoch-granular ``save_train_snapshot``
    (tree keyed 'counters', no 'mid') at the same path must not brick a
    supervisor retry loop with an orbax tree-mismatch error - fall back to
    None (fresh start) with a loud warning instead."""
    if not checkpoint_exists(path):
        return None
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "mid": {"step_total": np.asarray(state.step), "epoch": np.int64(0),
                "step": np.int64(0), "loss_sum": np.float64(0),
                "loss_count": np.int64(0), "best_loss": np.float64(0),
                "best_epoch": np.int64(0)},
        "sched": {k: np.float64(v) for k, v in dataclasses.asdict(sched).items()},
    }
    try:
        tree = load_checkpoint(path, target=target)
    except Exception as exc:  # orbax raises backend-specific tree errors
        import sys
        print(f"WARNING: step snapshot at {path} does not match the mid-epoch "
              f"format (old epoch-granular snapshot?); starting fresh: {exc}",
              file=sys.stderr, flush=True)
        return None
    state = state.replace(
        params=jax.tree.map(jax.numpy.asarray, tree["params"]),
        batch_stats=jax.tree.map(jax.numpy.asarray, tree["batch_stats"]),
        opt_state=jax.tree.map(jax.numpy.asarray, tree["opt_state"]),
        step=jax.numpy.asarray(tree["mid"]["step_total"]))
    sd = tree["sched"]
    sched = PlateauScheduler(lr=float(sd["lr"]), factor=float(sd["factor"]),
                             patience=int(sd["patience"]), min_lr=float(sd["min_lr"]),
                             threshold=float(sd["threshold"]), best=float(sd["best"]),
                             num_bad=int(sd["num_bad"]))
    mid = {k: (float(v) if k in ("loss_sum", "best_loss") else int(v))
           for k, v in tree["mid"].items() if k != "step_total"}
    return state, sched, mid


def load_train_snapshot(path: str, state, sched: PlateauScheduler
                        ) -> Optional[Tuple[object, int, PlateauScheduler, float, int]]:
    """Restore (state, next_epoch, sched, best_loss, best_epoch), or None if
    no snapshot exists. ``state``/``sched`` supply the tree structure."""
    if not checkpoint_exists(path):
        return None
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "counters": {"step": np.asarray(state.step), "epoch": np.int64(0),
                     "best_loss": np.float64(0), "best_epoch": np.int64(0)},
        "sched": {k: np.float64(v) for k, v in dataclasses.asdict(sched).items()},
    }
    tree = load_checkpoint(path, target=target)
    state = state.replace(
        params=jax.tree.map(jax.numpy.asarray, tree["params"]),
        batch_stats=jax.tree.map(jax.numpy.asarray, tree["batch_stats"]),
        opt_state=jax.tree.map(jax.numpy.asarray, tree["opt_state"]),
        step=jax.numpy.asarray(tree["counters"]["step"]))
    sd = tree["sched"]
    sched = PlateauScheduler(lr=float(sd["lr"]), factor=float(sd["factor"]),
                             patience=int(sd["patience"]), min_lr=float(sd["min_lr"]),
                             threshold=float(sd["threshold"]), best=float(sd["best"]),
                             num_bad=int(sd["num_bad"]))
    return (state, int(tree["counters"]["epoch"]) + 1, sched,
            float(tree["counters"]["best_loss"]), int(tree["counters"]["best_epoch"]))
