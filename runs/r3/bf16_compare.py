"""Measure the accuracy delta of --serve_dtype bfloat16 against float32 on a
30-pair subset of the test set (trained weights), plus per-variant timing.
Decides whether bf16 serving is safe to advertise (the speed is ~free; the
question is the depth-map delta)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.eval.pipeline import run_eval
from blurry_edges_tpu.utils.weights import load_inference_modules

N = 30
for dtype in ("float32", "bfloat16"):
    args = get_args("eval", argv=[
        "--data_path", "runs/r2/data/data_test",
        "--model_path", "runs/r3/weights",
        "--log_path", f"runs/r3/logs/bf16cmp_{dtype}",
        "--serve_dtype", dtype])
    mods = load_inference_modules(args, densify=None)
    t0 = time.time()
    m = run_eval(args, mods, visualizer=None, max_images=N)
    print(f"[{dtype}] delta1={m['delta1']:.4f} delta2={m['delta2']:.4f} "
          f"delta3={m['delta3']:.4f} rmse={m['rmse']:.4f} absrel={m['absrel']:.4f} "
          f"{m['pairs_per_sec']:.2f} pairs/s (total {time.time() - t0:.0f}s)",
          flush=True)
