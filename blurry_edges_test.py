"""Inference / evaluation CLI (reference blurry_edges_test.py:174-203 entry):
per-pair depth estimation with optional densification (--densify w|pp),
metrics, timing, and the 10-panel visualization. Pass --profile to capture a
jax.profiler trace of the timed loop into <log_path>/trace."""

import sys

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.eval.pipeline import run_eval
from blurry_edges_tpu.eval.visualize import make_file_visualizer
from blurry_edges_tpu.utils.weights import load_inference_modules

if __name__ == "__main__":
    profile = "--profile" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--profile"]
    args = get_args("eval", argv=argv)
    modules = load_inference_modules(args, densify=args.densify)
    run_eval(args, modules, visualizer=make_file_visualizer(args),
             profile_dir=f"{args.log_path}/trace" if profile else None)
