"""Inference / evaluation CLI (reference blurry_edges_test.py:174-203 entry):
per-pair depth estimation with optional densification (--densify w|pp),
metrics, timing, and the 10-panel visualization."""

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.eval.pipeline import run_eval
from blurry_edges_tpu.eval.visualize import make_file_visualizer
from blurry_edges_tpu.utils.weights import load_inference_modules

if __name__ == "__main__":
    args = get_args("eval")
    modules = load_inference_modules(args, densify=args.densify)
    run_eval(args, modules, visualizer=make_file_visualizer(args))
