"""Block-tiled big-image inference CLI (reference
blurry_edges_test_big.py:222-241 entry): 587x587 (147+4x) images, all blocks
vmapped into one jitted program."""

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.eval.pipeline_big import run_eval_big
from blurry_edges_tpu.eval.visualize import make_file_visualizer
from blurry_edges_tpu.utils.weights import load_inference_modules

if __name__ == "__main__":
    args = get_args("eval", big=True)
    modules = load_inference_modules(args, big=True)
    run_eval_big(args, modules, visualizer=make_file_visualizer(args, big=True))
