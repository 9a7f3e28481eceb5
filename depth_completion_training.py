"""Depth-completion (densify 'pp') U-Net training CLI - a capability the
reference lacks (it ships only pretrained weights; SURVEY.md C11)."""

import sys

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.train.densify import run_densify_training

if __name__ == "__main__":
    source = "pipeline" if "--pipeline" in sys.argv else "simulated"
    argv = [a for a in sys.argv[1:] if a != "--pipeline"]
    args = get_args("local_train", argv=argv)  # reuses data/log/model path flags
    args.data_path = args.data_path.replace("/patches", "")
    modules = None
    max_samples = None
    if source == "pipeline":
        from blurry_edges_tpu.utils.weights import load_inference_modules
        modules = load_inference_modules(args)
        # one full three-stage inference per sparse map: cap the set so
        # sparse-map generation stays bounded
        max_samples = (1500, 300)
    run_densify_training(args, source=source, modules=modules,
                         max_samples=max_samples)
