"""Densifier training driver (BE_DENSIFY_ROOT selects the round dir): pipeline-sourced sparse maps when the
trained global stage exists (the faithful mode, reference
blurry_edges_test.py:193-198 consumption), simulated fallback otherwise, with
time-boxed epochs suitable for the single-chip budget.

Round-4b extension: the pipeline-sourced set is mixed with freshly-seeded
realistic-generator scenes (same generator as the eval protocol's test set,
reference test_data_generator.py:123-133, different PRNG stream) so the UNet
sees planar depth ramps, not only the shape set's piecewise-constant depths —
the round-4 pp row trailed 'w' (RMSE 15.8 vs 10.2 cm) exactly because of that
domain gap. The sets are generated here (TPU, jitted synth chain) if missing.
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.train.densify import run_densify_training

ROOT = os.environ.get("BE_DENSIFY_ROOT", "runs/r3")
W = f"{ROOT}/weights"
args = get_args("local_train", argv=[
    "--data_path", "runs/r2/data/data_train_val",
    "--log_path", f"{ROOT}/logs",
    "--model_path", W,
])

modules = None
source = "simulated"
realistic_dirs = None
if os.path.isdir(f"{W}/best_run_exp_global_stage"):
    from blurry_edges_tpu.utils.weights import load_inference_modules

    modules = load_inference_modules(args)
    source = "pipeline"

    # freshly-seeded realistic scenes for the ramp-depth domain (seeds far
    # from the test set's 1869 stream; geometry/optics/noise identical)
    from blurry_edges_tpu.data.realistic_gen import SyntheticRealisticDataGenerator

    realistic_dirs = (f"{ROOT}/data/data_densify_train",
                      f"{ROOT}/data/data_densify_val")
    for d, n, seed in zip(realistic_dirs, (500, 80), (7000, 7100)):
        if os.path.exists(f"{d}/alphas.npy"):
            continue
        print(f"generating densify realistic set {d} ({n} pairs)", flush=True)
        gargs = get_args("data_gen_test", argv=[
            "--data_path", d, "--num_sample_test", str(n)])
        SyntheticRealisticDataGenerator(
            gargs, big=False, source="synthetic", seed=seed
        ).generate_synthetic_data()
print(f"densifier source = {source} realistic_dirs = {realistic_dirs}", flush=True)
try:
    run_densify_training(args, epochs=60, batch_size=8, source=source,
                         modules=modules, max_samples=(1500, 300),
                         realistic_dirs=realistic_dirs)
except Exception as e:
    if source != "pipeline":
        raise
    # a pp checkpoint must exist regardless: fall back to the self-contained
    # simulated sparsity mode (train/densify.py docstring)
    print(f"pipeline-sourced densify failed ({type(e).__name__}: {e}); "
          f"falling back to simulated", flush=True)
    source = "simulated"
    run_densify_training(args, epochs=60, batch_size=8, source="simulated",
                         modules=None, max_samples=(1500, 300))

# record which mode produced the checkpoint so the post-train chain can tell a
# simulated fallback apart from the faithful pipeline-sourced product and
# retrain once the trained global stage exists
with open(f"{W}/pp_source.txt", "w") as f:
    f.write(source + "\n")
