"""Round-5 densifier training driver (VERDICT r4 item 3: make 'pp' the best
mode, as it is in the reference).

Changes vs the round-4 recipe (runs/r3/train_densify.py):

* 2x the realistic ramp-depth training pairs (1000 vs 500) - the eval
  protocol's scenes are planar ramps (reference test_data_generator.py:
  123-133) and ramp extrapolation is exactly where the UNet trailed.
* The realistic VALIDATION split is PARAMETER-SHIFTED (Z_range [0.78, 1.15],
  alpha [150, 178] vs the protocol's [0.75, 1.18] / [180, 200], fresh seed):
  best-checkpoint selection now prefers weights that generalize beyond the
  exact test parameter draw, addressing the round-4 advisor's medium finding
  that pp was tuned to the test-scene distribution.
* Gradient-matching loss term (w=0.1) - penalizes the ramp-flattening failure
  mode directly (see blurry_edges_tpu/train/densify.py:grad_matching).
* Random flip augmentation (task is flip-equivariant).
* Longer schedule (90 epochs; the supervisor's timeout still bounds it - the
  best-val checkpoint is saved as it improves, so a timeout keeps the best).

pp_source.txt records the exact provenance string the METRICS builder keys on
(round-4 advisor low finding: provenance must come from what actually trained
the checkpoint, not from directory existence).
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.train.densify import run_densify_training

ROOT = os.environ.get("BE_DENSIFY_ROOT", "runs/r5")
W = os.environ.get("BE_DENSIFY_WEIGHTS", f"{ROOT}/weights")
args = get_args("local_train", argv=[
    "--data_path", "runs/r2/data/data_train_val",
    "--log_path", f"{ROOT}/logs",
    "--model_path", W,
])

modules = None
source = "simulated"
realistic_dirs = None
if os.path.isdir(f"{W}/best_run_exp_global_stage"):
    from blurry_edges_tpu.data.realistic_gen import SyntheticRealisticDataGenerator
    from blurry_edges_tpu.utils.weights import load_inference_modules

    modules = load_inference_modules(args)
    source = "pipeline+realistic"

    realistic_dirs = (f"{ROOT}/data/data_densify_train",
                      f"{ROOT}/data/data_densify_val_shifted")
    specs = [
        # (dir, n, seed, Z_range, alpha) - train matches the protocol ranges
        # (fresh PRNG stream far from the test set's 1869); val is shifted
        (realistic_dirs[0], 1000, 9000, (0.75, 1.18), (180, 200)),
        (realistic_dirs[1], 150, 9100, (0.78, 1.15), (150, 178)),
    ]
    for d, n, seed, zr, al in specs:
        if os.path.exists(f"{d}/alphas.npy"):
            continue
        print(f"generating densify realistic set {d} ({n} pairs, Z={zr}, "
              f"alpha={al})", flush=True)
        gargs = get_args("data_gen_test", argv=[
            "--data_path", d, "--num_sample_test", str(n),
            "--Z_range", str(zr[0]), str(zr[1]),
            "--alpha", str(al[0]), str(al[1])])
        SyntheticRealisticDataGenerator(
            gargs, big=False, source="synthetic", seed=seed
        ).generate_synthetic_data()

print(f"densifier source = {source} realistic_dirs = {realistic_dirs}",
      flush=True)


def record_source(s):
    """Written BEFORE training starts (and rewritten by the fallback), so a
    supervisor timeout-kill still leaves accurate provenance for the
    best-so-far checkpoint the run produced up to that point."""
    os.makedirs(W, exist_ok=True)
    with open(f"{W}/pp_source.txt", "w") as f:
        f.write(s + "\n")


record_source(source)
try:
    run_densify_training(args, epochs=90, batch_size=8,
                         source="pipeline" if modules else "simulated",
                         modules=modules, max_samples=(2000, 300),
                         realistic_dirs=realistic_dirs,
                         grad_loss_w=0.1, augment=True)
except Exception as e:
    if modules is None:
        raise
    print(f"pipeline-sourced densify failed ({type(e).__name__}: {e}); "
          f"falling back to simulated", flush=True)
    source = "simulated"
    record_source(source)
    run_densify_training(args, epochs=60, batch_size=8, source="simulated",
                         modules=None, max_samples=(1500, 300))
