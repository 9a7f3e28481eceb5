"""Generate a 60-pair 587x587 big test set on the host CPU (the reference
protocol uses 200 test pairs, utils/args.py:70; the round-3 set had 20).
Writes a DONE marker so consumers never read a half-written set."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.data.realistic_gen import SyntheticRealisticDataGenerator

OUT = "runs/r3/data/data_test_big_v2"
args = get_args("data_gen_test", argv=[
    "--data_path", OUT,
    "--num_sample_test", "60",
])
gen = SyntheticRealisticDataGenerator(args, big=True, source="synthetic")
gen.generate_synthetic_data()
with open(os.path.join(OUT, "DONE"), "w") as f:
    f.write("60 pairs\n")
print("big test set v2 done", flush=True)
