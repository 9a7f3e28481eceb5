"""Generate the 587x587 big test set on the host CPU while the TPU is busy
training. Forces jax onto cpu BEFORE backend init (the sitecustomize
force-registers the axon TPU plugin and overrides JAX_PLATFORMS)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")
from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.data.realistic_gen import SyntheticRealisticDataGenerator

args = get_args("data_gen_test", argv=[
    "--data_path", "runs/r3/data/data_test_big",
    "--num_sample_test", "20",
])
gen = SyntheticRealisticDataGenerator(args, big=True, source="synthetic")
gen.generate_synthetic_data()
print("big test set done", flush=True)
