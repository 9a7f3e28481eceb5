"""Generate the 60-pair 587x587 big test set ON THE TPU (fallback for the
CPU generator runs/r3/biggen_v2.py, which needs multiple hours on this
host's single core — the jitted synth_sample chain is the same program
either way; on the chip it is seconds per sample).

Reference protocol: test_data_generator.py:168 (BIG switches the generator
to 587x587); 60 pairs instead of 200 keeps the big eval within the round's
wall clock. Writes a DONE marker so consumers never read a half-written set.

Launch only while no other TPU process is running (one chip, one client).
"""

import os
import sys

sys.path.insert(0, "/root/repo")
from blurry_edges_tpu.config import get_args
from blurry_edges_tpu.data.realistic_gen import SyntheticRealisticDataGenerator

OUT = "runs/r4/data/data_test_big_v3"
args = get_args("data_gen_test", argv=[
    "--data_path", OUT,
    "--num_sample_test", "60",
])
gen = SyntheticRealisticDataGenerator(args, big=True, source="synthetic")
gen.generate_synthetic_data()
with open(os.path.join(OUT, "DONE"), "w") as f:
    f.write("60 pairs\n")
print("big test set v3 (TPU-generated) done", flush=True)
