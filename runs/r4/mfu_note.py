"""One-line MFU / compute-utilization estimate for the serving path
(VERDICT r3 item 4: a compute-util note in METRICS.md).

Method: build the exact single-pair timed-region program (the reference's
blurry_edges_test.py:118-145 region, ours is one jitted function -
eval/pipeline.py make_depth_estimator), lower + compile it on the CPU
backend, and sum XLA's algebraic FLOP count from compiled.cost_analysis().
FLOPs are a property of the HLO, not the backend, so this runs without
touching the (busy) TPU. MFU = flops / measured_s_per_pair / peak_flops.

Usage:  JAX_PLATFORMS=cpu python runs/r4/mfu_note.py [measured_s_per_pair]
(default reads single-pair latency from runs/r4/logs/bench.json)
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from blurry_edges_tpu import models
from blurry_edges_tpu.config import CamConfig, GridConfig, PatchConfig
from blurry_edges_tpu.eval.pipeline import (InferenceModules,
                                            make_depth_estimator)

# v5e peak: 197 TFLOP/s bf16 (MXU); the serving path runs f32 by default,
# which the MXU executes at reduced rate - quote MFU against the bf16 peak
# (the conservative convention) and say so.
V5E_PEAK_BF16 = 197e12

key = jax.random.PRNGKey(0)
grid = GridConfig()
patch_cfg = PatchConfig()
cam = CamConfig()

local = models.LocalStage()
glob = models.GlobalStage()
mods = InferenceModules(
    local_model=local, local_vars=local.init(key, jnp.zeros((1, 21, 21, 3))),
    global_model=glob,
    global_vars=glob.init(key, jnp.zeros((1, grid.num_tokens, 38))))

fn = make_depth_estimator(mods, patch_cfg, grid, cam, densify=None)
img = jax.random.uniform(key, (2, grid.H, grid.W, 3))
compiled = jax.jit(fn).lower(img).compile()
ca = compiled.cost_analysis()
if isinstance(ca, (list, tuple)):
    ca = ca[0]
flops = float(ca.get("flops", 0.0))

if len(sys.argv) > 1:
    s_per_pair = float(sys.argv[1])
    src = "argv"
else:
    with open("runs/r4/logs/bench.json") as f:
        bench = json.load(f)
    # bench.py prints one JSON line: value = pairs/s for the single-pair row
    s_per_pair = 1.0 / float(bench["value"])
    src = "bench.json"

tflops = flops / 1e12
achieved = flops / s_per_pair
print(f"timed-region FLOPs (XLA cost_analysis): {tflops:.3f} TFLOP/pair")
print(f"measured latency ({src}): {s_per_pair*1e3:.1f} ms/pair "
      f"-> {achieved/1e12:.2f} TFLOP/s achieved")
print(f"MFU vs v5e 197 TFLOP/s bf16 peak: {achieved/V5E_PEAK_BF16*100:.2f}%")
print("note: serving math is f32; the wedge/fold stages are "
      "bandwidth/transcendental-bound (erf), so MXU-peak MFU understates "
      "hardware efficiency for this program.")

# one-line form for METRICS.md (picked up by runs/r3/make_metrics.py)
note = (
    f"**Compute utilization (serving path)**: {tflops:.3f} TFLOP/pair "
    f"(XLA cost_analysis on the exact timed-region program) at "
    f"{s_per_pair*1e3:.1f} ms/pair measured -> {achieved/1e12:.2f} TFLOP/s "
    f"achieved = {achieved/V5E_PEAK_BF16*100:.2f}% of the v5e 197 TFLOP/s "
    f"bf16 MXU peak. The serving math is f32 and the wedge/fold stages are "
    f"HBM-bandwidth/transcendental-bound (erf), so MXU-peak MFU understates "
    f"hardware efficiency for this program; the FLOP count itself is tiny — "
    f"latency, not FLOPs, is the serving metric (see bench artifact).")
with open("runs/r4/logs/mfu.txt", "w") as f:
    f.write(note + "\n")
