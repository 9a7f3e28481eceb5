"""Crash-repro study (VERDICT r2 item #2): time each phase of one
production-scale global-training step in a fresh process, with flushed
per-phase output, to decide whether the runtime killer is compile time,
step time, the val program, or cumulative execution.

Loads only a 16-sample mmap'd slice of the production train set (the full
ShapeDataset load reads ~19 GB into RAM before any cap - itself a suspect
for marathon5's silent 55-minute stall).
"""

import os
import sys
import time

T0 = time.time()


def say(msg):
    print(f"[{time.time() - T0:8.1f}s] {msg}", flush=True)


say("python up")

import numpy as np

import jax
import jax.numpy as jnp

say(f"jax up, devices={jax.devices()}")

sys.path.insert(0, "/root/repo")
from blurry_edges_tpu.config import cam_from_args, get_args, grid_from_args, patch_from_args
from blurry_edges_tpu.models import GlobalStage
from blurry_edges_tpu.ops.dfd import DfDSolver
from blurry_edges_tpu.train import schedules
from blurry_edges_tpu.train.global_ import (gamma_ranges_from_args, gammas_to_array,
                                            init_state, make_step_fns)
from blurry_edges_tpu.utils.seeding import set_seed

DATA = "/root/repo/runs/r2/data/data_train_val"
NS = 16
BATCH = 8

args = get_args("global_train", argv=["--data_path", DATA])
patch_cfg = patch_from_args(args)
grid = grid_from_args(args)
dfd = DfDSolver.from_config(cam_from_args(args), patch_cfg)
say(f"config: grid {grid.H_patches}x{grid.W_patches} R={grid.R}")

mm = lambda n: np.load(f"{DATA}/{n}_train.npy", mmap_mode="r")
alpha = np.asarray(mm("alphas")[:NS]).astype(np.float32)
a_im = alpha.reshape(-1, 1, 1, 1, 1)
img_gt = np.asarray(mm("images_gt")[:NS]).astype(np.float32) / a_im
compact = {
    "input_param": np.asarray(mm("params_src")[:NS]).astype(np.float32),
    "imgs_u8": np.round(img_gt * 255.0).astype(np.uint8),
    "bndry_dist": np.asarray(mm("boundary_distances")[:NS]).astype(np.uint16),
    "bndry_depth": np.asarray(mm("boundary_depths")[:NS]).astype(np.float32),
}
say(f"host slice built: {sum(v.nbytes for v in compact.values())/1e6:.0f} MB")

t = time.time()
data = {k: jnp.asarray(v, dtype=jnp.bfloat16 if k == "input_param" else None)
        for k, v in compact.items()}
jax.block_until_ready(data)
say(f"device transfer: {time.time() - t:.2f}s")

key = set_seed(1898, deterministic=True)
attn_impl = os.environ.get("BE_ATTN", "xla")
say(f"attn_impl={attn_impl}")
model = GlobalStage(in_parameter_size=args.input_size,
                    out_parameter_size=args.output_size, attn_impl=attn_impl)
t = time.time()
state, tx = init_state(model, key, args.learning_rate, grid.num_tokens)
jax.block_until_ready(state.params)
say(f"init_state: {time.time() - t:.2f}s")

grad_accum = BATCH // 2
tstep, estep = make_step_fns(model, tx, patch_cfg, grid, dfd, grad_accum)

import functools


@functools.partial(jax.jit, donate_argnums=0)
def device_step(state, data, idx, gammas, dkey):
    batch = {k: v[idx] for k, v in data.items()}
    return tstep(state, batch, gammas, dkey)


ranges = gamma_ranges_from_args(args)
gammas = gammas_to_array(schedules.gamma_schedule(0, args.dynamic_epoch, ranges))

say("lowering + compiling device_step ...")
t = time.time()
idx = jnp.arange(BATCH)
lowered = device_step.lower(state, data, idx, gammas, key)
say(f"  lower: {time.time() - t:.2f}s")
t = time.time()
compiled = lowered.compile()
say(f"  compile: {time.time() - t:.2f}s")
mem = compiled.memory_analysis()
say(f"  memory: args {mem.argument_size_in_bytes/1e9:.2f} GB, "
    f"temp {mem.temp_size_in_bytes/1e9:.2f} GB, "
    f"output {mem.output_size_in_bytes/1e9:.2f} GB")

for b in range(10):
    key, kd = jax.random.split(key)
    idx = jnp.asarray(np.random.default_rng(b).permutation(NS)[:BATCH])
    t = time.time()
    state, loss = device_step(state, data, idx, gammas, kd)
    jax.block_until_ready(loss)
    say(f"step {b}: {time.time() - t:.3f}s loss={float(loss):.5f}")

# val program: needs img_ny
ny_u8 = np.round(np.asarray(mm("images_ny")[:NS])).astype(np.uint8)
val_batch = {k: jnp.asarray(v) for k, v in compact.items()}
val_batch["ny_u8"] = jnp.asarray(ny_u8)
val_batch["alpha"] = jnp.asarray(alpha)
val_batch = {k: (v[:BATCH] if k != "input_param" else v[:BATCH]) for k, v in val_batch.items()}

final_g = gammas_to_array(schedules.final_gamma(ranges))
eval_jit = jax.jit(estep)
say("compiling eval_step ...")
t = time.time()
l = eval_jit(state, val_batch, final_g)
jax.block_until_ready(l)
say(f"eval compile+first: {time.time() - t:.2f}s loss={float(l):.5f}")
for b in range(3):
    t = time.time()
    l = eval_jit(state, val_batch, final_g)
    jax.block_until_ready(l)
    say(f"eval {b}: {time.time() - t:.3f}s")

say("DONE")
