"""Per-stage wall-clock breakdown of the serving path on the real chip:
local CNN over 8,192 patches | global transformer | wedge render + folds,
each as its own jitted program, plus the fused whole program - single-pair
and batched x8. Identifies where the 61.8 ms/pair (r2 bench) actually goes.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from blurry_edges_tpu import models
from blurry_edges_tpu.config import CamConfig, GridConfig, PatchConfig
from blurry_edges_tpu.eval.pipeline import (InferenceModules,
                                            make_batched_depth_estimator,
                                            make_depth_estimator)
from blurry_edges_tpu.ops import unfold
from blurry_edges_tpu.ops.dfd import DfDSolver
from blurry_edges_tpu.ops.params import denormalize_global_eval, params2etas
from blurry_edges_tpu.train.global_precal import local_tokens

print("devices:", jax.devices(), flush=True)
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

img = jax.random.uniform(key, (2, grid.H, grid.W, 3))
L, Hp, Wp, R = grid.num_tokens, grid.H_patches, grid.W_patches, grid.R


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:<42} {dt:8.2f} ms", flush=True)
    return out


# stage 1: local tokens (unfold + 8,192 CNN forwards + color solve + normalize)
s1 = jax.jit(lambda im: local_tokens(mods.local_model, mods.local_vars, im,
                                     patch_cfg, grid, False)[0])
s1p = jax.jit(lambda im: local_tokens(mods.local_model, mods.local_vars, im,
                                      patch_cfg, grid, True)[0])
tokens = timeit("local_tokens (xla colors)", s1, img)
timeit("local_tokens (pallas colors)", s1p, img)

# stage 1a: the bare CNN over the 8,192 patches
patches = jax.jit(lambda im: unfold(im, R, grid.stride).reshape(-1, R, R, 3))(img)
print("patch tensor:", patches.shape, flush=True)
cnn = jax.jit(lambda p: mods.local_model.apply(mods.local_vars, p, train=False))
timeit("bare local CNN (8192, 21, 21, 3)", cnn, patches)

# stage 2: global transformer
src = jnp.asarray(np.random.default_rng(0).normal(size=(1, L, 38)), jnp.float32)
s2 = jax.jit(lambda s: mods.global_model.apply(mods.global_vars, s, train=False))
timeit("global transformer (1, 4096, 38)", s2, src)

# stage 3: render + folds + densify threshold (from tokens)
dfd = DfDSolver.from_config(cam, patch_cfg)
from blurry_edges_tpu.eval.pipeline import fold_outputs, render_full


def stage3(est, im):
    den = denormalize_global_eval(est).reshape(1, Hp, Wp, 12)
    img_patches = unfold(im, R, grid.stride)[None]
    rend = render_full(den[..., :8], params2etas(den[..., 8:]), img_patches,
                       patch_cfg, dfd, 10.39, False)
    out = fold_outputs(rend, grid, im.dtype)
    return jnp.where(out["confidence"] > 0.05, out["global_depth"], 0.0)


est = s2(src)
s3 = jax.jit(stage3)
timeit("wedge render + folds + threshold", s3, est, img)

# whole fused programs
fn = make_depth_estimator(mods, patch_cfg, grid, cam, densify=None)
timeit("FULL single-pair", fn, img)

fb = make_batched_depth_estimator(mods, patch_cfg, grid, cam)
batch = jax.random.uniform(key, (8, 2, grid.H, grid.W, 3))
out = fb(batch)
jax.block_until_ready(out)
t0 = time.time()
for _ in range(5):
    jax.block_until_ready(fb(batch))
dt = (time.time() - t0) / 5 / 8 * 1e3
print(f"{'FULL batched x8 (per pair)':<42} {dt:8.2f} ms", flush=True)

print("DONE", flush=True)
