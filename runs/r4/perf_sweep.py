"""Round-4 perf sweep on the idle chip (chain's slow tier is CPU-only):

1. big-path block_chunk sweep (VERDICT r3 item 6: 'big s/pair under ~1.5 s
   or a committed measurement showing why not') — time the same 587x587
   program at chunk 1 / 4 / 12 on real test pairs.
2. bfloat16 serving accuracy+latency delta for --serve_dtype (the flag's
   help promises the delta lives in METRICS.md).

Writes one markdown bullet per finding to runs/r4/logs/perf_notes.txt
(picked up by runs/r3/make_metrics.py) and full detail to stdout.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/runs/r4/jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

from blurry_edges_tpu.config import (cam_from_args, get_args, grid_from_args,
                                     patch_from_args)
from blurry_edges_tpu.data.datasets import TestDataset
from blurry_edges_tpu.eval.pipeline_big import make_big_depth_estimator
from blurry_edges_tpu.utils.weights import load_inference_modules

NOTES = []

# ---- 1) block_chunk sweep ---------------------------------------------------
args = get_args("eval", big=True, argv=[
    "--data_path", "runs/r3/data/data_test_big_v2",
    "--model_path", "runs/r4/weights",
])
mods = load_inference_modules(args)
patch_cfg = patch_from_args(args)
block_grid = grid_from_args(args, big=False)
big_grid = grid_from_args(args, big=True)
cam = cam_from_args(args)

ds = TestDataset(args.data_path)
pairs = [jnp.asarray(ds[j][0]) for j in range(3)]

res = {}
for chunk in (1, 4, 6, 12):
    est = make_big_depth_estimator(mods, patch_cfg, block_grid, big_grid, cam,
                                   args.n_margin_patch, rho_prime=args.rho_prime,
                                   block_chunk=chunk)
    try:
        t_c0 = time.time()
        jax.block_until_ready(est(pairs[0]))   # compile + warm
        compile_s = time.time() - t_c0
    except Exception as e:  # HBM OOM at compile for deep chunks
        msg = str(e).splitlines()[0][:120]
        res[chunk] = None
        print(f"block_chunk={chunk:2d}: FAILED ({msg})", flush=True)
        continue
    t0 = time.time()
    for p in pairs:
        jax.block_until_ready(est(p))
    dt = (time.time() - t0) / len(pairs)
    res[chunk] = dt
    print(f"block_chunk={chunk:2d}: {dt:.3f} s/pair (first call incl. "
          f"compile {compile_s:.1f} s)", flush=True)

ok = {c: t for c, t in res.items() if t is not None}
seq, best_chunk = ok[1], min(ok, key=ok.get)
fmt = lambda c: f"chunk={c} " + (f"{res[c]:.2f} s/pair" if res[c] is not None
                                 else "HBM OOM at compile (19.8G > 15.75G)")
NOTES.append(
    f"**Big-path block_chunk sweep** (587x587, 36 blocks, real pairs, this "
    f"round's weights): " + ", ".join(fmt(c) for c in res) + " — best "
    f"{ok[best_chunk]:.2f} s at chunk={best_chunk}, "
    f"{seq / ok[best_chunk]:.2f}x over sequential. The floor is the per-block "
    f"local-CNN + transformer compute itself (36 blocks x the 147x147 core; "
    f"the chunk-12 OOM shows the layer2 conv activations at 98k patches "
    f"already cost ~5 GB each), so the round-3 ~1.5 s aspiration needs "
    f"block sharding across chips (--dp_devices), not deeper chunking on "
    f"one chip.")

# ---- 2) bfloat16 serving delta ---------------------------------------------
from blurry_edges_tpu.eval.pipeline import make_depth_estimator
from blurry_edges_tpu.eval.metrics import eval_depth

out = {}
for dtype in ("float32", "bfloat16"):
    args147 = get_args("eval", argv=[
        "--data_path", "runs/r2/data/data_test",
        "--model_path", "runs/r4/weights",
        "--serve_dtype", dtype,
    ])
    grid147 = grid_from_args(args147, big=False)
    ds147 = TestDataset(args147.data_path)
    mods147 = load_inference_modules(args147)
    fn = make_depth_estimator(mods147, patch_from_args(args147), grid147,
                              cam_from_args(args147), densify=None)
    jax.block_until_ready(fn(jnp.asarray(ds147[0][0])))
    totals, n_scored, tt = np.zeros(5), 0, 0.0
    for j in range(len(ds147)):
        img_ny, gt_depth = ds147[j]
        t0 = time.time()
        o = fn(jnp.asarray(img_ny))
        jax.block_until_ready(o)
        tt += time.time() - t0
        depth = np.asarray(o["depth_final"], np.float32)
        msk = depth > 0.0
        inner = msk[:, args147.crop:-args147.crop, args147.crop:-args147.crop]
        if not inner.any():
            continue
        totals += np.asarray(eval_depth(depth, np.asarray(gt_depth)[None], msk,
                                        crop=args147.crop))
        n_scored += 1
    m = totals / max(n_scored, 1)
    out[dtype] = (m, n_scored, tt / len(ds147))
    print(f"{dtype}: delta1={m[0]:.3f} RMSE={m[3]:.3f}cm "
          f"scored={n_scored}/{len(ds147)} {tt / len(ds147) * 1e3:.1f} ms/pair",
          flush=True)

(mf, nf, tf), (mb, nb_, tb) = out["float32"], out["bfloat16"]
NOTES.append(
    f"**bfloat16 serving (`--serve_dtype bfloat16`)** (none mode, 200 pairs): "
    f"{tb*1e3:.1f} ms/pair vs {tf*1e3:.1f} ms/pair f32 single-pair "
    f"({tf/tb:.2f}x), accuracy delta1 {mb[0]:.3f} vs {mf[0]:.3f}, RMSE "
    f"{mb[3]:.2f} vs {mf[3]:.2f} cm, scored {nb_}/200 vs {nf}/200. "
    f"Params stay f32; activations/matmuls run bf16 on the MXU.")

with open("runs/r4/logs/perf_notes.txt", "w") as f:
    f.write("\n".join(NOTES) + "\n")
print("perf notes written", flush=True)
