"""Assemble METRICS.md from the round-5 eval logs.

Round-5 fixes over runs/r3/make_metrics.py (VERDICT r4 'what's weak' 1/5/6 +
advisor findings):
* pp provenance is keyed on pp_source.txt - what actually trained the
  committed checkpoint - not on directory existence (advisor low #2);
* per-row weight provenance comes from blessed.json written by the supervisor
  at blessing time, so every row names the checkpoint that produced it;
* a common-basis pp-vs-none comparison computed from the per-image log lines
  (the none row scores only its confident sparse pixels on its non-empty
  images; pp scores every pixel of every image - the dataset averages are
  not directly comparable without this);
* perf notes are read from perf_notes.txt (re-measured this round), replacing
  the stale round-3 Pallas/bf16 claims.
"""

import json
import os
import re
import sys

LOGS = os.environ.get("BE_METRICS_LOGS", "/root/repo/runs/r5/logs")
ROUND = os.environ.get("BE_METRICS_ROUND", "5")
WEIGHTS = os.environ.get("BE_METRICS_WEIGHTS", "/root/repo/pretrained_weights")
OUT = "/root/repo/METRICS.md"

ROW = re.compile(
    r"Average metrics for whole dataset: delta1 =\s*([\d.nan-]+), "
    r"delta2 =\s*([\d.nan-]+), delta3 =\s*([\d.nan-]+), "
    r"RMSE =\s*([\d.nan-]+) cm, AbsRel =\s*([\d.nan-]+) cm")
TIME = re.compile(r"Average running time:\s*([\d.]+) s")
EMPTY = re.compile(r"(\d+)/(\d+) images had empty predictions")
PER_IMG = re.compile(
    r"Image pair #(\d+): delta1 =\s*([\d.-]+), delta2 =\s*([\d.-]+), "
    r"delta3 =\s*([\d.-]+), RMSE =\s*([\d.-]+) cm, AbsRel =\s*([\d.-]+) cm")


def parse(path):
    if not os.path.exists(path):
        return None
    text = open(path).read()
    m = ROW.search(text)
    t = TIME.search(text)
    if not m:
        return None
    e = EMPTY.search(text)
    excluded = (int(e.group(1)), int(e.group(2))) if e else (0, 0)
    all_empty = e is not None and e.group(1) == e.group(2)
    vals = [float(x) for x in m.groups()]
    n_pairs = len(re.findall(r"Image pair #\d+", text))
    return (vals + [float(t.group(1)) if t else float("nan")], all_empty,
            excluded, n_pairs)


def per_image(path):
    """{image_index: (d1, d2, d3, rmse, absrel)} for scored images only."""
    if not os.path.exists(path):
        return {}
    out = {}
    for m in PER_IMG.finditer(open(path).read()):
        out[int(m.group(1))] = tuple(float(m.group(i)) for i in range(2, 7))
    return out


# Per-row log resolution: first existing path wins. The round-5 restart
# window could not re-measure rows whose inputs are unchanged (byte-identical
# weights + seed-regenerated data), so those rows fall back to the round-4
# logs that measured them; the big row falls back to the round-5 isolation
# run, which used exactly the weights now blessed as
# pretrained_weights/best_run_exp_global_stage_big.
R4_LOGS = "/root/repo/runs/r4/logs"
MODES = [
    ("none (threshold 0.05)",
     [os.path.join(LOGS, "eval_none.txt"),
      os.path.join(R4_LOGS, "eval_none.txt")], "147x147"),
    ("w (wedge assignment)",
     [os.path.join(LOGS, "eval_w.txt"),
      os.path.join(R4_LOGS, "eval_w.txt")], "147x147"),
    ("pp (U-Net densifier)",
     [os.path.join(LOGS, "eval_pp.txt"),
      os.path.join(R4_LOGS, "eval_pp.txt")], "147x147"),
    ("big (587x587 block-tiled)",
     [os.path.join(LOGS, "eval_big.txt"),
      os.path.join(LOGS, "eval_big_oldw.txt")], "587x587"),
    ("none, real-texture shard",
     [os.path.join(LOGS, "eval_real.txt")], "147x147"),
    ("pp, real-texture shard",
     [os.path.join(LOGS, "eval_real_pp.txt")], "147x147"),
]

blessed = {}
bj = os.path.join(LOGS, "blessed.json")
if os.path.exists(bj):
    try:
        blessed = json.load(open(bj))
    except Exception:
        blessed = {}

pp_source = "unknown"
pps = os.path.join(WEIGHTS, "pp_source.txt")
if os.path.exists(pps):
    pp_source = open(pps).read().strip()

lines = [
    f"# METRICS — blurry-edges-tpu (round {ROUND})",
    "",
    "Accuracy of the TPU-trained pipeline on the held-out realistic test set",
    "(protocol: reference blurry_edges_test.py:148-172 — predictions clipped to",
    "[0.75, 1.18] m, center crop 10, metrics on masked valid pixels;",
    "utils/metrics.py:3-21 formulas incl. the reference's AbsRel quirk).",
    "",
    "**Protocol deviation (test data):** the reference's test generator",
    "(test_data_generator.py:26-79) textures its layered-defocus scenes with",
    "MS-COCO + Painting images, which are not fetchable in this environment;",
    "the main rows use the same generator's procedural-texture fallback",
    "(blurry_edges_tpu/data/realistic_gen.py — identical geometry, optics and",
    "depth statistics, synthetic textures). The 'real-texture shard' rows run",
    "the repo's actual COCO branch end-to-end over freely-licensed photographs",
    "bundled with installed packages (scikit-learn/matplotlib sample images,",
    "runs/r5/realshard.py) — photographic texture statistics, procedural",
    "single-component masks standing in for COCO instance silhouettes.",
    "",
    "**Parity limit (reference weights):** the reference's published .pth",
    "checkpoints (OneDrive link, pretrained_weights/README.md) are not",
    "fetchable here, so depth-map parity against the shipped model is verified",
    "at program level only: the torch->flax converter and the",
    "architecture-parity oracle tests (tests/test_pipeline.py) run CONVERTED",
    "weights through both stacks and compare outputs; the reference's own",
    "weights were never obtainable to repeat that end-to-end.",
    "",
]

prov = ["Weights (per-row provenance, see also runs/r5/logs/blessed.json):"]
if blessed:
    for k, v in blessed.items():
        prov.append(f"- **{k}**: {v}")
else:
    prov.append("- blessed.json missing; rows use pretrained_weights/* as-is.")
prov.append(f"- **pp densifier training source** (pp_source.txt): {pp_source}")
lines += prov + [""]

lines += [
    "| densify mode | dataset | delta1 | delta2 | delta3 | RMSE (cm) | AbsRel (cm) | s/pair |",
    "|---|---|---|---|---|---|---|---|",
]

n_rows = 0
any_empty = False
row_logs = []
for name, candidates, dataset in MODES:
    # first candidate that actually PARSES wins (a timed-out partial log on
    # the preferred path must fall through to the round-4 measurement)
    path, parsed = candidates[0], None
    for cand in candidates:
        parsed = parse(cand)
        if parsed is not None:
            path = cand
            break
    if parsed is None:
        if "real" in candidates[0]:
            continue  # optional rows vanish quietly when not measured
        lines.append(f"| {name} | {dataset} | — | — | — | — | — | — |")
        continue
    row_logs.append(f"{name.split(' (')[0]}: "
                    f"`{os.path.relpath(path, '/root/repo')}`")
    vals, all_empty, excluded, n_pairs = parsed
    dataset = f"{n_pairs} pairs, {dataset}"
    d1, d2, d3, rmse, absrel, t = vals
    if all_empty:
        lines.append(f"| {name} | {dataset} | n/a* | n/a* | n/a* | n/a* | "
                     f"n/a* | {t:.3f} |")
        any_empty = True
    else:
        note = ""
        if excluded[0] > 0:
            note = (f" ({excluded[1] - excluded[0]}/{excluded[1]} images "
                    f"scored; {excluded[0]} empty*)")
            any_empty = True
        lines.append(f"| {name}{note} | {dataset} | {d1:.3f} | {d2:.3f} | "
                     f"{d3:.3f} | {rmse:.3f} | {absrel:.3f} | {t:.3f} |")
    n_rows += 1

lines += [
    "",
    "Raw logs per row: " + "; ".join(row_logs) + ".",
    "",
]
if any_empty:
    lines += [
        "\\* an image is 'empty' when it has zero pixels above the mode's "
        "boundary-confidence threshold (0.05, reference "
        "blurry_edges_test.py:144) — there is nothing to score, so it is "
        "excluded from that row's averages and the row states its scored/"
        "total basis. Confidence is the folded cross-patch boundary agreement "
        "(utils/postprocessing_loss.py:166-173): ~0.05 means ~6 of the ~110 "
        "overlapping patches covering a pixel agree on a boundary there. "
        "The 'w'/'pp' modes densify past the threshold and score every image.",
        "",
    ]

# ---- common-basis pp vs none -------------------------------------------
def _resolve(name):
    for nm, candidates, _ in MODES:
        if nm.startswith(name):
            return next((p for p in candidates if parse(p) is not None),
                        candidates[0])
    return os.path.join(LOGS, f"eval_{name}.txt")


none_img = per_image(_resolve("none"))
pp_img = per_image(_resolve("pp"))
if none_img and pp_img:
    common = sorted(set(none_img) & set(pp_img))
    if common:
        import numpy as np

        pn = np.array([none_img[i] for i in common])
        pq = np.array([pp_img[i] for i in common])
        lines += [
            "## pp vs none on a common basis",
            "",
            "The dataset averages above are not directly comparable between "
            "'none' and 'pp': 'none' scores ONLY the sparse pixels above its "
            "confidence threshold on its non-empty images, while 'pp' "
            "completes the map and is scored on EVERY valid pixel of every "
            "image (a strictly harder basis — it is graded on the "
            "extrapolated regions 'none' abstains from). Restricted to the "
            f"{len(common)} images 'none' scores (pp still scored densely):",
            "",
            "| mode | delta1 | delta2 | delta3 | RMSE (cm) | AbsRel (cm) |",
            "|---|---|---|---|---|---|",
            f"| none (sparse pixels) | {pn[:, 0].mean():.3f} | "
            f"{pn[:, 1].mean():.3f} | {pn[:, 2].mean():.3f} | "
            f"{pn[:, 3].mean():.3f} | {pn[:, 4].mean():.3f} |",
            f"| pp (all pixels, same images) | {pq[:, 0].mean():.3f} | "
            f"{pq[:, 1].mean():.3f} | {pq[:, 2].mean():.3f} | "
            f"{pq[:, 3].mean():.3f} | {pq[:, 4].mean():.3f} |",
            "",
        ]

lines += [
    "## Performance notes (TPU v5e, single chip)",
    "",
    "- **Timed-region throughput**: see the committed bench artifact "
    "(BENCH_r*.json / runs/r*/logs/bench.json) — single-pair latency, "
    "batch sweep, Pallas on/off delta, per-stage weight provenance.",
]

perf_notes = os.path.join(LOGS, "perf_notes.txt")
if os.path.exists(perf_notes):
    for note in open(perf_notes).read().strip().split("\n"):
        if note.strip():
            lines.append(f"- {note.strip()}")

# Standing decisions measured in round 4 (unchanged program; carried forward
# so the rebuilt table does not silently drop them):
lines += [
    "- **Big-path block_chunk sweep** (round-4 measurement, 587x587, 36 "
    "blocks, v5e): chunk=1 2.69 s/pair, chunk=4 2.22, chunk=6 2.09, chunk=12 "
    "HBM OOM at compile (19.8G > 15.75G) — default stays chunk=6 (1.29x over "
    "sequential). The floor is the per-block local-CNN + transformer compute; "
    "going below ~2 s/pair needs block sharding across chips "
    "(--dp_devices), not deeper chunking on one chip.",
    "- **Flash attention (`--attn_impl flash`) remains EXPERIMENTAL and "
    "unused by committed checkpoints**: at this model's head_dim=16 "
    "(d_model 128 / 8 heads) the Pallas flash kernel measured 2.9 s/step vs "
    "2.4 s/step for XLA attention on the production global-train step "
    "(round-3, v5e), and it deviates from reference numerics twice (no "
    "attention-prob dropout; f32 operands to dodge a Mosaic bf16 tpu.matmul "
    "bug on this toolchain). The 961-4,096-token lengths are where flash "
    "usually wins; the tiny head_dim is why it does not here.",
]

mfu_txt = os.path.join(LOGS, "mfu.txt")
if not os.path.exists(mfu_txt):
    mfu_txt = "/root/repo/runs/r4/logs/mfu.txt"  # unchanged serving program
if os.path.exists(mfu_txt):
    note = open(mfu_txt).read().strip()
    if note:
        lines.append(f"- {note}")

bench_json = os.path.join(LOGS, "bench.json")
if os.path.exists(bench_json):
    try:
        b = json.loads(open(bench_json).read().strip().splitlines()[-1])
        lines += [
            f"- **Committed bench** ({os.path.relpath(bench_json)}): "
            f"{b.get('value'):.2f} {b.get('unit', '')} on "
            f"platform={b.get('platform', '?')}, "
            f"vs_baseline={b.get('vs_baseline')}.",
        ]
    except Exception as exc:  # malformed bench must not kill the metrics table
        print(f"bench.json unreadable, skipping summary: {exc}", file=sys.stderr)
lines.append("")

open(OUT, "w").write("\n".join(lines))
print(f"wrote {OUT} with {n_rows} filled rows")
sys.exit(0)
