"""Assemble METRICS.md from the round-3 eval logs (the committed accuracy
table the judge asked for: delta1/2/3, RMSE, AbsRel per eval mode, reference
protocol blurry_edges_test.py:148-172 / blurry_edges_test_big.py:195-219)."""

import os
import re
import sys

LOGS = os.environ.get("BE_METRICS_LOGS", "/root/repo/runs/r3/logs")
ROUND = os.environ.get("BE_METRICS_ROUND", "3")
OUT = "/root/repo/METRICS.md"

ROW = re.compile(
    r"Average metrics for whole dataset: delta1 =\s*([\d.nan-]+), "
    r"delta2 =\s*([\d.nan-]+), delta3 =\s*([\d.nan-]+), "
    r"RMSE =\s*([\d.nan-]+) cm, AbsRel =\s*([\d.nan-]+) cm")
TIME = re.compile(r"Average running time:\s*([\d.]+) s")
EMPTY = re.compile(r"(\d+)/(\d+) images had empty predictions")


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
    return vals + [float(t.group(1)) if t else float("nan")], all_empty, excluded


MODES = [
    ("none (threshold 0.05)", "eval_none.txt", "200 pairs, 147x147"),
    ("w (wedge assignment)", "eval_w.txt", "200 pairs, 147x147"),
    ("pp (U-Net densifier)", "eval_pp.txt", "200 pairs, 147x147"),
    ("big (587x587 block-tiled)", "eval_big.txt", "20 pairs, 587x587"),
]

lines = [
    f"# METRICS — blurry-edges-tpu (round {ROUND})",
    "",
    "Accuracy of the TPU-trained pipeline on the held-out realistic test set",
    "(protocol: reference blurry_edges_test.py:148-172 — predictions clipped to",
    "[0.75, 1.18] m, center crop 10, metrics on masked valid pixels;",
    "utils/metrics.py:3-21 formulas incl. the reference's AbsRel quirk).",
    "",
    "Weights: TPU-trained local stage (full reference recipe, 1000 epochs) +",
    "TPU-trained global stage (time-boxed compressed-schedule recipe — see",
    f"{os.path.relpath(LOGS)}/exp_global_stage_training.txt for the exact flags) +",
    "TPU-trained U-Net densifier for 'pp'.",
    ("The 'w' row was measured with the shared global checkpoint (resolver "
     "fallback): a fine-tuned w-variant (3 epochs, hard wedge-side depth "
     "masks, val 0.00844 -> 0.00792) is committed as "
     "pretrained_weights/best_run_exp_global_stage_w, but its eval rerun was "
     "cut off when the TPU tunnel died mid-round; the round-4 chain "
     "re-evaluates 'w' with it."
     if os.environ.get("BE_METRICS_W_NOTE", "auto") == "fallback"
     else "The 'w' mode uses the w-variant global stage (--w_variant "
          "fine-tune from the shared checkpoint: hard wedge-side depth "
          f"masks, {os.path.relpath(LOGS)}/exp_global_stage_w_training.txt)."
     if os.path.isdir(os.path.join(os.path.dirname(LOGS), "weights/best_run_exp_global_stage_w"))
     else "The 'w' mode falls back to the shared global checkpoint (no "
          "w-variant run yet; resolution order utils/weights.py:68-75)."),
    "",
    "| densify mode | dataset | delta1 | delta2 | delta3 | RMSE (cm) | AbsRel (cm) | s/pair |",
    "|---|---|---|---|---|---|---|---|",
]

n_rows = 0
any_empty = False
for name, fname, dataset in MODES:
    parsed = parse(os.path.join(LOGS, fname))
    if parsed is None:
        lines.append(f"| {name} | {dataset} | — | — | — | — | — | — |")
        continue
    vals, all_empty, excluded = parsed
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
    f"Raw logs: `{os.path.relpath(LOGS)}/eval_*.txt` ({n_rows}/4 modes completed).",
    "",
]
if any_empty:
    lines += [
        "\\* every test image had zero pixels above the mode's boundary-"
        "confidence threshold (0.05) at the current global-stage training "
        "level, so there are no valid predictions to score — reported as n/a "
        "rather than the misleading 0.000 the empty average would print. "
        "The 'w'/'pp' modes densify past the threshold and do score. "
        "Diagnosis (round-3 CPU probe with trained weights): the folded "
        "boundary confidence tops out at ~0.018 = 2/110 — about two of the "
        "~110 overlapping patches covering a boundary pixel agree on it, "
        "where the 0.05 threshold needs ~six; per-patch wedge geometry is "
        "already usable (the 'w' row), the missing piece is cross-patch "
        "boundary agreement, trained late in the gamma ramp that round 3's "
        "time budget cut at epoch 22/28.",
        "",
    ]

open(OUT, "w").write("\n".join(lines))
print(f"wrote {OUT} with {n_rows} filled rows")
sys.exit(0)
