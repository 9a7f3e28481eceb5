"""Bless the round-5 shared global stage (VERDICT r4 items 1-2).

Round 4 ended with two candidate shared checkpoints and an unreconciled
regression: the extended-training (epoch-58) weights improved the 147x147
rows (delta1 0.405) but collapsed the 587x587 block-tiled path (0.101 vs
0.241 for the earlier weights on the same v3 big set — isolated in
runs/r5/logs/eval_big_oldw.txt). Round 5 fine-tunes the stage on a 50/50
block-crop/full-image mix (runs/r5/blockgen.py) precisely to remove that
tradeoff.

This script adjudicates AFTER the fine-tuned stage was evaluated on both
paths (eval_none.txt / eval_big.txt in runs/r5/logs):

* ACCEPT the fine-tune if it keeps the 147-path at >= ACCEPT_NONE_FRAC of
  the round-4 committed delta1 AND lifts the big path above the round-4
  committed number by a real margin; then it becomes THE shared stage (one
  checkpoint for every row, like the reference).
* Otherwise RESTORE the round-4 stage from pretrained_weights and exit 1 —
  the supervisor then re-runs the two evals with the restored weights so
  the committed logs always match the blessed checkpoint.

Writes runs/r5/logs/blessed.json (read by runs/r5/make_metrics.py) either way.
"""

import json
import os
import re
import shutil
import sys

ROOT = os.environ.get("BE_R5_ROOT", "runs/r5")
W = f"{ROOT}/weights"
LOGS = f"{ROOT}/logs"

# round-4 committed basis (METRICS.md @ commit 1e4ef65)
R4_NONE_D1, R4_BIG_D1 = 0.405, 0.101
ACCEPT_NONE_FRAC = 0.95   # keep >= 95% of the 147-path delta1
ACCEPT_BIG_MIN = 0.15     # and clearly beat the regressed big number

ROW = re.compile(r"Average metrics for whole dataset: delta1 =\s*([\d.]+)")


def d1_of(path):
    if not os.path.exists(path):
        return None
    m = ROW.search(open(path).read())
    return float(m.group(1)) if m else None


none_d1 = d1_of(f"{LOGS}/eval_none.txt")
big_d1 = d1_of(f"{LOGS}/eval_big.txt")

bft_log = f"{LOGS}/exp_global_stage_training.txt"
accept = (none_d1 is not None and big_d1 is not None
          and none_d1 >= ACCEPT_NONE_FRAC * R4_NONE_D1
          and big_d1 >= ACCEPT_BIG_MIN)

blessed = {
    "global_stage": (
        f"round-5 block-mix fine-tune (runs/r5/blockgen.py 50/50 block-crop/"
        f"full-image mix, warm-started from the round-4 epoch-58 best; log "
        f"{os.path.relpath(bft_log)}) — ACCEPTED: 147-path delta1 "
        f"{none_d1}, big-path delta1 {big_d1} (round-4 committed basis "
        f"{R4_NONE_D1}/{R4_BIG_D1})."
        if accept else
        f"round-4 extended-training epoch-58 checkpoint (block-mix fine-tune "
        f"attempt measured 147-path delta1 {none_d1} / big-path delta1 "
        f"{big_d1}, below the acceptance gate of "
        f">={ACCEPT_NONE_FRAC}x{R4_NONE_D1} and >={ACCEPT_BIG_MIN}; "
        f"restored and re-evaluated)."),
    "local_stage": "round-2 TPU-trained, full reference recipe (1000 epochs).",
    "w_stage": "w-variant fine-tune from the blessed shared stage (this round).",
    "pp_densifier": "round-5 retrain, see pp_source.txt provenance row.",
    "decision": "accept" if accept else "restore-r4",
    "eval_none_delta1": none_d1,
    "eval_big_delta1": big_d1,
}
os.makedirs(LOGS, exist_ok=True)
with open(f"{LOGS}/blessed.json", "w") as f:
    json.dump(blessed, f, indent=1)
print(json.dumps(blessed, indent=1), flush=True)

if not accept:
    src = "pretrained_weights/best_run_exp_global_stage"
    dst = f"{W}/best_run_exp_global_stage"
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(src, dst)
    print(f"restored {src} -> {dst}", flush=True)
    sys.exit(1)
