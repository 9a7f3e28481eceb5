"""Val-curve evidence (VERDICT r4 item 4: show the plateau as a plotted fact).

Round 4's global-stage recipe was a time-boxed compression of the reference's
350-epoch schedule (reference global_training.py:173-225), and the verdict
asked for the val curve to be recorded so "converged" is demonstrated, not
asserted. This script assembles the two relevant validation curves:

* the round-4 full-image run (runs/r4/logs/exp_global_stage_training.txt —
  the per-epoch table's Loss column is the val sweep, train/global_.py:717-721),
  63 epochs ending in the round's blessed epoch-58 best;
* the round-5 block-mix fine-tune (train/val per epoch parsed from the
  supervisor log's "epoch N train X val Y" heartbeat lines; on watchdog
  restarts the LAST occurrence of an epoch wins).

Outputs runs/r5/logs/val_curve.png (two panels, log scale) and
val_curve_summary.txt with the plateau facts: best epoch, and the relative
val improvement over the final third of each run vs the third before it.
"""

import os
import re
import sys

import numpy as np

ROOT = os.environ.get("BE_R5_ROOT", "runs/r5")
LOGS = f"{ROOT}/logs"
R4_TXT = "runs/r4/logs/exp_global_stage_training.txt"
R5_LOG = f"{LOGS}/round5.log"

EPOCH_ROW = re.compile(r"^(\d+)\s+([\d.]+)\s+\d+\s+[\d.e+-]+\s*$")
BFT_ROW = re.compile(r"epoch (\d+) train ([\d.]+) val ([\d.]+)")


def r4_curve():
    if not os.path.exists(R4_TXT):
        return None
    vals = {}
    for line in open(R4_TXT):
        m = EPOCH_ROW.match(line)
        if m:
            vals[int(m.group(1))] = float(m.group(2))
    if not vals:
        return None
    n = max(vals) + 1
    out = np.full(n, np.nan)
    for e, v in vals.items():
        out[e] = v
    return out


def r5_curves():
    if not os.path.exists(R5_LOG):
        return None, None
    tr, va = {}, {}
    for line in open(R5_LOG):
        m = BFT_ROW.search(line)
        if m:
            e = int(m.group(1))
            tr[e], va[e] = float(m.group(2)), float(m.group(3))
    if not va:
        return None, None
    n = max(va) + 1
    t = np.full(n, np.nan)
    v = np.full(n, np.nan)
    for e in va:
        t[e], v[e] = tr[e], va[e]
    return t, v


def plateau_stmt(name, v):
    ok = np.isfinite(v)
    idx = np.where(ok)[0]
    vv = v[idx]
    best_e = int(idx[np.argmin(vv)])
    n = len(vv)
    if n < 6:
        return f"{name}: {n} epochs, best val {vv.min():.6f} @ epoch {best_e} (too short for a plateau claim)"
    third = max(n // 3, 2)
    last, prev = vv[-third:], vv[-2 * third:-third]
    rel = (prev.mean() - last.mean()) / prev.mean() * 100.0
    return (f"{name}: {n} epochs, best val {vv.min():.6f} @ epoch {best_e}; "
            f"final-third mean {last.mean():.6f} vs prior-third {prev.mean():.6f} "
            f"({rel:+.2f}% change — "
            f"{'plateaued' if abs(rel) < 2.0 else 'still moving'})")


def main():
    r4 = r4_curve()
    t5, v5 = r5_curves()
    lines = []
    if r4 is not None:
        lines.append(plateau_stmt("round-4 full-image global run (val)", r4))
    if v5 is not None:
        lines.append(plateau_stmt("round-5 block-mix fine-tune (val)", v5))
        lines.append(plateau_stmt("round-5 block-mix fine-tune (train)", t5))
    if not lines:
        print("no curves found", file=sys.stderr)
        return 1
    os.makedirs(LOGS, exist_ok=True)
    with open(f"{LOGS}/val_curve_summary.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return 0
    n_pan = (r4 is not None) + (v5 is not None)
    fig, axes = plt.subplots(1, n_pan, figsize=(7 * n_pan, 5))
    axes = np.atleast_1d(axes)
    i = 0
    if r4 is not None:
        ax = axes[i]; i += 1
        ax.plot(np.arange(len(r4)), r4, "b-", lw=2, label="val")
        ax.set_yscale("log"); ax.set_xlabel("epoch"); ax.set_ylabel("val loss")
        ax.set_title("round-4 full-image global run")
        ax.legend()
    if v5 is not None:
        ax = axes[i]
        ax.plot(np.arange(len(t5)), t5, "c--", lw=1.5, label="train")
        ax.plot(np.arange(len(v5)), v5, "b-", lw=2, label="val")
        ax.set_yscale("log"); ax.set_xlabel("epoch"); ax.set_ylabel("loss")
        ax.set_title("round-5 block-mix fine-tune")
        ax.legend()
    fig.savefig(f"{LOGS}/val_curve.png", bbox_inches="tight", dpi=200)
    print(f"wrote {LOGS}/val_curve.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
