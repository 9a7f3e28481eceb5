#!/bin/bash
# Round-4 endgame: runs AFTER chain_all's bench step frees the TPU.
#   1. secure a 60-pair 587x587 big test set (prefer the CPU generator's
#      output if it finished; else regenerate on the now-idle TPU in minutes)
#   2. run the big block-tiled eval (reference blurry_edges_test_big.py)
#   3. compute the serving-path MFU note from the committed bench artifact
#   4. rebuild METRICS.md with all four rows + perf notes and commit
# Launch ONCE:  nohup bash runs/r4/endgame.sh > runs/r4/logs/endgame.log 2>&1 &
set -u
cd /root/repo
if [ -f /tmp/endgame.pid ] && kill -0 "$(cat /tmp/endgame.pid)" 2>/dev/null; then
  echo "endgame already running; exiting" >&2
  exit 0
fi
echo $$ > /tmp/endgame.pid
R=runs/r4
LOGS=$R/logs
export JAX_COMPILATION_CACHE_DIR=/root/repo/$R/jax_cache
stamp() { echo "=== [$(date '+%F %T')] $*"; }

CHAIN_PID=2207          # runs/r4/chain_all.sh, recorded from /tmp/chain_all.pid
CPU_BIGGEN_PID=4028     # runs/r3/biggen_v2.py background CPU generator

# --- wait for the chain's bench step to finish (TPU free afterwards: the
# only chain step after bench is the CPU-only slow-tier pytest) -------------
while true; do
  grep -q "bench rc=" "$LOGS/chain_all.log" && { stamp "chain bench done"; break; }
  kill -0 "$CHAIN_PID" 2>/dev/null || { stamp "chain exited"; break; }
  sleep 60
done

# --- 1) big test set --------------------------------------------------------
if [ -f runs/r3/data/data_test_big_v2/DONE ]; then
  DATA_BIG=runs/r3/data/data_test_big_v2
  stamp "CPU big set complete; using $DATA_BIG"
else
  stamp "CPU big set incomplete; generating on TPU (biggen_tpu)"
  timeout 2400 python -u runs/r4/biggen_tpu.py >> "$LOGS/gen_big_tpu.log" 2>&1
  RC=$?
  stamp "biggen_tpu rc=$RC"
  if [ -f runs/r4/data/data_test_big_v3/DONE ]; then
    DATA_BIG=runs/r4/data/data_test_big_v3
    # supersedes the CPU generator; free its core for the slow-tier tests.
    # kill strictly by the recorded pid, verified against its cmdline.
    if kill -0 "$CPU_BIGGEN_PID" 2>/dev/null && \
       grep -q biggen_v2 "/proc/$CPU_BIGGEN_PID/cmdline" 2>/dev/null; then
      stamp "stopping CPU biggen pid $CPU_BIGGEN_PID (superseded)"
      kill "$CPU_BIGGEN_PID"
    fi
  elif [ -f runs/r3/data/data_test_big_v2/DONE ]; then
    DATA_BIG=runs/r3/data/data_test_big_v2   # CPU gen won the race meanwhile
  else
    stamp "no big set available; skipping big eval"
    DATA_BIG=""
  fi
fi

# --- 2) big eval -------------------------------------------------------------
if [ -n "$DATA_BIG" ] && [ -f "$DATA_BIG/images_ny.npy" ]; then
  for TRY in 1 2; do
    stamp "eval big try $TRY ($DATA_BIG)"
    timeout 2400 python -u blurry_edges_test_big.py \
      --data_path "$DATA_BIG" --model_path "$R/weights" \
      --log_path "$LOGS/eval_big" --vis_max 5 > "$LOGS/eval_big.txt" 2>&1
    stamp "eval big rc=$?"
    grep -q "Average metrics" "$LOGS/eval_big.txt" && break
  done
fi

# --- 3) MFU note (CPU-side cost_analysis; reads runs/r4/logs/bench.json) ----
if [ -f "$LOGS/bench.json" ]; then
  stamp "mfu note"
  JAX_PLATFORMS=cpu timeout 1200 python runs/r4/mfu_note.py \
    > "$LOGS/mfu_full.txt" 2>&1
  stamp "mfu rc=$?"
fi

# --- 4) rebuild METRICS.md + commit ------------------------------------------
BE_METRICS_LOGS=/root/repo/$LOGS BE_METRICS_ROUND=4 python runs/r3/make_metrics.py
git add -f METRICS.md "$LOGS"/eval_big.txt "$LOGS"/mfu.txt "$LOGS"/mfu_full.txt \
  "$LOGS"/bench.json "$LOGS"/bench_detail.txt 2>/dev/null
git diff --cached --quiet || git commit -q -m "Round-4 big-path eval on the 60-pair 587x587 set + serving MFU note"
stamp "endgame complete"
rm -f /tmp/endgame.pid
