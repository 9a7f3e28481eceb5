#!/bin/bash
# Watch for the TPU tunnel relay to come back (it died at ~19:39 on
# 2026-08-17, cutting off the fine-tuned w-variant eval) and, if it returns
# within the deadline, run the pending 'w' eval with the fine-tuned
# checkpoint, refresh METRICS.md, and commit. Exits harmlessly otherwise,
# or if another process already holds the chip (e.g. the round-4 chain).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/r3/jax_cache
LOG=runs/r3/logs/tunnel_watch.log
stamp() { echo "=== [$(date '+%F %T')] $*" >> "$LOG"; }
DEADLINE=$(( $(date +%s) + ${WATCH_BUDGET:-10800} ))

stamp "watching for tunnel relay"
while ! timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    stamp "deadline reached, tunnel never returned"; exit 0
  fi
  sleep 120
done
stamp "tunnel is up"
sleep 60
# if round 4's chain (or anything else) is already using the chip, stand down
if ps -o cmd= -C python 2>/dev/null | grep -Eq "global_training|blurry_edges_test|train_densify"; then
  stamp "another TPU job is running; standing down"; exit 0
fi

OUT=runs/r3/logs/eval_w_ft.txt
for TRY in 1 2; do
  : > "$OUT"
  timeout 2400 python -u blurry_edges_test.py \
    --data_path runs/r2/data/data_test --model_path runs/r3/weights \
    --log_path runs/r3/logs/eval_w --vis_max 10 --densify w > "$OUT" 2>&1 &
  EPID=$!
  LAST_SZ=0 LAST_T=$(date +%s)
  while kill -0 "$EPID" 2>/dev/null; do
    sleep 30
    SZ=$(stat -c %s "$OUT" 2>/dev/null || echo 0)
    NOW=$(date +%s)
    if [ "$SZ" -ne "$LAST_SZ" ]; then LAST_SZ=$SZ; LAST_T=$NOW; fi
    if [ $(( NOW - LAST_T )) -gt 600 ]; then
      stamp "eval stalled, killing (try $TRY)"
      kill "$EPID" 2>/dev/null; sleep 5; kill -9 "$EPID" 2>/dev/null
      break
    fi
  done
  wait "$EPID" 2>/dev/null
  grep -q "Average metrics" "$OUT" && break
done

if grep -q "Average metrics" "$OUT"; then
  mv "$OUT" runs/r3/logs/eval_w.txt
  python runs/r3/make_metrics.py >> "$LOG" 2>&1
  git add -f METRICS.md runs/r3/logs/eval_w.txt
  git diff --cached --quiet || git commit -q -m "Re-run 'w' eval with the fine-tuned w-variant checkpoint (tunnel restored)"
  stamp "w eval refreshed and committed"
else
  stamp "w eval failed both tries"
fi
