#!/bin/bash
# Phase-2 unattended chain: after the main post-train chain (chain_post.sh)
# has committed the round's accuracy table, fine-tune the w-variant global
# stage (--w_variant --init_from the trained shared checkpoint; the reference
# distributes pretrained_global_stage_w.pth with no trainer), re-run the 'w'
# eval with it, refresh METRICS.md, and commit.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/r3/jax_cache
LOG=runs/r3/logs/chain_w.log
W=runs/r3/weights
LOGS=runs/r3/logs
stamp() { echo "=== [$(date '+%F %T')] $*" >> "$LOG"; }

# 1) wait for chain_post to finish (bounded 8 h)
WAITED=0
while ! grep -q "chain_post complete" runs/r3/logs/chain_post.log 2>/dev/null \
      && [ "$WAITED" -lt 28800 ]; do
  sleep 120; WAITED=$(( WAITED + 120 ))
done
stamp "chain_post done after ${WAITED}s wait; starting w-variant phase"
if [ ! -d "$W/best_run_exp_global_stage" ]; then
  stamp "no trained shared global stage; aborting w-variant phase"
  exit 0
fi

# 2) fine-tune the w-variant: final gammas from epoch 0 (--dynamic_epoch
# 0 0 0), warm start, supervised retry like the main marathon
DEADLINE=$(( $(date +%s) + 5400 ))
ATTEMPT=0
while [ ! -f "$W/done_global_w" ]; do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  if [ "$REMAIN" -le 120 ]; then stamp "w-variant deadline reached"; break; fi
  ATTEMPT=$(( ATTEMPT + 1 ))
  stamp "w-variant trainer attempt $ATTEMPT (remain ${REMAIN}s)"
  python global_training.py \
    --data_path runs/r2/data/data_train_val \
    --model_path "$W" --log_path "$LOGS" \
    --w_variant --init_from "$W/best_run_exp_global_stage" \
    --dynamic_epoch 0 0 0 --epoch_num 6 --learning_rate 5e-5 \
    --train_subset 2500 --val_batches 25 --snapshot_steps 50 \
    --time_budget_s "$REMAIN" >> "$LOG" 2>&1 &
  TPID=$!
  T0=$(date +%s)
  HB=runs/r3/logs/global_steps.log
  while kill -0 "$TPID" 2>/dev/null; do
    sleep 60
    HB_T=$(stat -c %Y "$HB" 2>/dev/null || echo 0)
    if [ "$HB_T" -lt "$T0" ]; then HB_T=$T0; fi
    if [ $(( $(date +%s) - HB_T )) -gt 900 ]; then
      stamp "WATCHDOG: stale heartbeat, killing w-variant trainer $TPID"
      kill "$TPID" 2>/dev/null; sleep 10; kill -9 "$TPID" 2>/dev/null
      break
    fi
  done
  wait "$TPID"; RC=$?
  stamp "w-variant attempt $ATTEMPT exited rc=$RC"
  [ "$RC" -eq 0 ] && [ ! -f "$W/done_global_w" ] && break   # clean budget exit
  sleep 10
done

# 3) re-run the 'w' eval with the fine-tuned variant + refresh metrics
if [ -d "$W/best_run_exp_global_stage_w" ]; then
  stamp "eval w (w-variant weights)"
  timeout 2400 python blurry_edges_test.py \
    --data_path runs/r2/data/data_test --model_path "$W" \
    --log_path "$LOGS/eval_w" --vis_max 10 --densify w \
    > "$LOGS/eval_w.txt" 2>&1
  stamp "eval w rc=$?"
  python runs/r3/make_metrics.py >> "$LOG" 2>&1
  if [ ! -d pretrained_weights/best_run_exp_global_stage_w ]; then
    cp -r "$W/best_run_exp_global_stage_w" pretrained_weights/
  fi
  git add -f METRICS.md runs/r3/logs/eval_w.txt \
    runs/r3/logs/exp_global_stage_w_training.txt pretrained_weights 2>/dev/null
  git diff --cached --quiet || git commit -q -m "w-variant global stage: fine-tuned checkpoint + refreshed 'w' eval metrics"
fi
stamp "chain_w complete"
