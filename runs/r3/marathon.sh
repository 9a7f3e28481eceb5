#!/bin/bash
# Round-3 marathon: supervised global-stage training with auto-retry, then
# densifier training, then the eval suite. Crash-resilient by design:
# - the harness snapshots full train state every --snapshot_steps optimizer
#   steps and resumes mid-epoch, so a TPU-runtime kill costs <= ~2 min;
# - this loop re-execs the trainer until done_global appears or the
#   training deadline passes (the harness itself exits cleanly on
#   --time_budget_s, so SIGKILL is never needed);
# - the persistent XLA compilation cache makes each restart pay seconds,
#   not the ~4 min cold compile.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/runs/r3/jax_cache
mkdir -p runs/r3/logs runs/r3/weights

DATA=runs/r2/data/data_train_val
TRAIN_BUDGET=${TRAIN_BUDGET:-25200}   # 7 h default
DEADLINE=$(( $(date +%s) + TRAIN_BUDGET ))
LOG=runs/r3/logs/marathon_global.log

echo "=== [$(date '+%F %T')] global-stage training (budget ${TRAIN_BUDGET}s, supervised retry) ===" >> "$LOG"
ATTEMPT=0
while [ ! -f runs/r3/weights/done_global ]; do
  NOW=$(date +%s)
  REMAIN=$(( DEADLINE - NOW ))
  if [ "$REMAIN" -le 120 ]; then
    echo "=== [$(date '+%F %T')] training deadline reached after $ATTEMPT attempts ===" >> "$LOG"
    break
  fi
  ATTEMPT=$(( ATTEMPT + 1 ))
  echo "=== [$(date '+%F %T')] trainer attempt $ATTEMPT (remain ${REMAIN}s) ===" >> "$LOG"
  python global_training.py \
    --data_path "$DATA" \
    --model_path runs/r3/weights \
    --log_path runs/r3/logs \
    --train_subset 2500 \
    --val_batches 25 \
    --snapshot_steps 50 \
    --epoch_num 40 \
    --dynamic_epoch 8 16 28 \
    --time_budget_s "$REMAIN" \
    >> "$LOG" 2>&1 &
  TPID=$!
  ATTEMPT_T0=$(date +%s)
  # Watchdog: the runtime can HANG a step execution (observed live: heartbeat
  # frozen mid-epoch, process alive at ~5% CPU, no error) - a supervisor that
  # only waits on exit never recovers. Kill the trainer when the per-step
  # heartbeat goes stale; 900 s covers a cold compile + data load.
  HB=runs/r3/logs/global_steps.log
  while kill -0 "$TPID" 2>/dev/null; do
    sleep 60
    HB_T=$(stat -c %Y "$HB" 2>/dev/null || echo 0)
    # a stale heartbeat from BEFORE this attempt must not count against it
    if [ "$HB_T" -lt "$ATTEMPT_T0" ]; then HB_T=$ATTEMPT_T0; fi
    STALE=$(( $(date +%s) - HB_T ))
    if [ "$STALE" -gt 900 ]; then
      echo "=== [$(date '+%F %T')] WATCHDOG: heartbeat stale ${STALE}s, killing trainer $TPID ===" >> "$LOG"
      kill "$TPID" 2>/dev/null; sleep 10; kill -9 "$TPID" 2>/dev/null
      break
    fi
  done
  wait "$TPID"
  RC=$?
  echo "=== [$(date '+%F %T')] trainer attempt $ATTEMPT exited rc=$RC ===" >> "$LOG"
  if [ "$RC" -eq 0 ] && [ ! -f runs/r3/weights/done_global ]; then
    # clean time-budget exit
    break
  fi
  sleep 10
done

# stage the best checkpoint where the eval weight resolver finds it
if [ -d runs/r3/weights/best_run_exp_global_stage ]; then
  echo "=== [$(date '+%F %T')] global training produced a best checkpoint ===" >> "$LOG"
fi

echo "=== [$(date '+%F %T')] marathon training phase complete ===" >> "$LOG"
