#!/bin/bash
# Round-4c supervisor: identical staged chain to round4b.sh, relaunched after
# round4b completes to spend the rest of the round's wall clock. The chain is
# idempotent, so on relaunch: dataset stages skip (files exist), training
# resumes from the round4b snapshot (epoch 63, val 0.00649 best) with a fresh
# budget, the densifier re-sources its sparse maps from the improved
# checkpoint, and every eval/metrics/bench/slow-tier stage reruns and
# recommits with the better weights.
#
# Differences vs round4b.sh:
#   * own pidfile/log (round4b may still be cleaning up at launch time);
#   * eval stall watchdog widened 600 -> 900 s: a cold XLA compile of the
#     eval program is silent for >10 min when the pipeline code changed
#     since the cache was built (observed 15:10-15:21 this round: try 1
#     killed mid-compile, try 2 rode its cached artifact and ran fine).
#
# Launch ONCE with the round-end epoch set:
#   BE_ROUND_END_TS=$(date -d '... UTC' +%s) \
#     nohup bash runs/r4/round4c.sh > runs/r4/logs/round4c.out 2>&1 &
set -u
cd /root/repo
if [ -f /tmp/round4c.pid ] && kill -0 "$(cat /tmp/round4c.pid)" 2>/dev/null; then
  echo "round4c supervisor already running; exiting" >&2
  exit 0
fi
echo $$ > /tmp/round4c.pid

R=runs/r4
W=$R/weights
LOGS=$R/logs
DATA_TV=runs/r2/data/data_train_val
DATA_TEST=runs/r2/data/data_test
DATA_BIG=$R/data/data_test_big_v3
mkdir -p "$W" "$LOGS" "$R/jax_cache" "$R/data" runs/r2/data
export JAX_COMPILATION_CACHE_DIR=/root/repo/$R/jax_cache
LOG=$LOGS/round4c.log
stamp() { echo "=== [$(date '+%F %T')] $*" >> "$LOG"; }

# Wall-clock bookkeeping: reserve ~3.3 h after training for densify retrain +
# 4 evals + w fine-tune + metrics + bench + slow tier (measured ~3 h in the
# first round-4 pass).
ROUND_END=${BE_ROUND_END_TS:-$(( $(date +%s) + 37800 ))}
POST_RESERVE=12000

# --- seed weights from the committed checkpoints ----------------------------
for CKPT in best_run_exp_local_stage best_run_exp_global_stage \
            best_run_exp_global_stage_w best_run_exp_depth_completion_pp \
            last_exp_global_stage; do
  if [ -d "pretrained_weights/$CKPT" ] && [ ! -d "$W/$CKPT" ]; then
    cp -r "pretrained_weights/$CKPT" "$W/"
  fi
done
stamp "weights seeded (resume snapshot: $([ -d $W/last_exp_global_stage ] && echo yes || echo NO))"

# --- preflight: TPU tunnel ---------------------------------------------------
WAITED=0
while ! timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; do
  if [ "$WAITED" -ge 14400 ]; then stamp "ABORT: tunnel down ${WAITED}s"; exit 1; fi
  [ $(( WAITED % 600 )) -eq 0 ] && stamp "waiting for tunnel (${WAITED}s)"
  sleep 60; WAITED=$(( WAITED + 60 ))
done
[ "$WAITED" -gt 0 ] && stamp "tunnel came up after ${WAITED}s"

# --- TPU queue 1: train/val generation (seeded -> bit-identical to what the
# epoch-42 snapshot was trained on; resuming over it is sound) ---------------
ATT=0
while [ ! -f "$DATA_TV/patches/alphas_val.npy" ] && [ "$ATT" -lt 3 ]; do
  ATT=$(( ATT + 1 ))
  stamp "train/val generation attempt $ATT (TPU)"
  timeout 7200 python -u train_val_data_generator.py --data_path "$DATA_TV" \
    > "$LOGS/gen_tv.log" 2>&1
  stamp "train/val generation rc=$?"
done
[ -f "$DATA_TV/patches/alphas_val.npy" ] || { stamp "ABORT: tv gen failed"; exit 1; }

# --- TPU queue 2: global pre-calculation ------------------------------------
ATT=0
while [ ! -f "$DATA_TV/params_src_val.npy" ] && [ "$ATT" -lt 3 ]; do
  ATT=$(( ATT + 1 ))
  stamp "global pre-cal attempt $ATT (TPU)"
  timeout 7200 python -u global_data_pre_cal.py --data_path "$DATA_TV" \
    --model_path "$W" > "$LOGS/gen_precal.log" 2>&1
  stamp "pre-cal rc=$?"
done
[ -f "$DATA_TV/params_src_val.npy" ] || { stamp "ABORT: pre-cal failed"; exit 1; }

# --- TPU queue 3: 200-pair realistic test set (TPU; CPU took hours) ---------
if [ ! -f "$DATA_TEST/alphas.npy" ]; then
  stamp "test-set generation (TPU, 200 pairs)"
  timeout 5400 python -u test_data_generator.py --data_path "$DATA_TEST" \
    > "$LOGS/gen_test.log" 2>&1
  stamp "test-set generation rc=$?"
fi
if [ ! -f "$DATA_TEST/alphas.npy" ]; then
  stamp "TPU test gen failed; CPU fallback in background"
  ( JAX_PLATFORMS=cpu nice -n 10 python -u test_data_generator.py \
      --data_path "$DATA_TEST" > "$LOGS/gen_test_cpu.log" 2>&1
    stamp "CPU test-set generation rc=$?" ) &
fi

# --- TPU queue 4: 60-pair 587x587 big set (TPU) ------------------------------
if [ ! -f "$DATA_BIG/DONE" ]; then
  stamp "big test-set generation (TPU, 60 pairs)"
  timeout 5400 python -u runs/r4/biggen_tpu.py > "$LOGS/gen_big.log" 2>&1
  stamp "big test-set generation rc=$?"
fi
if [ ! -f "$DATA_BIG/DONE" ]; then
  stamp "TPU big gen failed; CPU fallback in background"
  ( JAX_PLATFORMS=cpu nice -n 10 python -u runs/r3/biggen_v2.py \
      > "$LOGS/gen_big_cpu.log" 2>&1
    stamp "CPU big gen rc=$?" ) &
fi

# --- 1) resume shared global-stage training (watchdog + retry) --------------
TRAIN_BUDGET=$(( ROUND_END - $(date +%s) - POST_RESERVE ))
[ "$TRAIN_BUDGET" -lt 1800 ] && TRAIN_BUDGET=1800
stamp "training resume: budget ${TRAIN_BUDGET}s (epoch_num 100)"
DEADLINE=$(( $(date +%s) + TRAIN_BUDGET ))
ATTEMPT=0
rm -f "$W/done_global"
while [ ! -f "$W/done_global" ]; do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  if [ "$REMAIN" -le 120 ]; then stamp "train deadline after $ATTEMPT attempts"; break; fi
  ATTEMPT=$(( ATTEMPT + 1 ))
  stamp "trainer attempt $ATTEMPT (remain ${REMAIN}s)"
  python global_training.py \
    --data_path "$DATA_TV" --model_path "$W" --log_path "$LOGS" \
    --train_subset 2500 --val_batches 25 --snapshot_steps 50 \
    --epoch_num 100 --dynamic_epoch 8 16 28 \
    --time_budget_s "$REMAIN" >> "$LOG" 2>&1 &
  TPID=$!
  T0=$(date +%s)
  HB=$LOGS/global_steps.log
  while kill -0 "$TPID" 2>/dev/null; do
    sleep 60
    HB_T=$(stat -c %Y "$HB" 2>/dev/null || echo 0)
    [ "$HB_T" -lt "$T0" ] && HB_T=$T0
    if [ $(( $(date +%s) - HB_T )) -gt 900 ]; then
      stamp "WATCHDOG: stale heartbeat, killing trainer $TPID"
      kill "$TPID" 2>/dev/null; sleep 10; kill -9 "$TPID" 2>/dev/null
      break
    fi
  done
  wait "$TPID"; RC=$?
  stamp "trainer attempt $ATTEMPT exited rc=$RC"
  [ "$RC" -eq 0 ] && [ ! -f "$W/done_global" ] && break   # clean budget exit
  sleep 10
done
git add -f "$LOGS/exp_global_stage_training.txt" "$W/best_run_exp_global_stage" \
  "$W/last_exp_global_stage" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Extend global-stage training further past the gamma ramp (round-4c continuation from epoch 63)"

# --- 2) densifier retrain, pipeline-sourced from the improved checkpoint ----
rm -rf "$W/best_run_exp_depth_completion_pp"
stamp "densifier retrain (pipeline-sourced)"
BE_DENSIFY_ROOT=$R timeout 5400 python runs/r3/train_densify.py >> "$LOG" 2>&1
stamp "densifier rc=$?"

run_eval_guarded() {
  local OUT=$1; shift
  local TRY
  for TRY in 1 2; do
    : > "$OUT"
    "$@" > "$OUT" 2>&1 &
    local EPID=$!
    local LAST_SZ=0 LAST_T=$(date +%s)
    while kill -0 "$EPID" 2>/dev/null; do
      sleep 30
      local SZ=$(stat -c %s "$OUT" 2>/dev/null || echo 0)
      local NOW=$(date +%s)
      if [ "$SZ" -ne "$LAST_SZ" ]; then LAST_SZ=$SZ; LAST_T=$NOW; fi
      if [ $(( NOW - LAST_T )) -gt 900 ]; then
        stamp "EVAL WATCHDOG: $OUT stalled, killing $EPID (try $TRY)"
        kill "$EPID" 2>/dev/null; sleep 5; kill -9 "$EPID" 2>/dev/null
        break
      fi
    done
    wait "$EPID" 2>/dev/null
    grep -q "Average metrics" "$OUT" && return 0
    stamp "eval try $TRY produced no metrics, $([ $TRY -eq 1 ] && echo retrying || echo giving up)"
  done
  return 1
}

# --- 3) evals none/pp/big with the improved shared stage --------------------
for MODE in none pp; do
  DARG=""
  [ "$MODE" != "none" ] && DARG="--densify $MODE"
  stamp "eval $MODE"
  run_eval_guarded "$LOGS/eval_${MODE}.txt" timeout 2400 python -u blurry_edges_test.py \
    --data_path "$DATA_TEST" --model_path "$W" \
    --log_path "$LOGS/eval_$MODE" --vis_max 10 $DARG
  stamp "eval $MODE rc=$?"
done
if [ -f "$DATA_BIG/images_ny.npy" ]; then
  stamp "eval big ($DATA_BIG)"
  run_eval_guarded "$LOGS/eval_big.txt" timeout 3600 python -u blurry_edges_test_big.py \
    --data_path "$DATA_BIG" --model_path "$W" \
    --log_path "$LOGS/eval_big" --vis_max 5
  stamp "eval big rc=$?"
fi

# --- 4) w-variant fine-tune from the improved shared best, then eval w ------
W_BUDGET=${W_BUDGET:-5400}
rm -f "$W/done_global_w"
DEADLINE=$(( $(date +%s) + W_BUDGET ))
ATTEMPT=0
while [ ! -f "$W/done_global_w" ]; do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  if [ "$REMAIN" -le 120 ]; then stamp "w deadline"; break; fi
  ATTEMPT=$(( ATTEMPT + 1 ))
  stamp "w-variant attempt $ATTEMPT (remain ${REMAIN}s)"
  python global_training.py \
    --data_path "$DATA_TV" --model_path "$W" --log_path "$LOGS" \
    --w_variant --init_from "$W/best_run_exp_global_stage" \
    --dynamic_epoch 0 0 0 --epoch_num 6 --learning_rate 5e-5 \
    --train_subset 2500 --val_batches 25 --snapshot_steps 50 \
    --time_budget_s "$REMAIN" >> "$LOG" 2>&1 &
  TPID=$!
  T0=$(date +%s)
  HB=$LOGS/global_steps.log
  while kill -0 "$TPID" 2>/dev/null; do
    sleep 60
    HB_T=$(stat -c %Y "$HB" 2>/dev/null || echo 0)
    [ "$HB_T" -lt "$T0" ] && HB_T=$T0
    if [ $(( $(date +%s) - HB_T )) -gt 900 ]; then
      stamp "WATCHDOG: stale heartbeat, killing w trainer $TPID"
      kill "$TPID" 2>/dev/null; sleep 10; kill -9 "$TPID" 2>/dev/null
      break
    fi
  done
  wait "$TPID"; RC=$?
  stamp "w attempt $ATTEMPT exited rc=$RC"
  [ "$RC" -eq 0 ] && [ ! -f "$W/done_global_w" ] && break
  sleep 10
done
stamp "eval w"
run_eval_guarded "$LOGS/eval_w.txt" timeout 2400 python -u blurry_edges_test.py \
  --data_path "$DATA_TEST" --model_path "$W" \
  --log_path "$LOGS/eval_w" --vis_max 10 --densify w
stamp "eval w rc=$?"

# --- 5) metrics + stage checkpoints + commit ---------------------------------
BE_METRICS_LOGS=/root/repo/$LOGS BE_METRICS_ROUND=4 \
  python runs/r3/make_metrics.py >> "$LOG" 2>&1
for CKPT in best_run_exp_global_stage best_run_exp_global_stage_w \
            best_run_exp_depth_completion_pp last_exp_global_stage; do
  if [ -d "$W/$CKPT" ]; then
    rm -rf "pretrained_weights/$CKPT"
    cp -r "$W/$CKPT" pretrained_weights/
  fi
done
git add -f METRICS.md pretrained_weights "$LOGS"/eval_*.txt \
  "$LOGS/exp_global_stage_training.txt" "$LOGS/exp_global_stage_w_training.txt" \
  "$LOGS/exp_depth_completion_training.txt" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Round-4c accuracy table: metrics with the further-extended global stage (none/w/pp/big)"

# --- 5.5) committed bench artifact with the round's trained weights ---------
stamp "bench"
BE_WEIGHTS=$PWD/pretrained_weights timeout 3600 python bench.py \
  > "$LOGS/bench.json" 2> "$LOGS/bench_detail.txt"
stamp "bench rc=$?"
git add -f "$LOGS/bench.json" "$LOGS/bench_detail.txt" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Round-4c bench artifact: further-extended-training weights"

# --- 6) slow-tier guarantees (TPU idle now; CPU-only mesh tests) -------------
stamp "slow-tier pytest"
timeout 5400 python -m pytest tests/test_dp_harness.py tests/test_big_sharded.py -q \
  > "$LOGS/slowtier_pytest.log" 2>&1
stamp "slow-tier rc=$?"
git add -f "$LOGS/slowtier_pytest.log" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Round-4c slow-tier DP/sharded-big-path test log"
stamp "round4b complete"
rm -f /tmp/round4c.pid
