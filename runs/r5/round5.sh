#!/bin/bash
# Round-5 supervisor: one unattended chain executing VERDICT r4's accuracy
# program on the single TPU chip, committing each stage's artifacts.
#
#   1. blockgen       — 587x587 block-crop fine-tune mix (VERDICT item 2)
#   2. blockft        — fine-tune the shared global stage on the mix
#   3. eval+bless     — eval none/big with the fine-tune; accept it only if
#                       it keeps the 147 path AND fixes the big path, else
#                       restore the round-4 stage and re-eval (item 1)
#   4. w fine-tune    — from the blessed shared stage, then eval w
#   5. densifier v2   — grad-matching + augmentation + shifted val (item 3)
#   6. realshard      — real-texture eval shard + none/pp rows (item 6)
#   7. perf notes     — re-measure Pallas on/off + bf16 coverage (item 5)
#   8. metrics        — rebuild METRICS.md with per-row provenance
#   9. bench          — committed bench artifact
#  10. slow tier      — DP/sharded-big/scaling tests (item 9)
#
# Launch ONCE:  nohup bash runs/r5/round5.sh > runs/r5/logs/round5.out 2>&1 &
set -u
cd /root/repo
if [ -f /tmp/round5.pid ] && kill -0 "$(cat /tmp/round5.pid)" 2>/dev/null; then
  echo "round5 supervisor already running; exiting" >&2
  exit 0
fi
echo $$ > /tmp/round5.pid

R=runs/r5
W=$R/weights
LOGS=$R/logs
DATA_TV=runs/r2/data/data_train_val
DATA_TEST=runs/r2/data/data_test
DATA_BIG=runs/r4/data/data_test_big_v3
DATA_BFT=$R/data/data_blockft
DATA_REAL=$R/data/data_test_real
mkdir -p "$W" "$LOGS" "$R/jax_cache" "$R/data"
export JAX_COMPILATION_CACHE_DIR=/root/repo/$R/jax_cache
LOG=$LOGS/round5.log
stamp() { echo "=== [$(date '+%F %T')] $*" >> "$LOG"; }

# Wall-clock bookkeeping: post-training reserve covers bless re-evals + w
# fine-tune + densifier + realshard + perf + metrics + bench + slow tier.
ROUND_END=${BE_ROUND_END_TS:-$(( $(date +%s) + 36000 ))}
POST_RESERVE=19800

# --- seed weights from the committed checkpoints (NOT last_exp_global_stage:
# the block fine-tune must start a FRESH run via --init_from, not resume the
# round-4 full-image run's snapshot/schedule) --------------------------------
for CKPT in best_run_exp_local_stage best_run_exp_global_stage \
            best_run_exp_global_stage_w best_run_exp_depth_completion_pp; do
  if [ -d "pretrained_weights/$CKPT" ] && [ ! -d "$W/$CKPT" ]; then
    cp -r "pretrained_weights/$CKPT" "$W/"
  fi
done
stamp "weights seeded from pretrained_weights"

# --- preflight: TPU tunnel ----------------------------------------------------
WAITED=0
while ! timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; do
  if [ "$WAITED" -ge 14400 ]; then stamp "ABORT: tunnel down ${WAITED}s"; exit 1; fi
  [ $(( WAITED % 600 )) -eq 0 ] && stamp "waiting for tunnel (${WAITED}s)"
  sleep 60; WAITED=$(( WAITED + 60 ))
done
[ "$WAITED" -gt 0 ] && stamp "tunnel came up after ${WAITED}s"

# --- 1) blockgen (TPU) --------------------------------------------------------
ATT=0
while [ ! -f "$DATA_BFT/manifest.json" ] && [ "$ATT" -lt 2 ]; do
  ATT=$(( ATT + 1 ))
  stamp "blockgen attempt $ATT (TPU)"
  BE_R5_ROOT=$R BE_ORIG_DATA=$DATA_TV BE_MODEL_PATH=$W \
    timeout 10800 python -u runs/r5/blockgen.py > "$LOGS/blockgen.log" 2>&1
  stamp "blockgen rc=$?"
done
[ -f "$DATA_BFT/manifest.json" ] || { stamp "ABORT: blockgen failed"; exit 1; }
git add -f "$LOGS/blockgen.log" "$DATA_BFT/manifest.json" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Block-view fine-tune dataset: 587x587 scenes cropped at the 36 big-pipeline offsets, mixed 50/50 with full-image samples"

# --- 2) block fine-tune of the shared global stage ----------------------------
# epoch_num 12: the first round-5 pass measured the fine-tune's val plateau at
# epoch 5-7 (runs/r5/logs/val_curve_summary.txt); 12 epochs bounds the stage so
# the wall clock reaches the eval/bless/densifier/realshard stages downstream.
TRAIN_BUDGET=$(( ROUND_END - $(date +%s) - POST_RESERVE ))
[ "$TRAIN_BUDGET" -lt 1800 ] && TRAIN_BUDGET=1800
[ "$TRAIN_BUDGET" -gt 14400 ] && TRAIN_BUDGET=14400
stamp "block fine-tune: budget ${TRAIN_BUDGET}s"
if [ ! -f "$LOGS/.bft_started" ]; then
  rm -rf "$W/last_exp_global_stage"          # fresh run, not a resume of r4
  rm -f "$W/done_global" "$LOGS/loss_curve_exp_global_stage.npy"
  touch "$LOGS/.bft_started"
fi
DEADLINE=$(( $(date +%s) + TRAIN_BUDGET ))
ATTEMPT=0
while [ ! -f "$W/done_global" ]; do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  if [ "$REMAIN" -le 120 ]; then stamp "bft deadline after $ATTEMPT attempts"; break; fi
  ATTEMPT=$(( ATTEMPT + 1 ))
  stamp "bft attempt $ATTEMPT (remain ${REMAIN}s)"
  python global_training.py \
    --data_path "$DATA_BFT" --model_path "$W" --log_path "$LOGS" \
    --init_from pretrained_weights/best_run_exp_global_stage \
    --dynamic_epoch 0 0 0 --epoch_num 12 --learning_rate 5e-5 \
    --val_batches 25 --snapshot_steps 50 \
    --time_budget_s "$REMAIN" >> "$LOG" 2>&1 &
  TPID=$!
  T0=$(date +%s)
  HB=$LOGS/global_steps.log
  while kill -0 "$TPID" 2>/dev/null; do
    sleep 60
    HB_T=$(stat -c %Y "$HB" 2>/dev/null || echo 0)
    [ "$HB_T" -lt "$T0" ] && HB_T=$T0
    if [ $(( $(date +%s) - HB_T )) -gt 900 ]; then
      stamp "WATCHDOG: stale heartbeat, killing bft trainer $TPID"
      kill "$TPID" 2>/dev/null; sleep 10; kill -9 "$TPID" 2>/dev/null
      break
    fi
  done
  wait "$TPID"; RC=$?
  stamp "bft attempt $ATTEMPT exited rc=$RC"
  [ "$RC" -eq 0 ] && [ ! -f "$W/done_global" ] && break   # clean budget exit
  sleep 10
done
git add -f "$LOGS/exp_global_stage_training.txt" "$W/best_run_exp_global_stage" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Fine-tune the shared global stage on the block-crop/full-image mix"

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
      if [ $(( NOW - LAST_T )) -gt 600 ]; then
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

eval_none() {
  stamp "eval none"
  run_eval_guarded "$LOGS/eval_none.txt" timeout 2400 python -u blurry_edges_test.py \
    --data_path "$DATA_TEST" --model_path "$W" \
    --log_path "$LOGS/eval_none" --vis_max 10
  stamp "eval none rc=$?"
}
eval_big() {
  stamp "eval big"
  run_eval_guarded "$LOGS/eval_big.txt" timeout 3600 python -u blurry_edges_test_big.py \
    --data_path "$DATA_BIG" --model_path "$W" \
    --log_path "$LOGS/eval_big" --vis_max 5
  stamp "eval big rc=$?"
}

# --- 3) adjudicate the fine-tune ----------------------------------------------
eval_none
eval_big
if ! BE_R5_ROOT=$R python runs/r5/bless.py >> "$LOG" 2>&1; then
  stamp "bless: fine-tune REJECTED, re-evaluating with restored r4 stage"
  eval_none
  eval_big
else
  stamp "bless: fine-tune ACCEPTED"
fi
git add -f "$LOGS/eval_none.txt" "$LOGS/eval_big.txt" "$LOGS/blessed.json" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Adjudicate the block fine-tune: eval none/big + blessed.json"

# --- 4) w-variant fine-tune from the blessed shared best, then eval w ---------
W_BUDGET=${W_BUDGET:-4500}
rm -f "$W/done_global_w"
rm -rf "$W/last_exp_global_stage_w"
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
git add -f "$LOGS/eval_w.txt" "$LOGS/exp_global_stage_w_training.txt" \
  "$W/best_run_exp_global_stage_w" 2>/dev/null
git diff --cached --quiet || git commit -q -m "w-variant fine-tune from the blessed shared stage + eval"

# --- 5) densifier v2 (grad-matching + augment + shifted val), then eval pp ----
rm -rf "$W/best_run_exp_depth_completion_pp"
stamp "densifier v2 retrain"
BE_DENSIFY_ROOT=$R BE_DENSIFY_WEIGHTS=$W timeout 7200 python -u runs/r5/train_densify.py \
  >> "$LOG" 2>&1
stamp "densifier rc=$?"
stamp "eval pp"
run_eval_guarded "$LOGS/eval_pp.txt" timeout 2400 python -u blurry_edges_test.py \
  --data_path "$DATA_TEST" --model_path "$W" \
  --log_path "$LOGS/eval_pp" --vis_max 10 --densify pp
stamp "eval pp rc=$?"
git add -f "$LOGS/eval_pp.txt" "$LOGS/exp_depth_completion_training.txt" \
  "$W/best_run_exp_depth_completion_pp" "$W/pp_source.txt" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Densifier v2: gradient-matching loss, flip augmentation, parameter-shifted validation"

# --- 6) real-texture shard + eval rows ----------------------------------------
stamp "realshard generation"
BE_R5_ROOT=$R timeout 3600 python -u runs/r5/realshard.py > "$LOGS/realshard.log" 2>&1
stamp "realshard rc=$?"
if [ -f "$DATA_REAL/alphas.npy" ]; then
  stamp "eval real (none)"
  run_eval_guarded "$LOGS/eval_real.txt" timeout 1800 python -u blurry_edges_test.py \
    --data_path "$DATA_REAL" --model_path "$W" \
    --log_path "$LOGS/eval_real" --vis_max 6
  stamp "eval real rc=$?"
  stamp "eval real (pp)"
  run_eval_guarded "$LOGS/eval_real_pp.txt" timeout 1800 python -u blurry_edges_test.py \
    --data_path "$DATA_REAL" --model_path "$W" \
    --log_path "$LOGS/eval_real_pp" --vis_max 6 --densify pp
  stamp "eval real pp rc=$?"
  git add -f "$LOGS/realshard.log" "$LOGS/eval_real.txt" "$LOGS/eval_real_pp.txt" 2>/dev/null
  git diff --cached --quiet || git commit -q -m "Real-texture eval shard (COCO branch over freely-licensed photos) + accuracy rows"
fi

# --- 7) perf-decision refresh --------------------------------------------------
stamp "perf notes"
BE_R5_ROOT=$R BE_PERF_WEIGHTS=$W BE_PERF_DATA=$DATA_TEST \
  timeout 3600 python -u runs/r5/perf_notes.py > "$LOGS/perf_detail.txt" 2>&1
stamp "perf notes rc=$?"

# --- 8) install blessed checkpoints + metrics ----------------------------------
for CKPT in best_run_exp_global_stage best_run_exp_global_stage_w \
            best_run_exp_depth_completion_pp; do
  if [ -d "$W/$CKPT" ]; then
    rm -rf "pretrained_weights/$CKPT"
    cp -r "$W/$CKPT" pretrained_weights/
  fi
done
[ -f "$W/pp_source.txt" ] && cp "$W/pp_source.txt" pretrained_weights/
# round 5 does not extend the full-image run, so last_exp_global_stage keeps
# its round-4 resume snapshot in pretrained_weights as-is.
BE_METRICS_LOGS=/root/repo/$LOGS BE_METRICS_ROUND=5 \
  BE_METRICS_WEIGHTS=/root/repo/pretrained_weights \
  python runs/r5/make_metrics.py >> "$LOG" 2>&1
stamp "metrics rc=$?"
# refresh the val-curve evidence with this pass's block fine-tune heartbeats
BE_R5_ROOT=$R python runs/r5/valcurve.py >> "$LOG" 2>&1
stamp "valcurve rc=$?"
git add -f METRICS.md pretrained_weights "$LOGS/perf_notes.txt" \
  "$LOGS/perf_detail.txt" "$LOGS/blessed.json" "$LOGS/val_curve.png" \
  "$LOGS/val_curve_summary.txt" "$LOGS/loss_curve_exp_global_stage.npy" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Round-5 accuracy table: blessed checkpoints, per-row provenance, refreshed perf notes"

# --- 9) bench -------------------------------------------------------------------
stamp "bench"
BE_WEIGHTS=$PWD/pretrained_weights timeout 3600 python bench.py \
  > "$LOGS/bench.json" 2> "$LOGS/bench_detail.txt"
stamp "bench rc=$?"
git add -f "$LOGS/bench.json" "$LOGS/bench_detail.txt" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Round-5 bench artifact: blessed weights"

# --- 10) slow tier ---------------------------------------------------------------
stamp "slow-tier pytest"
timeout 5400 nice -n 15 python -m pytest tests/test_dp_harness.py \
  tests/test_big_sharded.py tests/test_eval_dp.py -q \
  > "$LOGS/slowtier_pytest.log" 2>&1
stamp "slow-tier rc=$?"
git add -f "$LOGS/slowtier_pytest.log" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Round-5 slow-tier DP/sharded-big-path test log"
stamp "round5 complete"
rm -f /tmp/round5.pid
