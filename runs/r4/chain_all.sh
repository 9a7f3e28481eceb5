#!/bin/bash
# Round-4 unattended chain. Launch ONCE at round start:
#   nohup bash runs/r4/chain_all.sh > runs/r4/logs/chain_all.out 2>&1 &
#
# Continues exactly where round 3's time budget cut training off:
# resume the shared global stage from the committed step snapshot
# (runs/r3/weights/last_exp_global_stage, epoch 22 + optimizer state) and
# finish the gamma-depth ramp (dynamic_epoch 8 16 28 -> final weights from
# epoch 28) plus post-ramp convergence epochs, then retrain the densifier
# pipeline-sourced, re-run all four evals, re-fine-tune the w-variant from
# the improved shared checkpoint, refresh METRICS.md, and commit each
# milestone. One TPU process at a time throughout.
#
# Budgets (env-overridable):
#   TRAIN_BUDGET  shared-stage training seconds (default 6 h)
#   W_BUDGET      w-variant fine-tune seconds   (default 90 min)
set -u
cd /root/repo
# single-instance guard: two chains = two TPU processes = crash
if [ -f /tmp/chain_all.pid ] && kill -0 "$(cat /tmp/chain_all.pid)" 2>/dev/null; then
  echo "chain_all already running (pid $(cat /tmp/chain_all.pid)); exiting" >&2
  exit 0
fi
echo $$ > /tmp/chain_all.pid
R=runs/r4
W=$R/weights
LOGS=$R/logs
mkdir -p "$W" "$LOGS" "$R/jax_cache"
# seed the compile cache from round 3 (same programs/shapes -> warm hits)
cp -n runs/r3/jax_cache/* "$R/jax_cache/" 2>/dev/null
export JAX_COMPILATION_CACHE_DIR=/root/repo/$R/jax_cache
LOG=$LOGS/chain_all.log
stamp() { echo "=== [$(date '+%F %T')] $*" >> "$LOG"; }
TRAIN_BUDGET=${TRAIN_BUDGET:-21600}
W_BUDGET=${W_BUDGET:-5400}
DATA_TV=runs/r2/data/data_train_val
DATA_TEST=runs/r2/data/data_test
# the 60-pair big set regenerates on CPU in parallel with training (the env
# reset wiped all datasets); resolve the path at eval time, not here
resolve_data_big() {
  if [ -f runs/r3/data/data_test_big_v2/DONE ]; then
    echo runs/r3/data/data_test_big_v2
  else
    echo runs/r3/data/data_test_big
  fi
}

# --- preflight: the TPU tunnel relay (127.0.0.1:8082) must be alive --------
# When the relay daemon dies (observed at the end of round 3), EVERY process
# that initializes the axon backend hangs forever at startup; a chain that
# launches anyway burns its whole budget on watchdog kill/retry loops. Wait
# up to 8 h for the environment to restore it (round 4 began with the relay
# down), else abort loudly.
WAITED=0
while ! timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; do
  if [ "$WAITED" -ge 28800 ]; then
    stamp "ABORT: TPU tunnel relay down for ${WAITED}s (ps aux | grep tpu_init)"
    exit 1
  fi
  [ $(( WAITED % 600 )) -eq 0 ] && stamp "waiting for tunnel (${WAITED}s)"
  sleep 60; WAITED=$(( WAITED + 60 ))
done
[ "$WAITED" -gt 0 ] && stamp "tunnel came up after ${WAITED}s"

# shrink the training budget if the tunnel outage ate into the round:
# BE_ROUND_END_TS (epoch seconds) marks when the round's wall clock runs out;
# reserve ~3.5 h after training for densify + 4 evals + w fine-tune + bench
# + slow tier, clamp to [30 min, TRAIN_BUDGET].
if [ -n "${BE_ROUND_END_TS:-}" ]; then
  AVAIL=$(( BE_ROUND_END_TS - $(date +%s) - 12600 ))
  if [ "$AVAIL" -lt "$TRAIN_BUDGET" ]; then
    [ "$AVAIL" -lt 1800 ] && AVAIL=1800
    stamp "trimming TRAIN_BUDGET $TRAIN_BUDGET -> $AVAIL (round end $(date -d @$BE_ROUND_END_TS '+%T'))"
    TRAIN_BUDGET=$AVAIL
  fi
fi

# --- 0) seed round-4 weights/logs from round 3 (resume continuity) ---------
for CKPT in best_run_exp_local_stage best_run_exp_global_stage \
            best_run_exp_global_stage_w best_run_exp_depth_completion_pp \
            last_exp_global_stage; do
  if [ -d "runs/r3/weights/$CKPT" ] && [ ! -d "$W/$CKPT" ]; then
    cp -r "runs/r3/weights/$CKPT" "$W/"
  fi
done
cp -n runs/r3/weights/pp_source.txt "$W/" 2>/dev/null
cp -n runs/r3/logs/exp_global_stage_training.txt "$LOGS/" 2>/dev/null
cp -n runs/r3/logs/loss_curve_exp_global_stage.npy "$LOGS/" 2>/dev/null
stamp "seeded $W from runs/r3 (resume snapshot present: $([ -d $W/last_exp_global_stage ] && echo yes || echo NO))"

# --- 1) resume shared global-stage training (supervised retry + watchdog) --
DEADLINE=$(( $(date +%s) + TRAIN_BUDGET ))
ATTEMPT=0
while [ ! -f "$W/done_global" ]; do
  REMAIN=$(( DEADLINE - $(date +%s) ))
  if [ "$REMAIN" -le 120 ]; then stamp "train deadline after $ATTEMPT attempts"; break; fi
  ATTEMPT=$(( ATTEMPT + 1 ))
  stamp "trainer attempt $ATTEMPT (remain ${REMAIN}s)"
  python global_training.py \
    --data_path "$DATA_TV" --model_path "$W" --log_path "$LOGS" \
    --train_subset 2500 --val_batches 25 --snapshot_steps 50 \
    --epoch_num 60 --dynamic_epoch 8 16 28 \
    --time_budget_s "$REMAIN" >> "$LOG" 2>&1 &
  TPID=$!
  T0=$(date +%s)
  HB=$LOGS/global_steps.log
  while kill -0 "$TPID" 2>/dev/null; do
    sleep 60
    HB_T=$(stat -c %Y "$HB" 2>/dev/null || echo 0)
    if [ "$HB_T" -lt "$T0" ]; then HB_T=$T0; fi
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
git diff --cached --quiet || git commit -q -m "Resume global-stage training through the gamma ramp (round-4 continuation)"

# --- 2) densifier retrain, pipeline-sourced from the improved checkpoint ---
# force a retrain against the ramp-complete global stage: the driver would
# otherwise load the round-3 pp checkpoint and the resolver keeps pipelines
# consistent with whatever global stage produced the sparse maps
rm -rf "$W/best_run_exp_depth_completion_pp"
stamp "densifier retrain (pipeline-sourced, BE_DENSIFY_ROOT=$R)"
BE_DENSIFY_ROOT=$R timeout 4500 python runs/r3/train_densify.py >> "$LOG" 2>&1
stamp "densifier rc=$?"

# run_eval_guarded OUT CMD...: run CMD > OUT with a stall watchdog (the
# runtime sporadically hangs a process AT STARTUP — observed on an eval:
# 2 s of CPU, zero output, forever; a plain `timeout 2400` burns 40 min per
# hang). Kill when OUT stops growing for 10 min; retry once in a fresh
# process (fresh processes usually succeed).
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
# wait up to 45 min for the background big-set generation to finish
WAITED=0
while [ ! -f runs/r3/data/data_test_big_v2/DONE ] && [ "$WAITED" -lt 2700 ]; do
  sleep 60; WAITED=$(( WAITED + 60 ))
done
DATA_BIG=$(resolve_data_big)
if [ -f "$DATA_BIG/images_ny.npy" ]; then
  stamp "eval big ($DATA_BIG)"
  run_eval_guarded "$LOGS/eval_big.txt" timeout 2400 python -u blurry_edges_test_big.py \
    --data_path "$DATA_BIG" --model_path "$W" \
    --log_path "$LOGS/eval_big" --vis_max 5
  stamp "eval big rc=$?"
fi

# --- 4) w-variant fine-tune from the improved shared best, then eval w -----
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
    if [ "$HB_T" -lt "$T0" ]; then HB_T=$T0; fi
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

# --- 5) metrics + stage checkpoints + commit --------------------------------
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
git diff --cached --quiet || git commit -q -m "Round-4 accuracy table: metrics with the ramp-complete global stage (none/w/pp/big)"

# --- 5.5) committed bench artifact with the round's trained weights --------
stamp "bench"
BE_WEIGHTS=$PWD/pretrained_weights timeout 3600 python bench.py \
  > "$LOGS/bench.json" 2> "$LOGS/bench_detail.txt"
stamp "bench rc=$?"
git add -f "$LOGS/bench.json" "$LOGS/bench_detail.txt" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Round-4 bench artifact: trained weights, Pallas on/off delta, batch sweep"

# --- 6) slow-tier guarantees (TPU idle now; CPU-only mesh tests) ------------
stamp "slow-tier pytest"
timeout 5400 python -m pytest tests/test_dp_harness.py tests/test_big_sharded.py -q \
  > "$LOGS/slowtier_pytest.log" 2>&1
stamp "slow-tier rc=$?"
git add -f "$LOGS/slowtier_pytest.log" 2>/dev/null
git diff --cached --quiet || git commit -q -m "Round-4 slow-tier DP/sharded-big-path test log"
stamp "chain_all complete"
