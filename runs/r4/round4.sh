#!/bin/bash
# Round-4 supervisor. The environment reset between rounds wiped every
# generated dataset (only git-tracked content survives), so before the staged
# training/eval chain (runs/r4/chain_all.sh) can run we must regenerate:
#   TPU queue: train/val shapes set -> global pre-calculation cache
#   CPU queue: 200-pair realistic test set -> 60-pair 587x587 big set
# Generation is fully seeded (set_seed(1869), threefry keys), so the
# regenerated train/val set is bit-identical to what the committed epoch-22
# resume snapshot was trained on; resuming from it is sound.
#
# Launch ONCE:  nohup bash runs/r4/round4.sh > runs/r4/logs/round4.out 2>&1 &
set -u
cd /root/repo
if [ -f /tmp/round4.pid ] && kill -0 "$(cat /tmp/round4.pid)" 2>/dev/null; then
  echo "round4 supervisor already running; exiting" >&2
  exit 0
fi
echo $$ > /tmp/round4.pid

R=runs/r4
W=$R/weights
LOGS=$R/logs
mkdir -p "$W" "$LOGS" "$R/jax_cache" runs/r2/data runs/r3/data
export JAX_COMPILATION_CACHE_DIR=/root/repo/$R/jax_cache
LOG=$LOGS/round4.log
stamp() { echo "=== [$(date '+%F %T')] $*" >> "$LOG"; }

DATA_TV=runs/r2/data/data_train_val
DATA_TEST=runs/r2/data/data_test
DATA_BIG=runs/r3/data/data_test_big_v2

# --- seed weights from the committed checkpoints ---------------------------
for CKPT in best_run_exp_local_stage best_run_exp_global_stage \
            best_run_exp_global_stage_w best_run_exp_depth_completion_pp; do
  if [ -d "pretrained_weights/$CKPT" ] && [ ! -d "$W/$CKPT" ]; then
    cp -r "pretrained_weights/$CKPT" "$W/"
  fi
done
if [ -d runs/r3/weights/last_exp_global_stage ] && [ ! -d "$W/last_exp_global_stage" ]; then
  cp -r runs/r3/weights/last_exp_global_stage "$W/"
fi
stamp "weights seeded (resume snapshot: $([ -d $W/last_exp_global_stage ] && echo yes || echo NO))"

# --- preflight: TPU tunnel ---------------------------------------------------
WAITED=0
while ! timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; do
  if [ "$WAITED" -ge 28800 ]; then stamp "ABORT: tunnel down ${WAITED}s"; exit 1; fi
  [ $(( WAITED % 600 )) -eq 0 ] && stamp "waiting for tunnel (${WAITED}s)"
  sleep 60; WAITED=$(( WAITED + 60 ))
done

# --- TPU queue: train/val generation (retry up to 3x) ------------------------
ATT=0
while [ ! -f "$DATA_TV/patches/alphas_val.npy" ] && [ "$ATT" -lt 3 ]; do
  ATT=$(( ATT + 1 ))
  stamp "train/val generation attempt $ATT (TPU)"
  timeout 7200 python -u train_val_data_generator.py --data_path "$DATA_TV" \
    > "$LOGS/gen_tv.log" 2>&1
  stamp "train/val generation rc=$?"
done
if [ ! -f "$DATA_TV/patches/alphas_val.npy" ]; then
  stamp "ABORT: train/val generation failed 3x"; exit 1
fi

# --- TPU queue: global pre-calculation ---------------------------------------
ATT=0
while [ ! -f "$DATA_TV/params_src_val.npy" ] && [ "$ATT" -lt 3 ]; do
  ATT=$(( ATT + 1 ))
  stamp "global pre-cal attempt $ATT (TPU)"
  timeout 7200 python -u global_data_pre_cal.py --data_path "$DATA_TV" \
    --model_path "$W" > "$LOGS/gen_precal.log" 2>&1
  stamp "pre-cal rc=$?"
done
if [ ! -f "$DATA_TV/params_src_val.npy" ]; then
  stamp "ABORT: pre-cal failed 3x"; exit 1
fi

# --- CPU queue in background (test set, then big set), nice'd ---------------
# The single host core is shared with the trainer's feed thread; nice keeps
# the TPU pipeline ahead. Both sets are only needed by evals hours from now.
(
  if [ ! -f "$DATA_TEST/alphas.npy" ]; then
    stamp "test-set generation start (CPU, 200 pairs)"
    JAX_PLATFORMS=cpu nice -n 10 python -u test_data_generator.py \
      --data_path "$DATA_TEST" > "$LOGS/gen_test.log" 2>&1
    stamp "test-set generation rc=$?"
  fi
  if [ ! -f "$DATA_BIG/DONE" ]; then
    stamp "big test-set generation start (CPU, 60 pairs)"
    JAX_PLATFORMS=cpu nice -n 10 python -u runs/r3/biggen_v2.py \
      > "$LOGS/gen_big.log" 2>&1
    stamp "big test-set generation rc=$?"
  fi
) &

# --- hand off to the staged chain -------------------------------------------
stamp "datagen complete; launching chain_all"
rm -f /tmp/round4.pid
exec bash runs/r4/chain_all.sh
