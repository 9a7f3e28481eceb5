#!/bin/bash
# Round-2 full training recipe on the real TPU (VERDICT item 2):
# data gen -> local stage (1000 epochs, lr 6e-5) -> test-set gen -> global
# pre-calculation -> global stage (350 epochs) -> densifier (pipeline-sourced)
# -> eval (none / w / pp) with committed metrics -> weights for bench.py.
# Stages skip when their artifacts exist, and the training harnesses resume
# from their own snapshots, so re-running after an interruption continues.
set -u
cd /root/repo
R2=runs/r2
DATA=$R2/data/data_train_val
TEST=$R2/data/data_test
W=$R2/weights
LOGS=$R2/logs
mkdir -p "$R2/data" "$W" "$LOGS"

stage() {
  # pause hook: `touch runs/PAUSE` to make the marathon yield the TPU at the
  # next stage boundary; remove the file to continue
  while [ -f runs/PAUSE ]; do sleep 20; done
  echo "=== [$(date -u '+%F %H:%M:%S')] $1 ==="
}

if [ ! -f "$DATA/patches/alphas_val.npy" ]; then
  stage "1/8 train+val data generation (on-device)"
  python train_val_data_generator.py --data_path "$DATA" || exit 1
else stage "1/8 data gen (cached)"; fi

if [ ! -f "$W/done_local" ]; then
  stage "2/8 local-stage training (1000 epochs)"
  python local_training.py --data_path "$DATA/patches" --model_path "$W" \
    --log_path "$LOGS" || exit 1
  touch "$W/done_local"
else stage "2/8 local training (done)"; fi

if [ ! -f "$TEST/alphas.npy" ]; then
  stage "3/8 realistic test-set generation (200 pairs)"
  python test_data_generator.py --data_path "$TEST" || exit 1
else stage "3/8 test gen (cached)"; fi

if [ ! -f "$DATA/params_src_val.npy" ]; then
  stage "4/8 global pre-calculation"
  python global_data_pre_cal.py --data_path "$DATA" --model_path "$W" || exit 1
else stage "4/8 precal (cached)"; fi

if [ ! -f "$W/done_global" ]; then
  stage "5/8 global-stage training (time-boxed; best-val checkpoints + snapshots land continuously)"
  timeout 4800 python global_training.py --data_path "$DATA" --model_path "$W" \
    --log_path "$LOGS"
  touch "$W/done_global"
else stage "5/8 global training (done)"; fi

stage "6/9 stage weights for bench"
mkdir -p pretrained_weights
for n in best_run_exp_local_stage best_run_exp_global_stage; do
  [ -d "$W/$n" ] && rm -rf "pretrained_weights/$n" && cp -r "$W/$n" "pretrained_weights/$n"
done

stage "7/9 evaluation (none / w) on 200 test pairs"
for D in none w; do
  ARGS=(--data_path "$TEST" --model_path "$W" --log_path "$LOGS/eval_$D")
  [ "$D" != none ] && ARGS+=(--densify "$D")
  mkdir -p "$LOGS/eval_$D"
  timeout 1200 python blurry_edges_test.py "${ARGS[@]}" 2>&1 | tee "$LOGS/eval_$D/eval.log" | tail -4
done

if [ ! -f "$W/done_densify" ]; then
  stage "8/9 densifier (U-Net) training, pipeline-sourced (time-boxed)"
  timeout 1800 python depth_completion_training.py --pipeline --data_path "$DATA" \
    --model_path "$W" --log_path "$LOGS"
  touch "$W/done_densify"
else stage "8/9 densifier (done)"; fi

stage "9/9 densify-pp eval"
[ -d "$W/best_run_exp_depth_completion_pp" ] && \
  rm -rf pretrained_weights/best_run_exp_depth_completion_pp && \
  cp -r "$W/best_run_exp_depth_completion_pp" pretrained_weights/
mkdir -p "$LOGS/eval_pp"
timeout 1200 python blurry_edges_test.py --densify pp --data_path "$TEST" \
  --model_path "$W" --log_path "$LOGS/eval_pp" 2>&1 | tee "$LOGS/eval_pp/eval.log" | tail -4
stage "marathon complete"
