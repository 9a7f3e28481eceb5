#!/bin/bash
# Round-2 marathon continuation: global training (time-boxed) -> weights ->
# eval none/w -> densifier -> eval pp. Stage 1-4 artifacts already exist.
set -u
cd /root/repo
R2=runs/r2
DATA=$R2/data/data_train_val
TEST=$R2/data/data_test
W=$R2/weights
LOGS=$R2/logs
GLOBAL_BOX=${GLOBAL_BOX:-4200}

stage() { echo "=== [$(date -u '+%F %H:%M:%S')] $1 ==="; }

stage "global-stage training (time-boxed ${GLOBAL_BOX}s; best-val ckpts + snapshots land continuously)"
timeout "$GLOBAL_BOX" python global_training.py --data_path "$DATA" --model_path "$W" \
  --log_path "$LOGS"

stage "stage weights for bench"
mkdir -p pretrained_weights
for n in best_run_exp_local_stage best_run_exp_global_stage; do
  [ -d "$W/$n" ] && rm -rf "pretrained_weights/$n" && cp -r "$W/$n" "pretrained_weights/$n"
done

stage "evaluation (none / w) on 200 test pairs"
for D in none w; do
  ARGS=(--data_path "$TEST" --model_path "$W" --log_path "$LOGS/eval_$D")
  [ "$D" != none ] && ARGS+=(--densify "$D")
  mkdir -p "$LOGS/eval_$D"
  timeout 1200 python blurry_edges_test.py "${ARGS[@]}" 2>&1 | tee "$LOGS/eval_$D/eval.log" | tail -4
done

stage "densifier (U-Net) training, pipeline-sourced (time-boxed)"
timeout 1500 python depth_completion_training.py --pipeline --data_path "$DATA" \
  --model_path "$W" --log_path "$LOGS"

stage "densify-pp eval"
if [ -d "$W/best_run_exp_depth_completion_pp" ]; then
  rm -rf pretrained_weights/best_run_exp_depth_completion_pp
  cp -r "$W/best_run_exp_depth_completion_pp" pretrained_weights/
  mkdir -p "$LOGS/eval_pp"
  timeout 900 python blurry_edges_test.py --densify pp --data_path "$TEST" \
    --model_path "$W" --log_path "$LOGS/eval_pp" 2>&1 | tee "$LOGS/eval_pp/eval.log" | tail -4
fi
stage "marathon2 complete"
