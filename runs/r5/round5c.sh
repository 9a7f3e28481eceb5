#!/bin/bash
# Round-5c (restart-window endgame): after the test-set regeneration and the
# real-texture shard generation, run the remaining TPU queue serially —
#   1. eval on the real-texture shard (none, then pp)
#   2. fresh eval_none on the regenerated 200-pair set (confirms the
#      seed-regenerated data reproduces the round-4 numbers with the same
#      blessed weights, giving the none row a round-5 log)
#   3. rebuild METRICS.md + commit artifacts
# Every stage respects BE_DEADLINE_TS (epoch seconds): stages that would
# start too late are skipped so the TPU is free before the driver's
# end-of-round bench.
set -u
cd /root/repo
R=runs/r5
LOGS=$R/logs
W=pretrained_weights
DATA_TEST=runs/r2/data/data_test
DATA_REAL=$R/data/data_test_real
export JAX_COMPILATION_CACHE_DIR=/root/repo/$R/jax_cache
DEADLINE=${BE_DEADLINE_TS:?set BE_DEADLINE_TS}
LOG=$LOGS/round5c.log
stamp() { echo "=== [$(date '+%F %T')] $*" >> "$LOG"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
stamp "round5c start, $(left)s to deadline"

# wait for the realshard generator to finish (it holds the TPU)
while ps -eo args | grep -v grep | grep -q "runs/r5/realshard.py"; do
  sleep 15
  [ "$(left)" -le 60 ] && { stamp "deadline while waiting for realshard"; exit 1; }
done
stamp "realshard generator done"

run_eval() {  # run_eval <out> <budget_floor_s> <cmd...>
  local OUT=$1 FLOOR=$2; shift 2
  if [ "$(left)" -le "$FLOOR" ]; then stamp "SKIP $OUT ($(left)s left < ${FLOOR}s floor)"; return 1; fi
  stamp "start $OUT ($(left)s left)"
  timeout $(( $(left) - 60 )) "$@" > "$OUT" 2>&1
  local RC=$?
  stamp "done $OUT rc=$RC"
  grep -q "Average metrics" "$OUT"
}

if [ -f "$DATA_REAL/alphas.npy" ]; then
  run_eval "$LOGS/eval_real.txt" 420 python -u blurry_edges_test.py \
    --data_path "$DATA_REAL" --model_path "$W" --log_path "$LOGS/eval_real" --vis_max 4
  run_eval "$LOGS/eval_real_pp.txt" 300 python -u blurry_edges_test.py \
    --data_path "$DATA_REAL" --model_path "$W" --log_path "$LOGS/eval_real_pp" --vis_max 4 --densify pp
else
  stamp "realshard data missing; skipping real rows"
fi

run_eval "$LOGS/eval_none.txt" 300 python -u blurry_edges_test.py \
  --data_path "$DATA_TEST" --model_path "$W" --log_path "$LOGS/eval_none" --vis_max 6

BE_METRICS_LOGS=/root/repo/$LOGS BE_METRICS_ROUND=5 \
  BE_METRICS_WEIGHTS=/root/repo/pretrained_weights \
  python $R/make_metrics.py >> "$LOG" 2>&1
stamp "metrics rc=$?"

git add -f METRICS.md README.md tests/test_weights_big.py \
  "$LOGS/perf_notes.txt" "$LOGS/blessed.json" 2>/dev/null
for F in "$LOGS/eval_real.txt" "$LOGS/eval_real_pp.txt" "$LOGS/eval_none.txt" \
         "$LOGS/realshard.log" "$LOGS/round5c.log" "$LOGS/gen_test.log"; do
  [ -f "$F" ] && git add -f "$F"
done
git diff --cached --quiet || git commit -q -m "Round-5 accuracy table: per-row log provenance, real-texture shard rows, refreshed perf notes"
stamp "round5c complete, $(left)s to spare"
