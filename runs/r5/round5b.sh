#!/bin/bash
# Round-5b supervisor: the round restarted with a fresh wall clock and a wiped
# scratch area (datasets and scratch weights are not git-tracked; only
# pretrained_weights/ and logs survive). Regenerate every dataset the round-5
# chain (runs/r5/round5.sh) depends on, then hand off to that chain.
#
# Regeneration order (all on the TPU queue — the jitted synth chain is
# seconds/sample on-chip vs hours on this host's single core):
#   1. train/val shapes set (seeded -> bit-identical to the one the committed
#      checkpoints were trained on)
#   2. global pre-calculation over it (params_src_*.npy, needed by the w
#      fine-tune and by blockgen's full-image mix half)
#   3. 200-pair realistic 147x147 test set
#   4. 60-pair 587x587 big test set (v3)
#   5. drop the stale blockft manifest (its .npy payload was wiped) so the
#      chain's blockgen stage regenerates the block-crop mix
#
# Launch ONCE:  nohup bash runs/r5/round5b.sh > runs/r5/logs/round5b.out 2>&1 &
set -u
cd /root/repo
if [ -f /tmp/round5b.pid ] && kill -0 "$(cat /tmp/round5b.pid)" 2>/dev/null; then
  echo "round5b supervisor already running; exiting" >&2
  exit 0
fi
echo $$ > /tmp/round5b.pid

R=runs/r5
LOGS=$R/logs
DATA_TV=runs/r2/data/data_train_val
DATA_TEST=runs/r2/data/data_test
DATA_BIG=runs/r4/data/data_test_big_v3
DATA_BFT=$R/data/data_blockft
mkdir -p "$LOGS" "$R/jax_cache" runs/r2/data runs/r4/data
export JAX_COMPILATION_CACHE_DIR=/root/repo/$R/jax_cache
LOG=$LOGS/round5b.log
stamp() { echo "=== [$(date '+%F %T')] $*" >> "$LOG"; }
stamp "round5b start (round end ts: ${BE_ROUND_END_TS:-unset})"

# --- preflight: TPU tunnel ----------------------------------------------------
WAITED=0
while ! timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; do
  if [ "$WAITED" -ge 14400 ]; then stamp "ABORT: tunnel down ${WAITED}s"; exit 1; fi
  [ $(( WAITED % 600 )) -eq 0 ] && stamp "waiting for tunnel (${WAITED}s)"
  sleep 60; WAITED=$(( WAITED + 60 ))
done
[ "$WAITED" -gt 0 ] && stamp "tunnel came up after ${WAITED}s"

# --- 1) train/val generation (TPU) ---------------------------------------------
ATT=0
while [ ! -f "$DATA_TV/patches/alphas_val.npy" ] && [ "$ATT" -lt 3 ]; do
  ATT=$(( ATT + 1 ))
  stamp "train/val generation attempt $ATT (TPU)"
  timeout 7200 python -u train_val_data_generator.py --data_path "$DATA_TV" \
    > "$LOGS/gen_tv.log" 2>&1
  stamp "train/val generation rc=$?"
done
[ -f "$DATA_TV/patches/alphas_val.npy" ] || { stamp "ABORT: tv gen failed"; exit 1; }

# --- 2) global pre-calculation (TPU; local stage read from pretrained_weights) --
ATT=0
while [ ! -f "$DATA_TV/params_src_val.npy" ] && [ "$ATT" -lt 3 ]; do
  ATT=$(( ATT + 1 ))
  stamp "global pre-cal attempt $ATT (TPU)"
  timeout 7200 python -u global_data_pre_cal.py --data_path "$DATA_TV" \
    --model_path pretrained_weights > "$LOGS/gen_precal.log" 2>&1
  stamp "pre-cal rc=$?"
done
[ -f "$DATA_TV/params_src_val.npy" ] || { stamp "ABORT: pre-cal failed"; exit 1; }

# --- 3) 200-pair realistic test set (TPU) ---------------------------------------
ATT=0
while [ ! -f "$DATA_TEST/alphas.npy" ] && [ "$ATT" -lt 2 ]; do
  ATT=$(( ATT + 1 ))
  stamp "test-set generation attempt $ATT (TPU, 200 pairs)"
  timeout 5400 python -u test_data_generator.py --data_path "$DATA_TEST" \
    > "$LOGS/gen_test.log" 2>&1
  stamp "test-set generation rc=$?"
done
[ -f "$DATA_TEST/alphas.npy" ] || { stamp "ABORT: test gen failed"; exit 1; }

# --- 4) 60-pair 587x587 big set (TPU) -------------------------------------------
ATT=0
while [ ! -f "$DATA_BIG/DONE" ] && [ "$ATT" -lt 2 ]; do
  ATT=$(( ATT + 1 ))
  stamp "big test-set generation attempt $ATT (TPU, 60 pairs)"
  timeout 7200 python -u runs/r4/biggen_tpu.py > "$LOGS/gen_big.log" 2>&1
  stamp "big test-set generation rc=$?"
done
[ -f "$DATA_BIG/DONE" ] || { stamp "ABORT: big gen failed"; exit 1; }

# --- 5) stale blockft manifest: payload wiped, force blockgen to re-run ---------
if [ -f "$DATA_BFT/manifest.json" ] && [ ! -f "$DATA_BFT/params_src_train.npy" ]; then
  stamp "dropping stale blockft manifest (payload wiped by env reset)"
  rm -f "$DATA_BFT/manifest.json"
fi
rm -f "$LOGS/.bft_started"

stamp "regeneration complete; handing off to runs/r5/round5.sh"
rm -f /tmp/round5b.pid /tmp/round5.pid
exec bash runs/r5/round5.sh
