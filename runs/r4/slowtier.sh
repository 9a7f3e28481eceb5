#!/bin/bash
# Round-4 full slow-tier rerun (VERDICT r3 item 7): one pytest process PER
# test file, not one monolithic run — a full-suite CPU pytest has wedged
# while a TPU trainer held the axon channel (round-3 observation), while
# per-file runs coexist fine. Each file gets its own timeout so a single
# hang cannot eat the round.
set -u
cd /root/repo
LOG=${1:-runs/r4/logs/slowtier_full.log}
: > "$LOG"
echo "=== slow-tier per-file run started $(date '+%F %T') ===" >> "$LOG"
FAIL=0
for F in tests/test_*.py; do
  # skip files with no slow tests quickly: pytest reports 'no tests ran'
  echo "--- $F $(date '+%T') ---" >> "$LOG"
  timeout 2700 python -m pytest "$F" -q -m slow >> "$LOG" 2>&1
  RC=$?
  if [ "$RC" -ne 0 ] && [ "$RC" -ne 5 ]; then  # 5 = no tests collected
    echo "FAILED rc=$RC: $F" >> "$LOG"
    FAIL=1
  fi
done
echo "=== slow-tier per-file run finished $(date '+%F %T') overall_fail=$FAIL ===" >> "$LOG"
exit $FAIL
