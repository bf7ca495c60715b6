#!/bin/bash
# Round-5 TPU queue, phase 2: follow-ups after the main measurement queue.
# Waits for phase 1 (scripts/r5_queue.sh) to finish.
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG2:-/tmp/r5_queue2.log}

while ! grep -q "r5 queue done" /tmp/r5_queue.log 2>/dev/null; do sleep 60; done

run() {
  local t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [timeout ${t}s] $* ===" | tee -a "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $(date -u +%H:%M:%S) exit $? ---" | tee -a "$LOG"
}

# quiet re-runs now that every compile is cached: cheap, replaces rows
# measured while the host was saturated
run 1800 python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 20..23
# where do the k=22 sum-check's 7.7s go? (k=21 was 1.6s)
run 3600 python -u scripts/profile_zero_check.py 22
# the VERDICT-named sangria case: k=5 fold must complete in any timeout
run 5400 python -u -m plonkish_tpu.benchmark --system sangria --backend jax --k 5..6
run 5400 python -u -m plonkish_tpu.benchmark --system univariate_plonk --backend jax --k 16..18 --breakdown
echo "r5 queue2 done $(date -u)" | tee -a "$LOG"
