#!/bin/bash
# Round-5 TPU queue, phase 3: retry slots for stages phase 1 lost to the
# (since-fixed) normalize_points_jit HBM abort.  Waits for phase 2.
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG3:-/tmp/r5_queue3.log}

while ! grep -q "r5 queue2 done" /tmp/r5_queue2.log 2>/dev/null; do sleep 60; done

run() {
  local t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [timeout ${t}s] $* ===" | tee -a "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $(date -u +%H:%M:%S) exit $? ---" | tee -a "$LOG"
}

run 7200 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 22..23 --breakdown
run 5400 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 20..22 --breakdown
echo "r5 queue3 done $(date -u)" | tee -a "$LOG"
