#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r03 items 1, 3, 7, 8).
# Stages run sequentially; each appends to target/bench/* (FAILED rows on
# crash/timeout).  Waits for any in-flight benchmark process first.
set -u
cd "$(dirname "$0")/.."
LOG=${R4_LOG:-/tmp/r4_queue.log}

while pgrep -af plonkish_tpu.benchmark | grep -v -- --mesh | grep -q benchmark; do sleep 60; done

run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "${STAGE_TIMEOUT:-7200}" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" | tee -a "$LOG"
}

run python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 20..23 --breakdown
run python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 21..24
run python -u -m plonkish_tpu.benchmark --system hyperplonk --circuit vanilla_plonk_with_lookup --backend jax --k 18..19 --breakdown
run python -u -m plonkish_tpu.benchmark --system protostar --circuit aggregation --backend jax --k 18..21
run python -u -m plonkish_tpu.benchmark --system univariate_plonk --backend jax --k 16..17 --breakdown
run python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 16..17
run python -u scripts/validate_pallas_tpu.py f32
run python -u scripts/profile_zero_check.py 20
run python -u bench.py --msm-log2 18 --budget 1800
run python -u bench.py --msm-log2 20 --budget 1800
echo "r4 queue done $(date -u)" | tee -a "$LOG"
