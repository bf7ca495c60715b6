#!/bin/bash
# Round-5 session-3 queue: re-prioritized mid-session.
# - protostar first: its table has ZERO committed rows (VERDICT item 4);
# - then the k=22 e2e north-star retry (the 15:24 RESOURCE_EXHAUSTED ran
#   while concurrent queues shared the chip's HBM — single-queue retry);
# - then re-measure k=20..22: the committed 04:17 rows predate the MSM
#   basis-normalization hoist (041ebc0) and both runs were MSM-bound.
# Usage: r5_session3.sh [pid-to-wait-for]
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG:-target/r5_session3.log}

if [ $# -ge 1 ]; then
  while [ -d "/proc/$1" ]; do sleep 20; done
fi

run() {
  local t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [timeout ${t}s] $* ===" | tee -a "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $(date -u +%H:%M:%S) exit $? ---" | tee -a "$LOG"
}

run 3000 python -u -m plonkish_tpu.benchmark --system protostar --circuit aggregation --backend jax --k 18..19
run 3600 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 22..23 --breakdown
run 3600 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 20..22 --breakdown
run 1800 python -u -m plonkish_tpu.benchmark --system univariate_plonk --backend jax --k 16..18 --breakdown
run 1800 python -u -m plonkish_tpu.benchmark --system sangria --backend jax --k 6..7
run 1500 python -u -m plonkish_tpu.benchmark --system pcs --pcs kzg --backend jax --k 16..19
run 1200 python -u bench.py --msm-log2 20 --budget 600
echo "r5 session3 done $(date -u)" | tee -a "$LOG"
