#!/bin/bash
# Round-5 session-5 queue: chained after the manual hyperplonk k=22 run.
# zero_check k>=23 (primed or streaming-safe setup), protostar retry with
# heartbeats, then the remaining empty tables.
# Usage: r5_session5.sh [pid-to-wait-for]
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG:-target/r5_session5.log}

if [ $# -ge 1 ]; then
  while [ -d "/proc/$1" ]; do sleep 20; done
fi

run() {
  local t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [timeout ${t}s] $* ===" | tee -a "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $(date -u +%H:%M:%S) exit $? ---" | tee -a "$LOG"
}

run 3600 python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 23..25
run 3600 python -u -m plonkish_tpu.benchmark --system protostar --circuit aggregation --backend jax --k 18..19
run 1800 python -u -m plonkish_tpu.benchmark --system pcs --pcs kzg --backend jax --k 16..19
run 1800 python -u -m plonkish_tpu.benchmark --system sangria --backend jax --k 6..7
run 2400 python -u -m plonkish_tpu.benchmark --system univariate_plonk --backend jax --k 16..18 --breakdown
run 900 python -u bench.py --msm-log2 20 --budget 600
run 3600 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 20..22 --breakdown
echo "r5 session5 done $(date -u)" | tee -a "$LOG"
