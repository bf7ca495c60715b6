#!/bin/bash
# Round-5 final TPU queue: takes over after the in-flight hyperplonk k=23
# stage exits.  Priority: k=22 e2e retry (all HBM fixes) -> MSM A/B ->
# protostar -> k=23+ zero_check with donated inputs -> the rest.
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG:-/tmp/r5_final.log}

while pgrep -f "python -u -m plonkish_tpu[.]benchmark" >/dev/null 2>&1; do sleep 60; done

run() {
  local t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [timeout ${t}s] $* ===" | tee -a "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $(date -u +%H:%M:%S) exit $? ---" | tee -a "$LOG"
}

run 7200 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 22..23 --breakdown
run 2400 python -u bench.py --msm-log2 20 --budget 600
run 2400 env PLONKISH_TPU_F32_MUL=1 python -u bench.py --msm-log2 20 --budget 600
run 7200 python -u -m plonkish_tpu.benchmark --system protostar --circuit aggregation --backend jax --k 18..19
run 5400 python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 23..25
run 3600 python -u -m plonkish_tpu.benchmark --system sangria --backend jax --k 8..9
run 1800 python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 20..23
run 2400 python -u bench.py --msm-log2 18 --budget 600
run 2400 env PLONKISH_TPU_F32_MUL=1 python -u bench.py --msm-log2 18 --budget 600
run 2400 python -u scripts/profile_zero_check.py 22
run 3600 python -u -m plonkish_tpu.benchmark --system hyperplonk --circuit vanilla_plonk_with_lookup --backend jax --k 18..19 --breakdown
run 5400 python -u -m plonkish_tpu.benchmark --system protostar --circuit aggregation --backend jax --k 19..21
run 3600 python -u -m plonkish_tpu.benchmark --system univariate_plonk --backend jax --k 16..18 --breakdown
echo "r5 final done $(date -u)" | tee -a "$LOG"
