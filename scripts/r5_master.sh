#!/bin/bash
# Round-5 consolidated TPU measurement queue (replaces r5_queue{,2,3}.sh,
# whose stages kept racing in-flight HBM fixes: a stage imports the code
# present at its own start, so retries must come AFTER the fix lands).
# Priority: e2e k>=22 rows -> protostar/sangria -> MSM A/B -> the rest.
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG:-/tmp/r5_master.log}

run() {
  local t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [timeout ${t}s] $* ===" | tee -a "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $(date -u +%H:%M:%S) exit $? ---" | tee -a "$LOG"
}

# 1. north-star e2e rows with every k>=22 HBM fix in the tree
run 7200 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 22..23 --breakdown
run 5400 python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 23..25
run 7200 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 23..24 --breakdown
# 2. folding rows (VERDICT item 4)
run 7200 python -u -m plonkish_tpu.benchmark --system protostar --circuit aggregation --backend jax --k 18..19
run 5400 python -u -m plonkish_tpu.benchmark --system sangria --backend jax --k 8..9
# 3. MSM A/B matrix (VERDICT item 5)
run 2400 python -u bench.py --msm-log2 20 --budget 600
run 2400 env PLONKISH_TPU_F32_MUL=1 python -u bench.py --msm-log2 20 --budget 600
run 2400 python -u bench.py --msm-log2 18 --budget 600
run 2400 env PLONKISH_TPU_F32_MUL=1 python -u bench.py --msm-log2 18 --budget 600
# 4. quiet re-runs of the loaded-host rows + the k=22 sum-check profile
run 1800 python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 20..23
run 3600 python -u scripts/profile_zero_check.py 22
# 5. remaining coverage
run 5400 python -u -m plonkish_tpu.benchmark --system protostar --circuit aggregation --backend jax --k 19..21
run 5400 python -u -m plonkish_tpu.benchmark --system hyperplonk --circuit vanilla_plonk_with_lookup --backend jax --k 18..19 --breakdown
run 5400 python -u -m plonkish_tpu.benchmark --system sangria --backend jax --k 5..6
run 5400 python -u -m plonkish_tpu.benchmark --system univariate_plonk --backend jax --k 16..18 --breakdown
run 7200 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 24..25 --breakdown
echo "r5 master done $(date -u)" | tee -a "$LOG"
