#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r04 items 1, 4, 5).
#
# Ordering notes:
# - one k per stage so a crash/timeout costs only that k, never the rest;
# - zero_check at a given k runs BEFORE hyperplonk at the same k: they share
#   the sum-check kernels, so hyperplonk's cold cost is just SRS + MSM/open;
# - the persistent compile cache (/tmp/plonkish_tpu_jax_cache_tpu) and the
#   SRS disk cache (target/srs_cache) make every stage resumable: a killed
#   stage's finished compiles are kept, so a retry only pays the remainder.
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG:-/tmp/r5_queue.log}

run() {
  local t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [timeout ${t}s] $* ===" | tee -a "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $(date -u +%H:%M:%S) exit $? ---" | tee -a "$LOG"
}

# north star: e2e + zero_check rows at k=22..24
run 5400 python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 22..23
run 7200 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 22..23 --breakdown
run 5400 python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 23..24
run 7200 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 23..24 --breakdown
run 5400 python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 24..25
# folding rows (VERDICT item 4): fold + decider, fat timeout for the
# decider's one-off tail-scan compile
run 7200 python -u -m plonkish_tpu.benchmark --system protostar --circuit aggregation --backend jax --k 18..19
run 5400 python -u -m plonkish_tpu.benchmark --system sangria --backend jax --k 8..9
run 5400 python -u -m plonkish_tpu.benchmark --system protostar --circuit aggregation --backend jax --k 19..21
# lookup e2e at reference sizes
run 5400 python -u -m plonkish_tpu.benchmark --system hyperplonk --circuit vanilla_plonk_with_lookup --backend jax --k 18..19 --breakdown
# MSM A/B matrix (VERDICT item 5): 3 samples per config via --budget
run 2400 python -u bench.py --msm-log2 20 --budget 600
run 2400 env PLONKISH_TPU_F32_MUL=1 python -u bench.py --msm-log2 20 --budget 600
run 2400 python -u bench.py --msm-log2 18 --budget 600
run 2400 env PLONKISH_TPU_F32_MUL=1 python -u bench.py --msm-log2 18 --budget 600
run 3600 python -u scripts/sweep_sumcheck_s.py 18 8,16,32
# stretch: k=24 e2e
run 7200 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 24..25 --breakdown
echo "r5 queue done $(date -u)" | tee -a "$LOG"
