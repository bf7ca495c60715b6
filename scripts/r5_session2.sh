#!/bin/bash
# Round-5 session-2 TPU queue.  The host restarted mid-round and wiped the
# /tmp compile cache, so every stage re-pays cold Mosaic compiles; caches
# now live in target/ (commit 'repo-resident caches').  Ordering: cheapest
# missing rows first (zero_check k>=23 needs no SRS), then the k=22 e2e
# retry, then the empty tables (protostar/univariate), then extras.
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG:-target/r5_session2.log}

run() {
  local t=$1; shift
  echo "=== $(date -u +%H:%M:%S) [timeout ${t}s] $* ===" | tee -a "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- $(date -u +%H:%M:%S) exit $? ---" | tee -a "$LOG"
}

# 1. zero_check k>=23 with the donated-input fix (b660a04) - no SRS needed
run 2700 python -u -m plonkish_tpu.benchmark --system zero_check --backend jax --k 23..25
# 2. north-star e2e retry at k=22 with all HBM fixes
run 5400 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 22..23 --breakdown
# 3. empty tables: protostar (rows=0), then sangria k=6, then univariate
run 5400 python -u -m plonkish_tpu.benchmark --system protostar --circuit aggregation --backend jax --k 18..19
run 2700 python -u -m plonkish_tpu.benchmark --system sangria --backend jax --k 6..7
run 3600 python -u -m plonkish_tpu.benchmark --system univariate_plonk --backend jax --k 16..18 --breakdown
# 4. coverage extras
run 3600 python -u -m plonkish_tpu.benchmark --system hyperplonk --circuit vanilla_plonk_with_lookup --backend jax --k 18..19 --breakdown
run 5400 python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 23..24 --breakdown
run 1800 python -u bench.py --msm-log2 20 --budget 600
echo "r5 session2 done $(date -u)" | tee -a "$LOG"
