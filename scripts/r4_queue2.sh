#!/bin/bash
# Round-4 TPU queue, phase 2: kernel microbenches + f32 MSM A/B + ceiling
# probes.  Waits for phase 1 (scripts/r4_queue.sh) to finish.
set -u
cd "$(dirname "$0")/.."
LOG=${R4_LOG2:-/tmp/r4_queue2.log}

while ! grep -q "r4 queue done" /tmp/r4_queue.log 2>/dev/null; do sleep 60; done

run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"
  timeout "${STAGE_TIMEOUT:-7200}" "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" | tee -a "$LOG"
}

run python -u scripts/sweep_sumcheck_s.py 18 8,16,32
run env PLONKISH_TPU_F32_MUL=1 python -u bench.py --msm-log2 18 --budget 1800
run env PLONKISH_TPU_F32_MUL=1 python -u bench.py --msm-log2 20 --budget 1800
# single-chip memory ceiling probe: k=23 hyperplonk ran in phase 1; try 24
run python -u -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 23..25 --breakdown
echo "r4 queue2 done $(date -u)" | tee -a "$LOG"
