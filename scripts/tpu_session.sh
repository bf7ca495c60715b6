#!/bin/bash
# One-shot TPU measurement session: run after any kernel/prover change,
# in dependency order (validation gates benches).  Each stage appends to
# target/bench/*; the persistent compile cache makes re-runs cheap.
#
# Usage: bash scripts/tpu_session.sh [stage...]   (default: all)
set -u
cd "$(dirname "$0")/.."
LOG=${TPU_SESSION_LOG:-/tmp/tpu_session.log}
stages=${*:-validate profile zero hyper protostar msm bench}

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout "${STAGE_TIMEOUT:-3600}" "$@" 2>&1 | tee -a "$LOG"
  return "${PIPESTATUS[0]}"
}

for st in $stages; do
  case $st in
    validate)
      # bit-exactness of the Pallas kernels on the chip — gates the rest
      run python -u scripts/validate_pallas_tpu.py sumcheck || exit 1
      run python -u scripts/validate_pallas_tpu.py msm || exit 1
      ;;
    profile)
      run python -u scripts/profile_zero_check.py 20
      ;;
    zero)
      run python -m plonkish_tpu.benchmark --system zero_check --backend jax --k 18..23
      ;;
    hyper)
      run python -m plonkish_tpu.benchmark --system hyperplonk --backend jax --k 20..23 --breakdown
      ;;
    protostar)
      run python -m plonkish_tpu.benchmark --system protostar --circuit aggregation --backend jax --k 18..21
      ;;
    uni)
      # BASELINE config[1]: halo2-comparison univariate backend at k=16
      run python -m plonkish_tpu.benchmark --system univariate_plonk --backend jax --k 16..17 --breakdown
      ;;
    msm)
      run python -u bench.py --msm-log2 18 --budget 1800
      run python -u bench.py --msm-log2 20 --budget 1800
      ;;
    bench)
      run python -u bench.py
      ;;
  esac
done
echo "tpu session done" | tee -a "$LOG"
