"""Configuration / flag system (reference Cargo features + env,
SURVEY.md §5 "Config / flag system": `default = [parallel, timer]`,
`sanity-check`, `benchmark` features in plonkish_backend/Cargo.toml).

The reference's compile-time Cargo features become process-level environment
flags here, read once at import.  All knobs in one place:

| Env var                  | Values        | Meaning                         |
|--------------------------|---------------|---------------------------------|
| PLONKISH_TPU_BACKEND     | cpp (tests) / jax | execution backend for field/EC kernels: native multicore C++ runtime vs XLA (TPU) |
| PLONKISH_TPU_TIMER       | 0/1           | hierarchical timing spans (reference `timer` feature / ark-std print-trace) |
| PLONKISH_TPU_SANITY      | 0/1           | extra O(2^k) self-checks in provers (reference `sanity-check` feature) |
| JAX_PLATFORMS            | axon/cpu      | forced to `axon` (tunneled TPU) by this container; CPU runs must call `jax.config.update("jax_platforms", "cpu")` — the env var alone is overridden by sitecustomize |

`parallel` has no flag: intra-chip parallelism is XLA vectorization / OpenMP
in the native runtime, inter-chip is `jax.sharding` (see parallel/sharded.py).
"""

from __future__ import annotations

import os


def backend() -> str:
    """'cpp' or 'jax' — which kernel family executes field/EC ops."""
    return os.environ.get("PLONKISH_TPU_BACKEND", "jax")


def timer_enabled() -> bool:
    return os.environ.get("PLONKISH_TPU_TIMER", "0") == "1"


def sanity_checks() -> bool:
    """Gate for expensive internal assertions (reference `sanity-check`
    feature, e.g. sum-check claimed-sum validation at prove time)."""
    return os.environ.get("PLONKISH_TPU_SANITY", "0") == "1"


def fused_rounds() -> bool:
    """Single-dispatch sum-check rounds under device-FS: each round's
    (evals kernel, FS message, fold) run as ONE program, per-round
    constants are device-resident stacks indexed by an on-device round
    counter, and the tail (tape) rounds collapse into one lax.scan
    program shared across every k.  Cuts the ~6 tunnel messages per
    round (3 dispatches + 3 constant uploads) to ~1 per packed round +
    1 for the whole tail — the fixed per-prove latency on the tunneled
    TPU.  Set PLONKISH_TPU_FUSED_ROUNDS=0 for the per-program path."""
    return os.environ.get("PLONKISH_TPU_FUSED_ROUNDS", "1") == "1"


def device_fs() -> bool:
    """Device-resident Fiat-Shamir for the jax sum-check prover: the
    transcript sponge runs on device so every round's programs enqueue
    asynchronously (zero per-round host syncs — the tunneled-TPU latency
    fix, piop/fiat_shamir.py).  Default on; set PLONKISH_TPU_DEVICE_FS=0
    to fall back to the per-round host squeeze."""
    return os.environ.get("PLONKISH_TPU_DEVICE_FS", "1") == "1"
