"""Pallas (Mosaic) TPU kernels for the hot loops.

Round-1 measurements (docs/PERF_NOTES.md) showed the XLA paths are
pass-bound: tensor-form digit arithmetic breaks elementwise fusion (~100
HBM passes per Montgomery multiply) and the fused struct-of-arrays XLA
kernels blow up compile time at bench sizes.  Pallas fixes both failure
modes at once:

- the kernel body is compiled ONCE per block and iterated by the grid, so
  compile size no longer scales with the problem;
- block layout is explicit ([L, S, 128] digit-major tiles), so XLA's layout
  assignment can't tile-pad the 16-digit minor axis 8x;
- bucket/table state lives in VMEM across grid steps (the accumulator
  pattern), so the inner loop never round-trips HBM.

The kernels reuse the struct-of-arrays field/EC formulas from
`fields/soa.py` / `curves/device.py` verbatim — inside a Pallas body the
"arrays" are [S, 128] VMEM tiles and every digit interaction is a plain
VPU op.

Layout convention ("lane-tiled digit-major"): a batch of N field elements
is a u32 tensor [L, N // 128, 128]; digit d of element i lives at
[d, i // 128, i % 128].  N must be padded to a multiple of 8*128 by the
caller (rows group into [S=8, 128] VPU tiles).
"""

from __future__ import annotations

import os

LANE = 128
SUBLANE = 8
TILE = LANE * SUBLANE


def is_available() -> bool:
    """True when Pallas kernels should be used (real TPU backend, not
    disabled by env)."""
    flag = os.environ.get("PLONKISH_TPU_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    import jax

    return jax.default_backend() == "tpu"


def interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (tests, CPU mesh)."""
    import jax

    return jax.default_backend() != "tpu"
