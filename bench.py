"""Benchmark entry point — prints ONE JSON line.

Round-1 headline: modular-multiplication throughput of the JAX/XLA device
kernel (the substrate under MSM, sum-check, and every other prover loop),
measured on the default JAX device (the TPU under the driver), with the
native single-core C++ host runtime as the baseline column.

Usage: python bench.py [--batch LOG2] [--iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

os.environ.setdefault("PLONKISH_TPU_BACKEND", "jax")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=18, help="log2 batch size")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from plonkish_tpu.fields import BN254_FR as spec
    from plonkish_tpu.fields import limb
    from plonkish_tpu.ops import field_cpp

    n = 1 << args.batch
    rng = random.Random(0)
    # build inputs host-side, transfer once
    import numpy as np

    vals = np.empty((2 * n, limb.L), dtype=np.uint32)
    host = limb.from_ints([rng.randrange(spec.p) for _ in range(4096)])
    host_np = np.asarray(host, dtype=np.uint32)
    reps = (2 * n + 4095) // 4096
    vals = np.tile(host_np, (reps, 1))[: 2 * n]
    a_np, b_np = vals[:n], vals[n:]

    # --- device throughput ---
    a = jnp.asarray(a_np)
    b = jnp.asarray(b_np)
    f = jax.jit(lambda x, y: limb._mont_mul_jax(spec, x, y))
    f(a, b).block_until_ready()  # compile
    t0 = time.perf_counter()
    out = a
    for _ in range(args.iters):
        out = f(out, b)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    device_mps = n * args.iters / dt / 1e6

    # --- native host baseline (single core) ---
    fid_warm = field_cpp.mul(spec, a_np[:1024], b_np[:1024])
    t0 = time.perf_counter()
    iters_host = max(1, args.iters // 6)
    for _ in range(iters_host):
        field_cpp.mul(spec, a_np, b_np)
    dt_host = time.perf_counter() - t0
    host_mps = n * iters_host / dt_host / 1e6

    backend = jax.default_backend()
    print(
        json.dumps(
            {
                "metric": f"bn254_fr_mont_mul_throughput[{backend}]",
                "value": round(device_mps, 3),
                "unit": "Mmul/s",
                "vs_baseline": round(device_mps / host_mps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
