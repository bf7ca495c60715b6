"""Benchmark entry point — prints ONE JSON line.

Headline metric (BASELINE.json): MSM throughput on the JAX device (the TPU
under the driver), with the native multicore C++ host runtime as the baseline
column.  Falls back to modular-multiplication throughput if the MSM path
cannot complete within the time budget (e.g. cold compile cache).

Usage: python bench.py [--msm-log2 N] [--budget SECONDS] [--fieldmul-only]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import signal
import time

os.environ.setdefault("PLONKISH_TPU_BACKEND", "jax")


class _Timeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Timeout


def bench_msm(log2n: int, budget: int):
    """Returns (device_pts_per_s, native_pts_per_s) or raises."""
    import jax

    from plonkish_tpu.curves import msm as msm_mod
    from plonkish_tpu.curves.device import from_affine_host
    from plonkish_tpu.curves.host import AffinePoint
    from plonkish_tpu.curves.specs import BN254_G1
    from plonkish_tpu.fields import limb
    from plonkish_tpu.ops import field_cpp

    rng = random.Random(0)
    curve = BN254_G1
    g = AffinePoint.generator(curve)
    base_pts = [
        g.scalar_mul(rng.randrange(1, curve.scalar.p)) for _ in range(64)
    ]
    n = 1 << log2n
    pts = from_affine_host(curve, base_pts * (n // 64))
    pts_np = limb.np.asarray(pts, dtype=limb.np.uint32)
    scalars = limb.from_ints(
        [rng.randrange(curve.scalar.p) for _ in range(n)]
    )
    scalars_np = limb.np.asarray(scalars, dtype=limb.np.uint32)

    # Production MSM pattern: commits reuse one basis (the SRS), so the
    # affine normalization is hoisted and cached (pcs/kzg.py eq()); the
    # bench measures the same reused-basis shape.
    basis = pts
    if not limb.IS_CPP:
        import jax as _jax

        from plonkish_tpu.curves.msm import NormalizedPoints
        from plonkish_tpu.pallas.msm import normalize_points_jit

        basis = NormalizedPoints(
            *_jax.block_until_ready(normalize_points_jit(curve, pts))
        )

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(budget)
    try:
        res = msm_mod.variable_base_msm(curve, scalars, basis)  # compile+warm
        t0 = time.perf_counter()
        res2 = msm_mod.variable_base_msm(curve, scalars, basis)
        dt = time.perf_counter() - t0
    finally:
        signal.alarm(0)
    assert res == res2
    device_pps = n / dt

    # native baseline (all cores)
    from plonkish_tpu.curves.device import to_affine_host

    out = field_cpp.ec_msm(curve, scalars_np, pts_np.reshape(n, 3, limb.L))
    t0 = time.perf_counter()
    out = field_cpp.ec_msm(curve, scalars_np, pts_np.reshape(n, 3, limb.L))
    dt_host = time.perf_counter() - t0
    native_pps = n / dt_host
    # correctness gate: a kernel regression must fail the bench loudly
    native_pt = to_affine_host(curve, limb.xnp.asarray(out)[None])[0]
    assert res == native_pt, "device MSM result diverges from native"
    return device_pps, native_pps


def bench_fieldmul(log2n: int, iters: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from plonkish_tpu.fields import BN254_FR as spec
    from plonkish_tpu.fields import limb
    from plonkish_tpu.ops import field_cpp

    n = 1 << log2n
    rng = random.Random(0)
    host = np.asarray(
        limb.from_ints([rng.randrange(spec.p) for _ in range(4096)]),
        dtype=np.uint32,
    )
    vals = np.tile(host, ((2 * n + 4095) // 4096, 1))[: 2 * n]
    a_np, b_np = vals[:n], vals[n:]

    a, b = jnp.asarray(a_np), jnp.asarray(b_np)
    f = jax.jit(lambda x, y: limb._mont_mul_jax(spec, x, y))
    f(a, b).block_until_ready()
    t0 = time.perf_counter()
    out = a
    for _ in range(iters):
        out = f(out, b)
    out.block_until_ready()
    device_mps = n * iters / (time.perf_counter() - t0)

    field_cpp.mul(spec, a_np[:1024], b_np[:1024])
    t0 = time.perf_counter()
    for _ in range(max(1, iters // 6)):
        field_cpp.mul(spec, a_np, b_np)
    host_mps = n * max(1, iters // 6) / (time.perf_counter() - t0)
    return device_mps, host_mps


def main() -> None:
    ap = argparse.ArgumentParser()
    # 2^20 is the headline size: the bucket kernel's fixed costs amortize
    # ~4x better than at 2^18 (see docs/PERF_NOTES.md round 5)
    ap.add_argument("--msm-log2", type=int, default=20)
    ap.add_argument("--budget", type=int, default=1200)
    ap.add_argument("--fieldmul-only", action="store_true")
    args = ap.parse_args()

    import jax

    backend = jax.default_backend()
    # keep the persistent compile cache inside the repo: /tmp is wiped on
    # host restarts, which re-colds every Mosaic compile mid-campaign
    _root = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(
        _root,
        "target/jax_cache_tpu" if backend == "tpu" else "target/jax_cache_cpu",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    if not args.fieldmul_only:
        try:
            device_pps, native_pps = bench_msm(args.msm_log2, args.budget)
            from plonkish_tpu import roofline
            from plonkish_tpu.curves.specs import BN254_G1

            n = 1 << args.msm_log2
            secs = n / device_pps
            pct = roofline.roofline_pct(
                roofline.msm_u32_mul_ops(BN254_G1, n), secs, backend
            )
            hbm_pct = roofline.roofline_pct(
                roofline.msm_hbm_bytes(BN254_G1, n), secs, backend,
                kind="hbm_bytes",
            )
            print(
                json.dumps(
                    {
                        "metric": f"bn254_msm_2^{args.msm_log2}_throughput[{backend}]",
                        "value": round(device_pps, 1),
                        "unit": "points/s",
                        "vs_baseline": round(device_pps / native_pps, 3),
                        "roofline_pct": (
                            round(pct, 1) if pct is not None else None
                        ),
                        "roofline_hbm_pct": (
                            round(hbm_pct, 1) if hbm_pct is not None else None
                        ),
                    }
                )
            )
            return
        except Exception as e:
            import sys
            import traceback

            print(
                f"bench_msm failed ({type(e).__name__}: {str(e)[:200]}); "
                "falling back to field-mul",
                file=sys.stderr,
            )
            traceback.print_exc(limit=3, file=sys.stderr)

    device_mps, host_mps = bench_fieldmul(16, 30)
    print(
        json.dumps(
            {
                "metric": f"bn254_fr_mont_mul_throughput[{backend}]",
                "value": round(device_mps / 1e6, 3),
                "unit": "Mmul/s",
                "vs_baseline": round(device_mps / host_mps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
