"""On-chip validation of the Pallas kernels (run with the TPU attached).

Bit-exactness checks that tests/test_pallas.py would run in interpret mode,
executed natively on the TPU instead (interpret mode's per-grid-step inlining
makes the CPU XLA compile intractable).  Usage:

    python scripts/validate_pallas_tpu.py            # all kernels
    python scripts/validate_pallas_tpu.py sumcheck   # subset
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("PLONKISH_TPU_BACKEND", "jax")

import jax

jax.config.update("jax_compilation_cache_dir", "target/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import random
import types

import jax.numpy as jnp
import numpy as np

from plonkish_tpu.fields import BN254_FR, limb
from plonkish_tpu.fields.host import Fp
from plonkish_tpu.utils.expression import (
    CommonPoly,
    Constant,
    EqXY,
    Identity,
    Lagrange,
    Polynomial,
    Query,
    Rotation,
)

SPEC = BN254_FR
RNG = random.Random(0xFEED)


def rand_mont_jnp(n):
    vals = [RNG.randrange(SPEC.p) for _ in range(n)]
    arr = np.zeros((n, limb.L), dtype=np.uint32)
    for i, v in enumerate(vals):
        m = SPEC.to_mont(v)
        for d in range(limb.L):
            arr[i, d] = (m >> (16 * d)) & 0xFFFF
    return jnp.asarray(arr), vals


def check_sumcheck(size=1 << 13):
    from plonkish_tpu.pallas import sumcheck as psc

    w0 = Polynomial(Query(0, Rotation(0)))
    w1 = Polynomial(Query(1, Rotation(0)))
    eq = CommonPoly(EqXY(0))
    ident = CommonPoly(Identity())
    lag = CommonPoly(Lagrange(1))
    expr = eq * (
        w0 * w1 + ident + lag * Constant(Fp(3, SPEC)) + Constant(Fp(7, SPEC))
    )
    degree = expr.degree()

    tables, host = {}, {}
    for key in [("poly", 0, 0), ("poly", 1, 0), ("eq_xy", 0), ("lagrange", 1)]:
        tables[key], vals = rand_mont_jnp(2 * size)
        host[key] = vals

    round_, offset = 2, 12345
    state = types.SimpleNamespace(
        spec=SPEC, round=round_, identity_offset=Fp(offset, SPEC)
    )
    keys = tuple(sorted(tables))
    m = (2 * size).bit_length() - 1
    rev = jnp.asarray(psc.bitrev_perm(m))
    stacked = psc.pack_digits(
        jnp.stack([tables[k].T for k in keys], axis=0)
    )[:, :, rev]  # packed bit-reversed [T, W, n]
    t0 = time.time()
    got = psc.round_evals(state, stacked, keys, expr, degree)
    print(f"round_evals cold: {time.time() - t0:.1f}s")
    t0 = time.time()
    got2 = psc.round_evals(state, stacked, keys, expr, degree)
    print(f"round_evals warm: {time.time() - t0:.3f}s")
    assert got == got2

    p = SPEC.p

    def eval_host(leaves, idv):
        def common(cp):
            if isinstance(cp, Identity):
                return idv
            if isinstance(cp, Lagrange):
                return leaves[("lagrange", cp.i)]
            if isinstance(cp, EqXY):
                return leaves[("eq_xy", cp.idx)]

        return expr.evaluate(
            lambda c: int(c) % p,
            common,
            lambda q: leaves[("poly", q.poly, q.rotation.value)],
            None,
            lambda a: (-a) % p,
            lambda a, b: (a + b) % p,
            lambda a, b: (a * b) % p,
            lambda a, s: (a * int(s)) % p,
        )

    want = []
    for t in range(1, degree + 1):
        total = 0
        for b in range(size):
            leaves = {
                k: (v[2 * b + 1] + (t - 1) * (v[2 * b + 1] - v[2 * b])) % p
                for k, v in host.items()
            }
            idv = (offset + t * (1 << round_) + b * (1 << (round_ + 1))) % p
            total = (total + eval_host(leaves, idv)) % p
        want.append(total)
    assert got == want, f"sumcheck MISMATCH\n got={got}\nwant={want}"
    print("sumcheck round_evals: MATCH")

    ch = Fp(RNG.randrange(SPEC.p), SPEC)
    folded = psc.unpack_digits_jit(
        psc.fold_tables(SPEC, stacked, ch)
    )[:, :, jnp.asarray(psc.bitrev_perm(m - 1))]  # [T, L, size] natural
    c = limb.const(SPEC, int(ch))
    for i, k in enumerate(keys):
        ref = limb._fold_pairs_jax(
            SPEC, tables[k], jnp.asarray(np.asarray(c))
        )
        assert np.array_equal(np.asarray(folded[i]).T, np.asarray(ref)), k
    print("sumcheck fold_tables: MATCH")


_MSM_CACHE = {}


def _msm_inputs(n):
    if n not in _MSM_CACHE:
        from plonkish_tpu.curves.device import from_affine_host
        from plonkish_tpu.curves.host import AffinePoint
        from plonkish_tpu.curves.specs import BN254_G1

        curve = BN254_G1
        scalars_int = [RNG.randrange(curve.scalar.p) for _ in range(n)]
        g = AffinePoint.generator(curve)
        base = [g.scalar_mul(RNG.randrange(1, 1 << 62)) for _ in range(256)]
        pts = (base * (n // 256 + 1))[:n]
        pts[3] = AffinePoint.identity(curve)
        dev = from_affine_host(curve, pts)
        scal = limb.from_ints(scalars_int)
        _MSM_CACHE[n] = (scalars_int, pts, dev, scal)
    return _MSM_CACHE[n]


def check_msm(n=1 << 12, c=None, sublanes=None, verify=True):
    from plonkish_tpu.curves.device import jacobian_to_affine_host
    from plonkish_tpu.curves.host import AffinePoint, msm_host
    from plonkish_tpu.curves.msm import _blind_point, window_size
    from plonkish_tpu.curves.specs import BN254_G1
    from plonkish_tpu.pallas.msm import (
        _msm_windows_pallas_jit,
        normalize_points_jit,
    )

    curve = BN254_G1
    c = c or window_size(n)
    s = sublanes or 8
    w = -(-curve.scalar.num_bits // c) + 1
    scalars_int, pts, dev, scal = _msm_inputs(n)
    blind, blind_digits = _blind_point(curve)
    norm = normalize_points_jit(curve, jnp.asarray(np.asarray(dev)))
    args = (jnp.asarray(np.asarray(scal)), *norm, blind_digits)

    t0 = time.time()
    windows = _msm_windows_pallas_jit(curve, args, c, w, s)
    jax.block_until_ready(windows)
    cold = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(_msm_windows_pallas_jit(curve, args, c, w, s))
    dt = time.time() - t0
    print(
        f"msm 2^{n.bit_length() - 1} c={c} s={s} w={w}: cold {cold:.1f}s "
        f"warm {dt * 1e3:.1f}ms ({n / dt / 1e3:.1f}K pts/s)",
        flush=True,
    )
    if not verify:
        return n / dt

    window_points = jacobian_to_affine_host(curve, windows)
    b = (1 << (c - 1)) + 1
    correction = -blind.scalar_mul((b - 1) * b // 2 * s * 128)
    acc = AffinePoint.identity(curve)
    for wp in reversed(window_points):
        for _ in range(c):
            acc = acc.double()
        acc = acc + wp + correction
    expect = msm_host([Fp(s_, curve.scalar) for s_ in scalars_int], pts)
    assert acc == expect, "msm MISMATCH"
    print("msm bucket kernel: MATCH")
    return n / dt


def sweep_msm():
    """Grid-search (c, sublanes) for the Pallas bucket kernel; VMEM bounds
    the product B*S (out block = 3*L*B*S*128*4 bytes)."""
    # Mosaic requires the input block sublane dim divisible by 8; VMEM
    # caps the bucket block 3*L*B*S*128*4 at ~10MB
    best = (0, None)
    for n_log2 in (16, 18):
        for c, s in [(4, 8), (5, 8), (6, 8), (4, 16), (5, 16), (4, 32)]:
            b = (1 << (c - 1)) + 1
            if 3 * 16 * b * s * 128 * 4 > 10 * 2**20:
                continue
            try:
                pps = check_msm(1 << n_log2, c=c, sublanes=s, verify=False)
            except Exception as e:  # noqa: BLE001 — report, keep sweeping
                print(
                    f"n=2^{n_log2} c={c} s={s}: FAILED "
                    f"{type(e).__name__}: {e}"
                )
                continue
            if n_log2 == 18 and pps > best[0]:
                best = (pps, (c, s))
    print(f"BEST at 2^18: {best[1]} at {best[0] / 1e3:.1f}K pts/s")


def check_f32_mul(s=512, chain=16, grid=64):
    """On-chip bit-equality of soa.mont_mul_f32/mont_sqr_f32 vs the u32
    path, plus a throughput microbenchmark of both inside one Mosaic
    kernel shape (dependent mul chain on [L, s, 128] blocks; each SoA
    mont_mul has ~2K internal independent ops, so the chain still
    exposes ILP).  Decides whether PLONKISH_TPU_F32_MUL should default
    on: f32 multiplies may issue faster than u32 on the VPU
    (docs/PERF_NOTES.md round-1 vs round-2 rates disagree)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from plonkish_tpu.fields import soa

    SPECF = SPEC
    L = limb.L

    def _chain_kernel(fn, a_ref, b_ref, out_ref):
        a = [a_ref[d] for d in range(L)]
        b = [b_ref[d] for d in range(L)]
        acc = a
        for _ in range(chain):
            acc = fn(SPECF, acc, b)
        for d in range(L):
            out_ref[d] = acc[d]

    def run(fn):
        kernel = functools.partial(_chain_kernel, fn)
        f = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((L, s, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, s, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, s, 128), lambda i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, s, 128), jnp.uint32),
        )
        a_t, _ = rand_mont_jnp(s * 128)
        b_t, _ = rand_mont_jnp(s * 128)
        a = jnp.asarray(a_t.T.reshape(L, s, 128))
        b = jnp.asarray(b_t.T.reshape(L, s, 128))
        fj = jax.jit(f)
        out = jax.block_until_ready(fj(a, b))
        t0 = time.time()
        out = jax.block_until_ready(fj(a, b))
        dt = time.time() - t0
        n_muls = grid * chain * s * 128
        return np.asarray(out), n_muls / dt

    def mul_u32(sp, x, y):  # the u32 path regardless of the env knob
        return soa._redc(
            sp, soa._carry_chain(soa._mul_columns(x, y))[: 2 * L + 1]
        )

    got_u32, rate_u32 = run(mul_u32)
    got_f32, rate_f32 = run(soa.mont_mul_f32)
    assert np.array_equal(got_u32, got_f32), "f32 mont_mul chain MISMATCH"
    print(
        f"mont_mul chain ({s}x128, {chain} deep): "
        f"u32 {rate_u32 / 1e9:.2f} Gmul/s, f32 {rate_f32 / 1e9:.2f} Gmul/s "
        f"({rate_f32 / rate_u32:.2f}x)"
    )
    print("f32 mont_mul: MATCH")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend())
    if which in ("all", "sumcheck"):
        check_sumcheck()
    if which in ("all", "msm"):
        check_msm()
    if which in ("all", "f32"):
        check_f32_mul()
    if which == "sweep":
        sweep_msm()
    print("OK")
