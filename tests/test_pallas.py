"""Pallas kernel equivalence tests.

The Mosaic kernels must agree bit-for-bit with the host/limb reference
implementations: sum-check round evaluations, fix_var folds, and MSM bucket
accumulation.  On a real TPU they compile natively (fast — the body is
compiled once and iterated by the grid).  Off-TPU the only option is the
Pallas interpreter, which inlines the ~10K-op kernel body per grid step
into one giant XLA CPU program — a multi-ten-minute LLVM compile even at
toy sizes — so these are skipped on CPU unless PLONKISH_TPU_SLOW=1.
`scripts/validate_pallas_tpu.py` runs the same checks on the chip.
"""

import os
import random
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

if jax.default_backend() != "tpu" and os.environ.get("PLONKISH_TPU_SLOW") != "1":
    pytest.skip(
        "Pallas interpret mode compiles too slowly on CPU; "
        "validated on TPU via scripts/validate_pallas_tpu.py "
        "(set PLONKISH_TPU_SLOW=1 to force)",
        allow_module_level=True,
    )

from plonkish_tpu.fields import BN254_FR, limb
from plonkish_tpu.fields.host import Fp
from plonkish_tpu.utils.expression import (
    CommonPoly,
    Constant,
    EqXY,
    Expression,
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


def _expr():
    w0 = Polynomial(Query(0, Rotation(0)))
    w1 = Polynomial(Query(1, Rotation(0)))
    eq = CommonPoly(EqXY(0))
    ident = CommonPoly(Identity())
    lag = CommonPoly(Lagrange(1))
    return eq * (w0 * w1 + ident + lag * Constant(Fp(3, SPEC)) + Constant(Fp(7, SPEC)))


def _host_round_evals(tables, expr, degree, round_, offset, size):
    """Reference: evaluate at t=1..degree via Python ints."""
    import math

    p = SPEC.p
    host = {
        k: [SPEC.from_mont(sum(int(row[d]) << (16 * d) for d in range(limb.L)))
            for row in np.asarray(v)]
        for k, v in tables.items()
    }
    out = []
    for t in range(1, degree + 1):
        total = 0
        for b in range(size):
            leaves = {}
            for k, vals in host.items():
                lo, hi = vals[2 * b], vals[2 * b + 1]
                leaves[k] = (hi + (t - 1) * (hi - lo)) % p
            ident = (offset + t * (1 << round_) + b * (1 << (round_ + 1))) % p
            ev = _eval_host(expr, leaves, ident)
            total = (total + ev) % p
        out.append(total)
    return out


def _eval_host(expr, leaves, ident):
    p = SPEC.p

    def common(cp):
        if isinstance(cp, Identity):
            return ident
        if isinstance(cp, Lagrange):
            return leaves[("lagrange", cp.i)]
        if isinstance(cp, EqXY):
            return leaves[("eq_xy", cp.idx)]
        raise TypeError(cp)

    return expr.evaluate(
        lambda c: int(c) % p,
        common,
        lambda q: leaves[("poly", q.poly, q.rotation.value)],
        lambda i: (_ for _ in ()).throw(AssertionError),
        lambda a: (-a) % p,
        lambda a, b: (a + b) % p,
        lambda a, b: (a * b) % p,
        lambda a, s: (a * int(s)) % p,
    )


def test_pallas_round_evals_and_fold():
    from plonkish_tpu.pallas import sumcheck as psc

    size = 128  # pair count; tables have 2*size rows
    n = 2 * size
    expr = _expr()
    degree = expr.degree()
    tables = {}
    for key in [("poly", 0, 0), ("poly", 1, 0), ("eq_xy", 0), ("lagrange", 1)]:
        tables[key], _ = rand_mont_jnp(n)

    round_ = 2
    offset = 12345
    state = types.SimpleNamespace(
        spec=SPEC, round=round_, identity_offset=Fp(offset, SPEC)
    )
    keys = tuple(sorted(tables))
    m = n.bit_length() - 1
    rev = jnp.asarray(psc.bitrev_perm(m))
    stacked = psc.pack_digits(
        jnp.stack([tables[k].T for k in keys], axis=0)
    )[:, :, rev]  # packed bit-reversed [T, W, n]
    got = psc.round_evals(state, stacked, keys, expr, degree)
    want = _host_round_evals(tables, expr, degree, round_, offset, size)
    assert got == want

    # fold: new = lo + c*(hi-lo), bit-exact vs the limb fold (the packed
    # state stays bit-reversed over the remaining m-1 bits)
    ch = Fp(RNG.randrange(SPEC.p), SPEC)
    folded = psc.unpack_digits(
        psc.fold_tables(SPEC, stacked, ch)  # packed [T, W, n/2]
    )[:, :, jnp.asarray(psc.bitrev_perm(m - 1))]
    c = limb.const(SPEC, int(ch))
    for i, k in enumerate(keys):
        ref = limb._fold_pairs_jax(
            SPEC, tables[k], jnp.asarray(np.asarray(c))
        )
        assert np.array_equal(np.asarray(folded[i]).T, np.asarray(ref)), k



def test_pallas_msm_bucket_kernel():
    from plonkish_tpu.curves.device import (
        from_affine_host,
        jacobian_to_affine_host,
    )
    from plonkish_tpu.curves.host import AffinePoint, msm_host
    from plonkish_tpu.curves.msm import _blind_point
    from plonkish_tpu.curves.specs import BN254_G1
    from plonkish_tpu.pallas.msm import (
        _msm_windows_pallas_jit,
        normalize_points_jit,
    )

    curve = BN254_G1
    n, c, w = 96, 5, 4  # scalars < 2^14 keep signed digits in windows 0..3
    scalars_int = [RNG.randrange(1 << 14) for _ in range(n)]
    g = AffinePoint.generator(curve)
    pts = [g.scalar_mul(RNG.randrange(1, 1000)) for _ in range(n)]
    pts[3] = AffinePoint.identity(curve)  # identity in the stream
    dev = from_affine_host(curve, pts)
    scal = limb.from_ints(scalars_int)

    blind, blind_digits = _blind_point(curve)
    norm = normalize_points_jit(curve, jnp.asarray(np.asarray(dev)))
    windows = _msm_windows_pallas_jit(
        curve,
        (jnp.asarray(np.asarray(scal)), *norm, blind_digits),
        c, w, 8,
    )
    window_points = jacobian_to_affine_host(curve, windows)
    b = (1 << (c - 1)) + 1
    correction = -blind.scalar_mul((b - 1) * b // 2 * 8 * 128)
    acc = AffinePoint.identity(curve)
    for wp in reversed(window_points):
        for _ in range(c):
            acc = acc.double()
        acc = acc + wp + correction
    expect = msm_host([Fp(s, curve.scalar) for s in scalars_int], pts)
    assert acc == expect
