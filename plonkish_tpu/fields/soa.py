"""Struct-of-arrays field arithmetic: a batch of field elements is a LIST of
16 u32 digit arrays (each [*batch]) instead of one [..., 16] tensor.

Why: the tensor-form kernels (limb.py) express digit interactions as pads /
shifts / concats along the digit axis, which break XLA elementwise fusion —
a Montgomery multiply lowers to ~100 separate passes over HBM and runs at
~1% of the VPU's measured 12 Tops/s u32-multiply rate.  With each digit as
its own named array every operation in the schoolbook product, the carry
chains, and the one-shot REDC is a plain elementwise op between [batch]
arrays, so XLA fuses entire point-addition formulas into a handful of memory
passes.  The cost model flips from pass-count-bound to bytes-per-element
bound (~192 B/element-mul -> ~4 Gmul/s HBM ceiling, ~18x the tensor form).

Used inside large fused kernels (MSM bucket loop); the tensor form remains
the interchange format at kernel boundaries.

Same mathematics as limb.py: 16x16-bit LE digits, Montgomery form, one-shot
REDC via p' = -p^{-1} mod R (reference arithmetic via halo2_curves; see
fields/spec.py).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from . import limb
from .spec import FieldSpec

L = limb.L
MASK = np.uint32(0xFFFF)  # numpy literal: Pallas kernels cannot capture jax scalars
W16 = 16


def from_tensor(x) -> List[jnp.ndarray]:
    """[..., L] digit tensor -> list of L digit arrays [...]."""
    return [x[..., i] for i in range(L)]


def from_wide(x) -> List[jnp.ndarray]:
    """[L, ...] digit-major tensor -> list of L digit arrays."""
    return [x[i] for i in range(L)]


def to_tensor(ds: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.stack(list(ds), axis=-1)


def to_wide(ds: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.stack(list(ds), axis=0)


def zeros_like(ds):
    return [jnp.zeros_like(d) for d in ds]


def const(spec: FieldSpec, value: int, ref) -> List[jnp.ndarray]:
    """Montgomery constant broadcast against a reference digit array."""
    import numpy as np

    from .spec import int_to_digits

    digs = int_to_digits(spec.to_mont(value % spec.p))
    return [jnp.full_like(ref[0], np.uint32(d)) for d in digs]


def _carry_chain(ds: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Exact carry propagation over lazy digits (values < 2^32 - 2^16 per
    lane so adding the incoming carry cannot overflow u32).  Returns L+1
    digits (the final carry in the last slot)."""
    out = []
    carry = None
    for d in ds:
        v = d if carry is None else d + carry
        out.append(v & MASK)
        carry = v >> W16
    out.append(carry)
    return out


def _sub_borrow(a: List[jnp.ndarray], b: List[jnp.ndarray]):
    """a - b with borrow chain; returns (digits, borrow_flag_array)."""
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(len(a)):
        v = a[i] + np.uint32(0x10000) - b[i] - borrow
        out.append(v & MASK)
        borrow = np.uint32(1) - (v >> W16)
    return out, borrow


def _p_digits(spec: FieldSpec, ref) -> List[jnp.ndarray]:
    import numpy as np

    return [
        jnp.full_like(ref, np.uint32(d)) for d in spec.p_digits
    ]


def _cond_sub_p(spec: FieldSpec, ds: List[jnp.ndarray]) -> List[jnp.ndarray]:
    diff, borrow = _sub_borrow(ds, _p_digits(spec, ds[0]))
    keep = borrow != 0  # borrowed => ds < p
    return [jnp.where(keep, d, e) for d, e in zip(ds, diff)]


def add(spec: FieldSpec, a, b) -> List[jnp.ndarray]:
    s = _carry_chain([x + y for x, y in zip(a, b)])
    # sum < 2p < 2^255 so the top carry is always 0
    return _cond_sub_p(spec, s[:L])


def sub(spec: FieldSpec, a, b) -> List[jnp.ndarray]:
    diff, borrow = _sub_borrow(a, b)
    wrapped = _carry_chain(
        [x + y for x, y in zip(diff, _p_digits(spec, a[0]))]
    )[:L]
    under = borrow != 0
    return [jnp.where(under, w, d) for d, w in zip(diff, wrapped)]


def neg(spec: FieldSpec, a) -> List[jnp.ndarray]:
    diff, _ = _sub_borrow(_p_digits(spec, a[0]), a)
    z = is_zero(a)
    return [jnp.where(z, jnp.zeros_like(d), d) for d in diff]


def is_zero(a) -> jnp.ndarray:
    acc = a[0]
    for d in a[1:]:
        acc = acc | d
    return acc == 0


def _mul_columns(a, b) -> List[jnp.ndarray]:
    """Schoolbook 16x16 digit product as 2L+1 lazy u32 columns, each
    < 32 * 2^16 = 2^21: the 16-bit halves of every partial product are
    accumulated into their columns as independent elementwise ops."""
    cols: List[jnp.ndarray] = [None] * (2 * L + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(L):
        ai = a[i]
        for j in range(L):
            p = ai * b[j]
            acc(i + j, p & MASK)
            acc(i + j + 1, p >> W16)
    z = jnp.zeros_like(a[0])
    return [c if c is not None else z for c in cols]


def _mul_columns_low(a, b) -> List[jnp.ndarray]:
    """Low L columns only (mod R), lazy < 2^21."""
    cols: List[jnp.ndarray] = [None] * L

    def acc(k, v):
        if k < L:
            cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(L):
        ai = a[i]
        for j in range(L - i):
            p = ai * b[j]
            acc(i + j, p & MASK)
            acc(i + j + 1, p >> W16)
    z = jnp.zeros_like(a[0])
    return [c if c is not None else z for c in cols]


def _sqr_columns(a) -> List[jnp.ndarray]:
    """Schoolbook square as lazy u32 columns: each cross product a_i·a_j
    (i<j) is accumulated once and the columns doubled afterwards, then the
    diagonal a_i² terms land — L(L+1)/2 = 136 u32 multiplies vs 256 for
    `_mul_columns(a, a)`.  Lazy bound: a cross column holds ≤ L/2 16-bit
    halves (< 2^19), doubled < 2^20, plus a diagonal half → < 2^21."""
    cols: List[jnp.ndarray] = [None] * (2 * L + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(L):
        ai = a[i]
        for j in range(i + 1, L):
            p = ai * a[j]
            acc(i + j, p & MASK)
            acc(i + j + 1, p >> W16)
    z = jnp.zeros_like(a[0])
    cols = [z if c is None else c + c for c in cols]
    for i in range(L):
        p = a[i] * a[i]
        acc(2 * i, p & MASK)
        acc(2 * i + 1, p >> W16)
    return cols


def _redc(spec: FieldSpec, t: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """One-shot Montgomery reduction of exact double-width digits t
    (2L+1 entries, 16-bit each) -> T·R^{-1} mod p (same math as limb.redc)."""
    import numpy as np

    pp = [np.uint32(int(d)) for d in np.asarray(spec.p_prime_digits)]
    m = _carry_chain(_mul_columns_low(t[:L], pp))[:L]  # exact mod R
    pd = [np.uint32(int(d)) for d in np.asarray(spec.p_digits)]
    mp = _mul_columns(m, pd)  # 2L+1 lazy
    u = _carry_chain([x + y for x, y in zip(t, mp)])[: 2 * L + 1]
    # (T + M·p)/R < 2p: take digits L..2L-1 (digit 2L is zero)
    return _cond_sub_p(spec, u[L : 2 * L])


def mont_mul(spec: FieldSpec, a, b) -> List[jnp.ndarray]:
    """a*b*R^{-1} mod p, one-shot REDC (same math as limb.redc)."""
    if F32_MUL:
        return mont_mul_f32(spec, a, b)
    t = _carry_chain(_mul_columns(a, b))[: 2 * L + 1]  # exact
    return _redc(spec, t)


def mont_sqr(spec: FieldSpec, a) -> List[jnp.ndarray]:
    """a²·R^{-1} mod p — 18% fewer u32 multiplies than mont_mul(a, a)
    (136 + 136 + 256 vs 256 + 136 + 256); the EC point formulas are
    square-heavy (madd-2007-bl: 8M+3S, dbl-2007-bl: 1M+8S)."""
    if F32_MUL:
        return mont_sqr_f32(spec, a)
    t = _carry_chain(_sqr_columns(a))[: 2 * L + 1]  # exact
    return _redc(spec, t)


# ---------------------------------------------------------------------------
# f32 digit products.
#
# The VPU's measured u32-multiply rate is 0.96 Tops/s vs 12.9 Tops/s for
# adds/logic (docs/PERF_NOTES.md) — 32-bit integer multiply is emulated in
# ~13 ops, while f32 multiply issues at native rate.  With 8-bit digits every
# partial product (< 2^16) and every schoolbook column sum (≤ 32 terms
# < 2^21.99) is an integer below 2^24, hence EXACT in f32.  So: split the
# 16-bit storage digits into bytes, convert to f32, run the schoolbook
# products as f32 mul/adds, convert the exact base-256 columns back to u32,
# and keep all carry propagation in the integer domain.  Identical results
# to the u32 path bit-for-bit, ~3x fewer mul-equivalent VPU ops.
# ---------------------------------------------------------------------------

import os as _os

F32_MUL = _os.environ.get("PLONKISH_TPU_F32_MUL", "0") == "1"

B8 = 2 * L  # byte digits per element
MASK8 = np.uint32(0xFF)


def _to_bytes_f32(a) -> List[jnp.ndarray]:
    """L u32 16-bit digit arrays -> 2L f32 byte-digit arrays (exact).

    Mosaic has no u32->f32 cast; go through i32 (values < 2^16, so the
    sign bit is never set and the round-trip is exact)."""
    out = []
    for d in a:
        out.append((d & MASK8).astype(jnp.int32).astype(jnp.float32))
        out.append(
            (d >> np.uint32(8)).astype(jnp.int32).astype(jnp.float32)
        )
    return out


def _spec_bytes_f32(digits) -> List[np.float32]:
    """Fixed-constant digits (p, p') as python f32 scalars for the kernels
    (numpy literals — Pallas bodies cannot capture jax scalars)."""
    out = []
    for d in np.asarray(digits, dtype=np.uint32):
        out.append(np.float32(int(d) & 0xFF))
        out.append(np.float32(int(d) >> 8))
    return out


def _mul_columns_f32(a8, b8, nlo=None) -> List[jnp.ndarray]:
    """Schoolbook byte product in f32: column k = Σ_{i+j=k} a8_i·b8_j,
    every column ≤ 32 terms of < 2^16 -> < 2^21, exact in f32.  Skips
    columns ≥ nlo when only the low half (mod 256^nlo) is needed.
    Constant (python float) b8 entries equal to 0 are elided."""
    n, m = len(a8), len(b8)
    hi = n + m - 1 if nlo is None else nlo
    cols: List[jnp.ndarray] = [None] * hi

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(n):
        ai = a8[i]
        for j in range(min(m, hi - i)):
            bj = b8[j]
            if isinstance(bj, (float, np.floating)) and float(bj) == 0.0:
                continue
            acc(i + j, ai * bj)
    z = None
    for k in range(hi):
        if cols[k] is None:
            if z is None:
                z = jnp.zeros_like(a8[0])
            cols[k] = z
    return cols


def _sqr_columns_f32(a8) -> List[jnp.ndarray]:
    """f32 byte square: cross products once, columns doubled, diagonals
    added.  Cross column ≤ 16 terms < 2^20, doubled < 2^21, + diagonal
    < 2^21 + 2^16 — exact in f32."""
    n = len(a8)
    cols: List[jnp.ndarray] = [None] * (2 * n - 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(n):
        ai = a8[i]
        for j in range(i + 1, n):
            acc(i + j, ai * a8[j])
    z = jnp.zeros_like(a8[0])
    cols = [z if c is None else c + c for c in cols]
    for i in range(n):
        acc(2 * i, ai := a8[i] * a8[i])
    return cols


def _pair_bytes_u32(cols) -> List[jnp.ndarray]:
    """Exact f32 base-256 columns -> lazy u32 base-2^16 digits:
    d[k] = c[2k] + c[2k+1]·256, value < 2^21 + 2^29 < 2^30 (safe for the
    carry chain's digit+carry < 2^32 requirement)."""
    # f32 -> i32 -> u32: Mosaic lacks the direct f32->u32 cast; values are
    # exact integers < 2^30 so the i32 hop is lossless
    c = [x.astype(jnp.int32).astype(jnp.uint32) for x in cols]
    ds = []
    for k in range(0, len(c) - 1, 2):
        ds.append(c[k] + (c[k + 1] << np.uint32(8)))
    if len(c) % 2:
        ds.append(c[-1])
    return ds


def mont_mul_f32(spec: FieldSpec, a, b) -> List[jnp.ndarray]:
    """Bit-identical to mont_mul, products in f32 (module comment above)."""
    a8 = _to_bytes_f32(a)
    b8 = _to_bytes_f32(b)
    t = _carry_chain(_pair_bytes_u32(_mul_columns_f32(a8, b8)))[: 2 * L + 1]
    return _redc_f32(spec, t)


def mont_sqr_f32(spec: FieldSpec, a) -> List[jnp.ndarray]:
    a8 = _to_bytes_f32(a)
    t = _carry_chain(_pair_bytes_u32(_sqr_columns_f32(a8)))[: 2 * L + 1]
    return _redc_f32(spec, t)


def _redc_f32(spec: FieldSpec, t: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """One-shot REDC with the two fixed-operand products (·p' mod R, ·p)
    also in f32.  Same result as _redc bit-for-bit."""
    pp8 = _spec_bytes_f32(spec.p_prime_digits)
    t8 = _to_bytes_f32(t[:L])
    m_cols = _mul_columns_f32(t8, pp8, nlo=B8)  # low half: mod 2^256
    m = _carry_chain(_pair_bytes_u32(m_cols))[:L]  # exact mod R
    pd8 = _spec_bytes_f32(spec.p_digits)
    mp = _pair_bytes_u32(_mul_columns_f32(_to_bytes_f32(m), pd8))
    u = _carry_chain(
        [x + y for x, y in zip(t, mp)] + list(t[len(mp):])
    )[: 2 * L + 1]
    return _cond_sub_p(spec, u[L : 2 * L])


def select(cond, a, b):
    """Where cond (bool array) pick digits of a else b."""
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]
