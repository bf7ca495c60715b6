"""Vectorized prime-field arithmetic on 16-bit-digit limb tensors.

This is the compute substrate of the whole framework: what the reference gets
from `halo2_curves`' hand-written Rust Montgomery arithmetic
(/root/reference/plonkish_backend/src/util/arithmetic.rs:15-22) is built here
as jnp ops over `uint32[..., 16]` tensors so that XLA vectorizes every field
operation across the boolean hypercube / MSM point axis.

Representation
--------------
A field element batch has shape `[..., NUM_DIGITS]`, dtype uint32, little
endian, each lane holding a digit `< 2^16`, value in **Montgomery form**
(`x * R mod p`, `R = 2^256`).  All partial products of two digits fit exactly
in a uint32 lane ((2^16-1)^2 < 2^32) and anti-diagonal column sums stay below
2^22, so no 64-bit arithmetic is ever required — the layout is TPU-native
(the VPU has no u64 multiplier).

Kernel design (compile-time and VPU-width friendly — every step is a *tensor*
op along the digit axis, never a per-digit Python loop):

- digit products:  one [.., L, L] broadcast multiply, lo/hi split, and a
  single gather+masked-sum producing all 2L anti-diagonal column sums;
- carry/borrow propagation:  Kogge–Stone parallel prefix over
  (generate, propagate) bits — log2(L) levels of shifts and boolean algebra
  instead of an L-step ripple;
- Montgomery reduction:  one-shot REDC.  With p' = -p^{-1} mod R the whole
  reduction is M = (T mod R)·p' mod R (a low-half product) followed by
  (T + M·p)/R — two more anti-diagonal products, no digit-serial loop.

A full mont_mul is ~100 XLA ops regardless of batch size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .spec import DIGIT_BITS, DIGIT_MASK, NUM_DIGITS, FieldSpec, int_to_digits

U32 = jnp.uint32
L = NUM_DIGITS
W = DIGIT_BITS
MASK = DIGIT_MASK

# ---------------------------------------------------------------------------
# Execution backend
# ---------------------------------------------------------------------------
# "jax"  — XLA tensors (the TPU path; also runs on CPU for kernel tests)
# "cpp"  — native host runtime (plonkish_tpu/ops/field_native.cpp) over numpy
#          arrays with the identical uint32[...,16] layout.  Selected via the
#          PLONKISH_TPU_BACKEND env var at import time; protocol code is
#          backend-agnostic through `xnp` and the ops below.
import os as _os

BACKEND = _os.environ.get("PLONKISH_TPU_BACKEND", "jax")
IS_CPP = BACKEND == "cpp"
if IS_CPP:
    from ..ops import field_cpp as _cpp

xnp = np if IS_CPP else jnp


def maybe_jit(fun=None, **jit_kwargs):
    """jax.jit in jax mode; identity in cpp mode."""
    def wrap(f):
        return f if IS_CPP else jax.jit(f, **jit_kwargs)
    return wrap(fun) if fun is not None else wrap


def set_index(arr, idx, value):
    """arr with arr[idx] = value (functional on jax, in-place copy on numpy)."""
    if IS_CPP:
        out = np.array(arr)
        out[idx] = value
        return out
    return arr.at[idx].set(value)


# ---------------------------------------------------------------------------
# Conversions
# ---------------------------------------------------------------------------

def zeros(shape=()) -> jnp.ndarray:
    return xnp.zeros((*shape, L), dtype=np.uint32)


def from_ints(values, spec: FieldSpec | None = None) -> jnp.ndarray:
    """Python ints -> digit tensor (canonical form, NOT Montgomery)."""
    if not isinstance(values, (list, tuple)):
        values = list(np.asarray(values, dtype=object).reshape(-1))
    blob = b"".join(int(v).to_bytes(32, "little") for v in values)
    out16 = np.frombuffer(blob, dtype="<u2").reshape(len(values), L)
    if IS_CPP:
        return out16.astype(np.uint32)
    # upload the 16-bit digits and widen on device: halves the host->device
    # bytes (the witness upload is ~2 GB/prove at k=23 in u32 form, and the
    # tunnel link is the bottleneck of witness_collector)
    return jnp.asarray(out16).astype(jnp.uint32)


def to_ints(digits) -> np.ndarray:
    """Digit tensor -> numpy object array of Python ints."""
    arr = np.asarray(jax.device_get(digits), dtype=np.uint32)
    shape = arr.shape[:-1]
    blob = np.ascontiguousarray(arr.reshape(-1, L).astype("<u2")).tobytes()
    n = len(blob) // 32
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = int.from_bytes(blob[32 * i: 32 * i + 32], "little")
    return out.reshape(shape)


def to_bytes_rows(digits) -> bytes:
    """Digit tensor -> concatenated canonical 32-byte LE reprs (bypasses
    Python ints; fast path for hashing/keying canonical values)."""
    arr = np.asarray(jax.device_get(digits), dtype=np.uint32)
    return np.ascontiguousarray(arr.reshape(-1, L).astype("<u2")).tobytes()


def const(spec: FieldSpec, value: int, mont: bool = True) -> jnp.ndarray:
    """A single field element as a [16] digit vector."""
    v = value % spec.p
    if mont:
        v = spec.to_mont(v)
    d = int_to_digits(v)
    return d if IS_CPP else jnp.asarray(d)


def one(spec: FieldSpec, shape=()) -> jnp.ndarray:
    """Montgomery-form 1 broadcast to shape."""
    if IS_CPP:
        return np.ascontiguousarray(
            np.broadcast_to(spec.r_digits, (*shape, L))
        )
    return jnp.broadcast_to(jnp.asarray(spec.r_digits), (*shape, L))


# ---------------------------------------------------------------------------
# Digit-axis plumbing (all tensor ops, no per-digit loops)
# ---------------------------------------------------------------------------

def _shift_up(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Along the last axis: out[i] = x[i-s] (zero fill below)."""
    if s == 0:
        return x
    n = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(s, 0)]
    return jnp.pad(x, pad)[..., :n]


def _prefix_carry(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Kogge–Stone: carry INTO each position given per-position generate g
    and propagate p bits (uint32 0/1).  c[i] = OR_{j<i} (g[j] & AND p[j+1..i-1])."""
    n = g.shape[-1]
    G, P = g, p
    s = 1
    while s < n:
        G = G | (P & _shift_up(G, s))
        P = P & _shift_up(P, s)
        s <<= 1
    return _shift_up(G, 1)


def _normalize(x: jnp.ndarray, relax_rounds: int) -> jnp.ndarray:
    """Lazy u32 columns -> exact digits (< 2^16) along the last axis.

    `relax_rounds` shift-add rounds bring every lane to <= 2^16, then one
    Kogge–Stone pass resolves the remaining single-bit ripple.  Top carries
    beyond the last lane are dropped (callers size the tensor so they are 0).
    """
    for _ in range(relax_rounds):
        x = (x & MASK) + _shift_up(x >> W, 1)
    # now each lane <= 2^16: treat lane == 2^16 as generate
    g = x >> W
    p = ((x & MASK) == MASK).astype(U32)
    c = _prefix_carry(g, p)
    return (x + c) & MASK


def _sub_borrow(a: jnp.ndarray, b: jnp.ndarray):
    """Exact digit tensors: returns (a-b digits, borrow_out bit [.., ])."""
    d = a + jnp.uint32(MASK + 1) - b  # in [1, 2^17-1]
    g = (d >> W) ^ 1  # borrow generated at this lane
    p = ((d & MASK) == 0).astype(U32)
    c = _prefix_carry(g, p)
    digits = (d - c) & MASK
    last = (g[..., -1] | (p[..., -1] & c[..., -1]))
    return digits, last


def _add_carry(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact digit tensors -> exact digits of a+b (carry out dropped;
    callers guarantee headroom in the top lane)."""
    s = a + b
    g = s >> W
    p = ((s & MASK) == MASK).astype(U32)
    c = _prefix_carry(g, p)
    return (s + c) & MASK


# ---------------------------------------------------------------------------
# Digit-MAJOR ("wide") kernel variants for the XLA path.
#
# The public layout keeps digits minor ([..., L]) for protocol-code ergonomics,
# but a 16-wide minor axis occupies only 16 of the TPU's 128 vector lanes and
# triggers heavy tile padding.  The jitted kernels therefore transpose to
# [digits, ...batch] on entry — digit ops run on the sublane axis while the
# large batch axis fills the lanes — and transpose back on exit.  XLA layout
# assignment cancels adjacent transposes between fused kernels.
# ---------------------------------------------------------------------------

def _shift_up0(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Along axis 0: out[i] = x[i-s] (zero fill below)."""
    if s == 0:
        return x
    n = x.shape[0]
    pad = [(s, 0)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)[:n]


def _prefix_carry0(g, p):
    n = g.shape[0]
    G, P = g, p
    s = 1
    while s < n:
        G = G | (P & _shift_up0(G, s))
        P = P & _shift_up0(P, s)
        s <<= 1
    return _shift_up0(G, 1)


def _normalize0(x, relax_rounds: int):
    for _ in range(relax_rounds):
        x = (x & MASK) + _shift_up0(x >> W, 1)
    g = x >> W
    p = ((x & MASK) == MASK).astype(U32)
    c = _prefix_carry0(g, p)
    return (x + c) & MASK


def _sub_borrow0(a, b):
    d = a + jnp.uint32(MASK + 1) - b
    g = (d >> W) ^ 1
    p = ((d & MASK) == 0).astype(U32)
    c = _prefix_carry0(g, p)
    digits = (d - c) & MASK
    last = (g[-1] | (p[-1] & c[-1]))
    return digits, last


def _add_carry0(a, b):
    s = a + b
    g = s >> W
    p = ((s & MASK) == MASK).astype(U32)
    c = _prefix_carry0(g, p)
    return (s + c) & MASK


def _cond_sub_p0(x, spec: FieldSpec):
    p_col = jnp.asarray(spec.p_digits).reshape(L, *([1] * (x.ndim - 1)))
    diff, borrow = _sub_borrow0(x, p_col)
    keep = (borrow != 0)[None]
    return jnp.where(keep, x, diff)


def _mul_columns0(a, b):
    """[L, ...] x [L, ...] -> lazy columns [2L+1, ...]."""
    nd = a.ndim
    acc = None
    for i in range(L):
        prod = a[i][None] * b  # [L, ...]
        lo = prod & MASK
        hi = prod >> W
        r = jnp.pad(lo, [(i, L + 1 - i)] + [(0, 0)] * (nd - 1))
        acc = r if acc is None else acc + r
        acc = acc + jnp.pad(hi, [(i + 1, L - i)] + [(0, 0)] * (nd - 1))
    return acc


def _redc0(spec: FieldSpec, t_lazy, relax_rounds: int = 2):
    width = t_lazy.shape[0]
    assert width in (2 * L, 2 * L + 1)
    if width == 2 * L:
        t_lazy = jnp.pad(t_lazy, [(0, 1)] + [(0, 0)] * (t_lazy.ndim - 1))
    t = _normalize0(t_lazy, relax_rounds)
    pp_col = jnp.asarray(spec.p_prime_digits).reshape(
        L, *([1] * (t.ndim - 1))
    )
    m = _normalize0(_mul_columns0(t[:L], pp_col + jnp.zeros_like(t[:L]))[:L], 2)
    p_col = jnp.asarray(spec.p_digits).reshape(L, *([1] * (t.ndim - 1)))
    mp = _mul_columns0(m, p_col + jnp.zeros_like(m))
    u = _normalize0(t + mp, 2)
    return _cond_sub_p0(u[L: 2 * L], spec)


def _to_wide(a):
    return jnp.moveaxis(a, -1, 0)


def _from_wide(a):
    return jnp.moveaxis(a, 0, -1)


# -- fully wide field ops: operate on [L, ...batch] without transposing.
# Used by kernels (MSM bucket accumulation) that keep every tensor
# digit-major end to end so the minor axes stay large and tile-friendly. --

def _add_wide(spec: FieldSpec, a, b):
    return _cond_sub_p0(_add_carry0(a, b), spec)


def _sub_wide(spec: FieldSpec, a, b):
    diff, borrow = _sub_borrow0(a, b)
    p_col = jnp.asarray(spec.p_digits).reshape(L, *([1] * (a.ndim - 1)))
    wrapped = _add_carry0(diff, p_col)
    return jnp.where((borrow != 0)[None], wrapped, diff)


def _mont_mul_wide(spec: FieldSpec, a, b):
    return _redc0(spec, _mul_columns0(a, b))


def _neg_wide(spec: FieldSpec, a):
    p_col = jnp.asarray(spec.p_digits).reshape(L, *([1] * (a.ndim - 1)))
    diff, _ = _sub_borrow0(p_col + jnp.zeros_like(a), a)
    z = jnp.all(a == 0, axis=0)
    return jnp.where(z[None], jnp.zeros_like(diff), diff)


def _cond_sub_p(x: jnp.ndarray, spec: FieldSpec) -> jnp.ndarray:
    diff, borrow = _sub_borrow(x, jnp.asarray(spec.p_digits))
    keep = (borrow != 0)[..., None]  # borrow => x < p
    return jnp.where(keep, x, diff)


@functools.lru_cache(maxsize=8)
def _antidiag_index(n_in: int):
    """Precomputed gather indices/mask for anti-diagonal sums of an
    [.., n_in(i), n_in(j)] product block into 2*n_in columns."""
    idx = np.zeros((n_in, 2 * n_in), dtype=np.int32)
    mask = np.zeros((n_in, 2 * n_in), dtype=np.uint32)
    for i in range(n_in):
        for k in range(2 * n_in):
            j = k - i
            if 0 <= j < n_in:
                idx[i, k] = j
                mask[i, k] = 1
    return idx, mask


def _mul_columns(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Digit tensors [.., L] x [.., L] -> lazy column sums [.., 2L+1]
    (each lane < 2^22).

    Anti-diagonal sums built from L statically-shifted row copies — pure
    pads/adds, no gathers (XLA CPU gathers serialize; TPU prefers shifts too).
    """
    nd = a.ndim
    acc = None
    for i in range(L):
        # row i of the schoolbook product: a_i * b, lo into cols i..i+L-1,
        # hi into cols i+1..i+L.  Accumulating row-by-row avoids the 16x
        # [.., L, L] intermediate (which OOMs on bucket-wide operands).
        prod = a[..., i: i + 1] * b  # [.., L] u32
        lo = prod & MASK
        hi = prod >> W
        r = jnp.pad(lo, [(0, 0)] * (nd - 1) + [(i, L + 1 - i)])
        acc = r if acc is None else acc + r
        acc = acc + jnp.pad(hi, [(0, 0)] * (nd - 1) + [(i + 1, L - i)])
    return acc


def _mul_low(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Low L columns of the digit product, lazily accumulated [.., L]."""
    return _mul_columns(a, b)[..., :L]


# ---------------------------------------------------------------------------
# Field ops
# ---------------------------------------------------------------------------

def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    if IS_CPP:
        return _cpp.add(spec, a, b)
    return _add_jax(spec, a, b)


@functools.partial(jax.jit, static_argnums=0)
def _add_jax(spec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    return _from_wide(_cond_sub_p0(_add_carry0(_to_wide(a), _to_wide(b)), spec))


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    if IS_CPP:
        return _cpp.sub(spec, a, b)
    return _sub_jax(spec, a, b)


@functools.partial(jax.jit, static_argnums=0)
def _sub_jax(spec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    aw, bw = _to_wide(a), _to_wide(b)
    diff, borrow = _sub_borrow0(aw, bw)
    p_col = jnp.asarray(spec.p_digits).reshape(L, *([1] * (aw.ndim - 1)))
    wrapped = _add_carry0(diff, p_col)
    return _from_wide(jnp.where((borrow != 0)[None], wrapped, diff))


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    if IS_CPP:
        return _cpp.neg(spec, a)
    return _neg_jax(spec, a)


@functools.partial(jax.jit, static_argnums=0)
def _neg_jax(spec, a):
    diff, _ = _sub_borrow(jnp.asarray(spec.p_digits) + jnp.zeros_like(a), a)
    z = is_zero(a)
    return jnp.where(z[..., None], jnp.zeros_like(diff), diff)


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    return xnp.all(a == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return xnp.all(a == b, axis=-1)


def redc(spec: FieldSpec, t_lazy: jnp.ndarray, relax_rounds: int = 2) -> jnp.ndarray:
    """One-shot Montgomery reduction of a lazy 2L(+1)-column value T:
    returns T·R^{-1} mod p as exact digits.

    M = (T mod R)·p' mod R with p' = -p^{-1} mod R, result = (T + M·p)/R.
    """
    width = t_lazy.shape[-1]
    assert width in (2 * L, 2 * L + 1)
    if width == 2 * L:
        t_lazy = jnp.pad(t_lazy, [(0, 0)] * (t_lazy.ndim - 1) + [(0, 1)])
    t = _normalize(t_lazy, relax_rounds)  # [.., 2L+1] exact
    m = _normalize(
        _mul_low(t[..., :L], jnp.asarray(spec.p_prime_digits) + jnp.zeros_like(t[..., :L])),
        2,
    )
    mp = _mul_columns(m, jnp.asarray(spec.p_digits) + jnp.zeros_like(m))
    u = _normalize(t + mp, 2)  # [.., 2L+1]; low L lanes are zero
    # (T + M·p)/R < 2p < 2^255, so lane 2L is 0 after normalization
    return _cond_sub_p(u[..., L: 2 * L], spec)


def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p over digit tensors.

    Eager [n, L] calls with huge n are row-block-scanned: a flat 2^22-wide
    multiply's widened temps abort the TPU compile (see
    mont_mul_rows_blocked).  Calls from inside larger jit programs use
    _mont_mul_jax directly and manage their own blocking."""
    if IS_CPP:
        return _cpp.mul(spec, a, b)
    if (
        a.ndim == 2
        and a.shape[0] > _BLOCK_THRESHOLD
        and (b.ndim < 2 or b.shape[0] == a.shape[0])
    ):
        bb = b if b.ndim == 2 else jnp.broadcast_to(b, a.shape)
        return mont_mul_rows_blocked(spec, a, bb)
    return _mont_mul_jax(spec, a, b)


@functools.partial(jax.jit, static_argnums=0)
def _mont_mul_jax(spec, a, b):
    a, b = jnp.broadcast_arrays(a, b)
    return _from_wide(
        _redc0(spec, _mul_columns0(_to_wide(a), _to_wide(b)))
    )


def mont_square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    r2 = spec.r2_digits if IS_CPP else jnp.asarray(spec.r2_digits)
    return mont_mul(spec, a, r2)


def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    one_ = np.zeros((L,), dtype=np.uint32)
    one_[0] = 1
    if not IS_CPP:
        one_ = jnp.asarray(one_)
    return mont_mul(spec, a, one_)


# ---------------------------------------------------------------------------
# Exponentiation / inversion
# ---------------------------------------------------------------------------

def pow_const(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    if IS_CPP:
        assert e >= 0
        if e == 0:
            return one(spec, a.shape[:-1])
        return _cpp.pow_const(spec, a, e)
    return _pow_const_jax(spec, a, e)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _pow_const_jax(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a fixed Python-int exponent.

    Small exponents unroll; large ones run an MSB-first square-and-multiply
    `lax.scan` over the exponent bits so mont_mul is traced only twice.
    """
    assert e >= 0
    if e == 0:
        return one(spec, a.shape[:-1])
    if e.bit_count() + e.bit_length() <= 8:
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else _mont_mul_jax(spec, result, base)
            e >>= 1
            if e:
                base = _mont_mul_jax(spec, base, base)
        return result

    nbits = e.bit_length()
    bits = jnp.asarray(
        [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
    )

    def body(acc, bit):
        acc = _mont_mul_jax(spec, acc, acc)
        with_mul = _mont_mul_jax(spec, acc, a)
        acc = jnp.where((bit != 0)[..., None], with_mul, acc)
        return acc, None

    init = one(spec, a.shape[:-1])
    out, _ = jax.lax.scan(body, init, bits)
    return out


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse a^{p-2}; maps 0 to 0."""
    if IS_CPP:
        return _cpp.pow_const(spec, a, spec.p - 2)
    return _inv_jax(spec, a)


@functools.partial(jax.jit, static_argnums=0)
def _inv_jax(spec, a):
    return _pow_const_jax(spec, a, spec.p - 2)


def prefix_mul(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    if IS_CPP:
        return _cpp.prefix_mul(spec, a)
    return _prefix_mul_jax(spec, a)


# Above this many leading-axis elements, prefix products and batched
# inversion switch to row-blocked lax.scan variants: a mont_mul over a
# full [n, L] tensor materializes several n-sized widened temps (digit
# products, carry chains), and at n = 2^22 XLA's schedule for the flat
# prefix/suffix formulation wants >5 GB of HLO temps — the k=22 z-polys
# HBM blowup (r5; same family as the r4 row-blocked round kernels, see
# docs/PERF_NOTES.md).  Blocked, every full-size multiply lives inside a
# [BLOCK]-sized scan iteration, so peak extra memory is O(BLOCK) + the
# unavoidable input/output.
_BLOCK_THRESHOLD = 1 << 21
_BLOCK = 1 << 19


@functools.partial(jax.jit, static_argnums=0)
def _prefix_mul_jax(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix product along axis 0.

    Two-level `lax.scan` (within √n-sized groups, then across group totals):
    the multiply body is traced exactly twice, keeping compile time flat while
    runtime stays ~2√n sequential vector multiplies.  Replaces the reference's
    serial running products (prover.rs:307-323) and is the building block for
    batched inversion.  Large inputs take the row-blocked path (see
    _BLOCK_THRESHOLD)."""
    n = a.shape[0]
    if n == 1:
        return a
    if n > _BLOCK_THRESHOLD:
        return _prefix_mul_blocked_jax(spec, a)
    k = 1 << max(1, (n.bit_length() // 2))
    g = -(-n // k)
    pad = g * k - n
    if pad:
        a = jnp.concatenate([a, one(spec, (pad, *a.shape[1:-1]))], axis=0)
    grouped = a.reshape(g, k, *a.shape[1:])
    grouped = jnp.moveaxis(grouped, 1, 0)  # [k, g, ..., L]

    def body(carry, x):
        new = _mont_mul_jax(spec, carry, x)
        return new, new

    _, incl = jax.lax.scan(body, one(spec, grouped.shape[1:-1]), grouped)
    totals = incl[-1]  # [g, ..., L]

    def body2(carry, x):
        new = _mont_mul_jax(spec, carry, x)
        return new, carry  # exclusive prefix of group totals

    _, group_excl = jax.lax.scan(body2, one(spec, totals.shape[1:-1]), totals)
    out = _mont_mul_jax(spec, incl, group_excl[None])  # [k, g, ..., L]
    out = jnp.moveaxis(out, 0, 1).reshape(g * k, *a.shape[1:])
    return out[:n]


def _pad_to_blocks(spec: FieldSpec, a: jnp.ndarray):
    """Pad axis 0 with ones to a multiple of _BLOCK; -> ([B, m, ..., L], n)."""
    n = a.shape[0]
    m = _BLOCK
    nb = -(-n // m)
    pad = nb * m - n
    if pad:
        a = jnp.concatenate([a, one(spec, (pad, *a.shape[1:-1]))], axis=0)
    return a.reshape(nb, m, *a.shape[1:]), n


def _prefix_mul_blocked_jax(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Row-blocked inclusive prefix product: scan over _BLOCK-sized blocks
    carrying the running product, in-block prefixes via the two-level scan.
    Peak extra memory is O(_BLOCK) instead of O(n)."""
    blocks, n = _pad_to_blocks(spec, a)

    def body(carry, blk):
        lp = _prefix_mul_jax(spec, blk)  # [m, ..., L]
        out = _mont_mul_jax(spec, carry[None], lp)
        return out[-1], out

    _, out = jax.lax.scan(body, one(spec, a.shape[1:-1]), blocks)
    return out.reshape(-1, *a.shape[1:])[:n]


def mont_mul_rows_blocked(spec: FieldSpec, a: jnp.ndarray,
                          b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise mont_mul over [n, ..., L] operands, scanned in _BLOCK
    rows when n is huge — a flat full-width multiply materializes ~20
    n-sized widened temps (digit products, carries), which is an HBM
    compile abort at n = 2^22 (the normalize_points_jit lesson, r5)."""
    n = a.shape[0]
    if n <= _BLOCK_THRESHOLD:
        return _mont_mul_jax(spec, a, b)
    blocks_a, _ = _pad_to_blocks(spec, a)
    blocks_b, _ = _pad_to_blocks(spec, b)

    def body(_, xs):
        return None, _mont_mul_jax(spec, xs[0], xs[1])

    _, out = jax.lax.scan(body, None, (blocks_a, blocks_b))
    return out.reshape(-1, *a.shape[1:])[:n]


def _batch_inv_blocked_jax(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Row-blocked Montgomery batch inversion (see _batch_inv_jax).

    Pass 1 scans blocks to get per-block totals and the grand product;
    pass 2 rescans, recomputing in-block prefix/suffix products and
    combining with the per-block exclusive prefix (C) / suffix (E) of the
    totals: inv_i = C_b·lp_excl_i · E_b·ls_excl_i · total_inv.  Recomputes
    one in-block prefix pair instead of materializing n-sized prefix,
    suffix, left and right tensors at once."""
    z = is_zero(a)
    safe = jnp.where(z[..., None], one(spec, a.shape[:-1]), a)
    blocks, n = _pad_to_blocks(spec, safe)

    def tot_body(carry, blk):
        lp = _prefix_mul_jax(spec, blk)
        t = lp[-1]
        return _mont_mul_jax(spec, carry, t), (carry, t)

    total, (c_excl, totals) = jax.lax.scan(
        tot_body, one(spec, a.shape[1:-1]), blocks
    )
    total_inv = _inv_jax(spec, total[None])[0]

    def suf_body(carry, t):
        return _mont_mul_jax(spec, carry, t), carry

    _, e_excl_rev = jax.lax.scan(
        suf_body, one(spec, a.shape[1:-1]), totals[::-1]
    )
    e_excl = e_excl_rev[::-1]  # [B, ..., L]: product of totals after b

    def inv_body(_, xs):
        blk, c_b, e_b = xs
        lp = _prefix_mul_jax(spec, blk)
        ls = _prefix_mul_jax(spec, blk[::-1])[::-1]
        left = jnp.concatenate([c_b[None], _mont_mul_jax(spec, c_b[None], lp[:-1])], axis=0)
        right = jnp.concatenate([_mont_mul_jax(spec, e_b[None], ls[1:]), e_b[None]], axis=0)
        out = _mont_mul_jax(
            spec, _mont_mul_jax(spec, left, right), total_inv[None]
        )
        return None, out

    _, out = jax.lax.scan(inv_body, None, (blocks, c_excl, e_excl))
    out = out.reshape(-1, *a.shape[1:])[:n]
    return jnp.where(z[..., None], jnp.zeros_like(out), out)


def batch_inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    if IS_CPP:
        shape = a.shape
        return _cpp.inv_batch(spec, a.reshape(-1, L)).reshape(shape)
    return _batch_inv_jax(spec, a)


@functools.partial(jax.jit, static_argnums=0)
def _batch_inv_jax(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched inversion along the leading axis via Montgomery's trick.

    Replaces the reference's `BatchInvert` chunked loops
    (/root/reference/plonkish_backend/src/backend/hyperplonk/prover.rs:226-234)
    with prefix/suffix product scans + one Fermat inversion of the grand
    total.  Zeros map to zero.
    """
    assert a.ndim >= 2
    n = a.shape[0]
    if n == 1:
        return _inv_jax(spec, a)
    if n > _BLOCK_THRESHOLD:
        return _batch_inv_blocked_jax(spec, a)
    z = is_zero(a)
    safe = jnp.where(z[..., None], one(spec, a.shape[:-1]), a)

    prefix = _prefix_mul_jax(spec, safe)
    suffix = _prefix_mul_jax(spec, safe[::-1])[::-1]
    total_inv = _inv_jax(spec, prefix[-1:])  # [1, ..., L]

    left = jnp.concatenate([one(spec, (1, *a.shape[1:-1])), prefix[:-1]], axis=0)
    right = jnp.concatenate([suffix[1:], one(spec, (1, *a.shape[1:-1]))], axis=0)
    out = _mont_mul_jax(spec, _mont_mul_jax(spec, left, right), total_inv)
    return jnp.where(z[..., None], jnp.zeros_like(out), out)


# ---------------------------------------------------------------------------
# Reductions
# ---------------------------------------------------------------------------

def sum_reduce(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    if IS_CPP:
        return _cpp.sum_reduce(spec, a)
    return _sum_reduce_jax(spec, a)


@functools.partial(jax.jit, static_argnums=0)
def _sum_reduce_jax(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Modular sum along axis 0: lazy u32 digit accumulation in chunks small
    enough to avoid overflow, then one REDC-based normalization.

    Σ of Montgomery values stays Montgomery: REDC(Σ)·R² ≡ Σ mod p.
    """
    n = a.shape[0]
    if n == 1:
        return a[0]
    # lazy sum: each digit < 2^16, so up to 2^16 terms fit in u32
    chunk = 1 << 15
    while a.shape[0] > 1:
        take = min(chunk, a.shape[0])
        pad = (-a.shape[0]) % take
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros((pad, *a.shape[1:]), dtype=U32)], axis=0
            )
        lazy = jnp.sum(
            a.reshape(-1, take, *a.shape[1:]), axis=1, dtype=U32
        )  # [.., L] lanes < 2^31
        width_pad = [(0, 0)] * (lazy.ndim - 1) + [(0, L + 1)]
        canon = redc(spec, jnp.pad(lazy, width_pad), relax_rounds=3)
        a = _mont_mul_jax(spec, canon, jnp.asarray(spec.r2_digits))
    return a[0]


def scatter_sum(
    spec: FieldSpec, terms: jnp.ndarray, idx: jnp.ndarray, size: int
) -> jnp.ndarray:
    if IS_CPP:
        return _cpp.scatter_sum(spec, terms, idx, size)
    return _scatter_sum_jax(spec, terms, idx, size)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _scatter_sum_jax(
    spec: FieldSpec, terms: jnp.ndarray, idx: jnp.ndarray, size: int
) -> jnp.ndarray:
    """Modular scatter-add: out[j] = Σ_{i: idx[i]=j} terms[i].

    terms: [..., N, L] Montgomery; idx: [N] int; out: [..., size, L] Montgomery.
    Digit lanes accumulate lazily in u32 (sound for < 2^16 terms per bucket),
    then one REDC + rescale restores Montgomery form — the TPU-native
    replacement for atomics-based bucket accumulation.
    """
    acc = jnp.zeros((*terms.shape[:-2], size, L), dtype=U32)
    if terms.ndim == 2:
        acc = acc.at[idx].add(terms)
    elif terms.ndim == 3:
        acc = acc.at[:, idx].add(terms)
    else:
        raise ValueError(f"unsupported terms rank {terms.ndim}")
    width_pad = [(0, 0)] * (acc.ndim - 1) + [(0, L + 1)]
    canon = redc(spec, jnp.pad(acc, width_pad), relax_rounds=3)
    return _mont_mul_jax(spec, canon, jnp.asarray(spec.r2_digits))


# ---------------------------------------------------------------------------
# Fused multilinear folds (the sum-check/fix_var inner loops)
# ---------------------------------------------------------------------------

def fold_halves(spec: FieldSpec, lo, hi, x):
    """out = (hi - lo) * x + lo, elementwise."""
    if IS_CPP:
        return _cpp.fold_halves(spec, lo, hi, x)
    return _fold_halves_jax(spec, lo, hi, x)


@functools.partial(jax.jit, static_argnums=0)
def _fold_halves_jax(spec, lo, hi, x):
    return _add_jax(spec, _mont_mul_jax(spec, _sub_jax(spec, hi, lo), x), lo)


def fold_pairs(spec: FieldSpec, evals, x):
    """out[i] = (e[2i+1] - e[2i]) * x + e[2i]  (multilinear fix_var kernel,
    /root/reference/plonkish_backend/src/poly/multilinear.rs:599-618)."""
    if IS_CPP:
        return _cpp.fix_var(spec, evals, x)
    return _fold_pairs_jax(spec, evals, x)


@functools.partial(jax.jit, static_argnums=0)
def _fold_pairs_jax(spec, evals, x):
    n = evals.shape[0]
    pairs = evals.reshape(n // 2, 2, -1)
    return _fold_halves_jax(spec, pairs[:, 0], pairs[:, 1], x)
