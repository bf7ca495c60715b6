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
in a uint32 lane ((2^16-1)^2 < 2^32) and schoolbook column sums stay below
2^22, so no 64-bit arithmetic is ever required — this is the property that
makes the layout TPU-native (the VPU has no u64 multiplier).

Every function is pure and jit-safe; digit loops are Python-level and unroll
at trace time into a fixed op DAG that XLA fuses.
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
# Conversions
# ---------------------------------------------------------------------------

def zeros(shape=()) -> jnp.ndarray:
    return jnp.zeros((*shape, L), dtype=U32)


def from_ints(values, spec: FieldSpec | None = None) -> jnp.ndarray:
    """Python ints -> digit tensor (canonical form, NOT Montgomery)."""
    values = np.asarray(values, dtype=object)
    flat = values.reshape(-1)
    out = np.empty((flat.size, L), dtype=np.uint32)
    for i, v in enumerate(flat.tolist()):
        out[i] = int_to_digits(int(v))
    return jnp.asarray(out.reshape(*values.shape, L))


def to_ints(digits) -> np.ndarray:
    """Digit tensor -> numpy object array of Python ints."""
    arr = np.asarray(jax.device_get(digits), dtype=np.uint64)
    shape = arr.shape[:-1]
    flat = arr.reshape(-1, L)
    out = np.empty(flat.shape[0], dtype=object)
    weights = [1 << (W * i) for i in range(L)]
    for i in range(flat.shape[0]):
        row = flat[i]
        acc = 0
        for j in range(L):
            acc += int(row[j]) * weights[j]
        out[i] = acc
    return out.reshape(shape)


def const(spec: FieldSpec, value: int, mont: bool = True) -> jnp.ndarray:
    """A single field element as a [16] digit vector."""
    v = value % spec.p
    if mont:
        v = spec.to_mont(v)
    return jnp.asarray(int_to_digits(v))


# ---------------------------------------------------------------------------
# Digit plumbing
# ---------------------------------------------------------------------------

def _carry(cols: list, n_out: int) -> list:
    """Propagate carries over lazily-accumulated u32 columns -> exact digits.

    `cols` is a list of [...]-shaped u32 arrays (one per column, values may
    exceed 2^16 but stay < 2^32).  Returns `n_out` exact digits; any final
    carry is dropped (callers guarantee it is zero).
    """
    out = []
    carry = None
    for k in range(n_out):
        v = cols[k] if k < len(cols) else jnp.zeros_like(cols[0])
        if carry is not None:
            v = v + carry
        out.append(v & MASK)
        carry = v >> W
    return out


def _stack(cols: list) -> jnp.ndarray:
    return jnp.stack(cols, axis=-1)


def _unstack(x: jnp.ndarray) -> list:
    return [x[..., i] for i in range(x.shape[-1])]


def _sub_digits(a_cols: list, b_digits: np.ndarray):
    """a - b over digit lists. Returns (diff digits list, borrow_out [...])."""
    out = []
    borrow = None
    for i in range(L):
        v = a_cols[i] + jnp.uint32(MASK + 1) - jnp.uint32(int(b_digits[i]))
        if borrow is not None:
            v = v - borrow
        out.append(v & MASK)
        borrow = 1 - (v >> W)
    return out, borrow


def _cond_sub_p(cols: list, spec: FieldSpec) -> list:
    """If value >= p subtract p (branch-free select)."""
    diff, borrow = _sub_digits(cols, spec.p_digits)
    keep = (borrow != 0)  # borrow => value < p => keep original
    return [jnp.where(keep, a, d) for a, d in zip(cols, diff)]


# ---------------------------------------------------------------------------
# Add / sub / neg
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.broadcast_arrays(a, b)
    cols = [a[..., i] + b[..., i] for i in range(L)]
    cols = _carry(cols, L)  # a+b < 2p < 2^256, no overflow out of digit 15
    return _stack(_cond_sub_p(cols, spec))


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.broadcast_arrays(a, b)
    out = []
    borrow = None
    for i in range(L):
        v = a[..., i] + jnp.uint32(MASK + 1) - b[..., i]
        if borrow is not None:
            v = v - borrow
        out.append(v & MASK)
        borrow = 1 - (v >> W)
    # If borrow: result is negative, add p back.
    add_back = []
    carry = None
    for i in range(L):
        v = out[i] + jnp.uint32(int(spec.p_digits[i]))
        if carry is not None:
            v = v + carry
        add_back.append(v & MASK)
        carry = v >> W
    need = (borrow != 0)
    return _stack([jnp.where(need, pb, o) for o, pb in zip(out, add_back)])


@functools.partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    # p - a, with 0 -> 0.
    diff, _ = [], None
    out = []
    borrow = None
    for i in range(L):
        v = jnp.uint32(int(spec.p_digits[i])) + jnp.uint32(MASK + 1) - a[..., i]
        if borrow is not None:
            v = v - borrow
        out.append(v & MASK)
        borrow = 1 - (v >> W)
    z = is_zero(a)
    return _stack([jnp.where(z, jnp.zeros_like(o), o) for o in out])


def is_zero(a: jnp.ndarray) -> jnp.ndarray:
    acc = a[..., 0]
    for i in range(1, L):
        acc = acc | a[..., i]
    return acc == 0


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    acc = a[..., 0] ^ b[..., 0]
    for i in range(1, L):
        acc = acc | (a[..., i] ^ b[..., i])
    return acc == 0


# ---------------------------------------------------------------------------
# Montgomery multiplication
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod p over digit tensors.

    Schoolbook product with lo/hi 16-bit splitting (every digit product fits a
    u32 lane) followed by digit-serial Montgomery reduction in base 2^16.
    The unrolled op DAG is fused by XLA into a single elementwise kernel over
    the batch axes.
    """
    a, b = jnp.broadcast_arrays(a, b)
    # --- full product into 2L lazy columns (each < 2^21) ---
    prod = a[..., :, None] * b[..., None, :]  # [..., L, L] u32
    lo = prod & MASK
    hi = prod >> W
    ncols = 2 * L + 1
    cols = [None] * ncols
    zero = jnp.zeros_like(a[..., 0])
    for k in range(ncols):
        cols[k] = zero
    for i in range(L):
        for j in range(L):
            cols[i + j] = cols[i + j] + lo[..., i, j]
            cols[i + j + 1] = cols[i + j + 1] + hi[..., i, j]
    return _redc(spec, cols)


def _redc(spec: FieldSpec, cols: list) -> jnp.ndarray:
    """Montgomery reduction of a 2L-column lazy number: returns T*R^{-1} mod p.

    `cols` is a list of 2L+1 u32 arrays with lazily-accumulated column values
    (each < ~2^30); consumed destructively."""
    n0inv = jnp.uint32(spec.n0_inv)
    p_dig = [jnp.uint32(int(d)) for d in spec.p_digits]
    for i in range(L):
        v = cols[i]
        cols[i + 1] = cols[i + 1] + (v >> W)
        d = v & MASK
        cols[i] = d
        m = (d * n0inv) & MASK
        for j in range(L):
            mp = m * p_dig[j]
            cols[i + j] = cols[i + j] + (mp & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (mp >> W)
        # column i is now ≡ 0 mod 2^16; push its carry and retire it
        v2 = cols[i]
        cols[i + 1] = cols[i + 1] + (v2 >> W)
    digits = _carry(cols[L:], L)
    return _stack(_cond_sub_p(digits, spec))


@functools.partial(jax.jit, static_argnums=(0, 3))
def scatter_sum(
    spec: FieldSpec, terms: jnp.ndarray, idx: jnp.ndarray, size: int
) -> jnp.ndarray:
    """Modular scatter-add: out[j] = Σ_{i: idx[i]=j} terms[i].

    terms: [..., N, L] Montgomery; idx: [N] int; out: [..., size, L] Montgomery.
    Digit sums accumulate lazily in u32 lanes (sound for < 2^16 terms per
    bucket) and are normalized with a single Montgomery reduction + re-scaling
    — the TPU-native replacement for atomics-based bucket accumulation.
    """
    acc = jnp.zeros((*terms.shape[:-2], size, L), dtype=U32)
    if terms.ndim == 2:
        acc = acc.at[idx].add(terms)
    elif terms.ndim == 3:
        acc = acc.at[:, idx].add(terms)
    else:
        raise ValueError(f"unsupported terms rank {terms.ndim}")
    zero = jnp.zeros_like(acc[..., 0])
    cols = [acc[..., i] for i in range(L)] + [zero] * (L + 1)
    canon = _redc(spec, cols)  # (Σ mont terms)*R^{-1} = canonical sum
    return mont_mul(spec, canon, jnp.asarray(spec.r2_digits))


def mont_square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont_mul(spec, a, jnp.asarray(spec.r2_digits))


def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    one = jnp.zeros((L,), dtype=U32).at[0].set(1)
    return mont_mul(spec, a, one)


def one(spec: FieldSpec, shape=()) -> jnp.ndarray:
    """Montgomery-form 1 broadcast to shape."""
    return jnp.broadcast_to(jnp.asarray(spec.r_digits), (*shape, L))


# ---------------------------------------------------------------------------
# Exponentiation / inversion
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 2))
def pow_const(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a fixed Python-int exponent.

    Small exponents unroll; large ones run an MSB-first square-and-multiply
    `lax.scan` over the exponent bits so `mont_mul` is traced only twice
    (compile-time matters: one mont_mul is ~10^3 XLA ops).
    """
    assert e >= 0
    if e == 0:
        return one(spec, a.shape[:-1])
    if e.bit_count() + e.bit_length() <= 8:
        result = None
        base = a
        while e:
            if e & 1:
                result = base if result is None else mont_mul(spec, result, base)
            e >>= 1
            if e:
                base = mont_square(spec, base)
        return result

    nbits = e.bit_length()
    bits = jnp.asarray(
        [(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=jnp.uint32
    )

    def body(acc, bit):
        acc = mont_square(spec, acc)
        with_mul = mont_mul(spec, acc, a)
        acc = jnp.where((bit != 0)[..., None], with_mul, acc)
        return acc, None

    init = one(spec, a.shape[:-1])
    out, _ = jax.lax.scan(body, init, bits)
    return out


@functools.partial(jax.jit, static_argnums=0)
def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inverse a^{p-2}; maps 0 to 0."""
    return pow_const(spec, a, spec.p - 2)


@functools.partial(jax.jit, static_argnums=0)
def batch_inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Batched inversion along the leading axis via Montgomery's trick.

    Replaces the reference's `BatchInvert` chunked loops
    (/root/reference/plonkish_backend/src/backend/hyperplonk/prover.rs:226-234)
    with two log-depth prefix/suffix product scans — the TPU-native shape of
    the same O(1) multiplications-per-inverse trick.  Zeros map to zero.
    """
    assert a.ndim >= 2
    n = a.shape[0]
    if n == 1:
        return inv(spec, a)
    z = is_zero(a)
    safe = jnp.where(z[..., None], one(spec, a.shape[:-1]), a)

    mul = functools.partial(mont_mul, spec)
    prefix = jax.lax.associative_scan(mul, safe, axis=0)
    suffix = jax.lax.associative_scan(mul, safe, axis=0, reverse=True)
    total_inv = inv(spec, prefix[-1:])  # [1, ..., L]

    left = jnp.concatenate([one(spec, (1, *a.shape[1:-1])), prefix[:-1]], axis=0)
    right = jnp.concatenate([suffix[1:], one(spec, (1, *a.shape[1:-1]))], axis=0)
    out = mont_mul(spec, mont_mul(spec, left, right), total_inv)
    return jnp.where(z[..., None], jnp.zeros_like(out), out)


@functools.partial(jax.jit, static_argnums=0)
def sum_reduce(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Modular sum along axis 0 by pairwise tree reduction (log-depth)."""
    while a.shape[0] > 1:
        n = a.shape[0]
        if n % 2:
            a = jnp.concatenate([a, jnp.zeros_like(a[:1])], axis=0)
        a = add(spec, a[0::2], a[1::2])
    return a[0]
