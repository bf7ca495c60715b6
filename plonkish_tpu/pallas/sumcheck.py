"""Pallas sum-check round kernels (EvaluationsProver hot loop).

Reference semantics: /root/reference/plonkish_backend/src/piop/sum_check/
classic/eval.rs:92-322 (per-round evals at t=1..d with per-poly steps) and
classic.rs:90-141 (fix_var fold).  TPU redesign:

- tables stream through VMEM as PACKED digit-major tiles (two 16-bit
  digits per u32 word, [W=8, S, 128] blocks -- half the HBM footprint and
  traffic of unpacked digits; kernels unpack per block); all digit
  interactions are struct-of-arrays VPU ops (fields/soa.py), so the kernel
  body is a few K ops compiled ONCE per (expression, size) and iterated by
  the grid — the fused XLA variant of this loop OOMed the compiler at
  k>=18 because its [.., 16]-minor temps tile-pad 8x (docs/PERF_NOTES.md);
- grid (d, blocks): per t the expression tape is evaluated on each block
  at leaf values hi + (t-1)*(hi-lo); per-lane partial sums accumulate in a
  VMEM scratch and are flushed as exact u32 digit sums (lo/hi 16-bit
  halves) at the last block — the host reduces mod p;
- the fix_var fold (lo + c*(hi-lo)) is a second tiny kernel on the same
  pre-split lo/hi arrays, gridded over (table, block).

Small rounds (pair count < PALLAS_MIN_SIZE) stay on the existing fused XLA
path, which compiles fine there — so each prove pays a handful of Mosaic
compiles for the big rounds only (all persistently cached).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import LANE, SUBLANE, TILE, interpret_mode
from ..fields import limb, soa
from ..fields.spec import FieldSpec, int_to_digits

L = limb.L

# Minimum pair count routed to the Pallas kernels; below this the tape-scan
# XLA round program is used (it compiles in seconds and the tail rounds are
# HBM-cheap anyway).  Each distinct size that reaches Pallas costs one
# Mosaic compile (~minutes cold, persistently cached), so the threshold
# trades cold-start against peak round throughput; override with
# PLONKISH_TPU_SUMCHECK_PALLAS_MIN (0 disables the Pallas path).
import os as _os

PALLAS_MIN_SIZE = int(
    _os.environ.get("PLONKISH_TPU_SUMCHECK_PALLAS_MIN", 1 << 13)
)


def _eval_expression_soa(spec: FieldSpec, expr, leaves: Dict):
    """Catamorphism over struct-of-arrays digit lists (the Pallas twin of
    sum_check._eval_expression_device)."""
    from ..utils.expression import EqXY, Identity, Lagrange

    ref = next(iter(leaves.values()))

    def cst(c):
        return soa.const(spec, int(c), ref)

    def common(cp):
        if isinstance(cp, Identity):
            return leaves[("identity",)]
        if isinstance(cp, Lagrange):
            return leaves[("lagrange", cp.i)]
        if isinstance(cp, EqXY):
            return leaves[("eq_xy", cp.idx)]
        raise TypeError(cp)

    return expr.evaluate(
        cst,
        common,
        lambda q: leaves[("poly", q.poly, q.rotation.value)],
        lambda idx: (_ for _ in ()).throw(
            AssertionError("challenges must be substituted")
        ),
        lambda a: soa.neg(spec, a),
        lambda a, b: soa.add(spec, a, b),
        lambda a, b: soa.mont_mul(spec, a, b),
        lambda a, s: soa.mont_mul(spec, a, cst(s)),
    )


W = L // 2  # packed words per element: two 16-bit digits per u32


def pack_digits(x):
    """[.., L, n] digit-major (digits < 2^16) -> [.., W, n] packed words
    (word w = digit_2w | digit_{2w+1} << 16).  Halves the HBM footprint and
    traffic of the sum-check state; kernels unpack per VMEM block (2 VPU
    ops per word vs an HBM read).  Slicing is on the digit axis, so the
    minor hypercube axis layout is preserved."""
    return x[..., 0::2, :] | (x[..., 1::2, :] << jnp.uint32(16))


def unpack_digits(x):
    """[.., W, n] packed words -> [.., L, n] exact digits."""
    lo = x & jnp.uint32(0xFFFF)
    hi = x >> jnp.uint32(16)
    return jnp.stack([lo, hi], axis=-2).reshape(
        *x.shape[:-2], L, x.shape[-1]
    )


pack_digits_jit = jax.jit(pack_digits)
unpack_digits_jit = jax.jit(unpack_digits)


def _unpack_rows(ref, ki):
    """Packed [T, W, ...] VMEM ref -> per-digit list of 16 blocks."""
    out = []
    for w in range(W):
        v = ref[ki, w]
        out.append(v & jnp.uint32(0xFFFF))
        out.append(v >> jnp.uint32(16))
    return out


@functools.lru_cache(maxsize=32)
def bitrev_perm(m: int) -> np.ndarray:
    """rev[s] = m-bit bit-reversal of s.  The Pallas state stores the
    hypercube BIT-REVERSED: fixing the first logical variable then pairs
    row s with row s + size — the contiguous halves — so the round/fold
    kernels address lo/hi as two index-mapped views of ONE array instead
    of materializing strided lo/hi copies (a full extra state read+write
    per round, and the peak-memory blocker one k below the HBM limit)."""
    s = np.arange(1 << m, dtype=np.int64)
    rev = np.zeros_like(s)
    for b in range(m):
        rev |= ((s >> b) & 1) << (m - 1 - b)
    return rev


def _bitrev_block(v, m: int):
    """In-kernel m-bit reversal of an int32 block (identity-leaf logical
    index from the bit-reversed storage index)."""
    x = v.astype(jnp.uint32)
    x = ((x & jnp.uint32(0x55555555)) << 1) | (
        (x >> 1) & jnp.uint32(0x55555555)
    )
    x = ((x & jnp.uint32(0x33333333)) << 2) | (
        (x >> 2) & jnp.uint32(0x33333333)
    )
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | (
        (x >> 4) & jnp.uint32(0x0F0F0F0F)
    )
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | (
        (x >> 8) & jnp.uint32(0x00FF00FF)
    )
    x = (x << 16) | (x >> 16)
    return x >> jnp.uint32(32 - m)


def _round_kernel(spec, expr, keys, num_blocks, use_identity, m,
                  lo_ref, hi_ref, idc_ref, off_ref, step_ref,
                  out_ref, acc_ref):
    """Grid (d, num_blocks): evaluate the round polynomial at t = 1 + t_idx
    over one block and accumulate per-lane digit sums.  lo/hi are two
    half-offset views of the SAME bit-reversed state array; `m` = log2 of
    the pair count (for the identity leaf's storage->logical index
    reversal)."""
    t_idx = pl.program_id(0)
    bi = pl.program_id(1)

    @pl.when(bi == 0)
    def _reset():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)

    def at_t(base, step):
        return jax.lax.fori_loop(
            0, t_idx, lambda _, cu: soa.add(spec, cu, step), base
        )

    # per-(table, word) lazy loads: materializing the whole [T, W, S,
    # LANE] blocks up front costs T*W vregs of register pressure per block
    # and the resulting spills dominate the step
    leaves = {}
    for ki, key in enumerate(keys):
        h = _unpack_rows(hi_ref, ki)
        l_ = _unpack_rows(lo_ref, ki)
        leaves[key] = at_t(h, soa.sub(spec, h, l_))

    if use_identity:
        # identity value at (t, b) = off + (t-1)*2^round + b*2^(round+1)
        # with off = mont(offset + 2^round); C = 2^(round+1)*R^2 folds the
        # scaling into one Montgomery multiply of b's raw digits.  The
        # storage index s is bit-reversed, so b = bitrev_m(s).
        shape = (lo_ref.shape[2], LANE)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        b = _bitrev_block(
            bi * (lo_ref.shape[2] * LANE) + row * LANE + col, m
        )
        bd = [
            b & jnp.uint32(0xFFFF),
            b >> jnp.uint32(16),
        ] + [jnp.zeros(shape, jnp.uint32)] * (L - 2)
        cd = [jnp.broadcast_to(idc_ref[d], shape) for d in range(L)]
        od = [jnp.broadcast_to(off_ref[d], shape) for d in range(L)]
        sd = [jnp.broadcast_to(step_ref[d], shape) for d in range(L)]
        base = soa.add(spec, soa.mont_mul(spec, bd, cd), od)
        leaves[("identity",)] = at_t(base, sd)

    res = _eval_expression_soa(spec, expr, leaves)
    for d in range(L):
        acc_ref[d] = acc_ref[d] + res[d]

    @pl.when(bi == num_blocks - 1)
    def _flush():
        for d in range(L):
            # int32 sums: Mosaic lacks unsigned reductions; halves fit
            # (low: <= lanes*2^16, high: <= lanes*2^12 < 2^31)
            v = acc_ref[d]
            lo16 = (v & 0xFFFF).astype(jnp.int32)
            hi16 = (v >> 16).astype(jnp.int32)
            out_ref[t_idx, 2 * d] = jnp.sum(lo16).astype(jnp.uint32)
            out_ref[t_idx, 2 * d + 1] = jnp.sum(hi16).astype(jnp.uint32)


def _fold_kernel(spec, lo_ref, hi_ref, ch_ref, out_ref):
    """new = lo + c*(hi - lo) for one table block (fix_var); packed
    words in, packed words out."""
    l_ = _unpack_rows(lo_ref, 0)
    h = _unpack_rows(hi_ref, 0)
    shape = l_[0].shape
    ch = [jnp.broadcast_to(ch_ref[d], shape) for d in range(L)]
    out = soa.add(
        spec, l_, soa.mont_mul(spec, soa.sub(spec, h, l_), ch)
    )
    for w in range(W):
        out_ref[0, w] = out[2 * w] | (out[2 * w + 1] << jnp.uint32(16))


def _half_view(stacked):
    """Packed BIT-REVERSED [T, W, n] state -> ([T, W, 2R, LANE] lane-tiled
    view, R, s, nb).  Pairs under fix_var of the first logical variable
    are rows s and s + size of the bit-reversed storage — the contiguous
    halves — so lo/hi are the same array read through two block index
    maps offset by nb blocks: NO strided lo/hi copies (a full extra state
    read+write per round otherwise, and the peak-memory blocker one k
    below the HBM limit)."""
    t, w_, n = stacked.shape
    size = n // 2
    r = size // LANE
    s = min(SUBLANE, r)
    nb = r // s
    view = stacked.reshape(t, w_, n // LANE, LANE)
    return view, r, s, nb


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _round_evals_jit(spec, expr, keys, degree, use_identity,
                     stacked, idc, off, step):
    """Packed bit-reversed [T, W, n] state -> [degree, 2L] exact u32 digit
    sums of the round polynomial evaluations at t = 1..degree."""
    view, r, s, nb = _half_view(stacked)
    t = view.shape[0]
    m = (r * LANE).bit_length() - 1  # log2(pair count)
    kern = functools.partial(
        _round_kernel, spec, expr, keys, nb, use_identity, m
    )
    return pl.pallas_call(
        kern,
        grid=(degree, nb),
        in_specs=[
            pl.BlockSpec((t, W, s, LANE), lambda ti, bi: (0, 0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, W, s, LANE),
                         lambda ti, bi, _nb=nb: (0, 0, bi + _nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((degree, 2 * L), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((L, s, LANE), jnp.uint32)],
        interpret=interpret_mode(),
    )(view, view, idc, off, step)


@functools.partial(jax.jit, static_argnums=0)
def _fold_tables_jit(spec, stacked, challenge_digits):
    """Packed bit-reversed [T, W, n] state -> [T, W, n/2] folded with
    fix_var(challenge); the output keeps bit-reversed order over the
    remaining variables (dropping the top storage bit IS dropping the
    first logical variable)."""
    view, r, s, nb = _half_view(stacked)
    t = view.shape[0]
    out = pl.pallas_call(
        functools.partial(_fold_kernel, spec),
        grid=(t, nb),
        in_specs=[
            pl.BlockSpec((1, W, s, LANE), lambda ti, bi: (ti, 0, bi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, s, LANE),
                         lambda ti, bi, _nb=nb: (ti, 0, bi + _nb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, W, s, LANE),
                               lambda ti, bi: (ti, 0, bi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, W, r, LANE), jnp.uint32),
        interpret=interpret_mode(),
    )(view, view, challenge_digits)
    return out.reshape(t, W, r * LANE)


def usable(size: int) -> bool:
    """Pallas round path handles pair counts that are multiples of the
    VPU tile and large enough to amortize a Mosaic compile.  Disabled when
    a device mesh is active: pallas_call does not auto-partition under
    GSPMD (a multi-chip pallas round kernel would need shard_map; the
    sharded prover uses the fused XLA path instead)."""
    from . import is_available
    from ..parallel import get_mesh

    return (
        PALLAS_MIN_SIZE > 0
        and size >= PALLAS_MIN_SIZE
        and size % LANE == 0
        and get_mesh() is None
        and is_available()
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _round_evals_canon_jit(spec, expr, keys, degree, use_identity,
                           stacked, idc, off_mont, stp):
    """Round kernel + device digit-sum reduction in one program:
    packed digit-major [T, W, n] state -> [degree, L] canonical values
    at t=1..degree.  `off_mont` is the Montgomery identity offset carried
    on device (the device-FS driver never knows it on host)."""
    from ..piop import fiat_shamir as fs

    off = limb._add_jax(spec, off_mont, stp)  # mont(identity_offset + 2^round)
    sums = _round_evals_jit(
        spec, expr, keys, degree, use_identity, stacked, idc, off, stp
    )
    # the kernel flush INTERLEAVES digit d's lo/hi halves at out[2d] (weight
    # 2^16d) and out[2d+1] (weight 2^16(d+1)); de-interleave to positional
    # digit sums before the reduction (sums < 2^27, no u32 overflow)
    lo, hi = sums[:, 0::2], sums[:, 1::2]
    pos = jnp.pad(lo, ((0, 0), (0, L)))
    pos = pos.at[:, 1: L + 1].add(hi)
    return fs.digit_sums_to_canonical(spec, pos)


def round_evals_canon(spec, expr, keys: Tuple, degree: int, round_: int,
                      off_mont, stacked):
    """Device [degree, L] canonical round evaluations (no host sync)."""
    use_identity = ("identity",) in _used_leaves(expr)
    c_int = ((1 << (round_ + 1)) * spec.r2_mod_p) % spec.p
    idc = jnp.asarray(int_to_digits(c_int))
    stp = jnp.asarray(int_to_digits(spec.to_mont((1 << round_) % spec.p)))
    return _round_evals_canon_jit(
        spec, expr, keys, degree, use_identity, stacked, idc, off_mont, stp
    )


def round_evals(state, stacked, keys: Tuple, expr, degree: int) -> List[int]:
    """Round polynomial evaluations at t=1..degree as canonical ints.
    `stacked` is the PACKED digit-major [T, W, n] state tensor, rows
    ordered by `keys`."""
    from ..piop import fiat_shamir as fs

    spec = state.spec
    off_mont = jnp.asarray(
        int_to_digits(spec.to_mont(int(state.identity_offset) % spec.p))
    )
    canon = round_evals_canon(
        spec, expr, keys, degree, state.round, off_mont, stacked
    )
    return [fs.digits_to_int(row) for row in np.asarray(canon)]


def _used_leaves(expr):
    from ..utils.expression import Identity

    leaves = set()
    expr.evaluate(
        lambda _: None,
        lambda cp: leaves.add(("identity",)) if isinstance(cp, Identity) else None,
        lambda q: None,
        lambda c: None,
        lambda a: None,
        lambda a, b: None,
        lambda a, b: None,
        lambda a, s: None,
    )
    return leaves


def fold_tables(spec: FieldSpec, stacked, challenge):
    """fix_var over the whole packed digit-major [T, W, n] state in one
    Pallas program; returns the halved [T, W, n/2] state."""
    ch = jnp.asarray(int_to_digits(spec.to_mont(int(challenge) % spec.p)))
    return _fold_tables_jit(spec, stacked, ch)
