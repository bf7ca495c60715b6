"""Classic sum-check PIOP, TPU-native.

Protocol semantics are identical to the reference
(/root/reference/plonkish_backend/src/piop/sum_check/classic.rs and
classic/eval.rs, classic/coeff.rs): per round the prover sends either the
round polynomial's evaluations at t = 0..d (`EvaluationsProver`) or its
coefficients (`CoefficientsProver`, degree-2 fast path), the verifier squeezes
a challenge, and every live table is folded with `fix_var`.

TPU design notes
----------------
- Every leaf of the constraint expression — witness/rotated-witness tables,
  eq(x,y) tables, dense Lagrange one-hots, and the identity polynomial — is a
  device limb tensor over the live hypercube slice; one memoized AST walk per
  (round, t) emits a fused XLA program that evaluates the whole constraint at
  every point at once.  (The reference needs a hand-rolled ExpressionRegistry
  tape + per-poly "step" deltas to vectorize on CPU — eval.rs:210-322; here
  the same t-stepping trick appears as `hi + (t-1)*step` tensor updates.)
- Rotated queries are materialized once at round 0 via a BH `rotation_map`
  gather (classic.rs:104-129 does the same materialization).
- Lagrange leaves stay DENSE one-hot tables (deliberate divergence from the
  reference's sparse split, eval.rs:357-396): a folded sparse L_i is
  scalar·one_hot(i >> r), which on CPU saves a table walk, but on TPU would
  add per-round single-element gathers and a second expression tape for the
  sparse factors while saving only ~2 of ~25-35 dense rows of HBM traffic —
  uniform dense streams beat divergent sparse handling at that ratio.
- The per-round transcript squeeze is the protocol-forced host sync point:
  d+1 field elements device->host per round, 32 bytes host->device back.
- Sharding: the hypercube axis is shardable on high-order index bits; fix_var
  and all expression evaluation stay shard-local, partial sums psum.  (See
  plonkish_tpu.parallel for the sharded driver.)
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.host import Fp, batch_invert
from ..fields.spec import FieldSpec
from ..poly.multilinear import MLPoly
from ..utils.bh import BooleanHypercube
from ..utils.expression import (
    Challenge,
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
from ..utils.timer import span
from ..utils.transcript import Keccak256Transcript


# ---------------------------------------------------------------------------
# Virtual polynomial
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class VirtualPolynomial:
    expression: Expression
    polys: List[MLPoly]
    challenges: List[Fp]
    ys: List[List[Fp]]


# ---------------------------------------------------------------------------
# Verifier-side final evaluation helpers (sum_check.rs:60-125)
# ---------------------------------------------------------------------------

def lagrange_eval(x: Sequence[Fp], b: int) -> Fp:
    assert len(x) > 0
    spec = x[0].spec
    acc = Fp.one(spec)
    for idx, x_i in enumerate(x):
        acc = acc * (x_i if (b >> idx) & 1 else Fp.one(spec) - x_i)
    return acc


def eq_xy_eval(x: Sequence[Fp], y: Sequence[Fp]) -> Fp:
    assert len(x) == len(y) and len(x) > 0
    spec = x[0].spec
    acc = Fp.one(spec)
    for x_i, y_i in zip(x, y):
        acc = acc * ((x_i * y_i).double() + Fp.one(spec) - x_i - y_i)
    return acc


def identity_eval(x: Sequence[Fp]) -> Fp:
    spec = x[0].spec
    acc = Fp.zero(spec)
    for i, x_i in enumerate(x):
        acc = acc + x_i * (1 << i)
    return acc


def evaluate(
    expression: Expression,
    num_vars: int,
    evals: Dict[Query, Fp],
    challenges: Sequence[Fp],
    ys: Sequence[Sequence[Fp]],
    x: Sequence[Fp],
) -> Fp:
    """Evaluate the expression at point x given query evals (host)."""
    assert num_vars > 0
    assert expression.max_used_rotation_distance() <= num_vars
    identity = identity_eval(x)
    bh = BooleanHypercube(num_vars)
    order = bh.iter_array
    lagranges = {}
    for i in expression.used_lagrange():
        b = int(order[i % (1 << num_vars)])
        lagranges[i] = lagrange_eval(x, b)
    eq_xys = [eq_xy_eval(x, y) for y in ys]

    def common(cp):
        if isinstance(cp, Identity):
            return identity
        if isinstance(cp, Lagrange):
            return lagranges[cp.i]
        if isinstance(cp, EqXY):
            return eq_xys[cp.idx]
        raise TypeError(cp)

    return expression.evaluate(
        lambda c: c,
        common,
        lambda q: evals[q],
        lambda idx: challenges[idx],
        lambda a: -a,
        lambda a, b: a + b,
        lambda a, b: a * b,
        lambda a, s: a * s,
    )


# ---------------------------------------------------------------------------
# Barycentric interpolation over points 0..d (arithmetic.rs:108-136)
# ---------------------------------------------------------------------------

def barycentric_weights(points: List[Fp]) -> List[Fp]:
    spec = points[0].spec
    weights = []
    for j, pj in enumerate(points):
        w = Fp.one(spec)
        for i, pi in enumerate(points):
            if i != j:
                w = w * (pj - pi)
        weights.append(w)
    return batch_invert(weights)


def barycentric_interpolate(
    weights: List[Fp], points: List[Fp], evals: List[Fp], x: Fp
) -> Fp:
    spec = x.spec
    coeffs = batch_invert([x - p for p in points])
    coeffs = [c * w for c, w in zip(coeffs, weights)]
    sum_inv = sum(coeffs, Fp.zero(spec)).inv()
    acc = Fp.zero(spec)
    for c, e in zip(coeffs, evals):
        acc = acc + c * e
    return acc * sum_inv


# ---------------------------------------------------------------------------
# Prover state
# ---------------------------------------------------------------------------

class ProverState:
    """Device-resident state of the classic sum-check prover.

    Slots hold Montgomery limb tensors over the live hypercube slice.  Mirrors
    classic.rs:25-150 with dense Lagrange/identity representations (TPU
    prefers a dense one-hot vector folded like any other table to per-scalar
    bookkeeping).
    """

    def __init__(self, spec: FieldSpec, num_vars: int, sum_: Fp,
                 virtual_poly: VirtualPolynomial, layout: str = "dm"):
        assert num_vars > 0
        assert virtual_poly.expression.max_used_rotation_distance() <= num_vars
        self.spec = spec
        self.layout = layout  # jax mode: "dm" = [T, L, n], "tensor" = [T, n, L]
        self.num_vars = num_vars
        self.expression = virtual_poly.expression
        self.degree = virtual_poly.expression.degree()
        self.sum = sum_
        self.challenges = virtual_poly.challenges
        self.round = 0

        bh = BooleanHypercube(num_vars)
        n = 1 << num_vars

        # Dense Lagrange one-hots at their BH positions (classic.rs:44-55).
        self.lagranges: Dict[int, jnp.ndarray] = {}
        order = bh.iter_array
        for i in self.expression.used_lagrange():
            b = int(order[i % n])
            vec = limb.set_index(limb.zeros((n,)), b, limb.one(spec, ()))
            self.lagranges[i] = vec

        # Identity polynomial: value at index b is identity_offset + b * 2^round
        # with challenge bits accumulated into the offset each round.
        self.identity_offset = Fp.zero(spec)

        self.eq_xys: List[jnp.ndarray] = [
            _eq_xy_table(spec, y) for y in virtual_poly.ys
        ]

        # Poly slots keyed by (poly_idx, rotation); rotations materialized by
        # BH-gather once (classic.rs:104-126 materializes at round 0).
        self.polys: Dict[Tuple[int, int], jnp.ndarray] = {}
        for idx, poly in enumerate(virtual_poly.polys):
            self.polys[(idx, 0)] = poly.evals
        for query in self.expression.used_query():
            rot = query.rotation.value
            if rot != 0 and (query.poly, rot) not in self.polys:
                rmap = limb.xnp.asarray(bh.rotation_map(rot))
                self.polys[(query.poly, rot)] = virtual_poly.polys[
                    query.poly
                ].evals[rmap]

        self.table_keys: Tuple = ()
        self.stacked = None
        self.packed = False
        if not limb.IS_CPP:
            # jax mode keeps ONE stacked tensor as the round state instead
            # of per-table dicts: every round folds/evaluates all tables
            # together, and the per-round jnp.stack of a dict view was a
            # full extra copy of the live data (and the peak-memory blocker
            # at k>=21 on a 16 GB chip).
            #
            # "dm" layout is digit-major [T, L, n] (hypercube axis minor):
            # every per-round reshape/slice then happens on the minor axis,
            # so no program ever materializes a transposed temp.  The
            # tensor-form [.., n, 16] temps that a transpose inside a
            # program produces get an XLA tile layout with the 16-wide
            # digit axis on the 128-lane tile dim -> 8x HBM padding (the
            # k=21 zero-check round program asked for 25 GB of temps).
            tables = {("lagrange", i): v for i, v in self.lagranges.items()}
            tables.update(
                {("eq_xy", i): v for i, v in enumerate(self.eq_xys)}
            )
            tables.update({("poly", *k): v for k, v in self.polys.items()})
            self.table_keys = tuple(sorted(tables))
            self.poly_keys = tuple(sorted(self.polys))
            from ..pallas import sumcheck as _psc

            if layout == "dm" and _psc.usable(self.size):
                # Pallas-bound state: TWO 16-bit digits per u32 word
                # ([T, W=8, n], half the HBM footprint/traffic) in
                # BIT-REVERSED hypercube order (fix_var pairs become the
                # contiguous halves, so the kernels read lo/hi as two
                # index-mapped views of one array — no strided pair-split
                # copies).  Reverts to exact digits in natural order once
                # the rounds fall below the Pallas threshold (next_round).
                #
                # Transpose+pack+bitrev run PER TABLE before the stack:
                # stacking the unpacked [T, L, n] state first, then packing
                # and permuting it, holds three full-size copies at the
                # peak — the k=23 single-chip blocker (16 GB HBM).
                rev = jnp.asarray(_psc.bitrev_perm(num_vars))
                pack = (
                    _pack_table_donate_jit
                    if _os.environ.get(
                        "PLONKISH_TPU_DONATE_SUMCHECK_INPUTS"
                    ) == "1"
                    else _pack_table_jit
                )
                stacked = jnp.stack(
                    [pack(tables[k], rev) for k in self.table_keys],
                    axis=0,
                )
                hyper_axis = 2
                self.packed = True
            elif layout == "dm":
                # per-table transposes ([n, L] -> [L, n]) are layout-safe
                # (the lane axis is the big n); stacking them never builds
                # a [.., n, L] rank-3 temp
                stacked = jnp.stack(
                    [tables[k].T for k in self.table_keys], axis=0
                )
                hyper_axis = 2
                self.packed = False
            else:
                stacked = jnp.stack(
                    [tables[k] for k in self.table_keys], axis=0
                )
                hyper_axis = 1
                self.packed = False
            self.lagranges = self.eq_xys = self.polys = None
            # Multi-chip: place the hypercube axis sharded over the active
            # mesh (high-order bits -> fix_var pairs stay shard-local);
            # GSPMD partitions the fused round programs and inserts the
            # psum/all-gather collectives (SURVEY §2.8).
            from ..parallel import maybe_shard_axis

            self.stacked = maybe_shard_axis(stacked, hyper_axis)

    def table(self, key: Tuple) -> jnp.ndarray:
        """One table's current evaluations as a tensor-form [n, L] array
        (jax mode: a row of the stacked state tensor)."""
        row = self.stacked[self.table_keys.index(key)]
        if self.packed:
            from ..pallas import sumcheck as _psc

            row = _psc.unpack_digits_jit(row)
            m = row.shape[-1].bit_length() - 1
            if m:
                row = row[:, jnp.asarray(_psc.bitrev_perm(m))]
        return row.T if self.layout == "dm" else row

    @property
    def size(self) -> int:
        return 1 << (self.num_vars - self.round - 1)

    def next_round(self, sum_: Fp, challenge: Fp) -> None:
        spec = self.spec
        self.sum = sum_
        self.identity_offset = self.identity_offset + challenge * (1 << self.round)
        c = limb.const(spec, int(challenge))
        if not limb.IS_CPP:
            # fold the whole stacked state in ONE device call (per-op
            # dispatch costs a network RTT on the tunneled TPU)
            from ..pallas import sumcheck as _psc

            if self.layout == "dm":
                if self.packed:
                    self.stacked = _psc.fold_tables(
                        spec, self.stacked, challenge
                    )
                    if not _psc.usable(self.size // 2):
                        # rounds below the Pallas threshold run on the XLA
                        # tape path: exact digits, natural order
                        self.stacked = _unpack_natural(spec, self.stacked)
                        self.packed = False
                else:
                    self.stacked = _fold_all_dm_jax(spec, self.stacked, c)
            else:
                self.stacked = _fold_all_jax(spec, self.stacked, c)
        else:
            self.lagranges = {
                i: _fix(spec, v, c) for i, v in self.lagranges.items()
            }
            self.eq_xys = [_fix(spec, v, c) for v in self.eq_xys]
            self.polys = {k: _fix(spec, v, c) for k, v in self.polys.items()}
        self.round += 1

    def into_evals(self) -> List[Fp]:
        """Final evaluations of each input poly at the challenge point."""
        assert self.round == self.num_vars
        if not limb.IS_CPP:
            idxs = sorted({p for (p, r) in self.poly_keys if r == 0})
            stack = limb.xnp.concatenate(
                [self.table(("poly", p, 0)) for p in idxs], axis=0
            )
        else:
            idxs = sorted({p for (p, r) in self.polys if r == 0})
            stack = limb.xnp.concatenate(
                [self.polys[(p, 0)] for p in idxs], axis=0
            )
        vals = limb.to_ints(limb.from_mont(self.spec, stack))
        return [Fp(int(v), self.spec) for v in vals]


def _unpack_natural(spec, stacked):
    """Packed bit-reversed [T, W, n] Pallas state -> exact-digit [T, L, n]
    in natural hypercube order (the XLA tape path's format).  Runs once per
    prove, at the Pallas->tape threshold crossing, on a tiny state."""
    from ..pallas import sumcheck as _psc

    out = _psc.unpack_digits_jit(stacked)
    m = out.shape[-1].bit_length() - 1
    if m:
        out = out[:, :, jnp.asarray(_psc.bitrev_perm(m))]
    return out


import functools as _functools

import jax as _jax

def _pack_table_body(tbl, rev):
    """One table [n, L] -> packed bit-reversed [W, n] (transpose + digit
    pack + BH bit-reversal fused per table; see ProverState.__init__)."""
    from ..pallas import sumcheck as _psc

    return _psc.pack_digits(tbl.T)[:, rev]


_pack_table_jit = _functools.partial(_jax.jit, donate_argnums=())(
    _pack_table_body
)
# Donating variant: frees each unpacked input buffer as it is packed, so
# the peak is (packed state + one table) instead of (all unpacked + all
# packed) — the difference between fitting and ResourceExhausted for
# zero_check at k>=23 on a 16 GB v5e.  Only safe when the caller will not
# touch the arrays again (jax invalidates donated buffers loudly);
# enabled per-prove via PLONKISH_TPU_DONATE_SUMCHECK_INPUTS=1 (the
# zero_check bench re-uploads its tables between samples).
_pack_table_donate_jit = _functools.partial(_jax.jit, donate_argnums=0)(
    _pack_table_body
)


# tail sum-check rounds are zero-padded up to this many pairs so they share
# one compiled round program (see _tape_round_jax)
_TAPE_PAD_SIZE = 1 << 10

# row-block for the flattened full-state fold (bounds the [2L+1, rows]
# mont-mul temps at large k; see _fold_all_jax)
_FOLD_ROW_BLOCK = 1 << 18


@_functools.partial(_jax.jit, static_argnums=0)
def _fold_all_jax(spec, stacked, challenge):
    # one stacked fold over [T, 2*size, L]: compiled program size is
    # independent of the table count.  The table axis is flattened into the
    # row axis so the mont-mul's wide-form temps are [2L+1, T*size] with a
    # huge minor axis — keeping T as its own (tiny) axis let XLA:TPU lay
    # the temps out T-minor with 8x tile padding and OOM HBM at k=20
    # (r04 session log: 1.31G padding per 192M buffer in this very
    # program).  Sizes past 2^18 rows also scan over row blocks to bound
    # the live temps.
    t, n2, l_ = stacked.shape
    size = n2 // 2
    pairs = stacked.reshape(t * size, 2, l_)
    m = t * size
    block = _FOLD_ROW_BLOCK
    if size >= block and m % block == 0:
        blocks = pairs.reshape(m // block, block, 2, l_)

        def body(_, blk):
            return None, limb._fold_halves_jax(
                spec, blk[:, 0], blk[:, 1], challenge
            )

        _, out = _jax.lax.scan(body, None, blocks)
        return out.reshape(t, size, l_)
    out = limb._fold_halves_jax(spec, pairs[:, 0], pairs[:, 1], challenge)
    return out.reshape(t, size, l_)


@_functools.partial(_jax.jit, static_argnums=0)
def _fold_all_dm_jax(spec, stacked, challenge):
    """Digit-major [T, L, 2*size] fold.  Only small (tail-round) sizes and
    CPU-mesh runs reach this path on TPU, so the internal tensor-form
    transposes' padded temps stay tiny."""
    t, l_, n2 = stacked.shape
    tf = jnp.transpose(stacked, (0, 2, 1))
    pairs = tf.reshape(t, n2 // 2, 2, l_)
    folded = limb._fold_halves_jax(
        spec, pairs[:, :, 0], pairs[:, :, 1], challenge
    )
    return jnp.transpose(folded, (0, 2, 1))


def _tape_round_body(
    spec, tape_static, degree, use_identity, stacked, instrs, consts,
    id_mul, id_off, id_step, mask
):
    """One fused round message: digit-major [T, L, 2*size] state tensor ->
    [degree, L] Montgomery totals at t = 1..degree.

    The t-axis is materialized up front (leaf value at t is hi + (t-1)*step,
    eval.rs:210-322's per-poly step trick) and the tape is evaluated once
    over the [degree*size] batch; compiled size is O(tape switch), not
    O(expression).  `instrs` arrive with OP_LOAD operands already remapped
    to stacked-row indices (identity = row T).  `mask` ([size] u32 0/1)
    zeroes rows past the true live size — small rounds are zero-padded to
    one shared shape so every tail round reuses a single compiled program
    (XLA CPU takes ~5s per field-op program; without padding each of the
    last ~10 rounds would recompile).  Only tail-round sizes and CPU-mesh
    runs reach this on TPU, so the internal transpose temps stay tiny."""
    from . import tape as tape_mod

    num_regs, out_reg = tape_static
    t_cnt, l_, n2 = stacked.shape
    size = n2 // 2
    tf = jnp.transpose(stacked, (0, 2, 1))  # [T, 2*size, L]
    grid = tf.reshape(t_cnt, size, 2, l_)
    lo, hi = grid[:, :, 0], grid[:, :, 1]
    step = limb._sub_jax(spec, hi, lo)
    per_t = [hi]
    for t in range(1, degree):
        per_t.append(limb._add_jax(spec, per_t[-1], step))
    by_leaf = jnp.stack(per_t, axis=1)  # [T, d, size, L]
    if use_identity:
        # identity value at (t, b) = off + (t-1)*2^round + b*2^(round+1);
        # the scaling folds into id_mul = 2^(round+1)*R^2 so only b's raw
        # 16-bit digits enter the Montgomery multiply
        b = jnp.arange(size, dtype=jnp.uint32)
        digits = jnp.stack([b & 0xFFFF, b >> 16], axis=-1)
        digits = jnp.concatenate(
            [digits, jnp.zeros((size, limb.L - 2), dtype=jnp.uint32)],
            axis=-1,
        )
        base = limb._add_jax(
            spec, limb._mont_mul_jax(spec, digits, id_mul), id_off
        )
        id_t = [base]
        for t in range(1, degree):
            id_t.append(
                limb._add_jax(
                    spec, id_t[-1], jnp.broadcast_to(id_step, base.shape)
                )
            )
        by_leaf = jnp.concatenate(
            [by_leaf, jnp.stack(id_t, axis=0)[None]], axis=0
        )
    leaves = by_leaf.reshape(by_leaf.shape[0], degree * size, l_)
    out = tape_mod.eval_tape(
        spec, num_regs, out_reg, instrs, leaves, consts,
    )  # [degree*size, L]
    out = out.reshape(degree, size, l_)
    out = jnp.where((mask > 0)[None, :, None], out, jnp.uint32(0))
    # one reduction over the whole [size, degree, L] block (a sum_reduce is
    # its own ~8s XLA CPU compile; d of them dominated the round's cold
    # cost); from-Montgomery conversion fused in (a separate eager call is
    # one more network round-trip on the tunneled TPU)
    totals = limb._sum_reduce_jax(spec, jnp.transpose(out, (1, 0, 2)))
    one_ = jnp.zeros((limb.L,), jnp.uint32).at[0].set(1)
    return limb._mont_mul_jax(spec, totals, one_)


_tape_round_jax = _functools.partial(_jax.jit, static_argnums=(0, 1, 2, 3))(
    _tape_round_body
)


# ---------------------------------------------------------------------------
# Fused-round programs (config.fused_rounds): one dispatch per packed round,
# one lax.scan program for the whole sub-threshold tail.  Both embed the
# device-FS message/squeeze (fiat_shamir._round_message_body) so a round is
# a single enqueue instead of 3 programs + per-round constant uploads — the
# fixed per-round latency on a network-tunneled TPU.
# ---------------------------------------------------------------------------

# Per-round constants for every possible round, uploaded ONCE per prove as
# [32, L] stacks and sliced on device by a carried round counter:
#   row r of idmul: (2^(r+1) * R^2) mod p   (identity b-scaling, see
#                   _tape_round_body / pallas round kernel)
#   row r of step:  mont(2^r)               (identity per-t step and the
#                   round_message offset update)
_MAX_ROUNDS = 32


def _round_const_stacks(spec):
    from ..fields.spec import int_to_digits

    idmul = np.stack([
        np.asarray(int_to_digits(((1 << (r + 1)) * spec.r2_mod_p) % spec.p))
        for r in range(_MAX_ROUNDS)
    ])
    step = np.stack([
        np.asarray(int_to_digits(spec.to_mont((1 << r) % spec.p)))
        for r in range(_MAX_ROUNDS)
    ])
    return idmul, step


@_functools.partial(_jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _fused_packed_round_jit(
    spec, expr, keys, degree, use_identity, nbytes,
    stacked, rnd, idmul_stack, stp_stack, sum_mont, off_mont,
    sp_lo, sp_hi, buf_lo, buf_hi, w_mont, pts_mont,
):
    """ONE program for a packed (Pallas) sum-check round: round-poly evals,
    canonicalization, Fiat-Shamir absorb/squeeze, next-sum interpolation,
    and the fold — returns the folded state plus the advanced sponge/round
    counter.  Shape-keyed only (the round index is a traced scalar), so the
    compiled program is shared across every k that reaches this size."""
    from ..pallas import sumcheck as _psc
    from . import fiat_shamir as fs

    idc = idmul_stack[rnd]
    stp = stp_stack[rnd]
    off = limb._add_jax(spec, off_mont, stp)
    sums = _psc._round_evals_jit(
        spec, expr, keys, degree, use_identity, stacked, idc, off, stp
    )
    # de-interleave the kernel's (lo, hi) digit-sum layout (see
    # pallas.sumcheck._round_evals_canon_jit)
    lo_, hi_ = sums[:, 0::2], sums[:, 1::2]
    pos = jnp.pad(lo_, ((0, 0), (0, limb.L)))
    pos = pos.at[:, 1: limb.L + 1].add(hi_)
    evals = fs.digit_sums_to_canonical(spec, pos)
    (msg_canon, ch_canon, ch_mont, next_sum, next_off,
     lo, hi, b_lo, b_hi) = fs._round_message_body(
        spec, degree, nbytes, evals, sum_mont, off_mont,
        sp_lo, sp_hi, buf_lo, buf_hi, w_mont, pts_mont, stp,
    )
    folded = _psc._fold_tables_jit(spec, stacked, ch_mont)
    return (msg_canon, ch_canon, folded, rnd + 1, next_sum, next_off,
            lo, hi, b_lo, b_hi)


@_functools.partial(_jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _fused_tail_scan_jit(
    spec, tape_static, degree, use_identity, nbytes, n_steps,
    stacked_p, rnd0, live0, idmul_stack, stp_stack, instrs, consts,
    sum_mont, off_mont, sp_lo, sp_hi, buf_lo, buf_hi, w_mont, pts_mont,
):
    """ALL remaining tape rounds as one lax.scan program.

    `stacked_p` is the digit-major state zero-padded to a fixed width
    [T, L, 2*psize]; the live pair count (live0 >> j at step j) only enters
    through the evaluation mask, and each step's fold writes the halved
    live region back into the padded width, so every step shares one shape.
    One dispatch + one [n_steps, d+1, L] message fetch replace ~n_steps*3
    programs; for k >= 14 the packed rounds always hand over at
    PALLAS_MIN_SIZE/2 pairs, so one compiled scan covers every such k."""
    from . import fiat_shamir as fs

    t_cnt, l_, n2 = stacked_p.shape
    psize = n2 // 2

    def step(carry, j):
        stacked, sum_m, off_m, lo, hi, blo, bhi = carry
        rnd = rnd0 + j
        live = live0 >> j
        mask = (jnp.arange(psize, dtype=jnp.uint32) < live).astype(
            jnp.uint32
        )
        id_step = stp_stack[rnd]
        id_mul = idmul_stack[rnd]
        id_off = limb._add_jax(spec, off_m, id_step)
        evals = _tape_round_body(
            spec, tape_static, degree, use_identity, stacked, instrs,
            consts, id_mul, id_off, id_step, mask,
        )
        (msg, ch, ch_mont, nsum, noff, lo, hi, blo, bhi) = (
            fs._round_message_body(
                spec, degree, nbytes, evals, sum_m, off_m,
                lo, hi, blo, bhi, w_mont, pts_mont, id_step,
            )
        )
        tf = jnp.transpose(stacked, (0, 2, 1)).reshape(t_cnt, psize, 2, l_)
        folded = limb._fold_halves_jax(spec, tf[:, :, 0], tf[:, :, 1],
                                       ch_mont)
        folded = jnp.transpose(folded, (0, 2, 1))  # [T, L, psize]
        stacked = jnp.concatenate(
            [folded, jnp.zeros_like(folded)], axis=2
        )
        return (stacked, nsum, noff, lo, hi, blo, bhi), (msg, ch)

    carry0 = (stacked_p, sum_mont, off_mont, sp_lo, sp_hi, buf_lo, buf_hi)
    carry, (msgs, chs) = _jax.lax.scan(
        step, carry0, jnp.arange(n_steps, dtype=jnp.uint32)
    )
    return carry, msgs, chs


def _eq_xy_table(spec, y):
    from ..poly.multilinear import eq_xy

    return eq_xy(spec, y).evals


def _fix(spec, evals, c):
    from ..poly.multilinear import _fix_var

    return _fix_var(spec, evals, c)


# ---------------------------------------------------------------------------
# Round messages
# ---------------------------------------------------------------------------

class Evaluations:
    """Round poly as evals at t=0..d (classic/eval.rs:22-68)."""

    def __init__(self, values: List[Fp]):
        self.values = values

    def write(self, transcript: Keccak256Transcript) -> None:
        transcript.write_field_elements(self.values)

    @staticmethod
    def read(degree: int, transcript: Keccak256Transcript) -> "Evaluations":
        return Evaluations(transcript.read_field_elements(degree + 1))

    def sum(self) -> Fp:
        return self.values[0] + self.values[1]

    @staticmethod
    def auxiliary(degree: int, spec: FieldSpec):
        points = [Fp(i, spec) for i in range(degree + 1)]
        return (barycentric_weights(points), points)

    def evaluate(self, aux, challenge: Fp) -> Fp:
        weights, points = aux
        return barycentric_interpolate(weights, points, self.values, challenge)


class Coefficients:
    """Round poly as coefficients (classic/coeff.rs:16-39)."""

    def __init__(self, values: List[Fp]):
        self.values = values

    def write(self, transcript: Keccak256Transcript) -> None:
        transcript.write_field_elements(self.values)

    @staticmethod
    def read(degree: int, transcript: Keccak256Transcript) -> "Coefficients":
        return Coefficients(transcript.read_field_elements(degree + 1))

    def sum(self) -> Fp:
        acc = self.values[0].double()
        for c in self.values[1:]:
            acc = acc + c
        return acc

    @staticmethod
    def auxiliary(degree: int, spec: FieldSpec):
        return None

    def evaluate(self, aux, challenge: Fp) -> Fp:
        acc = Fp.zero(challenge.spec)
        for c in reversed(self.values):
            acc = acc * challenge + c
        return acc


# ---------------------------------------------------------------------------
# EvaluationsProver
# ---------------------------------------------------------------------------

class EvaluationsProver:
    """General-degree prover: computes the round polynomial's evaluations at
    t=1..d by one vectorized expression evaluation per t (eval.rs semantics,
    dense representation).

    In jax mode the whole round message is one jitted function per
    (expression, size): leaf pair-splitting, the t-loop, the expression DAG,
    and the tree-sum all fuse into a single XLA program."""

    STATE_LAYOUT = "dm"  # digit-major [T, L, n] stacked state (jax mode)

    def __init__(self, state: ProverState):
        self.expr = state.expression.simplified(state.challenges)

    @staticmethod
    def _stacked_view(state: ProverState):
        """(table_keys, digit-major stacked tensor) — from the live jax
        state, or built on the fly for a cpp-mode state driven through the
        jax round (equivalence tests)."""
        if state.stacked is not None:
            return state.table_keys, state.stacked
        tables = {("lagrange", i): v for i, v in state.lagranges.items()}
        tables.update(
            {("eq_xy", i): v for i, v in enumerate(state.eq_xys)}
        )
        tables.update(
            {("poly", *k): v for k, v in state.polys.items()}
        )
        table_keys = tuple(sorted(tables))
        stacked_dm = jnp.stack(
            [jnp.asarray(np.asarray(tables[k])).T for k in table_keys],
            axis=0,
        )
        return table_keys, stacked_dm

    def evals_canon_device(
        self, spec, stacked_dm, table_keys, size: int, round_: int,
        off_mont, degree: int, packed: bool = False,
    ):
        """[d, L] canonical round-poly values at t=1..d, fully on device
        (no host sync — usable from the async device-FS driver).
        `off_mont` is the Montgomery identity offset as a digit tensor;
        `packed` marks a [T, W, n] packed-word state (Pallas rounds)."""
        from ..pallas import sumcheck as _psc

        if packed:
            return _psc.round_evals_canon(
                spec, self.expr, table_keys, degree, round_, off_mont,
                stacked_dm,
            )

        # Compile-size-bounded path: SSA tape + lax.scan (piop/tape.py).
        from ..fields.spec import int_to_digits

        t, instrs, use_identity = self._tape_setup(spec, table_keys)
        stacked = stacked_dm  # [T, L, 2*size] digit-major
        # pad tail rounds up to one shared shape (see _tape_round_jax)
        psize = max(size, _TAPE_PAD_SIZE)
        if size < psize:
            stacked = jnp.pad(
                stacked, ((0, 0), (0, 0), (0, 2 * (psize - size)))
            )
        mask = np.zeros(psize, np.uint32)
        mask[:size] = 1
        c = ((1 << (round_ + 1)) * spec.r2_mod_p) % spec.p
        id_mul = jnp.asarray(int_to_digits(c))
        id_step = limb.const(spec, (1 << round_) % spec.p, mont=True)
        id_off = limb._add_jax(spec, off_mont, id_step)
        return _tape_round_jax(
            spec, (t.num_regs, t.out_reg), degree, use_identity, stacked,
            jnp.asarray(instrs), t.const_rows(spec),
            id_mul, id_off, id_step, jnp.asarray(mask),
        )  # [d, L] canonical

    def _tape_setup(self, spec, table_keys):
        """(tape, row-remapped instrs, use_identity) for the XLA tail-round
        path — OP_LOAD operands remapped from tape leaf slots to stacked
        state rows (identity = synthetic row T, see _tape_round_jax)."""
        from . import tape as tape_mod

        t = tape_mod.tape_for(self.expr, spec)
        use_identity = ("identity",) in t.leaf_keys
        row_of = {k: i for i, k in enumerate(table_keys)}
        row_of[("identity",)] = len(table_keys)
        instrs = t.instrs.copy()
        is_load = instrs[:, 0] == tape_mod.OP_LOAD
        instrs[is_load, 1] = np.asarray(
            [row_of[k] for k in t.leaf_keys], dtype=np.int32
        )[instrs[is_load, 1]]
        return t, instrs, use_identity

    def _prove_round_jax(self, state: ProverState) -> Evaluations:
        from . import fiat_shamir as fs

        spec = state.spec
        d = state.degree
        table_keys, stacked_dm = self._stacked_view(state)
        off_mont = jnp.asarray(
            np.asarray(
                limb.const(spec, int(state.identity_offset) % spec.p,
                           mont=True)
            )
        )  # np in cpp mode, jnp in jax mode — normalize to a device array
        canon = self.evals_canon_device(
            spec, stacked_dm, table_keys, state.size, state.round,
            off_mont, d, packed=state.packed,
        )
        vals = np.asarray(canon)
        evals = [Fp.zero(spec)] * (d + 1)
        for t_ in range(1, d + 1):
            evals[t_] = Fp(fs.digits_to_int(vals[t_ - 1]), spec)
        evals[0] = state.sum - evals[1]
        return Evaluations(evals)

    def prove_round(self, state: ProverState) -> Evaluations:
        if not limb.IS_CPP:
            return self._prove_round_jax(state)
        spec = state.spec
        d = state.degree
        assert d >= 2
        size = state.size

        # Leaf (value, step) pairs at t=1: value = hi, step = hi - lo.
        leaves: Dict[object, Tuple[jnp.ndarray, jnp.ndarray]] = {}

        def pair(tbl):
            grid = tbl.reshape(size, 2, -1)
            lo, hi = grid[:, 0], grid[:, 1]
            return hi, limb.sub(spec, hi, lo)

        for i, tbl in state.lagranges.items():
            leaves[("lagrange", i)] = pair(tbl)
        for idx, tbl in enumerate(state.eq_xys):
            leaves[("eq_xy", idx)] = pair(tbl)
        for key, tbl in state.polys.items():
            leaves[("poly", *key)] = pair(tbl)

        # Identity: value at (t=1, b) = offset + 2^round + b*2^(round+1);
        # step per t = 2^round (eval.rs:233-236).
        id_base = _identity_base(
            spec, size, state.round, int(state.identity_offset)
        )
        id_step = limb.const(spec, (1 << state.round) % spec.p)
        leaves[("identity",)] = (id_base, id_step)

        evals = [Fp.zero(spec)] * (d + 1)
        current = {k: v for k, (v, _) in leaves.items()}
        for t in range(1, d + 1):
            if t > 1:
                current = {
                    k: limb.add(spec, current[k], leaves[k][1]) for k in current
                }
            result = _eval_expression_device(spec, self.expr, current, size)
            total = limb.sum_reduce(spec, result)
            v = limb.to_ints(limb.from_mont(spec, total[None]))[0]
            evals[t] = Fp(int(v), spec)
        evals[0] = state.sum - evals[1]
        return Evaluations(evals)


def _identity_base(spec, size, round_, offset_int):
    """Montgomery tensor of offset + 2^round + b*2^(round+1) for b in [0,size).

    The 2^(round+1) scaling folds into the Montgomery constant
    C = 2^(round+1)*R^2 mod p so only b's raw 16-bit digits are needed
    (b < 2^32, avoiding any 64-bit shifts)."""
    xnp = limb.xnp
    b = xnp.arange(size, dtype=np.uint32)
    digits = xnp.stack([b & 0xFFFF, b >> 16], axis=-1)
    digits = xnp.concatenate(
        [digits, xnp.zeros((size, limb.L - 2), dtype=np.uint32)], axis=-1
    )
    c = ((1 << (round_ + 1)) * spec.r2_mod_p) % spec.p
    from ..fields.spec import int_to_digits

    cd = int_to_digits(c) if limb.IS_CPP else jnp.asarray(int_to_digits(c))
    base = limb.mont_mul(spec, digits, cd)
    off = limb.const(spec, (offset_int + (1 << round_)) % spec.p)
    return limb.add(spec, base, off)


def _eval_expression_device(spec, expr, leaves, size, force_jax=False):
    """Memoized AST evaluation over whole-slice limb tensors.

    force_jax selects the jitted jax implementations regardless of the
    process backend (used inside the fused round kernel's trace)."""
    if force_jax:
        neg_, add_, mul_ = limb._neg_jax, limb._add_jax, limb._mont_mul_jax

        def cst(c):
            import jax.numpy as _jnp

            from ..fields.spec import int_to_digits

            return _jnp.asarray(int_to_digits(spec.to_mont(int(c) % spec.p)))
    else:
        neg_, add_, mul_ = limb.neg, limb.add, limb.mont_mul
        cst = lambda c: limb.const(spec, int(c))

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
        lambda a: neg_(spec, a),
        lambda a, b: add_(spec, a, b),
        lambda a, b: mul_(spec, a, b),
        lambda a, s: mul_(spec, a, cst(s)),
    )


# ---------------------------------------------------------------------------
# CoefficientsProver (degree-2 fast path used by PCS additive batch open)
# ---------------------------------------------------------------------------

class CoefficientsProver:
    """Flattens the expression to constant + Σ scalar·eq_xy·poly and runs the
    lazy karatsuba round (coeff.rs:66-208)."""

    # tensor-form [T, n, L] state: the deg-2 round works on a handful of
    # tables and its fused program reshapes only the middle axis
    STATE_LAYOUT = "tensor"

    def __init__(self, state: ProverState):
        spec = state.spec
        challenges = state.challenges

        def constant(c):
            return (c, [])

        def common(cp):
            return (Fp.zero(spec), [(Fp.one(spec), [CommonPoly(cp)])])

        def poly(q):
            return (Fp.zero(spec), [(Fp.one(spec), [Polynomial(q)])])

        def challenge(idx):
            return (challenges[idx], [])

        def negated(v):
            c, prods = v
            return (-c, [(-s, ps) for s, ps in prods])

        def sum_(a, b):
            return (a[0] + b[0], a[1] + b[1])

        def product(a, b):
            (ca, pa), (cb, pb) = a, b
            out = []
            if ca != 0:
                out.extend((ca * s, ps) for s, ps in pb)
            if cb != 0:
                out.extend((cb * s, ps) for s, ps in pa)
            for (sa, psa) in pa:
                for (sb, psb) in pb:
                    out.append((sa * sb, psa + psb))
            return (ca * cb, out)

        def scaled(v, s):
            c, prods = v
            return (c * s, [(x * s, ps) for x, ps in prods])

        self.constant, self.flattened = state.expression.evaluate(
            constant, common, poly, challenge, negated, sum_, product, scaled
        )
        assert all(len(ps) == 2 for _, ps in self.flattened), (
            "CoefficientsProver supports degree-2 eq_xy * poly expressions"
        )

    def term_triples(self):
        """Flattened terms as (eq_idx, poly_idx, scalar int) triples —
        the eq_xy/poly classification shared by the eager round and the
        device-FS driver (either product order; coeff.rs:157-167)."""
        out = []
        for scalar, prods in self.flattened:
            lhs, rhs = prods
            if isinstance(lhs, CommonPoly):
                eq_idx, query = lhs.poly.idx, rhs.query
            else:
                eq_idx, query = rhs.poly.idx, lhs.query
            assert query.rotation.value == 0
            out.append((eq_idx, query.poly, int(scalar)))
        return out

    def _term_tables(self, state):
        eqs, ps, scalars = [], [], []
        for eq_idx, poly_idx, scalar in self.term_triples():
            if limb.IS_CPP:
                eqs.append(state.eq_xys[eq_idx])
                ps.append(state.polys[(poly_idx, 0)])
            else:
                eqs.append(state.table(("eq_xy", eq_idx)))
                ps.append(state.table(("poly", poly_idx, 0)))
            scalars.append(scalar)
        return eqs, ps, scalars

    def prove_round(self, state: ProverState) -> Coefficients:
        spec = state.spec
        size = state.size
        c0 = Fp(size, spec) * self.constant
        c2 = Fp.zero(spec)
        eqs, ps, scalars = self._term_tables(state)
        if eqs and not limb.IS_CPP:
            # one fused program per round: on the tunneled TPU every eager
            # op costs a network RTT, and the deg-2 batch-open sum-check
            # runs ~10 of them per round per term otherwise; small rounds
            # pad to a shared shape (same trick as _tape_round_jax)
            from ..fields.spec import int_to_digits

            psize = max(size, _TAPE_PAD_SIZE)
            eq_s = jnp.stack(eqs, axis=0)
            p_s = jnp.stack(ps, axis=0)
            if size < psize:
                padrows = 2 * (psize - size)
                eq_s = jnp.pad(eq_s, ((0, 0), (0, padrows), (0, 0)))
                p_s = jnp.pad(p_s, ((0, 0), (0, padrows), (0, 0)))
            mask = np.zeros(psize, np.uint32)
            mask[:size] = 1
            sc = jnp.asarray(
                np.stack(
                    [int_to_digits(spec.to_mont(s)) for s in scalars]
                )
            )
            v0, v2 = limb.to_ints(
                _coeff_round_jax(spec, eq_s, p_s, sc, jnp.asarray(mask))
            )
            c0 = c0 + Fp(int(v0), spec)
            c2 = c2 + Fp(int(v2), spec)
        elif eqs:
            acc0 = None
            acc2 = None
            for eq_t, p_t, scalar in zip(eqs, ps, scalars):
                eq_tbl = eq_t.reshape(size, 2, -1)
                p_tbl = p_t.reshape(size, 2, -1)
                s = limb.const(spec, scalar)
                lo = limb.mont_mul(spec, eq_tbl[:, 0], p_tbl[:, 0])
                diff = limb.mont_mul(
                    spec,
                    limb.sub(spec, eq_tbl[:, 1], eq_tbl[:, 0]),
                    limb.sub(spec, p_tbl[:, 1], p_tbl[:, 0]),
                )
                term0 = limb.mont_mul(spec, limb.sum_reduce(spec, lo), s)
                term2 = limb.mont_mul(spec, limb.sum_reduce(spec, diff), s)
                acc0 = term0 if acc0 is None else limb.add(spec, acc0, term0)
                acc2 = term2 if acc2 is None else limb.add(spec, acc2, term2)
            both = limb.from_mont(spec, limb.xnp.stack([acc0, acc2]))
            v0, v2 = limb.to_ints(both)
            c0 = c0 + Fp(int(v0), spec)
            c2 = c2 + Fp(int(v2), spec)
        c1 = state.sum - c0.double() - c2
        return Coefficients([c0, c1, c2])


# Row block for the fused coeff round at large sizes: without it the XLA:TPU
# AOT compile of the k=20 round-0 program keeps hundreds of [L, T, size]
# mont-mul conv temps live and OOMs HBM (r04 session: 30.0G of 15.75G).
import os as _os

# Block size for the batch-open round's scan (r4 OOM fix).  Env-tunable:
# at k=21 the deg-2 round is 32 scan steps of 2^16 rows — sweepable
# against underutilization (PLONKISH_TPU_COEFF_BLOCK_LOG2=17/18).
_COEFF_ROW_BLOCK = 1 << int(
    _os.environ.get("PLONKISH_TPU_COEFF_BLOCK_LOG2", "16")
)


@_functools.partial(_jax.jit, static_argnums=0)
def _coeff_round_jax(spec, eq_tbls, p_tbls, scalar_digits, mask):
    """Fused degree-2 karatsuba round (coeff.rs:133-208): [T, 2*size, L]
    eq/poly tables + [T, L] Montgomery scalars -> [2, L] (c0, c2) totals.
    `mask` zeroes zero-padded rows of small rounds.

    Sizes above _COEFF_ROW_BLOCK run as a lax.scan over row blocks (partial
    [2, T, L] sums accumulated mod p per block), bounding the live mont-mul
    temps at block size."""
    t, n2, l_ = eq_tbls.shape
    size = n2 // 2

    def round_sums(eq, p, keep):
        # eq/p: [T, rows, 2, L]; keep: [rows] bool -> [2, T, L] sums
        lo = limb._mont_mul_jax(spec, eq[:, :, 0], p[:, :, 0])
        diff = limb._mont_mul_jax(
            spec,
            limb._sub_jax(spec, eq[:, :, 1], eq[:, :, 0]),
            limb._sub_jax(spec, p[:, :, 1], p[:, :, 0]),
        )
        k3 = keep[None, :, None]
        lo = jnp.where(k3, lo, jnp.uint32(0))
        diff = jnp.where(k3, diff, jnp.uint32(0))
        return limb._sum_reduce_jax(
            spec, jnp.stack([lo, diff], axis=0).transpose(2, 0, 1, 3)
        )  # [2, T, L]

    keep_all = mask > 0
    if size > _COEFF_ROW_BLOCK:
        nb = size // _COEFF_ROW_BLOCK
        eq_b = jnp.moveaxis(
            eq_tbls.reshape(t, nb, _COEFF_ROW_BLOCK, 2, l_), 1, 0
        )
        p_b = jnp.moveaxis(
            p_tbls.reshape(t, nb, _COEFF_ROW_BLOCK, 2, l_), 1, 0
        )
        keep_b = keep_all.reshape(nb, _COEFF_ROW_BLOCK)

        def body(acc, xs):
            eq, p, keep = xs
            return limb._add_jax(spec, acc, round_sums(eq, p, keep)), None

        init = jnp.zeros((2, t, l_), jnp.uint32)
        sums, _ = _jax.lax.scan(body, init, (eq_b, p_b, keep_b))
    else:
        sums = round_sums(
            eq_tbls.reshape(t, size, 2, l_),
            p_tbls.reshape(t, size, 2, l_),
            keep_all,
        )
    scaled = limb._mont_mul_jax(spec, sums, scalar_digits[None])
    totals = limb._sum_reduce_jax(spec, scaled.transpose(1, 0, 2))  # [2, L]
    one_ = jnp.zeros((limb.L,), jnp.uint32).at[0].set(1)
    return limb._mont_mul_jax(spec, totals, one_)  # canonical


@_functools.partial(_jax.jit, static_argnums=0)
def _coeff_block_sums_jax(spec, eq_tbls, p_tbls):
    """One row block of the degree-2 round, all rows live:
    [T, rows, L] eq/poly slices -> [2, T, L] partial (c0, c2) sums.
    Used by the blocked big-round path in _prove_device_fs_coeff (the
    whole-state `stacked[eq_rows]` gather is 2 x terms x n x L words —
    ~11 GB at k=22 round 0, the last e2e HBM blocker)."""
    t, rows, l_ = eq_tbls.shape
    eq = eq_tbls.reshape(t, rows // 2, 2, l_)
    p = p_tbls.reshape(t, rows // 2, 2, l_)
    lo = limb._mont_mul_jax(spec, eq[:, :, 0], p[:, :, 0])
    diff = limb._mont_mul_jax(
        spec,
        limb._sub_jax(spec, eq[:, :, 1], eq[:, :, 0]),
        limb._sub_jax(spec, p[:, :, 1], p[:, :, 0]),
    )
    return limb._sum_reduce_jax(
        spec, jnp.stack([lo, diff], axis=0).transpose(2, 0, 1, 3)
    )  # [2, T, L]


@_functools.partial(_jax.jit, static_argnums=0)
def _coeff_finish_jax(spec, sums, scalar_digits):
    """Weight accumulated [2, T, L] sums by the per-term scalars and
    canonicalize -> [2, L] (c0, c2)."""
    scaled = limb._mont_mul_jax(spec, sums, scalar_digits[None])
    totals = limb._sum_reduce_jax(spec, scaled.transpose(1, 0, 2))
    one_ = jnp.zeros((limb.L,), jnp.uint32).at[0].set(1)
    return limb._mont_mul_jax(spec, totals, one_)


# ---------------------------------------------------------------------------
# ClassicSumCheck driver
# ---------------------------------------------------------------------------

class ClassicSumCheck:
    """prove/verify loop (classic.rs:197-264)."""

    def __init__(self, prover_cls, message_cls):
        self.prover_cls = prover_cls
        self.message_cls = message_cls

    @classmethod
    def evaluations(cls):
        return cls(EvaluationsProver, Evaluations)

    @classmethod
    def coefficients(cls):
        return cls(CoefficientsProver, Coefficients)

    def prove(
        self,
        spec: FieldSpec,
        num_vars: int,
        virtual_poly: VirtualPolynomial,
        sum_: Fp,
        transcript: Keccak256Transcript,
    ) -> Tuple[List[Fp], List[Fp]]:
        with span(f"sum_check_prove-{num_vars}-{virtual_poly.expression.degree()}"):
            state = ProverState(
                spec, num_vars, sum_, virtual_poly,
                layout=getattr(self.prover_cls, "STATE_LAYOUT", "dm"),
            )
            prover = self.prover_cls(state)
            aux = self.message_cls.auxiliary(state.degree, spec)
            challenges = []
            from .. import config

            if not limb.IS_CPP and config.device_fs():
                if (
                    self.message_cls is Evaluations
                    and isinstance(prover, EvaluationsProver)
                ):
                    return self._prove_device_fs(
                        spec, num_vars, state, prover, aux, transcript
                    )
                if (
                    self.message_cls is Coefficients
                    and isinstance(prover, CoefficientsProver)
                    and prover.flattened
                ):
                    return self._prove_device_fs_coeff(
                        spec, num_vars, state, prover, aux, transcript
                    )

            for round_ in range(num_vars):
                with span(f"sum_check_prove_round-{round_}"):
                    msg = prover.prove_round(state)
                if config.sanity_checks():
                    # reference `sanity-check` feature (classic/eval.rs
                    # debug assertions): the round polynomial must carry
                    # the running claimed sum
                    assert msg.sum() == state.sum, (
                        f"sum-check round {round_}: message sum "
                        f"{msg.sum()} != claimed {state.sum}"
                    )
                msg.write(transcript)
                challenge = transcript.squeeze_challenge()
                challenges.append(challenge)
                with span(f"sum_check_next_round-{round_}"):
                    state.next_round(msg.evaluate(aux, challenge), challenge)
        return challenges, state.into_evals()

    def _prove_device_fs(
        self, spec, num_vars, state, prover, aux, transcript,
    ) -> Tuple[List[Fp], List[Fp]]:
        """All-rounds-async prover: the Fiat-Shamir sponge lives on device
        (piop/fiat_shamir.py), so the k (evals, message/squeeze, fold)
        programs enqueue without any host sync; round messages come back in
        ONE transfer at the end and the host transcript is replayed from
        them.  The replayed host challenges are checked against the device
        challenges — a transcript divergence raises instead of producing an
        unverifiable proof."""
        from ..fields.spec import int_to_digits
        from ..pallas import sumcheck as _psc
        from .. import config
        from . import fiat_shamir as fs

        d = state.degree
        table_keys, stacked = prover._stacked_view(state)

        lanes, pending = transcript.export_sponge()
        sponge = fs.DeviceSponge.from_host(lanes, pending)
        pts = [Fp(i, spec) for i in range(d + 1)]
        weights = barycentric_weights(pts)
        w_mont = jnp.asarray(
            np.stack([int_to_digits(spec.to_mont(int(x))) for x in weights])
        )
        pts_mont = jnp.asarray(
            np.stack([int_to_digits(spec.to_mont(int(x))) for x in pts])
        )
        sum_mont = jnp.asarray(int_to_digits(spec.to_mont(int(state.sum))))
        off_mont = jnp.asarray(
            int_to_digits(spec.to_mont(int(state.identity_offset) % spec.p))
        )

        msgs, chs = [], []
        packed = state.packed
        from ..parallel import get_mesh

        # Fused rounds compose with a device mesh (VERDICT r03/r04 weak #6):
        # under a mesh the state is never packed (pallas.usable() gates on
        # get_mesh()), so the fused path is the pure-XLA tail scan — GSPMD
        # partitions it over the NamedSharding'd hypercube axis, inserting
        # the round-sum psum and the fold's compaction permutes, while the
        # sponge/message math stays replicated.
        if config.fused_rounds():
            return self._prove_device_fs_fused(
                spec, num_vars, state, prover, aux, transcript,
                table_keys, stacked, packed, sponge,
                sum_mont, off_mont, w_mont, pts_mont,
            )

        for round_ in range(num_vars):
            size = 1 << (num_vars - round_ - 1)
            evals = prover.evals_canon_device(
                spec, stacked, table_keys, size, round_, off_mont, d,
                packed=packed,
            )
            step_mont = jnp.asarray(
                int_to_digits(spec.to_mont((1 << round_) % spec.p))
            )
            (msg_canon, ch_canon, ch_mont, sum_mont, off_mont,
             sponge) = fs.round_message(
                spec, d, sponge, evals, sum_mont, off_mont,
                w_mont, pts_mont, step_mont,
            )
            if packed:
                stacked = _psc._fold_tables_jit(spec, stacked, ch_mont)
                if not _psc.usable(size // 2):
                    stacked = _unpack_natural(spec, stacked)
                    packed = False
            else:
                stacked = _fold_all_dm_jax(spec, stacked, ch_mont)
            msgs.append(msg_canon)
            chs.append(ch_canon)

        # ONE device->host transfer for everything the transcript needs
        challenges = self._replay_device_fs(
            spec, num_vars, state, aux, transcript, Evaluations, msgs, chs
        )
        state.stacked = stacked
        state.packed = packed
        state.round = num_vars
        return challenges, state.into_evals()

    def _prove_device_fs_fused(
        self, spec, num_vars, state, prover, aux, transcript,
        table_keys, stacked, packed, sponge,
        sum_mont, off_mont, w_mont, pts_mont,
    ) -> Tuple[List[Fp], List[Fp]]:
        """Single-dispatch rounds (config.fused_rounds): each packed round
        is ONE program (Pallas evals + device-FS message + fold), the
        per-round constants live in device-resident [32, L] stacks sliced
        by a carried round counter, and every remaining tape round runs
        inside ONE lax.scan program.  A k=20 prove enqueues ~10 programs
        instead of ~60 program+upload messages — the fixed per-round
        latency on a network-tunneled TPU."""
        from ..pallas import sumcheck as _psc
        from . import fiat_shamir as fs
        from .. import config

        d = state.degree
        idmul_np, stp_np = _round_const_stacks(spec)
        idmul_stack = jnp.asarray(idmul_np)
        stp_stack = jnp.asarray(stp_np)
        rnd = jnp.uint32(0)
        round_ = 0
        msgs, chs = [], []

        if packed:
            use_id = ("identity",) in _psc._used_leaves(prover.expr)
            while round_ < num_vars:
                size = 1 << (num_vars - round_ - 1)
                (msg, ch, stacked, rnd, sum_mont, off_mont,
                 sp_lo, sp_hi, b_lo, b_hi) = _fused_packed_round_jit(
                    spec, prover.expr, table_keys, d, use_id, sponge.nbytes,
                    stacked, rnd, idmul_stack, stp_stack,
                    sum_mont, off_mont,
                    sponge.lo, sponge.hi, sponge.buf_lo, sponge.buf_hi,
                    w_mont, pts_mont,
                )
                sponge = fs.DeviceSponge(sp_lo, sp_hi, b_lo, b_hi, 32)
                msgs.append(msg)
                chs.append(ch)
                round_ += 1
                if not _psc.usable(size // 2):
                    stacked = _unpack_natural(spec, stacked)
                    packed = False
                    break

        if round_ < num_vars and sponge.nbytes != 32:
            # land the sponge on its 32-byte steady state (a fresh or
            # host-imported transcript before any fused round) with one
            # classic 3-program round, then scan the rest
            from ..fields.spec import int_to_digits

            size = 1 << (num_vars - round_ - 1)
            evals = prover.evals_canon_device(
                spec, stacked, table_keys, size, round_, off_mont, d,
                packed=False,
            )
            step_mont = jnp.asarray(
                int_to_digits(spec.to_mont((1 << round_) % spec.p))
            )
            (msg, ch, ch_mont, sum_mont, off_mont, sponge) = (
                fs.round_message(
                    spec, d, sponge, evals, sum_mont, off_mont,
                    w_mont, pts_mont, step_mont,
                )
            )
            stacked = _fold_all_dm_jax(spec, stacked, ch_mont)
            msgs.append(msg)
            chs.append(ch)
            round_ += 1

        if round_ < num_vars:
            t, instrs, use_id_t = prover._tape_setup(spec, table_keys)
            n_steps = num_vars - round_
            live0 = 1 << (num_vars - round_ - 1)
            assert stacked.shape[2] == 2 * live0
            carry, msgs_t, chs_t = _fused_tail_scan_jit(
                spec, (t.num_regs, t.out_reg), d, use_id_t, 32, n_steps,
                stacked, rnd, jnp.uint32(live0), idmul_stack, stp_stack,
                jnp.asarray(instrs), t.const_rows(spec),
                sum_mont, off_mont,
                sponge.lo, sponge.hi, sponge.buf_lo, sponge.buf_hi,
                w_mont, pts_mont,
            )
            stacked = carry[0][:, :, :1]
            if msgs:
                msgs = jnp.concatenate([jnp.stack(msgs), msgs_t])
                chs = jnp.concatenate([jnp.stack(chs), chs_t])
            else:
                msgs, chs = msgs_t, chs_t

        challenges = self._replay_device_fs(
            spec, num_vars, state, aux, transcript, Evaluations, msgs, chs
        )
        state.stacked = stacked
        state.packed = packed
        state.round = num_vars
        return challenges, state.into_evals()

    @staticmethod
    def _replay_device_fs(
        spec, num_vars, state, aux, transcript, message_cls, msgs, chs,
    ) -> List[Fp]:
        """Replay device-produced round messages into the host transcript
        (ONE device->host transfer), cross-checking every challenge against
        the device sponge's — a divergence raises instead of producing an
        unverifiable proof."""
        from .. import config
        from . import fiat_shamir as fs

        msgs_np = np.asarray(jnp.stack(msgs))  # [k, num_elems, L]
        chs_np = np.asarray(jnp.stack(chs))  # [k, L]
        num_elems = msgs_np.shape[1]

        challenges: List[Fp] = []
        for round_ in range(num_vars):
            msg = message_cls(
                [Fp(fs.digits_to_int(msgs_np[round_, i]), spec)
                 for i in range(num_elems)]
            )
            if config.sanity_checks():
                assert msg.sum() == state.sum, (
                    f"sum-check round {round_}: message sum "
                    f"{msg.sum()} != claimed {state.sum}"
                )
            msg.write(transcript)
            challenge = transcript.squeeze_challenge()
            if int(challenge) != fs.digits_to_int(chs_np[round_]):
                raise ValueError(
                    f"device Fiat-Shamir diverged from host transcript at "
                    f"round {round_}"
                )
            challenges.append(challenge)
            state.sum = msg.evaluate(aux, challenge)
            state.identity_offset = (
                state.identity_offset + challenge * (1 << round_)
            )
        return challenges

    def _prove_device_fs_coeff(
        self, spec, num_vars, state, prover, aux, transcript,
    ) -> Tuple[List[Fp], List[Fp]]:
        """Device-FS variant for the degree-2 CoefficientsProver (the PCS
        batch-open sum-check): same async structure as _prove_device_fs,
        with the karatsuba (c0, c2) kernel and Horner next-sum."""
        from ..fields.spec import int_to_digits
        from .. import config
        from . import fiat_shamir as fs

        # static row selection: each flattened term is eq_xy * poly
        row_of = {k: i for i, k in enumerate(state.table_keys)}
        eq_rows, p_rows, scalars = [], [], []
        for eq_idx, poly_idx, scalar in prover.term_triples():
            eq_rows.append(row_of[("eq_xy", eq_idx)])
            p_rows.append(row_of[("poly", poly_idx, 0)])
            scalars.append(scalar)
        eq_rows = jnp.asarray(np.asarray(eq_rows, dtype=np.int32))
        p_rows = jnp.asarray(np.asarray(p_rows, dtype=np.int32))
        sc = jnp.asarray(
            np.stack([int_to_digits(spec.to_mont(s)) for s in scalars])
        )

        lanes, pending = transcript.export_sponge()
        sponge = fs.DeviceSponge.from_host(lanes, pending)
        sum_mont = jnp.asarray(int_to_digits(spec.to_mont(int(state.sum))))
        stacked = state.stacked  # tensor layout [T, n, L]

        msgs, chs = [], []
        for round_ in range(num_vars):
            size = 1 << (num_vars - round_ - 1)
            c0_base = Fp(size, spec) * prover.constant
            c0_base_mont = jnp.asarray(
                int_to_digits(spec.to_mont(int(c0_base)))
            )
            n_terms = int(eq_rows.shape[0])
            rows_total = 2 * size
            gather_bytes = 2 * n_terms * rows_total * limb.L * 4
            if rows_total >= (1 << 20) and gather_bytes > (1 << 30):
                # Big rounds: the whole-state term gather would hold
                # 2 x terms full-length table copies (~11 GB at k=22
                # round 0).  Slice pair-aligned row blocks out of the
                # state, gather only the block, and accumulate the
                # [2, T, L] partial sums — peak extra memory O(block).
                # All rows are live here (size >= 2^19 > pad size).
                rb = 1 << 18
                sums = None
                for b in range(rows_total // rb):
                    sl = slice(b * rb, (b + 1) * rb)
                    part = _coeff_block_sums_jax(
                        spec, stacked[eq_rows, sl], stacked[p_rows, sl]
                    )
                    sums = (
                        part if sums is None
                        else limb._add_jax(spec, sums, part)
                    )
                v_canon = _coeff_finish_jax(spec, sums, sc)
            else:
                eq_s, p_s = stacked[eq_rows], stacked[p_rows]
                psize = max(size, _TAPE_PAD_SIZE)
                if size < psize:
                    padrows = 2 * (psize - size)
                    eq_s = jnp.pad(eq_s, ((0, 0), (0, padrows), (0, 0)))
                    p_s = jnp.pad(p_s, ((0, 0), (0, padrows), (0, 0)))
                mask = np.zeros(psize, np.uint32)
                mask[:size] = 1
                v_canon = _coeff_round_jax(
                    spec, eq_s, p_s, sc, jnp.asarray(mask)
                )
            (msg_canon, ch_canon, ch_mont, sum_mont,
             sponge) = fs.coeff_message(
                spec, sponge, v_canon, c0_base_mont, sum_mont
            )
            stacked = _fold_all_jax(spec, stacked, ch_mont)
            msgs.append(msg_canon)
            chs.append(ch_canon)

        challenges = self._replay_device_fs(
            spec, num_vars, state, aux, transcript, Coefficients, msgs, chs
        )
        state.stacked = stacked
        state.round = num_vars
        return challenges, state.into_evals()

    def verify(
        self,
        spec: FieldSpec,
        num_vars: int,
        degree: int,
        sum_: Fp,
        transcript: Keccak256Transcript,
    ) -> Tuple[Fp, List[Fp]]:
        msgs, challenges = [], []
        for _ in range(num_vars):
            msgs.append(self.message_cls.read(degree, transcript))
            challenges.append(transcript.squeeze_challenge())
        aux = self.message_cls.auxiliary(degree, spec)
        current = sum_
        for round_, (msg, challenge) in enumerate(zip(msgs, challenges)):
            if current != msg.sum():
                raise ValueError(
                    f"sum-check consistency failure at round {round_}"
                )
            current = msg.evaluate(aux, challenge)
        return current, challenges
