"""SSA tape compiler/evaluator unit tests (piop/tape.py).

Runs the jax evaluator directly (the tape path is jax-only; the default
suite's cpp backend doesn't route through it) and checks against host Fp
arithmetic, including CSE/register-reuse invariants.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from plonkish_tpu.fields import BN254_FR, limb
from plonkish_tpu.fields.host import Fp
from plonkish_tpu.piop import tape as tape_mod
from plonkish_tpu.utils import expression as ex

SPEC = BN254_FR


def _poly_leaf(i, rot=0):
    return ex.Polynomial(ex.Query(i, ex.Rotation(rot)))


def _rand_rows(rng, n_polys, n):
    vals = [
        [rng.randrange(SPEC.p) for _ in range(n)] for _ in range(n_polys)
    ]
    rows = [
        limb.to_mont(SPEC, limb.from_ints(v)) for v in vals
    ]
    return vals, rows


def _eval_host(expr, vals, challenges, b):
    return expr.evaluate(
        lambda c: Fp(int(c) % SPEC.p, SPEC),
        lambda cp: (_ for _ in ()).throw(AssertionError(cp)),
        lambda q: Fp(vals[q.poly][b], SPEC),
        lambda idx: challenges[idx],
        lambda a: -a,
        lambda a, b_: a + b_,
        lambda a, b_: a * b_,
        lambda a, s: a * s,
    )


def _run_tape(tape, rows):
    leaves = jnp.stack(rows, axis=0)
    out = tape_mod.eval_tape(
        SPEC,
        tape.num_regs,
        tape.out_reg,
        jnp.asarray(tape.instrs),
        leaves,
        tape.const_rows(SPEC),
    )
    return [int(v) for v in limb.to_ints(limb.from_mont(SPEC, out))]


def test_tape_matches_host_eval():
    rng = random.Random(7)
    n = 8
    vals, rows = _rand_rows(rng, 3, n)
    chal = [Fp(rng.randrange(SPEC.p), SPEC)]
    expr = (
        _poly_leaf(0) * _poly_leaf(1) * _poly_leaf(2)
        + _poly_leaf(0) * Fp(5, SPEC)
        - _poly_leaf(1) * ex.Challenge(0)
        + ex.Constant(Fp(3, SPEC))
    )
    tape = tape_mod.compile_tape(expr, SPEC, [int(c) for c in chal])
    # tape leaves are demand-ordered poly keys
    assert set(tape.leaf_keys) == {("poly", i, 0) for i in range(3)}
    ordered = [rows[k[1]] for k in tape.leaf_keys]
    got = _run_tape(tape, ordered)
    for b in range(n):
        assert got[b] == int(_eval_host(expr, vals, chal, b))


def test_tape_cse_and_register_reuse():
    # (a*b) appears 3 times -> must be computed once; registers must be
    # far fewer than instruction count on a deep sum
    a, b = _poly_leaf(0), _poly_leaf(1)
    prod = a * b
    expr = prod + prod * prod
    for i in range(20):
        expr = expr + a * b * Fp(i + 2, SPEC)
    tape = tape_mod.compile_tape(expr, SPEC)
    muls = int(np.sum(tape.instrs[:, 0] == tape_mod.OP_MUL))
    # one a*b, one (ab)^2, 20 scaled muls (the scale consts differ)
    assert muls <= 22
    assert tape.num_regs <= 8

    rng = random.Random(3)
    vals, rows = _rand_rows(rng, 2, 4)
    ordered = [rows[k[1]] for k in tape.leaf_keys]
    got = _run_tape(tape, ordered)
    for idx in range(4):
        assert got[idx] == int(_eval_host(expr, vals, [], idx))


def test_tape_distribute_powers_and_neg():
    rng = random.Random(11)
    vals, rows = _rand_rows(rng, 3, 4)
    base = Fp(rng.randrange(SPEC.p), SPEC)
    expr = ex.distribute_powers(
        [_poly_leaf(0), -_poly_leaf(1), _poly_leaf(2)], ex.Constant(base)
    )
    tape = tape_mod.compile_tape(expr, SPEC)
    key_order = [k[1] for k in tape.leaf_keys]
    got = _run_tape(tape, [rows[i] for i in key_order])
    for b in range(4):
        want = (
            Fp(vals[0][b], SPEC)
            + (-Fp(vals[1][b], SPEC)) * base
            + Fp(vals[2][b], SPEC) * base * base
        )
        assert got[b] == int(want)
