"""Multilinear polynomial layer tests (mirrors reference
poly/multilinear.rs:663-712 test strategy with seeded RNG)."""

import random

import pytest

from plonkish_tpu.fields import BN254_FR, Fp
from plonkish_tpu.poly.multilinear import (
    MLPoly,
    eq_xy,
    rotation_eval,
    rotation_eval_points,
)
from plonkish_tpu.utils.bh import BooleanHypercube
from plonkish_tpu.utils.expression import Rotation

SPEC = BN254_FR
RNG = random.Random(42)


def rand_fps(n):
    return [Fp(RNG.randrange(SPEC.p), SPEC) for n_ in range(n)]


def naive_fix_vars(evals, xs):
    evals = list(evals)
    for x in xs:
        evals = [
            (e1 - e0) * x + e0 for e0, e1 in zip(evals[0::2], evals[1::2])
        ]
    return evals


@pytest.mark.parametrize("num_vars", [1, 2, 4, 6])
def test_fix_var_and_evaluate(num_vars):
    values = rand_fps(1 << num_vars)
    poly = MLPoly.from_fps(SPEC, values)
    choices = [Fp.zero(SPEC), Fp.one(SPEC)] + rand_fps(1)
    x = [RNG.choice(choices) for _ in range(num_vars)]
    expect = naive_fix_vars(values, x)[0]
    assert poly.evaluate(x) == expect
    acc = poly
    for x_i in x:
        acc = acc.fix_var(x_i)
    assert acc.to_fps()[0] == expect


def test_fix_last_vars():
    num_vars = 5
    values = rand_fps(1 << num_vars)
    poly = MLPoly.from_fps(SPEC, values)
    x = rand_fps(2)
    fixed = poly.fix_last_vars(x)
    # fixing last vars = evaluating with those coords at the TOP bits
    full_x = rand_fps(3) + x
    assert fixed.evaluate(full_x[:3]) == poly.evaluate(full_x)


@pytest.mark.parametrize("num_vars", [1, 3, 5])
def test_eq_xy(num_vars):
    y = rand_fps(num_vars)
    table = eq_xy(SPEC, y).to_fps()
    one = Fp.one(SPEC)
    for b in range(1 << num_vars):
        expect = one
        for i in range(num_vars):
            expect = expect * (y[i] if (b >> i) & 1 else one - y[i])
        assert table[b] == expect


@pytest.mark.parametrize("num_vars", [2, 3, 5])
def test_evaluate_for_rotation_roundtrip(num_vars):
    bh = BooleanHypercube(num_vars)

    def rotate(vals):
        return [vals[bh.rotate(i, 1)] for i in range(1 << num_vars)]

    f0 = rand_fps(1 << num_vars)
    fs = [f0]
    for _ in range(num_vars - 1):
        fs.append(rotate(fs[-1]))
    x = rand_fps(num_vars)

    for rot in range(-(num_vars - 1), num_vars):
        rotation = Rotation(rot)
        if rot < 0:
            f, f_rotated = fs[-1], fs[len(fs) - rotation.distance - 1]
        else:
            f, f_rotated = fs[0], fs[rotation.distance]
        poly = MLPoly.from_fps(SPEC, f)
        efr = poly.evaluate_for_rotation(x, rotation)
        got = rotation_eval(x, rotation, efr)
        expect = MLPoly.from_fps(SPEC, f_rotated).evaluate(x)
        assert got == expect, f"rotation {rot}"


def test_rotation_eval_points_match_evals():
    num_vars, rot = 4, 1
    rotation = Rotation(rot)
    f = rand_fps(1 << num_vars)
    poly = MLPoly.from_fps(SPEC, f)
    x = rand_fps(num_vars)
    efr = poly.evaluate_for_rotation(x, rotation)
    pts = rotation_eval_points(x, rotation)
    assert len(pts) == len(efr) == 1 << rotation.distance
    for pt, ev in zip(pts, efr):
        assert poly.evaluate(pt) == ev
