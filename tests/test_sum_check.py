"""Classic sum-check prove/verify round-trips (mirrors reference
piop/sum_check.rs:140-354 test harness at reduced sizes)."""

import random

import pytest

from plonkish_tpu.fields import BN254_FR, Fp
from plonkish_tpu.piop.sum_check import (
    ClassicSumCheck,
    VirtualPolynomial,
    evaluate,
)
from plonkish_tpu.poly.multilinear import MLPoly, rotation_eval
from plonkish_tpu.utils.bh import BooleanHypercube
from plonkish_tpu.utils import expression as ex
from plonkish_tpu.utils.transcript import Keccak256Transcript

SPEC = BN254_FR
RNG = random.Random(7)


def rand_fps(n):
    return [Fp(RNG.randrange(SPEC.p), SPEC) for _ in range(n)]


def run_zero_check(num_vars, expression, polys, challenges, y):
    scheme = ClassicSumCheck.evaluations()
    ys = [y]
    vp = VirtualPolynomial(expression, polys, challenges, ys)
    t = Keccak256Transcript(SPEC)
    scheme.prove(SPEC, num_vars, vp, Fp.zero(SPEC), t)
    proof = t.into_proof()

    r = Keccak256Transcript.from_proof(SPEC, proof)
    x_eval, x = scheme.verify(
        SPEC, num_vars, expression.degree(), Fp.zero(SPEC), r
    )
    evals = {}
    for query in expression.used_query():
        efr = polys[query.poly].evaluate_for_rotation(x, query.rotation)
        evals[query] = rotation_eval(x, query.rotation, efr)
    expected = evaluate(expression, num_vars, evals, challenges, [y], x)
    assert x_eval == expected


@pytest.mark.parametrize("num_vars", [2, 3])
def test_sum_check_lagrange(num_vars):
    # Lagrange identity: Σ_i alpha^i (L_i - poly_i) where poly_i is the
    # one-hot at BH position i (sum_check.rs:196-245).
    n = 1 << num_vars
    polys_expr = [ex.Polynomial(ex.Query(i, ex.Rotation(0))) for i in range(n)]
    gates = [ex.lagrange(i) - p for i, p in enumerate(polys_expr)]
    alpha = ex.Challenge(0)
    expr = ex.distribute_powers(gates, alpha) * ex.eq_xy(0)

    bh = BooleanHypercube(num_vars)
    order = list(bh.iter())
    polys = []
    for i in range(n):
        vals = [Fp.zero(SPEC)] * n
        vals[order[i]] = Fp.one(SPEC)
        polys.append(MLPoly.from_fps(SPEC, vals))
    run_zero_check(num_vars, expr, polys, rand_fps(1), rand_fps(num_vars))


@pytest.mark.parametrize("num_vars", [2, 4])
def test_sum_check_rotation(num_vars):
    # Chain of rotations: gates (poly_{i+1} - poly_i) over 2k-1 rotated
    # copies of one polynomial (sum_check.rs:248-297).
    rotations = list(range(-(num_vars - 1), num_vars))[::-1]
    polys_expr = [
        ex.Polynomial(ex.Query(idx, ex.Rotation(rot)))
        for idx, rot in enumerate(rotations)
    ]
    gates = [b - a for a, b in zip(polys_expr, polys_expr[1:])]
    alpha = ex.Challenge(0)
    expr = ex.distribute_powers(gates, alpha) * ex.eq_xy(0)

    bh = BooleanHypercube(num_vars)

    def rotate(vals):
        return [vals[bh.rotate(i, 1)] for i in range(1 << num_vars)]

    f = rand_fps(1 << num_vars)
    fs = [f]
    for _ in range(2 * num_vars - 2):
        fs.append(rotate(fs[-1]))
    polys = [MLPoly.from_fps(SPEC, v) for v in fs]
    run_zero_check(num_vars, expr, polys, rand_fps(1), rand_fps(num_vars))


def test_sum_check_identity_poly():
    # zero-check on (id - Σ_i 2^i x_i interpolant): poly[b] = b in BH order
    num_vars = 3
    n = 1 << num_vars
    poly_vals = [Fp(b, SPEC) for b in range(n)]
    poly = MLPoly.from_fps(SPEC, poly_vals)
    expr = (ex.identity() - ex.Polynomial(ex.Query(0))) * ex.eq_xy(0)
    # degree must be >= 2 for the evaluations prover; eq_xy gives 2
    run_zero_check(num_vars, expr, [poly], [], rand_fps(num_vars))


def test_sum_check_bad_proof_rejected():
    num_vars = 2
    expr = (
        ex.Polynomial(ex.Query(0)) * ex.Polynomial(ex.Query(1))
    ) * ex.eq_xy(0)
    f = rand_fps(1 << num_vars)
    g = rand_fps(1 << num_vars)
    polys = [MLPoly.from_fps(SPEC, f), MLPoly.from_fps(SPEC, g)]
    scheme = ClassicSumCheck.evaluations()
    vp = VirtualPolynomial(expr, polys, [], [rand_fps(num_vars)])
    t = Keccak256Transcript(SPEC)
    # claimed sum is wrong (nonzero random) -> verifier must reject
    scheme.prove(SPEC, num_vars, vp, Fp.zero(SPEC), t)
    proof = t.into_proof()
    r = Keccak256Transcript.from_proof(SPEC, proof)
    with pytest.raises(ValueError):
        scheme.verify(SPEC, num_vars, expr.degree(), Fp(12345, SPEC), r)
