"""Exact-value golden tests mirroring the reference's unit tests."""

import pytest

from plonkish_tpu.fields import BN254_FR, Fp
from plonkish_tpu.models.circuits import (
    vanilla_plonk_expression,
    vanilla_plonk_with_lookup_expression,
)
from plonkish_tpu.pcs.brakedown_code import (
    BRAKEDOWN_SPEC_1,
    BRAKEDOWN_SPEC_2,
    BRAKEDOWN_SPEC_3,
    BRAKEDOWN_SPEC_4,
    BRAKEDOWN_SPEC_5,
    BRAKEDOWN_SPEC_6,
)
from plonkish_tpu.utils import expression as ex
from plonkish_tpu.utils.expression import Query, Rotation

SPEC = BN254_FR


# Brakedown spec constants vs GLSTW21 paper values
# (reference util/code/brakedown.rs:370-390).
@pytest.mark.parametrize(
    "bspec,delta,c_n,d_n,col_open,prox127,prox254",
    [
        (BRAKEDOWN_SPEC_1, 0.02, 6, 33, 13265, 2, 1),
        (BRAKEDOWN_SPEC_2, 0.03, 7, 26, 8768, 2, 1),
        (BRAKEDOWN_SPEC_3, 0.04, 7, 22, 6593, 2, 1),
        (BRAKEDOWN_SPEC_4, 0.05, 8, 19, 5279, 2, 1),
        (BRAKEDOWN_SPEC_5, 0.06, 9, 21, 4390, 2, 1),
        (BRAKEDOWN_SPEC_6, 0.07, 10, 20, 3755, 2, 1),
    ],
)
def test_brakedown_spec_constants(bspec, delta, c_n, d_n, col_open, prox127, prox254):
    n, n_0 = 1 << 30, 30
    assert abs(bspec.delta() - delta) < 1e-3
    assert bspec.c_n(n) == c_n
    assert bspec.d_n(127, n) == d_n
    assert bspec.num_column_opening() == col_open
    assert bspec.num_proximity_testing(127, n, n_0) == prox127
    assert bspec.num_proximity_testing(254, n, n_0) == prox254


def _eval_both(e1, e2, num_vars=3):
    """Compare two expressions by evaluation on random leaves (AST shapes may
    differ; semantics must match)."""
    import random

    from plonkish_tpu.piop.sum_check import evaluate

    rng = random.Random(77)
    queries = e1.used_query() | e2.used_query()
    evals = {q: Fp(rng.randrange(SPEC.p), SPEC) for q in queries}
    nch = max(
        [c + 1 for c in (e1.used_challenge() | e2.used_challenge())], default=0
    )
    challenges = [Fp(rng.randrange(SPEC.p), SPEC) for _ in range(nch)]
    y = [Fp(rng.randrange(SPEC.p), SPEC) for _ in range(num_vars)]
    x = [Fp(rng.randrange(SPEC.p), SPEC) for _ in range(num_vars)]
    v1 = evaluate(e1, num_vars, evals, challenges, [y], x)
    v2 = evaluate(e2, num_vars, evals, challenges, [y], x)
    assert v1 == v2


def test_compose_vanilla_plonk():
    """Composed zero-check expression matches the hand-built reference AST
    (preprocessor.rs:216-251), compared by evaluation."""
    num_vars = 3
    expression = vanilla_plonk_expression(SPEC, num_vars)

    pi, q_l, q_r, q_m, q_o, q_c, w_l, w_r, w_o, s_1, s_2, s_3 = [
        ex.Polynomial(Query(i, Rotation(0))) for i in range(12)
    ]
    z = ex.Polynomial(Query(12, Rotation(0)))
    z_next = ex.Polynomial(Query(12, Rotation(1)))
    beta, gamma, alpha = [ex.Challenge(i) for i in range(3)]
    ids = [
        ex.Constant(Fp(idx << num_vars, SPEC)) + ex.identity()
        for idx in range(3)
    ]
    l_1 = ex.lagrange(1)
    one = ex.Constant(Fp.one(SPEC))
    constraints = [
        q_l * w_l + q_r * w_r + q_m * w_l * w_r + q_o * w_o + q_c + pi,
        l_1 * (z - one),
        (
            z
            * (
                (w_l + beta * ids[0] + gamma)
                * (w_r + beta * ids[1] + gamma)
                * (w_o + beta * ids[2] + gamma)
            )
        )
        - (
            z_next
            * (
                (w_l + beta * s_1 + gamma)
                * (w_r + beta * s_2 + gamma)
                * (w_o + beta * s_3 + gamma)
            )
        ),
    ]
    expected = ex.distribute_powers(constraints, alpha) * ex.eq_xy(0)
    _eval_both(expression, expected, num_vars)
    assert expression.degree() == expected.degree()


def test_compose_vanilla_plonk_with_lookup():
    """preprocessor.rs:254-302 by evaluation."""
    num_vars = 3
    expression = vanilla_plonk_with_lookup_expression(SPEC, num_vars)

    polys = [ex.Polynomial(Query(i, Rotation(0))) for i in range(16)]
    (pi, q_l, q_r, q_m, q_o, q_c, q_lookup, t_l, t_r, t_o,
     w_l, w_r, w_o, s_1, s_2, s_3) = polys
    lookup_m = ex.Polynomial(Query(16, Rotation(0)))
    lookup_h = ex.Polynomial(Query(17, Rotation(0)))
    perm_z = ex.Polynomial(Query(18, Rotation(0)))
    perm_z_next = ex.Polynomial(Query(18, Rotation(1)))
    beta, gamma, alpha = [ex.Challenge(i) for i in range(3)]
    ids = [
        ex.Constant(Fp(idx << num_vars, SPEC)) + ex.identity()
        for idx in range(3)
    ]
    l_1 = ex.lagrange(1)
    one = ex.Constant(Fp.one(SPEC))
    lookup_input = ex.distribute_powers(
        [q_lookup * w for w in (w_l, w_r, w_o)], beta
    )
    lookup_table = ex.distribute_powers([t_l, t_r, t_o], beta)
    constraints = [
        q_l * w_l + q_r * w_r + q_m * w_l * w_r + q_o * w_o + q_c + pi,
        lookup_h * (lookup_input + gamma) * (lookup_table + gamma)
        - (lookup_table + gamma)
        + lookup_m * (lookup_input + gamma),
        l_1 * (perm_z - one),
        (
            perm_z
            * (
                (w_l + beta * ids[0] + gamma)
                * (w_r + beta * ids[1] + gamma)
                * (w_o + beta * ids[2] + gamma)
            )
        )
        - (
            perm_z_next
            * (
                (w_l + beta * s_1 + gamma)
                * (w_r + beta * s_2 + gamma)
                * (w_o + beta * s_3 + gamma)
            )
        ),
    ]
    zero_check = ex.distribute_powers(constraints, alpha) * ex.eq_xy(0)
    expected = ex.distribute_powers([lookup_h, zero_check], alpha)
    _eval_both(expression, expected, num_vars)
    assert expression.degree() == expected.degree()
