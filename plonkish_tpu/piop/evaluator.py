"""Vectorized constraint evaluation over the full boolean hypercube.

One memoized AST walk over whole-hypercube limb tensors; rotations become BH
gathers, Identity becomes a Montgomery-encoded iota, Lagrange(i) a one-hot.
Used for lookup compression (backend/hyperplonk/prover.rs:79-137 evaluates the
same thing row-by-row on CPU) and for sanity-checking constraints.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp

from ..fields import limb
from ..fields.host import Fp
from ..fields.spec import FieldSpec, int_to_digits
from ..utils.bh import BooleanHypercube
from ..utils.expression import (
    EqXY,
    Expression,
    Identity,
    Lagrange,
)


def identity_table(spec: FieldSpec, num_vars: int) -> jnp.ndarray:
    """Montgomery tensor of f(b) = b over the hypercube."""
    import numpy as np

    xnp = limb.xnp
    n = 1 << num_vars
    b = xnp.arange(n, dtype=np.uint32)
    digits = xnp.stack([b & 0xFFFF, b >> 16], axis=-1)
    digits = xnp.concatenate(
        [digits, xnp.zeros((n, limb.L - 2), dtype=np.uint32)], axis=-1
    )
    r2 = int_to_digits(spec.r2_mod_p)
    if not limb.IS_CPP:
        r2 = jnp.asarray(r2)
    return limb.mont_mul(spec, digits, r2)


def lagrange_table(spec: FieldSpec, num_vars: int, i: int) -> jnp.ndarray:
    bh = BooleanHypercube(num_vars)
    b = int(bh.iter_array[i % (1 << num_vars)])
    return limb.set_index(limb.zeros((1 << num_vars,)), b, limb.one(spec, ()))


def evaluate_on_hypercube(
    spec: FieldSpec,
    expression: Expression,
    num_vars: int,
    polys: Sequence[jnp.ndarray],
    challenges: Sequence[Fp],
    eq_tables: Sequence[jnp.ndarray] = (),
) -> jnp.ndarray:
    """Evaluate `expression` at every hypercube point -> [2^k, 16] tensor.

    jax mode runs the register-allocated instruction tape (piop/tape.py) —
    one scan program whose compiled size is O(1) in the expression — since
    the inlined AST walk blows up XLA compile time past a few dozen field
    ops; the native backend keeps the direct walk (each op is one OpenMP
    C++ call, no compile step)."""
    if not limb.IS_CPP:
        return _evaluate_on_hypercube_tape(
            spec, expression, num_vars, polys, challenges, eq_tables
        )
    bh = BooleanHypercube(num_vars)
    rot_cache: Dict[int, jnp.ndarray] = {}

    def rot_map(rot: int) -> jnp.ndarray:
        if rot not in rot_cache:
            rot_cache[rot] = limb.xnp.asarray(bh.rotation_map(rot))
        return rot_cache[rot]

    def common(cp):
        if isinstance(cp, Identity):
            return identity_table(spec, num_vars)
        if isinstance(cp, Lagrange):
            return lagrange_table(spec, num_vars, cp.i)
        if isinstance(cp, EqXY):
            return eq_tables[cp.idx]
        raise TypeError(cp)

    def poly(q):
        tbl = polys[q.poly]
        if q.rotation.value == 0:
            return tbl
        return tbl[rot_map(q.rotation.value)]

    return expression.evaluate(
        lambda c: limb.xnp.broadcast_to(
            limb.const(spec, int(c)), (1 << num_vars, limb.L)
        ),
        common,
        poly,
        lambda idx: limb.xnp.broadcast_to(
            limb.const(spec, int(challenges[idx])), (1 << num_vars, limb.L)
        ),
        lambda a: limb.neg(spec, a),
        lambda a, b: limb.add(spec, a, b),
        lambda a, b: limb.mont_mul(spec, a, b),
        lambda a, s: limb.mont_mul(spec, a, limb.const(spec, int(s))),
    )


def _evaluate_on_hypercube_tape(
    spec: FieldSpec,
    expression: Expression,
    num_vars: int,
    polys: Sequence[jnp.ndarray],
    challenges: Sequence[Fp],
    eq_tables: Sequence[jnp.ndarray] = (),
) -> jnp.ndarray:
    from . import tape as tape_mod

    tape = tape_mod.compile_tape(
        expression, spec, [int(c) for c in challenges]
    )
    bh = BooleanHypercube(num_vars)
    rows = []
    for key in tape.leaf_keys:
        if key[0] == "poly":
            _, idx, rot = key
            tbl = polys[idx]
            if rot != 0:
                tbl = tbl[limb.xnp.asarray(bh.rotation_map(rot))]
            rows.append(tbl)
        elif key == ("identity",):
            rows.append(identity_table(spec, num_vars))
        elif key[0] == "lagrange":
            rows.append(lagrange_table(spec, num_vars, key[1]))
        elif key[0] == "eq_xy":
            rows.append(eq_tables[key[1]])
        else:
            raise AssertionError(key)
    if not rows:  # constant expression
        rows = [limb.zeros((1 << num_vars,))]
    leaves = jnp.stack(rows, axis=0)
    return tape_mod.eval_tape(
        spec,
        tape.num_regs,
        tape.out_reg,
        jnp.asarray(tape.instrs),
        leaves,
        tape.const_rows(spec),
    )
