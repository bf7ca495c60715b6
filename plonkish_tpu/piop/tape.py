"""SSA tape compiler for constraint expressions (compile-size-bounded
evaluator for the jax backend).

The reference CSE-compiles each Expression into a flat Calculation list and
interprets it row-by-row on the CPU
(/root/reference/plonkish_backend/src/util/expression/evaluator.rs:135-324).
The TPU twin of that idea serves a different purpose: inlining the whole
expression DAG into one XLA program (sum_check._eval_expression_device) is
fastest *when it compiles*, but its HLO size grows as
#field-ops x ~100 digit ops, and past a few tens of thousands of ops the
XLA CPU backend takes minutes and the TPU backend OOMs at trace time.  Here
the expression is compiled ONCE into a register-allocated instruction tape
and executed by a `lax.scan` whose body contains exactly one field op
switch — the compiled program size is O(1) in the expression, while the
work per instruction is still a full [batch, L] vectorized field op.

Used by the fused-XLA sum-check round path for every (size, round) the
Pallas kernels don't take (small rounds, CPU runs, active-mesh runs); the
scan body partitions cleanly under GSPMD because every op is elementwise
over the batch axis.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.spec import FieldSpec, int_to_digits
from ..utils.expression import EqXY, Identity, Lagrange

OP_ADD = 0
OP_MUL = 1
OP_NEG = 2
OP_CONST = 3  # a = constant-table row
OP_LOAD = 4  # a = leaf-table row


@dataclasses.dataclass(frozen=True, eq=False)  # id-hash: usable as a jit
class Tape:  # static argument (tapes are cached one per expression)
    leaf_keys: Tuple  # row order of the stacked leaves tensor
    consts: Tuple[int, ...]  # canonical ints, one Montgomery row each
    instrs: np.ndarray  # [n, 4] int32: (op, a, b, dst-register)
    num_regs: int
    out_reg: int

    def const_rows(self, spec: FieldSpec) -> jnp.ndarray:
        rows = [int_to_digits(spec.to_mont(c % spec.p)) for c in self.consts]
        if not rows:
            rows = [np.zeros(limb.L, np.uint32)]
        return jnp.asarray(np.stack(rows))


def compile_tape(expr, spec: FieldSpec, challenges: Sequence = None) -> Tape:
    """Expression -> register-allocated SSA tape.

    CSE happens twice: the catamorphism memoizes shared subtrees by node
    identity, and instruction emission hash-conses on (op, a, b) so
    structurally repeated subterms collapse (evaluator.rs:141-151 does the
    same for its Calculation list).
    """
    instrs: List[Tuple[int, int, int]] = []  # (op, a, b) over value ids
    cse: Dict[Tuple[int, int, int], int] = {}
    leaf_ids: Dict[Tuple, int] = {}
    leaf_keys: List[Tuple] = []
    const_ids: Dict[int, int] = {}
    consts: List[int] = []

    def emit(op: int, a: int, b: int = 0) -> int:
        key = (op, a, b)
        if key in cse:
            return cse[key]
        instrs.append(key)
        vid = len(instrs) - 1
        cse[key] = vid
        return vid

    def leaf(key: Tuple) -> int:
        if key not in leaf_ids:
            leaf_keys.append(key)
            leaf_ids[key] = len(leaf_keys) - 1
        return emit(OP_LOAD, leaf_ids[key])

    def const(c: int) -> int:
        c = int(c) % spec.p
        if c not in const_ids:
            consts.append(c)
            const_ids[c] = len(consts) - 1
        return emit(OP_CONST, const_ids[c])

    def common(cp):
        if isinstance(cp, Identity):
            return leaf(("identity",))
        if isinstance(cp, Lagrange):
            return leaf(("lagrange", cp.i))
        if isinstance(cp, EqXY):
            return leaf(("eq_xy", cp.idx))
        raise TypeError(cp)

    out_vid = expr.evaluate(
        const,
        common,
        lambda q: leaf(("poly", q.poly, q.rotation.value)),
        (lambda idx: const(int(challenges[idx])))
        if challenges is not None
        else lambda idx: (_ for _ in ()).throw(
            AssertionError("challenges must be substituted before compile")
        ),
        lambda a: emit(OP_NEG, a),
        lambda a, b: emit(OP_ADD, *sorted((a, b))),
        lambda a, b: emit(OP_MUL, *sorted((a, b))),
        lambda a, s: emit(OP_MUL, *sorted((a, const(int(s))))),
    )

    # --- linear-scan register allocation (dst may alias a dying operand:
    # the scan body reads both operands before writing) ---
    n = len(instrs)
    last_use = [vid for vid in range(n)]  # a value with no later use dies at
    for vid, (op, a, b) in enumerate(instrs):  # its own instruction
        if op in (OP_ADD, OP_MUL):
            last_use[a] = max(last_use[a], vid)
            last_use[b] = max(last_use[b], vid)
        elif op == OP_NEG:
            last_use[a] = max(last_use[a], vid)
    last_use[out_vid] = n  # keep the result live

    free: List[int] = []
    num_regs = 0
    reg_of: List[int] = [0] * n
    expiring: Dict[int, List[int]] = {}
    for vid in range(n):
        expiring.setdefault(last_use[vid], []).append(vid)
    coded = np.zeros((n, 4), np.int32)
    for vid, (op, a, b) in enumerate(instrs):
        ra = reg_of[a] if op in (OP_ADD, OP_MUL, OP_NEG) else a
        rb = reg_of[b] if op in (OP_ADD, OP_MUL) else b
        # free operands dying here BEFORE allocating dst so dst can reuse
        for dead in expiring.get(vid, ()):  # includes vid itself if unused
            if dead < vid:
                free.append(reg_of[dead])
        if free:
            dst = free.pop()
        else:
            dst = num_regs
            num_regs += 1
        reg_of[vid] = dst
        coded[vid] = (op, ra, rb, dst)

    return Tape(
        leaf_keys=tuple(leaf_keys),
        consts=tuple(consts),
        instrs=coded,
        num_regs=max(num_regs, 1),
        out_reg=reg_of[out_vid],
    )


_TAPE_CACHE: Dict[Tuple[int, int], Tape] = {}


def tape_for(expr, spec: FieldSpec) -> Tape:
    key = (id(expr), id(spec))
    if key not in _TAPE_CACHE:
        _TAPE_CACHE[key] = compile_tape(expr, spec)
    return _TAPE_CACHE[key]


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def eval_tape(
    spec: FieldSpec, num_regs: int, out_reg: int, instrs, leaves, consts
):
    """Run the tape over a stacked leaves tensor.

    leaves: [n_leaves, B, L] Montgomery digit rows; consts: [n_consts, L];
    returns [B, L].  One scan step = one vectorized field op; the compiled
    body is a 5-way switch, independent of the expression size.
    """
    batch = leaves.shape[1:]
    cache0 = jnp.zeros((num_regs,) + batch, jnp.uint32)

    def body(cache, instr):
        op, a, b, dst = instr[0], instr[1], instr[2], instr[3]
        va = jax.lax.dynamic_index_in_dim(cache, a, 0, keepdims=False)
        vb = jax.lax.dynamic_index_in_dim(cache, b, 0, keepdims=False)
        lv = jax.lax.dynamic_index_in_dim(
            leaves, jnp.minimum(a, leaves.shape[0] - 1), 0, keepdims=False
        )
        cv = jax.lax.dynamic_index_in_dim(
            consts, jnp.minimum(a, consts.shape[0] - 1), 0, keepdims=False
        )
        res = jax.lax.switch(
            op,
            [
                lambda: limb._add_jax(spec, va, vb),
                lambda: limb._mont_mul_jax(spec, va, vb),
                lambda: limb._neg_jax(spec, va),
                lambda: jnp.broadcast_to(cv, va.shape),
                lambda: lv,
            ],
        )
        return jax.lax.dynamic_update_index_in_dim(cache, res, dst, 0), None

    cache, _ = jax.lax.scan(body, cache0, instrs)
    return cache[out_reg]
