"""Dense multilinear polynomials over the boolean hypercube, device-resident.

The evaluation vector lives on device as a Montgomery limb tensor
`uint32[2^k, 16]`; variable ordering matches the reference
(/root/reference/plonkish_backend/src/poly/multilinear.rs): index bit 0 is the
first variable, so `fix_var` consumes neighbor pairs (2i, 2i+1) — a local,
perfectly-vectorizable strided op (and, sharded on high-order index bits,
communication-free until the final log2(num_chips) sum-check rounds).

Rotation-evaluation machinery (evaluate_for_rotation / rotation_eval /
point & coeff patterns) ports the semantics of multilinear.rs:191-263,433-570;
patterns are pure host integer precomputation, the O(2^k) merges run on
device.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..fields import limb
from ..fields.host import Fp
from ..fields.spec import FieldSpec
from ..utils.bh import BooleanHypercube
from ..utils.expression import Rotation


class MLPoly:
    """A multilinear polynomial in evaluation form on device (Montgomery)."""

    __slots__ = ("spec", "evals")

    def __init__(self, spec: FieldSpec, evals: jnp.ndarray):
        assert evals.ndim == 2, evals.shape
        self.spec = spec
        self.evals = evals

    @property
    def num_vars(self) -> int:
        return (self.evals.shape[0]).bit_length() - 1

    def __len__(self):
        return self.evals.shape[0]

    # ---- constructors ----
    @classmethod
    def from_fps(cls, spec: FieldSpec, values: Sequence[Fp]) -> "MLPoly":
        return cls(
            spec, limb.to_mont(spec, limb.from_ints([int(v) for v in values]))
        )

    @classmethod
    def from_ints(cls, spec: FieldSpec, values: Sequence[int]) -> "MLPoly":
        return cls(spec, limb.to_mont(spec, limb.from_ints(list(values))))

    @classmethod
    def zero(cls, spec: FieldSpec, num_vars: int) -> "MLPoly":
        return cls(spec, limb.zeros((1 << num_vars,)))

    def to_fps(self) -> List[Fp]:
        vals = limb.to_ints(limb.from_mont(self.spec, self.evals))
        return [Fp(int(v), self.spec) for v in vals]

    # ---- arithmetic ----
    def __add__(self, other: "MLPoly") -> "MLPoly":
        return MLPoly(self.spec, limb.add(self.spec, self.evals, other.evals))

    def __sub__(self, other: "MLPoly") -> "MLPoly":
        return MLPoly(self.spec, limb.sub(self.spec, self.evals, other.evals))

    def scale(self, scalar: Fp) -> "MLPoly":
        c = limb.const(self.spec, int(scalar))
        return MLPoly(self.spec, limb.mont_mul(self.spec, self.evals, c))

    # ---- core ops ----
    def fix_var(self, x: Fp) -> "MLPoly":
        c = limb.const(self.spec, int(x))
        return MLPoly(self.spec, _fix_var(self.spec, self.evals, c))

    def fix_last_vars(self, xs: Sequence[Fp]) -> "MLPoly":
        """Fix the highest-index variables (multilinear.rs:158-177)."""
        evals = self.evals
        for x in reversed(list(xs)):
            c = limb.const(self.spec, int(x))
            evals = _fix_last_var(self.spec, evals, c)
        return MLPoly(self.spec, evals)

    def evaluate(self, point: Sequence[Fp]) -> Fp:
        assert len(point) == self.num_vars
        evals = self.evals
        xs = [limb.const(self.spec, int(x)) for x in point]
        for i in range(self.num_vars):
            evals = _fix_var(self.spec, evals, xs[i])
        v = limb.to_ints(limb.from_mont(self.spec, evals))[0]
        return Fp(int(v), self.spec)

    def evaluate_for_rotation(self, point: Sequence[Fp], rotation: Rotation) -> List[Fp]:
        """Partial evals recombinable by `rotation_eval` into the evaluation
        of the rotated polynomial (multilinear.rs:191-263)."""
        spec = self.spec
        num_vars = self.num_vars
        if rotation.value == 0:
            return [self.evaluate(point)]
        distance = rotation.distance
        num_x = num_vars - distance
        x = [Fp(int(p), spec) for p in point]
        out = []
        if rotation.value < 0:
            xs = x[distance:]
            pattern = rotation_eval_point_pattern(num_vars, distance, next_=False)
            offset_mask = (1 << num_vars) - (1 << num_x)
            for pat in pattern:
                offset = pat & offset_mask
                evals = self.evals[offset: offset + (1 << num_x)]
                for idx, x_i in enumerate(xs):
                    xv = 1 - x_i if (pat >> idx) & 1 else x_i
                    evals = _fix_var(spec, evals, limb.const(spec, int(xv)))
                out.append(evals)
        else:
            xs = x[:num_x]
            pattern = rotation_eval_point_pattern(num_vars, distance, next_=True)
            skip_mask = (1 << distance) - 1
            for pat in pattern:
                skip = pat & skip_mask
                x_0 = 1 - xs[0] if (pat >> distance) & 1 else xs[0]
                evals = _merge(
                    spec, self.evals, limb.const(spec, int(x_0)), distance + 1, skip
                )
                for i in range(1, num_x):
                    x_i = xs[i]
                    xv = 1 - x_i if (pat >> (distance + i)) & 1 else x_i
                    evals = _fix_var(spec, evals, limb.const(spec, int(xv)))
                out.append(evals)
        flat = xnp.concatenate(out, axis=0)
        vals = limb.to_ints(limb.from_mont(spec, flat))
        return [Fp(int(v), spec) for v in vals]


# ---------------------------------------------------------------------------
# Kernels (backend-agnostic: fused native calls in cpp mode, jit in jax mode)
# ---------------------------------------------------------------------------

xnp = limb.xnp


def _fix_var(spec: FieldSpec, evals, x):
    """out[i] = (e[2i+1] - e[2i]) * x + e[2i]  (multilinear.rs:599-618)."""
    return limb.fold_pairs(spec, evals, x)


def _fix_last_var(spec: FieldSpec, evals, x):
    n = evals.shape[0]
    return limb.fold_halves(spec, evals[: n // 2], evals[n // 2:], x)


def _merge(spec: FieldSpec, evals, x, distance: int, skip: int):
    """Generalized fix: pairs (step*i+skip, step*i+skip+step/2), step=2^distance
    (multilinear.rs merge_into with distance/skip)."""
    step = 1 << distance
    n = evals.shape[0]
    grid = evals.reshape(n // step, step, -1)
    return limb.fold_halves(spec, grid[:, skip], grid[:, skip + step // 2], x)


def _eq_xy_kernel(spec: FieldSpec, k: int, ys):
    """eq(x, y) table by doubling expansion (multilinear.rs:91-127).
    ys: [k, 16] Montgomery digits; returns [2^k, 16]."""
    evals = limb.one(spec, (1,))
    for i in range(k - 1, -1, -1):
        hi = limb.mont_mul(spec, evals, ys[i])
        lo = limb.sub(spec, evals, hi)
        evals = xnp.stack([lo, hi], axis=1).reshape(-1, evals.shape[-1])
    return evals


if not limb.IS_CPP:
    _eq_xy_kernel = functools.partial(
        jax.jit, static_argnums=(0, 1)
    )(_eq_xy_kernel)


def eq_xy(spec: FieldSpec, y: Sequence[Fp]) -> MLPoly:
    if not y:
        return MLPoly(spec, limb.one(spec, (1,)))
    ys = xnp.stack([limb.const(spec, int(v)) for v in y])
    return MLPoly(spec, _eq_xy_kernel(spec, len(y), ys))


# ---------------------------------------------------------------------------
# Rotation patterns & verifier-side recombination (host, exact ints / Fp)
# ---------------------------------------------------------------------------

def rotation_eval_point_pattern(num_vars: int, distance: int, next_: bool) -> List[int]:
    """multilinear.rs:526-545."""
    bh = BooleanHypercube(num_vars)
    remainder = bh.primitive if next_ else bh.x_inv
    pattern = [0] * (1 << distance)
    for depth in range(distance):
        step = 1 << (distance - depth)
        half = step >> 1
        for start in range(0, len(pattern), step):
            for off in range(half):
                e = start + off
                o = start + off + half
                rotated = pattern[e] << 1 if next_ else pattern[e] >> 1
                pattern[o] = rotated ^ remainder
                pattern[e] = rotated
    return pattern


def rotation_eval_coeff_pattern(num_vars: int, distance: int, next_: bool) -> List[int]:
    """multilinear.rs:547-570."""
    bh = BooleanHypercube(num_vars)
    remainder = (bh.primitive - (1 << num_vars)) if next_ else (bh.x_inv << distance)
    pattern = [0] * (1 << (distance - 1))
    for depth in range(distance - 1):
        step = 1 << (distance - depth - 1)
        half = step >> 1
        for start in range(0, len(pattern), step):
            for off in range(half):
                e = start + off
                o = start + off + half
                rotated = pattern[e] << 1 if next_ else pattern[e] >> 1
                pattern[o] = rotated ^ remainder
                pattern[e] = rotated
    return pattern


def rotation_eval(x: Sequence[Fp], rotation: Rotation, evals_for_rotation: Sequence[Fp]) -> Fp:
    """Recombine 2^distance partial evals into the rotated poly's evaluation
    (multilinear.rs:433-476).  Host-side: O(2^distance) field ops."""
    if rotation.value == 0:
        assert len(evals_for_rotation) == 1
        return evals_for_rotation[0]
    num_vars = len(x)
    distance = rotation.distance
    assert len(evals_for_rotation) == 1 << distance
    assert distance <= num_vars

    if rotation.value < 0:
        pattern = rotation_eval_coeff_pattern(num_vars, distance, next_=False)
        nths = list(range(distance, 0, -1))
        xs = list(reversed(x[0:distance]))
    else:
        pattern = rotation_eval_coeff_pattern(num_vars, distance, next_=True)
        nths = list(range(num_vars - 1, num_vars - 1 + distance))
        xs = list(x[num_vars - distance:])

    evals = list(evals_for_rotation)
    for idx, (x_i, nth) in enumerate(zip(xs, nths)):
        pat_bits = [
            (pattern[p] >> nth) & 1 for p in range(0, len(pattern), 1 << idx)
        ]
        next_evals = []
        for bit, (e0, e1) in zip(pat_bits, zip(evals[0::2], evals[1::2])):
            if bit:
                next_evals.append((e0 - e1) * x_i + e1)
            else:
                next_evals.append((e1 - e0) * x_i + e0)
        evals = next_evals
    return evals[0]


def rotation_eval_points(x: Sequence[Fp], rotation: Rotation) -> List[List[Fp]]:
    """The 2^distance points at which the prover opens a rotated query
    (multilinear.rs:478-524)."""
    if rotation.value == 0:
        return [list(x)]
    spec = x[0].spec
    one_ = Fp.one(spec)
    zero = Fp.zero(spec)
    distance = rotation.distance
    num_x = len(x) - distance
    points = []
    if rotation.value < 0:
        pattern = rotation_eval_point_pattern(len(x), distance, next_=False)
        xs = x[distance:]
        for pat in pattern:
            pt = [
                (one_ - xs[idx]) if (pat >> idx) & 1 else xs[idx]
                for idx in range(num_x)
            ]
            pt += [
                one_ if (pat >> (idx + num_x)) & 1 else zero
                for idx in range(distance)
            ]
            points.append(pt)
    else:
        pattern = rotation_eval_point_pattern(len(x), distance, next_=True)
        xs = x[:num_x]
        for pat in pattern:
            pt = [one_ if (pat >> idx) & 1 else zero for idx in range(distance)]
            pt += [
                (one_ - xs[idx]) if (pat >> (idx + distance)) & 1 else xs[idx]
                for idx in range(num_x)
            ]
            points.append(pt)
    return points
