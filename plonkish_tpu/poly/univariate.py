"""Univariate polynomials in coefficient basis.

Mirrors /root/reference/plonkish_backend/src/poly/univariate.rs: evaluate
(Horner), div_rem (long division), `basis` (incremental vanishing polynomial
Π(X − p_i)), and ring ops.  Coefficients are host `Fp` scalars — univariate
protocol algebra is O(degree) sequential work; commitments of big coefficient
vectors go through the device MSM path separately.
"""

from __future__ import annotations

from typing import List, Sequence

from ..fields.host import Fp
from ..fields.spec import FieldSpec


class UniPoly:
    __slots__ = ("spec", "coeffs")

    def __init__(self, spec: FieldSpec, coeffs: Sequence[Fp]):
        self.spec = spec
        self.coeffs = list(coeffs)
        self._trim()

    def _trim(self):
        while self.coeffs and self.coeffs[-1].is_zero():
            self.coeffs.pop()

    @classmethod
    def zero(cls, spec: FieldSpec) -> "UniPoly":
        return cls(spec, [])

    @classmethod
    def basis(cls, spec: FieldSpec, points: Sequence[Fp], scalar: Fp) -> "UniPoly":
        """scalar · Π (X − p) (univariate.rs:109-124), ascending coeffs."""
        coeffs = [scalar]
        zero = Fp.zero(spec)
        for point in points:
            new = [zero] * (len(coeffs) + 1)
            for i, c in enumerate(coeffs):
                new[i + 1] = new[i + 1] + c
                new[i] = new[i] - c * point
            coeffs = new
        return cls(spec, coeffs)

    def is_zero(self) -> bool:
        return not self.coeffs

    def degree(self) -> int:
        return max(0, len(self.coeffs) - 1)

    def evaluate(self, x: Fp) -> Fp:
        acc = Fp.zero(self.spec)
        for c in reversed(self.coeffs):
            acc = acc * x + c
        return acc

    def __add__(self, other: "UniPoly") -> "UniPoly":
        n = max(len(self.coeffs), len(other.coeffs))
        z = Fp.zero(self.spec)
        return UniPoly(
            self.spec,
            [
                (self.coeffs[i] if i < len(self.coeffs) else z)
                + (other.coeffs[i] if i < len(other.coeffs) else z)
                for i in range(n)
            ],
        )

    def __sub__(self, other: "UniPoly") -> "UniPoly":
        n = max(len(self.coeffs), len(other.coeffs))
        z = Fp.zero(self.spec)
        return UniPoly(
            self.spec,
            [
                (self.coeffs[i] if i < len(self.coeffs) else z)
                - (other.coeffs[i] if i < len(other.coeffs) else z)
                for i in range(n)
            ],
        )

    def scale(self, scalar: Fp) -> "UniPoly":
        return UniPoly(self.spec, [c * scalar for c in self.coeffs])

    def __mul__(self, other: "UniPoly") -> "UniPoly":
        if self.is_zero() or other.is_zero():
            return UniPoly.zero(self.spec)
        z = Fp.zero(self.spec)
        out = [z] * (len(self.coeffs) + len(other.coeffs) - 1)
        for i, a in enumerate(self.coeffs):
            if a.is_zero():
                continue
            for j, b in enumerate(other.coeffs):
                out[i + j] = out[i + j] + a * b
        return UniPoly(self.spec, out)

    def div_rem(self, divisor: "UniPoly"):
        """Long division (univariate.rs:144-168)."""
        assert not divisor.is_zero()
        if self.is_zero() or self.degree() < divisor.degree():
            return UniPoly.zero(self.spec), UniPoly(self.spec, self.coeffs)
        lead_inv = divisor.coeffs[-1].inv()
        rem = list(self.coeffs)
        qn = len(rem) - len(divisor.coeffs) + 1
        quotient = [Fp.zero(self.spec)] * qn
        for i in range(qn - 1, -1, -1):
            q = rem[i + len(divisor.coeffs) - 1] * lead_inv
            quotient[i] = q
            if not q.is_zero():
                for j, d in enumerate(divisor.coeffs):
                    rem[i + j] = rem[i + j] - q * d
        return UniPoly(self.spec, quotient), UniPoly(self.spec, rem)
