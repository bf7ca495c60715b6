"""Univariate polynomials in coefficient basis.

Mirrors /root/reference/plonkish_backend/src/poly/univariate.rs: evaluate
(Horner), div_rem (long division), `basis` (incremental vanishing polynomial
Π(X − p_i)), and ring ops.  Two representations:

- `UniPoly`: host `Fp` coefficient lists — O(degree) sequential protocol
  algebra at small degree (verifier side, tests, eval-set bookkeeping).
- `DUniPoly`: a Montgomery digit tensor [n, L] that never leaves the
  device — the NTT pipeline's native form.  The univariate prover's open
  phase is O(n) work over degree-2^k polynomials; doing it with host
  bigints was the k=20 univariate-PLONK bottleneck (hundreds of seconds).
  Division by (X − z) uses the closed form q_i = z^{-(i+1)} · Σ_{j>i} c_j z^j
  (two full-width mont-muls + one suffix-sum scan) instead of the
  sequential Horner recurrence, so it stays a handful of fused device
  passes (reference long division: univariate.rs:144-168).
"""

from __future__ import annotations

from typing import List, Sequence

from ..fields import limb
from ..fields.host import Fp
from ..fields.spec import FieldSpec


def powers_tensor(spec: FieldSpec, x: Fp, n: int):
    """Device [n, L] Montgomery tensor of 1, x, x^2, …, x^{n-1} built by
    log-doubling (log n mont-muls of doubling width ≈ one full pass)."""
    out = limb.one(spec, (1,))
    xm = limb.const(spec, int(x))
    step = xm[None]  # x^(current length), shape [1, L]
    while out.shape[0] < n:
        out = limb.xnp.concatenate(
            [out, limb.mont_mul(spec, out, step)], axis=0
        )
        step = limb.mont_square(spec, step)
    return out[:n]


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

    def div_by_roots(self, roots: Sequence[Fp]) -> "UniPoly":
        """Quotient by Π(X − rᵢ), remainder dropped (the batched-opening
        divisions — kzg.rs:318-330 — discard it)."""
        q, _ = self.div_rem(
            UniPoly.basis(self.spec, roots, Fp.one(self.spec))
        )
        return q


class DUniPoly:
    """Univariate polynomial as a device-resident Montgomery digit tensor
    [n, L] (ascending coefficients, zero tail allowed — untrimmed).

    Drop-in for the subset of the `UniPoly` API the prover-side batched
    opening needs (scale/add/evaluate/div_by_roots/commit via tensor), with
    every O(n) operation staying on device; see module docstring."""

    __slots__ = ("spec", "coeffs")

    def __init__(self, spec: FieldSpec, coeffs):
        self.spec = spec
        self.coeffs = coeffs  # [n, L] Montgomery digit tensor

    @classmethod
    def from_unipoly(cls, poly: UniPoly) -> "DUniPoly":
        return cls(
            poly.spec,
            limb.to_mont(
                poly.spec, limb.from_ints([int(c) for c in poly.coeffs])
            ),
        )

    def is_zero(self) -> bool:
        return self.coeffs.shape[0] == 0

    def degree(self) -> int:
        return max(0, self.coeffs.shape[0] - 1)  # upper bound (untrimmed)

    def scale(self, scalar: Fp) -> "DUniPoly":
        return DUniPoly(
            self.spec,
            limb.mont_mul(
                self.spec, self.coeffs, limb.const(self.spec, int(scalar))
            ),
        )

    def __add__(self, other: "DUniPoly") -> "DUniPoly":
        a, b = self.coeffs, other.coeffs
        if a.shape[0] < b.shape[0]:
            a, b = b, a
        if b.shape[0] < a.shape[0]:
            pad = limb.zeros((a.shape[0] - b.shape[0],))
            b = limb.xnp.concatenate([b, pad], axis=0)
        return DUniPoly(self.spec, limb.add(self.spec, a, b))

    def evaluate(self, x: Fp) -> Fp:
        """f(x) as a host scalar: one powers build + dot + single fetch."""
        spec = self.spec
        n = self.coeffs.shape[0]
        if n == 0:
            return Fp.zero(spec)
        pw = powers_tensor(spec, x, n)
        acc = limb.sum_reduce(spec, limb.mont_mul(spec, self.coeffs, pw))
        return Fp(int(limb.to_ints(limb.from_mont(spec, acc[None]))[0]), spec)

    def div_by_roots(self, roots: Sequence[Fp]) -> "DUniPoly":
        out = self
        for r in roots:
            out = out._div_by_root(r)
        return out

    def _div_by_root(self, z: Fp) -> "DUniPoly":
        """Quotient of f by (X − z) via the closed form
        q_i = z^{-(i+1)} · Σ_{j≥i+1} c_j z^j — two elementwise mont-muls
        against power tables plus one field suffix-sum scan, instead of the
        O(n)-sequential synthetic division."""
        spec = self.spec
        n = self.coeffs.shape[0]
        if n <= 1:
            return DUniPoly(spec, limb.zeros((0,)))
        if z.is_zero():  # degenerate (never a transcript challenge)
            return DUniPoly(spec, self.coeffs[1:])
        w = limb.mont_mul(spec, self.coeffs, powers_tensor(spec, z, n))
        s = _suffix_sum(spec, w)[1:]  # S_i = Σ_{j≥i+1} w_j, i = 0..n-2
        inv_pw = powers_tensor(spec, z.inv(), n)  # z^{-i}
        zinv = limb.const(spec, int(z.inv()))
        q = limb.mont_mul(
            spec, limb.mont_mul(spec, s, inv_pw[: n - 1]), zinv
        )  # × z^{-(i+1)}
        return DUniPoly(spec, q)


def _suffix_sum(spec: FieldSpec, a):
    """Inclusive suffix sums of [n, L] field rows, on device in jax mode."""
    if not limb.IS_CPP:
        import jax

        return jax.lax.associative_scan(
            lambda x, y: limb._add_jax(spec, x, y), a, reverse=True, axis=0
        )
    import numpy as np

    out = np.array(a, dtype=np.uint32)
    for i in range(out.shape[0] - 2, -1, -1):
        out[i] = limb.add(spec, out[i], out[i + 1])
    return out
