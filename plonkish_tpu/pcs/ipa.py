"""Multilinear IPA (Bulletproofs-style inner product argument).

Mirrors /root/reference/plonkish_backend/src/pcs/multilinear/ipa.rs:
hash-to-curve generator basis, k rounds of L/R commitments + challenge folding
of (bases, coeffs, zs=eq(point)), final (g_k, c) with the verifier rebuilding
h(X) = Π(1 + ξ_i X_hi).  Folding runs on device: field folds are fused
kernels, base folds a shared-scalar batched EC scalar-mul + add.
"""

from __future__ import annotations

import random
from typing import List, Sequence

from ..backend.pcs_api import Evaluation
from ..curves.device import (
    from_affine_host,
    padd,
    scalar_mul_const,
    to_affine_host,
)
from ..curves.host import AffinePoint, msm_host
from ..curves.msm import msm_affine
from ..curves.msm import variable_base_msm
from ..curves.specs import GRUMPKIN_G1, CurveSpec, sqrt_mod
from ..fields import limb
from ..fields.host import Fp, batch_invert
from ..poly.multilinear import MLPoly, eq_xy
from ..utils.keccak import keccak256
from ..utils.transcript import Keccak256Transcript
from . import additive


def hash_to_curve(curve: CurveSpec, tag: bytes, idx: int) -> AffinePoint:
    """Deterministic try-and-increment point derivation (replaces
    halo2_curves' hash_to_curve; SRS bit-compat is out of scope)."""
    base = curve.base
    ctr = 0
    while True:
        digest = keccak256(tag + idx.to_bytes(4, "little") + ctr.to_bytes(4, "little"))
        x = int.from_bytes(digest, "little") % base.p
        rhs = (pow(x, 3, base.p) + curve.b) % base.p
        if pow(rhs, (base.p - 1) // 2, base.p) in (0, 1):
            y = sqrt_mod(rhs, base.p)
            # deterministic sign choice
            if y % 2 == 1:
                y = base.p - y
            return AffinePoint(curve, Fp(x, base), Fp(y, base))
        ctr += 1


class IpaParams:
    def __init__(self, curve, num_vars: int, g, h: AffinePoint):
        self.curve = curve
        self.num_vars = num_vars
        self.g = g  # device tensor [2^k, 3, L]
        self.h = h


class MultilinearIpa:
    def __init__(self, curve: CurveSpec = GRUMPKIN_G1):
        self.curve = curve
        self.field_spec = curve.scalar

    def setup(self, poly_size: int, batch_size: int, rng=None) -> IpaParams:
        assert poly_size & (poly_size - 1) == 0
        num_vars = poly_size.bit_length() - 1
        g_pts = [
            hash_to_curve(self.curve, b"MultilinearIpa::setup", i)
            for i in range(poly_size)
        ]
        h = hash_to_curve(self.curve, b"MultilinearIpa::setup::h", 0)
        return IpaParams(
            self.curve, num_vars, from_affine_host(self.curve, g_pts), h
        )

    def trim(self, param: IpaParams, poly_size: int, batch_size: int):
        num_vars = poly_size.bit_length() - 1
        if param.num_vars < num_vars:
            raise ValueError("SRS too small")
        pp = IpaParams(self.curve, num_vars, param.g[:poly_size], param.h)
        return pp, pp

    def dummy_commitment(self):
        return AffinePoint.identity(self.curve)

    def commit(self, pp: IpaParams, poly: MLPoly) -> AffinePoint:
        spec = self.field_spec
        return variable_base_msm(
            self.curve, limb.from_mont(spec, poly.evals), pp.g
        )

    def batch_commit(self, pp, polys):
        return [self.commit(pp, p) for p in polys]

    def commit_and_write(self, pp, poly, transcript):
        comm = self.commit(pp, poly)
        transcript.write_point(comm)
        return comm

    def batch_commit_and_write(self, pp, polys, transcript):
        comms = self.batch_commit(pp, polys)
        for c in comms:
            transcript.write_point(c)
        return comms

    def read_commitments(self, vp, n, transcript):
        return [transcript.read_point(self.curve) for _ in range(n)]

    def combine_commitments(self, vp, scalars, bases):
        return msm_affine(scalars, bases)

    # ------------------------------------------------------------------- open
    def open(self, pp: IpaParams, poly: MLPoly, comm, point: Sequence[Fp],
             eval_, transcript: Keccak256Transcript):
        spec = self.field_spec
        xi_0 = transcript.squeeze_challenge()
        h_prime = pp.h.scalar_mul(int(xi_0))

        bases = pp.g
        coeffs = poly.evals
        zs = eq_xy(spec, list(point)).evals

        for i in range(pp.num_vars):
            mid = 1 << (pp.num_vars - i - 1)
            bases_l, bases_r = bases[:mid], bases[mid:]
            coeffs_l, coeffs_r = coeffs[:mid], coeffs[mid:]
            zs_l, zs_r = zs[:mid], zs[mid:]

            c_l = limb.sum_reduce(
                spec, limb.mont_mul(spec, coeffs_r, zs_l)
            )
            c_r = limb.sum_reduce(
                spec, limb.mont_mul(spec, coeffs_l, zs_r)
            )
            c_l_fp = Fp(int(limb.to_ints(limb.from_mont(spec, c_l[None]))[0]), spec)
            c_r_fp = Fp(int(limb.to_ints(limb.from_mont(spec, c_r[None]))[0]), spec)

            l_i = variable_base_msm(
                self.curve, limb.from_mont(spec, coeffs_r), bases_l
            ) + h_prime.scalar_mul(int(c_l_fp))
            r_i = variable_base_msm(
                self.curve, limb.from_mont(spec, coeffs_l), bases_r
            ) + h_prime.scalar_mul(int(c_r_fp))
            transcript.write_point(l_i)
            transcript.write_point(r_i)

            xi = transcript.squeeze_challenge()
            xi_inv = xi.inv()

            bases = padd(
                self.curve, bases_l,
                scalar_mul_const(self.curve, bases_r, int(xi)),
            )
            coeffs = limb.add(
                spec,
                coeffs_l,
                limb.mont_mul(spec, coeffs_r, limb.const(spec, int(xi_inv))),
            )
            zs = limb.add(
                spec,
                zs_l,
                limb.mont_mul(spec, zs_r, limb.const(spec, int(xi))),
            )

        g_k = to_affine_host(self.curve, bases[:1])[0]
        transcript.write_point(g_k)
        c = Fp(int(limb.to_ints(limb.from_mont(spec, coeffs[:1]))[0]), spec)
        transcript.write_field_element(c)

    def batch_open(self, pp, polys, comms, points, evals, transcript):
        additive.batch_open(
            self, pp, pp.num_vars, polys, comms, points, evals, transcript
        )

    # ----------------------------------------------------------------- verify
    def verify(self, vp: IpaParams, comm: AffinePoint, point: Sequence[Fp],
               eval_: Fp, transcript):
        spec = self.field_spec
        xi_0 = transcript.squeeze_challenge()
        ls, rs, xis = [], [], []
        for _ in range(vp.num_vars):
            ls.append(transcript.read_point(self.curve))
            rs.append(transcript.read_point(self.curve))
            xis.append(transcript.squeeze_challenge())
        g_k = transcript.read_point(self.curve)
        c = transcript.read_field_element()

        xi_invs = batch_invert(list(xis))
        eval_prime = xi_0 * eval_
        c_k = msm_affine(
            xi_invs + xis + [eval_prime], ls + rs + [vp.h]
        ) + comm

        h_evals = _h_coeffs(spec, xis)
        h_poly = MLPoly.from_fps(spec, h_evals)
        h_at_point = h_poly.evaluate(list(point))

        lhs_ok = c_k == msm_affine(
            [c, c * h_at_point * xi_0], [g_k, vp.h]
        )
        g_ok = g_k == variable_base_msm(
            self.curve, limb.from_mont(spec, h_poly.evals), vp.g
        )
        if not (lhs_ok and g_ok):
            raise ValueError("Invalid multilinear IPA open")

    def batch_verify(self, vp, comms, points, evals, transcript):
        additive.batch_verify(
            self, vp, vp.num_vars, comms, points, evals, transcript
        )


def _h_coeffs(spec, xis: List[Fp]) -> List[Fp]:
    """h(X) coefficients (ipa.rs:325-343)."""
    assert xis
    coeffs = [Fp.zero(spec)] * (1 << len(xis))
    coeffs[0] = Fp.one(spec)
    for i, xi in enumerate(reversed(xis)):
        length = 1 << i
        for j in range(length):
            coeffs[length + j] = coeffs[j] * xi
    return coeffs
