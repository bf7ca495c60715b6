"""Multilinear KZG (PST13-style) over BN254.

Mirrors /root/reference/plonkish_backend/src/pcs/multilinear/kzg.rs:
- SRS: eq-basis G1 tables for every prefix size (eqs[i] commits eq(s_0..s_{i-1},·))
  plus s_i·G2; built by device doubling-expansion + fixed-base MSM.
- commit = variable-base MSM(evals, eq basis) — the framework's hot MSM kernel.
- open = multilinear quotients (device fold, same kernel as fix_last_var) each
  committed by MSM; verify = pairing product on host.
"""

from __future__ import annotations

import dataclasses
import random
from typing import List, Sequence

import jax.numpy as jnp

from .. import config
from ..backend.pcs_api import Evaluation
from ..curves.device import from_affine_host
from ..curves.host import AffinePoint, msm_host
from ..curves.msm import msm_affine
from ..curves.msm import fixed_base_msm, variable_base_msm
from ..curves.pairing import G2Point, pairings_product_is_identity
from ..curves.specs import BN254_G1, CurveSpec
from ..fields import limb
from ..fields.host import Fp
from ..fields.spec import FieldSpec
from ..poly.multilinear import MLPoly
from ..utils.transcript import Keccak256Transcript
from . import additive

import functools as _functools

import jax as _jax


@_functools.partial(_jax.jit, static_argnums=0)
def _quotient_step_jax(spec, remainder, x_digits):
    """One multilinear-quotient step (pcs/multilinear.rs:72-107):
    (quotient, remainder) of dividing by (X_var - x) — fused so each
    variable costs one device dispatch instead of four.  The two products
    row-block above 2^21 rows (flat full-width mont_mul temps abort the
    k>=23 compile; see limb.mont_mul_rows_blocked)."""
    half = remainder.shape[0] // 2
    lo, hi = remainder[:half], remainder[half:]
    quotient = limb._sub_jax(spec, hi, lo)
    new_rem = limb._add_jax(
        spec,
        limb.mont_mul_rows_blocked(
            spec, quotient, jnp.broadcast_to(x_digits, quotient.shape)
        ),
        lo,
    )
    one_ = jnp.zeros((limb.L,), jnp.uint32).at[0].set(1)
    return new_rem, limb.mont_mul_rows_blocked(
        spec, quotient, jnp.broadcast_to(one_, quotient.shape)
    )


@dataclasses.dataclass
class MultilinearKzgParams:
    g1: AffinePoint
    eqs: List[jnp.ndarray]  # eqs[i]: [2^i, 3, L] projective G1 basis
    g2: G2Point
    ss: List[G2Point]

    @property
    def num_vars(self) -> int:
        return len(self.eqs) - 1


@dataclasses.dataclass
class MultilinearKzgProverParams:
    g1: AffinePoint
    eqs: List[jnp.ndarray]
    # lazily-filled affine-normalized bases, keyed by prefix size: the SRS
    # is reused across every commit/open of a prove, so the per-MSM 2^k
    # batch inversion (pallas.msm.normalize_points_jit) is paid once here
    _eq_norm: dict = dataclasses.field(
        default_factory=dict, repr=False, compare=False
    )

    @property
    def num_vars(self) -> int:
        return len(self.eqs) - 1

    def eq(self, num_vars: int):
        """MSM basis for a 2^num_vars commit — normalized + cached on the
        jax path (variable_base_msm accepts the NormalizedPoints triple),
        raw projective on the native host path.

        The projective table is RELEASED once normalized: holding both was
        +1.6 GB of HBM at k=22 and tipped the e2e prove into runtime
        ResourceExhausted (r5).  The normalized triple is strictly smaller
        (no z column) and every MSM path can rebuild projective from it."""
        if limb.IS_CPP:
            return self.eqs[num_vars]
        if self._eq_norm.get(num_vars) is None:
            from ..curves.msm import NormalizedPoints
            from ..pallas.msm import normalize_points_jit

            self._eq_norm[num_vars] = NormalizedPoints(
                *normalize_points_jit(self.g1.curve, self.eqs[num_vars])
            )
            self.eqs[num_vars] = None
        return self._eq_norm[num_vars]


@dataclasses.dataclass
class MultilinearKzgVerifierParams:
    g1: AffinePoint
    g2: G2Point
    ss: List[G2Point]

    @property
    def num_vars(self) -> int:
        return len(self.ss)


class MultilinearKzg:
    def __init__(self, curve: CurveSpec = BN254_G1):
        self.curve = curve
        self.field_spec = curve.scalar

    # ------------------------------------------------------------- lifecycle
    def setup(self, poly_size: int, batch_size: int, rng: random.Random):
        assert poly_size & (poly_size - 1) == 0
        num_vars = poly_size.bit_length() - 1
        spec = self.field_spec
        ss = [Fp(rng.randrange(1, spec.p), spec) for _ in range(num_vars)]

        g1 = AffinePoint.generator(self.curve)
        # eq tables per prefix (kzg.rs:174-195): level i over s_0..s_{i-1}
        eq_scalars: List[List[Fp]] = [[Fp.one(spec)]]
        for s_i in ss:
            last = eq_scalars[-1]
            hi = [s_i * v for v in last]
            lo = [v - h for v, h in zip(last, hi)]
            eq_scalars.append(lo + hi)  # index bit i ↔ s_i

        eqs = []
        for level in eq_scalars:
            tbl = fixed_base_msm(self.curve, g1, level)
            if not limb.IS_CPP:
                # keep the SRS on HOST: a device-resident projective table
                # set is ~1.6 GB of HBM at k=22 pinned for the whole prove
                # (the r5 ResourceExhausted); the normalized triple uploads
                # transiently in pp.eq() when first used
                import numpy as _np

                tbl = _np.asarray(tbl, dtype=_np.uint32)
            eqs.append(tbl)

        g2 = G2Point.generator()
        ss_g2 = [g2.scalar_mul(int(s)) for s in ss]
        return MultilinearKzgParams(g1=g1, eqs=eqs, g2=g2, ss=ss_g2)

    def trim(self, param: MultilinearKzgParams, poly_size: int, batch_size: int):
        num_vars = poly_size.bit_length() - 1
        if param.num_vars < num_vars:
            raise ValueError("SRS too small")
        pp = MultilinearKzgProverParams(
            g1=param.g1, eqs=param.eqs[: num_vars + 1]
        )
        vp = MultilinearKzgVerifierParams(
            g1=param.g1, g2=param.g2, ss=param.ss[:num_vars]
        )
        return pp, vp

    def dummy_commitment(self):
        return AffinePoint.identity(self.curve)

    # ----------------------------------------------------------------- commit
    def commit(self, pp: MultilinearKzgProverParams, poly: MLPoly) -> AffinePoint:
        spec = self.field_spec
        scalars = limb.from_mont(spec, poly.evals)  # canonical digits
        return variable_base_msm(self.curve, scalars, pp.eq(poly.num_vars))

    def batch_commit(self, pp, polys):
        return [self.commit(pp, p) for p in polys]

    def commit_and_write(self, pp, poly, transcript: Keccak256Transcript):
        comm = self.commit(pp, poly)
        transcript.write_point(comm)
        return comm

    def batch_commit_and_write(self, pp, polys, transcript):
        comms = self.batch_commit(pp, polys)
        for c in comms:
            transcript.write_point(c)
        return comms

    def read_commitments(self, vp, n, transcript) -> List[AffinePoint]:
        return [transcript.read_point(self.curve) for _ in range(n)]

    def combine_commitments(self, vp, scalars, bases) -> AffinePoint:
        return msm_affine(scalars, bases)

    # ------------------------------------------------------------------- open
    def open(
        self,
        pp: MultilinearKzgProverParams,
        poly: MLPoly,
        comm,
        point: Sequence[Fp],
        eval_,
        transcript: Keccak256Transcript,
    ) -> None:
        """Multilinear quotients (pcs/multilinear.rs:72-107) + per-variable
        commitments (kzg.rs:291-301)."""
        spec = self.field_spec
        num_vars = poly.num_vars
        assert len(point) == num_vars
        if config.sanity_checks():
            # reference `sanity-check` feature (kzg.rs:286-296): the claimed
            # commitment and evaluation must match the polynomial.
            if comm is not None and self.commit(pp, poly) != comm:
                raise AssertionError("sanity: kzg open comm mismatch")
            if poly.evaluate(list(point)) != eval_:
                raise AssertionError("sanity: kzg open eval mismatch")
        remainder = poly.evals
        quotient_comms: List[AffinePoint] = []  # var k-1 first
        for var in range(num_vars - 1, -1, -1):
            x_i = limb.const(spec, int(point[var]))
            if limb.IS_CPP:
                half = 1 << var
                lo, hi = remainder[:half], remainder[half:]
                quotient = limb.sub(spec, hi, lo)
                remainder = limb.add(
                    spec, limb.mont_mul(spec, quotient, x_i), lo
                )
                q_canon = limb.from_mont(spec, quotient)
            else:
                # one program per variable (the eager version is 4 device
                # dispatches each — network RTTs on a tunneled TPU)
                remainder, q_canon = _quotient_step_jax(
                    spec, remainder, jnp.asarray(x_i)
                )
            quotient_comms.append(
                variable_base_msm(self.curve, q_canon, pp.eq(var))
            )
        quotient_comms.reverse()  # write variable 0 first
        for c in quotient_comms:
            transcript.write_point(c)

    def batch_open(self, pp, polys, comms, points, evals, transcript):
        additive.batch_open(
            self, pp, pp.num_vars, polys, comms, points, evals, transcript
        )

    # ----------------------------------------------------------------- verify
    def verify(
        self,
        vp: MultilinearKzgVerifierParams,
        comm: AffinePoint,
        point: Sequence[Fp],
        eval_: Fp,
        transcript: Keccak256Transcript,
    ) -> None:
        """Pairing check e(C − eval·g1, −g2)·Π e(q_i, (s_i − x_i)·g2) == 1
        (kzg.rs:330-361)."""
        quotients = [transcript.read_point(self.curve) for _ in range(len(point))]
        neg_g2 = -vp.g2
        rhs = [neg_g2] + [
            vp.ss[i] + (-(vp.g2.scalar_mul(int(point[i]))))
            for i in range(len(point))
        ]
        lhs = [comm + (-(vp.g1.scalar_mul(int(eval_))))] + quotients
        if not pairings_product_is_identity(list(zip(lhs, rhs))):
            raise ValueError("Invalid multilinear KZG open")

    def batch_verify(self, vp, comms, points, evals, transcript):
        additive.batch_verify(
            self, vp, vp.num_vars, comms, points, evals, transcript
        )
