"""Shared batch open/verify for additively-homomorphic PCS.

Reduces a batch of (poly, point, eval) claims to ONE opening via a degree-2
sum-check, mirroring /root/reference/plonkish_backend/src/pcs/multilinear.rs:
109-276 exactly (challenge schedule, merged-poly weighting, g' construction).
Merged polys are device tensors; the sum-check runs the CoefficientsProver
karatsuba fast path.
"""

from __future__ import annotations

from typing import List, Sequence

from ..backend.pcs_api import Evaluation
from ..fields import limb
from ..fields.host import Fp
from ..fields.spec import FieldSpec
from ..piop.sum_check import ClassicSumCheck, VirtualPolynomial, eq_xy_eval
from ..poly.multilinear import MLPoly, eq_xy
from ..utils import expression as ex
from ..utils.expression import Query, Rotation
from ..utils.transcript import Keccak256Transcript


def batch_open(
    pcs,
    pp,
    num_vars: int,
    polys: Sequence[MLPoly],
    comms: Sequence,
    points: Sequence[Sequence[Fp]],
    evals: Sequence[Evaluation],
    transcript: Keccak256Transcript,
) -> None:
    spec = polys[0].spec
    ell = max(1, (len(evals) - 1).bit_length()) if len(evals) > 1 else 0
    t = transcript.squeeze_challenges(ell)

    eq_xt = eq_xy(spec, t).to_fps() if t else [Fp.one(spec)]

    # merged_polys[point] = Σ_{evals at point} eq_xt_i · poly_i  (multilinear.rs:153-171)
    merged: List[MLPoly | None] = [None] * len(points)
    merged_scalar: List[Fp] = [Fp.one(spec)] * len(points)
    if not limb.IS_CPP:
        # one fused weighted-sum program per point: the eager loop below
        # runs ~2 full-table device ops per evaluation (~2 network RTTs
        # each on a tunneled TPU; a HyperPlonk batch has dozens of evals)
        groups: dict = {}
        for eval_, eq_xt_i in zip(evals, eq_xt):
            groups.setdefault(eval_.point, []).append(
                (eval_.poly, eq_xt_i)
            )
        for pt, items in groups.items():
            if len(items) == 1:
                poly_idx, s = items[0]
                merged[pt] = polys[poly_idx]
                merged_scalar[pt] = s
                continue
            merged[pt] = MLPoly(
                spec,
                _weighted_sum(
                    spec,
                    [polys[i].evals for i, _ in items],
                    [s for _, s in items],
                ),
            )
    else:
        for eval_, eq_xt_i in zip(evals, eq_xt):
            pt = eval_.point
            if merged[pt] is None:
                merged[pt] = polys[eval_.poly]
                merged_scalar[pt] = eq_xt_i
            else:
                if merged_scalar[pt] != 1:
                    merged[pt] = merged[pt].scale(merged_scalar[pt])
                    merged_scalar[pt] = Fp.one(spec)
                merged[pt] = merged[pt] + polys[eval_.poly].scale(eq_xt_i)

    active = [
        (idx, scalar, poly)
        for idx, (scalar, poly) in enumerate(zip(merged_scalar, merged))
        if poly is not None
    ]
    expression = None
    sum_polys = []
    for slot, (point_idx, scalar, poly) in enumerate(active):
        term = ex.eq_xy(point_idx) * ex.Polynomial(Query(slot, Rotation(0))) * scalar
        expression = term if expression is None else expression + term
        sum_polys.append(poly)

    tilde_gs_sum = Fp.zero(spec)
    for eval_, eq_xt_i in zip(evals, eq_xt):
        tilde_gs_sum = tilde_gs_sum + eval_.value * eq_xt_i

    vp = VirtualPolynomial(expression, sum_polys, [], [list(p) for p in points])
    challenges, _ = ClassicSumCheck.coefficients().prove(
        spec, num_vars, vp, tilde_gs_sum, transcript
    )

    # g' = Σ (scalar·eq_xy_eval)·merged  (multilinear.rs:203-213)
    eq_xy_evals = [eq_xy_eval(challenges, list(p)) for p in points]
    if not limb.IS_CPP and len(active) > 1:
        g_prime = MLPoly(
            spec,
            _weighted_sum(
                spec,
                [poly.evals for (_, _, poly) in active],
                [
                    scalar * eq_xy_evals[point_idx]
                    for (point_idx, scalar, _) in active
                ],
            ),
        )
    else:
        g_prime = None
        for (point_idx, scalar, poly) in active:
            term = poly.scale(scalar * eq_xy_evals[point_idx])
            g_prime = term if g_prime is None else g_prime + term

    pcs.open(pp, g_prime, None, challenges, None, transcript)


def _weighted_sum(spec: FieldSpec, tables, scalars):
    """Σ scalars[i]·tables[i] over [n, L] device tables in ONE program."""
    import jax.numpy as jnp
    import numpy as np

    from ..fields.spec import int_to_digits

    stacked = jnp.stack(tables, axis=0)  # [M, n, L]
    sc = jnp.asarray(
        np.stack([int_to_digits(spec.to_mont(int(s))) for s in scalars])
    )
    return _weighted_sum_jit(spec, stacked, sc)


import functools as _functools

import jax as _jax


@_functools.partial(_jax.jit, static_argnums=0)
def _weighted_sum_jit(spec, stacked, sc):
    # Scan over hypercube chunks: one flat [M, n] Montgomery multiply would
    # materialize [16, 16, M*n] digit-product temps (~13 GB at k=20 with the
    # HyperPlonk batch-open's ~12 active polys) and OOM the chip; a chunk
    # bounds the live temps at a few hundred MB regardless of k.
    import jax.numpy as jnp

    m, n, l_ = stacked.shape
    chunk = min(n, 1 << 15)

    def body(carry, i):
        x = _jax.lax.dynamic_slice_in_dim(stacked, i * chunk, chunk, axis=1)
        terms = limb._mont_mul_jax(spec, x, sc[:, None, :])
        return carry, limb._sum_reduce_jax(spec, terms)

    _, out = _jax.lax.scan(
        body, None, jnp.arange(n // chunk, dtype=jnp.int32)
    )
    return out.reshape(n, l_)


def batch_verify(
    pcs,
    vp,
    num_vars: int,
    comms: Sequence,
    points: Sequence[Sequence[Fp]],
    evals: Sequence[Evaluation],
    transcript: Keccak256Transcript,
) -> None:
    spec = transcript.spec
    ell = max(1, (len(evals) - 1).bit_length()) if len(evals) > 1 else 0
    t = transcript.squeeze_challenges(ell)
    eq_xt = eq_xy(spec, t).to_fps() if t else [Fp.one(spec)]

    tilde_gs_sum = Fp.zero(spec)
    for eval_, eq_xt_i in zip(evals, eq_xt):
        tilde_gs_sum = tilde_gs_sum + eval_.value * eq_xt_i

    g_prime_eval, challenges = ClassicSumCheck.coefficients().verify(
        spec, num_vars, 2, tilde_gs_sum, transcript
    )

    eq_xy_evals = [eq_xy_eval(challenges, list(p)) for p in points]
    scalars = [
        eq_xy_evals[eval_.point] * eq_xt_i
        for eval_, eq_xt_i in zip(evals, eq_xt)
    ]
    bases = [comms[eval_.poly] for eval_ in evals]
    g_prime_comm = pcs.combine_commitments(vp, scalars, bases)
    pcs.verify(vp, g_prime_comm, challenges, g_prime_eval, transcript)
