"""PCS round-trips (mirrors reference pcs/multilinear.rs:293-406 harness)."""

import random

import pytest

from plonkish_tpu.backend.pcs_api import Evaluation
from plonkish_tpu.fields import BN254_FR, Fp
from plonkish_tpu.pcs.brakedown import MultilinearBrakedown
from plonkish_tpu.pcs.brakedown_code import BRAKEDOWN_SPEC_TEST
from plonkish_tpu.pcs.kzg import MultilinearKzg
from plonkish_tpu.poly.multilinear import MLPoly
from plonkish_tpu.utils.transcript import Keccak256Transcript

SPEC = BN254_FR
RNG = random.Random(31337)


def rand_poly(num_vars, spec=SPEC):
    return MLPoly.from_fps(
        spec, [Fp(RNG.randrange(spec.p), spec) for _ in range(1 << num_vars)]
    )


def run_commit_open_verify(pcs, num_vars):
    spec = getattr(pcs, "field_spec", SPEC)
    param = pcs.setup(1 << num_vars, 1, random.Random(7))
    pp, vp = pcs.trim(param, 1 << num_vars, 1)

    t = Keccak256Transcript(spec)
    poly = rand_poly(num_vars, spec)
    comm = pcs.commit_and_write(pp, poly, t)
    point = t.squeeze_challenges(num_vars)
    eval_ = poly.evaluate(point)
    t.write_field_element(eval_)
    pcs.open(pp, poly, comm, point, eval_, t)
    proof = t.into_proof()

    r = Keccak256Transcript.from_proof(spec, proof)
    comm = pcs.read_commitments(vp, 1, r)[0]
    point = r.squeeze_challenges(num_vars)
    eval_ = r.read_field_element()
    pcs.verify(vp, comm, point, eval_, r)


def run_batch_commit_open_verify(pcs, num_vars, batch_size=4):
    spec = getattr(pcs, "field_spec", SPEC)
    num_points = batch_size >> 1
    param = pcs.setup(1 << num_vars, batch_size, random.Random(7))
    pp, vp = pcs.trim(param, 1 << num_vars, batch_size)

    pairs = list(
        dict.fromkeys(
            [(0, pt) for pt in range(num_points)]
            + [(poly, 0) for poly in range(batch_size)]
            + [
                (RNG.randrange(batch_size), RNG.randrange(num_points))
                for _ in range(batch_size)
            ]
        )
    )

    t = Keccak256Transcript(spec)
    polys = [rand_poly(num_vars, spec) for _ in range(batch_size)]
    comms = pcs.batch_commit_and_write(pp, polys, t)
    points = [t.squeeze_challenges(num_vars) for _ in range(num_points)]
    evals = [
        Evaluation(poly, pt, polys[poly].evaluate(points[pt]))
        for (poly, pt) in pairs
    ]
    t.write_field_elements([e.value for e in evals])
    pcs.batch_open(pp, polys, comms, points, evals, t)
    proof = t.into_proof()

    r = Keccak256Transcript.from_proof(spec, proof)
    comms = pcs.read_commitments(vp, batch_size, r)
    points = [r.squeeze_challenges(num_vars) for _ in range(num_points)]
    read_evals = [
        Evaluation(poly, pt, v)
        for (poly, pt), v in zip(pairs, r.read_field_elements(len(pairs)))
    ]
    pcs.batch_verify(vp, comms, points, read_evals, r)


@pytest.mark.parametrize("num_vars", [3, 5, 10])
def test_brakedown_commit_open_verify(num_vars):
    run_commit_open_verify(
        MultilinearBrakedown(SPEC, BRAKEDOWN_SPEC_TEST), num_vars
    )


@pytest.mark.parametrize("num_vars", [3, 5, 12, 16])
def test_kzg_commit_open_verify(num_vars):
    run_commit_open_verify(MultilinearKzg(), num_vars)


# reference batch matrix runs k=3..16 (pcs/multilinear.rs:293-406);
# sample through the chunking thresholds, largest in the slow tier
@pytest.mark.parametrize(
    "num_vars", [3, 4, 12, pytest.param(16, marks=pytest.mark.slow)]
)
def test_kzg_batch_commit_open_verify(num_vars):
    run_batch_commit_open_verify(MultilinearKzg(), num_vars)


@pytest.mark.parametrize(
    "num_vars", [3, 10, pytest.param(16, marks=pytest.mark.slow)]
)
def test_brakedown_batch_commit_open_verify(num_vars):
    run_batch_commit_open_verify(
        MultilinearBrakedown(SPEC, BRAKEDOWN_SPEC_TEST), num_vars
    )


def test_kzg_bad_eval_rejected():
    pcs = MultilinearKzg()
    num_vars = 3
    param = pcs.setup(1 << num_vars, 1, random.Random(7))
    pp, vp = pcs.trim(param, 1 << num_vars, 1)
    t = Keccak256Transcript(SPEC)
    poly = rand_poly(num_vars)
    comm = pcs.commit_and_write(pp, poly, t)
    point = t.squeeze_challenges(num_vars)
    eval_ = poly.evaluate(point) + Fp.one(SPEC)  # WRONG
    t.write_field_element(eval_)
    pcs.open(pp, poly, comm, point, poly.evaluate(point), t)
    proof = t.into_proof()
    r = Keccak256Transcript.from_proof(SPEC, proof)
    comm = pcs.read_commitments(vp, 1, r)[0]
    point = r.squeeze_challenges(num_vars)
    bad_eval = r.read_field_element()
    with pytest.raises(ValueError):
        pcs.verify(vp, comm, point, bad_eval, r)


# ---------------------------------------------------------------------------
# Univariate KZG + the multilinear-via-univariate schemes
# ---------------------------------------------------------------------------

def test_univariate_kzg_commit_open_verify():
    import random as _r

    from plonkish_tpu.pcs.univariate_kzg import UnivariateKzg
    from plonkish_tpu.poly.univariate import UniPoly

    pcs = UnivariateKzg()
    for k in (3, 5):
        n = 1 << k
        param = pcs.setup(n, 1, random.Random(7))
        pp, vp = pcs.trim(param, n, 1)
        t = Keccak256Transcript(SPEC)
        poly = UniPoly(SPEC, [Fp(RNG.randrange(SPEC.p), SPEC) for _ in range(n)])
        comm = pcs.commit_and_write(pp, poly, t)
        point = t.squeeze_challenge()
        eval_ = poly.evaluate(point)
        t.write_field_element(eval_)
        pcs.open(pp, poly, comm, point, eval_, t)
        proof = t.into_proof()
        r = Keccak256Transcript.from_proof(SPEC, proof)
        comm = pcs.read_commitments(vp, 1, r)[0]
        point = r.squeeze_challenge()
        eval_ = r.read_field_element()
        pcs.verify(vp, comm, point, eval_, r)


def test_univariate_kzg_batch():
    from plonkish_tpu.pcs.univariate_kzg import UnivariateKzg
    from plonkish_tpu.poly.univariate import UniPoly

    pcs = UnivariateKzg()
    k, batch, num_points = 4, 4, 2
    n = 1 << k
    param = pcs.setup(n, batch, random.Random(3))
    pp, vp = pcs.trim(param, n, batch)
    t = Keccak256Transcript(SPEC)
    polys = [
        UniPoly(SPEC, [Fp(RNG.randrange(SPEC.p), SPEC) for _ in range(n)])
        for _ in range(batch)
    ]
    comms = pcs.batch_commit_and_write(pp, polys, t)
    points = t.squeeze_challenges(num_points)
    pairs = [(0, 0), (0, 1), (1, 0), (2, 1), (3, 0), (3, 1)]
    evals = [
        Evaluation(p, pt, polys[p].evaluate(points[pt])) for (p, pt) in pairs
    ]
    t.write_field_elements([e.value for e in evals])
    pcs.batch_open(pp, polys, comms, points, evals, t)
    proof = t.into_proof()
    r = Keccak256Transcript.from_proof(SPEC, proof)
    comms = pcs.read_commitments(vp, batch, r)
    points = r.squeeze_challenges(num_points)
    evals = [
        Evaluation(p, pt, v)
        for (p, pt), v in zip(pairs, r.read_field_elements(len(pairs)))
    ]
    pcs.batch_verify(vp, comms, points, evals, r)


@pytest.mark.parametrize("num_vars", [2, 3, 4, 10, 14])
def test_gemini_commit_open_verify(num_vars):
    from plonkish_tpu.pcs.gemini import Gemini

    run_commit_open_verify(Gemini(), num_vars)


def test_gemini_batch():
    from plonkish_tpu.pcs.gemini import Gemini

    run_batch_commit_open_verify(Gemini(), 3)


@pytest.mark.parametrize("num_vars", [2, 3, 4, 10])
def test_zeromorph_commit_open_verify(num_vars):
    from plonkish_tpu.pcs.zeromorph import Zeromorph

    run_commit_open_verify(Zeromorph(), num_vars)


def test_zeromorph_batch():
    from plonkish_tpu.pcs.zeromorph import Zeromorph

    run_batch_commit_open_verify(Zeromorph(), 3)


@pytest.mark.parametrize(
    "num_vars", [2, 4, 10, pytest.param(14, marks=pytest.mark.slow)]
)
def test_ipa_commit_open_verify(num_vars):
    from plonkish_tpu.pcs.ipa import MultilinearIpa

    run_commit_open_verify(MultilinearIpa(), num_vars)


def test_ipa_batch():
    from plonkish_tpu.pcs.ipa import MultilinearIpa

    run_batch_commit_open_verify(MultilinearIpa(), 3)


@pytest.mark.parametrize(
    "num_vars", [5, 6, 10, pytest.param(14, marks=pytest.mark.slow)]
)
def test_hyrax_commit_open_verify(num_vars):
    from plonkish_tpu.pcs.hyrax import MultilinearHyrax

    run_commit_open_verify(MultilinearHyrax(), num_vars)


def test_hyrax_batch():
    from plonkish_tpu.pcs.hyrax import MultilinearHyrax

    run_batch_commit_open_verify(MultilinearHyrax(), 5)
