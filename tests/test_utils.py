"""Keccak256, transcript, and boolean-hypercube unit tests."""

import pytest

from plonkish_tpu.fields import BN254_FR, Fp
from plonkish_tpu.utils.bh import BooleanHypercube
from plonkish_tpu.utils.keccak import Keccak256, keccak256
from plonkish_tpu.utils.transcript import Keccak256Transcript

# Well-known Keccak-256 vectors (Ethereum-style Keccak, NOT SHA3-256).
KECCAK_VECTORS = {
    b"": "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470",
    b"abc": "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45",
    b"The quick brown fox jumps over the lazy dog":
        "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15",
}


@pytest.mark.parametrize("msg,digest", KECCAK_VECTORS.items())
def test_keccak256_vectors(msg, digest):
    assert keccak256(msg).hex() == digest


def test_keccak256_incremental_and_long():
    data = bytes(range(256)) * 3  # spans multiple rate blocks
    h = Keccak256()
    for i in range(0, len(data), 7):
        h.update(data[i:i + 7])
    assert h.digest() == keccak256(data)
    # finalize_reset returns digest and resets
    h2 = Keccak256()
    h2.update(b"abc")
    assert h2.finalize_reset() == keccak256(b"abc")
    assert h2.digest() == keccak256(b"")


def test_transcript_roundtrip():
    spec = BN254_FR
    t = Keccak256Transcript(spec)
    fes = [Fp(3, spec), Fp(spec.p - 1, spec), Fp(12345678901234567890, spec)]
    t.write_field_elements(fes)
    c1 = t.squeeze_challenge()
    t.write_field_element(c1 * c1)
    c2 = t.squeeze_challenges(3)
    proof = t.into_proof()
    assert len(proof) == 32 * 4

    r = Keccak256Transcript.from_proof(spec, proof)
    assert r.read_field_elements(3) == fes
    d1 = r.squeeze_challenge()
    assert d1 == c1
    assert r.read_field_element() == c1 * c1
    assert r.squeeze_challenges(3) == c2


def test_transcript_challenge_depends_on_absorbed():
    spec = BN254_FR
    t1, t2 = Keccak256Transcript(spec), Keccak256Transcript(spec)
    t1.common_field_element(Fp(1, spec))
    t2.common_field_element(Fp(2, spec))
    assert t1.squeeze_challenge() != t2.squeeze_challenge()
    # squeeze twice gives different challenges (state chained)
    t3 = Keccak256Transcript(spec)
    a, b = t3.squeeze_challenge(), t3.squeeze_challenge()
    assert a != b


@pytest.mark.parametrize("num_vars", range(1, 12))
def test_bh_iter_is_permutation(num_vars):
    bh = BooleanHypercube(num_vars)
    seen = sorted(bh.iter())
    assert seen == list(range(1 << num_vars))


@pytest.mark.parametrize("num_vars", [1, 2, 5, 8])
def test_bh_rotate_consistency(num_vars):
    bh = BooleanHypercube(num_vars)
    order = list(bh.iter())
    # next of order[i] is order[i+1] (for nonzero elements, cyclic)
    for i in range(1, len(order) - 1):
        assert bh.rotate(order[i], 1) == order[i + 1]
    assert bh.rotate(order[-1], 1) == order[1]
    # prev inverts next
    for b in range(1 << num_vars):
        assert bh.rotate(bh.rotate(b, 1), -1) == b
    # rotation_map vectorized matches scalar
    rm = bh.rotation_map(3)
    for b in range(1 << num_vars):
        assert rm[b] == bh.rotate(b, 3)
    rm = bh.rotation_map(-2)
    for b in range(1 << num_vars):
        assert rm[b] == bh.rotate(b, -2)


def test_bh_nth_map():
    bh = BooleanHypercube(4)
    order = list(bh.iter())
    for nth, b in enumerate(order):
        assert bh.nth_map[b] == nth
        assert bh.iter_array[nth] == b


def test_roofline_models():
    """Op-count models stay in sync with the kernels they describe
    (roofline.py documents the derivations)."""
    import random

    from plonkish_tpu import roofline
    from plonkish_tpu.backend.hyperplonk.preprocessor import compose
    from plonkish_tpu.curves.specs import BN254_G1
    from plonkish_tpu.fields import BN254_FR as spec
    from plonkish_tpu.fields.host import Fp
    from plonkish_tpu.models.circuits import rand_vanilla_plonk_circuit

    # MSM: n * windows * madd-2007-bl (7 mont-muls + 4 mont-sqrs)
    n = 1 << 18
    ops = roofline.msm_u32_mul_ops(BN254_G1, n)  # c=5 -> 52 windows
    assert ops == n * 52 * (7 * 648 + 4 * 528)
    # at the BENCH_r02 throughput the Pallas MSM sits ~36% of the u32 peak
    pct = roofline.roofline_pct(ops, n / 929301.7, "tpu")
    assert 30 < pct < 45
    assert roofline.roofline_pct(ops, 1.0, "cpu") is None

    ci, _ = rand_vanilla_plonk_circuit(
        spec, 4, random.Random(1), random.Random(2)
    )
    _, expr = compose(ci)
    ch = [Fp(i + 7, spec) for i in range(3)]
    muls = roofline.expression_mul_count(spec, expr, ch)
    assert 0 < muls < 100
    total = roofline.sumcheck_u32_mul_ops(spec, expr, 10, 13, ch)
    assert total == ((1 << 10) - 1) * (expr.degree() * muls + 13) * 648
    assert roofline.sumcheck_hbm_bytes(10, 13) == 13 * ((1 << 11) - 2) * 80
