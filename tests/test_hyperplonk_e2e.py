"""End-to-end HyperPlonk + Brakedown prove/verify round-trips
(mirrors reference backend.rs:202-241 run_plonkish_backend harness)."""

import random

import pytest

from plonkish_tpu.backend.hyperplonk import HyperPlonk
from plonkish_tpu.fields import BN254_FR
from plonkish_tpu.models.circuits import (
    rand_vanilla_plonk_circuit,
    rand_vanilla_plonk_with_lookup_circuit,
)
from plonkish_tpu.pcs.brakedown import MultilinearBrakedown
from plonkish_tpu.pcs.brakedown_code import BRAKEDOWN_SPEC_TEST
from plonkish_tpu.utils.transcript import Keccak256Transcript

SPEC = BN254_FR


def run_plonkish_backend(num_vars, circuit_fn):
    circuit_info, circuit = circuit_fn(num_vars)
    backend = HyperPlonk(MultilinearBrakedown(SPEC, BRAKEDOWN_SPEC_TEST))
    param = backend.setup(circuit_info, random.Random(0))
    pp, vp = backend.preprocess(param, circuit_info)

    transcript = Keccak256Transcript(SPEC)
    backend.prove(pp, circuit, transcript)
    proof = transcript.into_proof()

    reader = Keccak256Transcript.from_proof(SPEC, proof)
    backend.verify(vp, circuit.instances(), reader)
    return proof


@pytest.mark.parametrize("num_vars", [2, 3, 5, 9])
def test_vanilla_plonk(num_vars):
    run_plonkish_backend(
        num_vars,
        lambda nv: rand_vanilla_plonk_circuit(
            SPEC, nv, random.Random(1), random.Random(2)
        ),
    )


@pytest.mark.parametrize("num_vars", [2, 3, 5, 9])
def test_vanilla_plonk_with_lookup(num_vars):
    run_plonkish_backend(
        num_vars,
        lambda nv: rand_vanilla_plonk_with_lookup_circuit(
            SPEC, nv, random.Random(3), random.Random(4)
        ),
    )


@pytest.mark.parametrize(
    "num_vars", [12, pytest.param(14, marks=pytest.mark.slow),
                 pytest.param(16, marks=pytest.mark.slow)]
)
def test_vanilla_plonk_with_lookup_large_kzg(num_vars):
    """Large-k coverage past the chunking/fold thresholds (the reference
    harness runs k=2..16, backend/hyperplonk.rs:398-426; KZG here because
    Brakedown's verifier hashing dominates at these sizes)."""
    from plonkish_tpu.pcs.kzg import MultilinearKzg

    circuit_info, circuit = rand_vanilla_plonk_with_lookup_circuit(
        SPEC, num_vars, random.Random(7), random.Random(8)
    )
    backend = HyperPlonk(MultilinearKzg())
    param = backend.setup(circuit_info, random.Random(0))
    pp, vp = backend.preprocess(param, circuit_info)
    transcript = Keccak256Transcript(SPEC)
    backend.prove(pp, circuit, transcript)
    reader = Keccak256Transcript.from_proof(SPEC, transcript.into_proof())
    backend.verify(vp, circuit.instances(), reader)


def test_corrupted_proof_rejected():
    circuit_info, circuit = rand_vanilla_plonk_circuit(
        SPEC, 3, random.Random(5), random.Random(6)
    )
    backend = HyperPlonk(MultilinearBrakedown(SPEC, BRAKEDOWN_SPEC_TEST))
    param = backend.setup(circuit_info, random.Random(0))
    pp, vp = backend.preprocess(param, circuit_info)
    transcript = Keccak256Transcript(SPEC)
    backend.prove(pp, circuit, transcript)
    proof = bytearray(transcript.into_proof())
    proof[len(proof) // 2] ^= 1
    reader = Keccak256Transcript.from_proof(SPEC, bytes(proof))
    with pytest.raises((ValueError, AssertionError, EOFError)):
        backend.verify(vp, circuit.instances(), reader)


@pytest.mark.parametrize(
    "num_vars",
    [2, 9, 12, pytest.param(16, marks=pytest.mark.slow)],
)
@pytest.mark.parametrize(
    "pcs_name", ["kzg", "gemini", "zeromorph", "ipa", "hyrax"]
)
def test_hyperplonk_all_pcs(pcs_name, num_vars):
    """HyperPlonk over every curve-based PCS at sampled reference sizes
    (the reference matrix runs k=2..16 per scheme,
    backend/hyperplonk.rs:398-426) — k>=12 crosses the chunking/fold
    thresholds the single-size round-trip missed (VERDICT r03 item 6)."""
    from plonkish_tpu.pcs.gemini import Gemini
    from plonkish_tpu.pcs.hyrax import MultilinearHyrax
    from plonkish_tpu.pcs.ipa import MultilinearIpa
    from plonkish_tpu.pcs.kzg import MultilinearKzg
    from plonkish_tpu.pcs.zeromorph import Zeromorph

    if pcs_name == "hyrax" and num_vars < 4:
        # the reference asserts batch_size <= poly_size (hyrax.rs:123);
        # the vanilla circuit's 12 committed columns need 2^k >= 12
        pytest.skip("hyrax: batch_size <= poly_size (hyrax.rs:123)")
    pcs = {
        "kzg": lambda: MultilinearKzg(),
        "gemini": lambda: Gemini(),
        "zeromorph": lambda: Zeromorph(),
        "ipa": lambda: MultilinearIpa(),
        "hyrax": lambda: MultilinearHyrax(),
    }[pcs_name]()
    spec = pcs.field_spec
    circuit_info, circuit = rand_vanilla_plonk_circuit(
        spec, num_vars, random.Random(9), random.Random(10)
    )
    backend = HyperPlonk(pcs)
    param = backend.setup(circuit_info, random.Random(0))
    pp, vp = backend.preprocess(param, circuit_info)
    transcript = Keccak256Transcript(spec)
    backend.prove(pp, circuit, transcript)
    reader = Keccak256Transcript.from_proof(spec, transcript.into_proof())
    backend.verify(vp, circuit.instances(), reader)
