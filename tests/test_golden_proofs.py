"""Frozen self-golden proof fixtures.

The reference tests only via prove->verify round-trips; a transcript-format
regression that changes prover and verifier symmetrically (byte order, point
encoding, challenge schedule) would pass them all (SURVEY §4 "add what the
reference lacks").  These tests freeze proof bytes for fixed seeds and
assert byte-equality against committed fixtures.

Regenerate (after an INTENDED protocol change) with:
    PLONKISH_TPU_REGEN_GOLDEN=1 python -m pytest tests/test_golden_proofs.py
then commit the new tests/golden/*.bin and call out the format break.
"""

import hashlib
import os
import pathlib
import random

import pytest

from plonkish_tpu.backend.hyperplonk import HyperPlonk
from plonkish_tpu.fields import BN254_FR
from plonkish_tpu.models.circuits import rand_vanilla_plonk_circuit
from plonkish_tpu.utils.transcript import Keccak256Transcript

SPEC = BN254_FR
GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
REGEN = os.environ.get("PLONKISH_TPU_REGEN_GOLDEN") == "1"


def _check_golden(name: str, proof: bytes):
    path = GOLDEN_DIR / f"{name}.bin"
    if REGEN or not path.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        path.write_bytes(proof)
        if not REGEN:
            pytest.fail(
                f"golden fixture {path} was missing; generated it — "
                "commit the file and re-run"
            )
        return
    want = path.read_bytes()
    assert proof == want, (
        f"proof bytes diverge from frozen fixture {name} "
        f"(got {len(proof)}B sha256={hashlib.sha256(proof).hexdigest()[:16]}, "
        f"want {len(want)}B sha256={hashlib.sha256(want).hexdigest()[:16]}); "
        "if the transcript format change is intended, regenerate with "
        "PLONKISH_TPU_REGEN_GOLDEN=1 and commit"
    )


def _hyperplonk_proof(pcs, num_vars: int) -> bytes:
    circuit_info, circuit = rand_vanilla_plonk_circuit(
        SPEC, num_vars, random.Random(1), random.Random(2)
    )
    backend = HyperPlonk(pcs)
    param = backend.setup(circuit_info, random.Random(0))
    pp, vp = backend.preprocess(param, circuit_info)
    transcript = Keccak256Transcript(SPEC)
    backend.prove(pp, circuit, transcript)
    proof = transcript.into_proof()
    # the fixture must describe a VALID proof
    reader = Keccak256Transcript.from_proof(SPEC, proof)
    backend.verify(vp, circuit.instances(), reader)
    return proof


@pytest.mark.parametrize("num_vars", [3, 5])
def test_golden_hyperplonk_brakedown(num_vars):
    from plonkish_tpu.pcs.brakedown import MultilinearBrakedown
    from plonkish_tpu.pcs.brakedown_code import BRAKEDOWN_SPEC_TEST

    proof = _hyperplonk_proof(
        MultilinearBrakedown(SPEC, BRAKEDOWN_SPEC_TEST), num_vars
    )
    _check_golden(f"hyperplonk_brakedown_k{num_vars}", proof)


@pytest.mark.parametrize("num_vars", [3, 5])
def test_golden_hyperplonk_kzg(num_vars):
    from plonkish_tpu.pcs.kzg import MultilinearKzg

    proof = _hyperplonk_proof(MultilinearKzg(), num_vars)
    _check_golden(f"hyperplonk_kzg_k{num_vars}", proof)


def test_golden_protostar_decider():
    from plonkish_tpu.accumulation.protostar import Protostar
    from plonkish_tpu.pcs.kzg import MultilinearKzg

    scheme = Protostar(MultilinearKzg())
    num_vars = 3
    circuit_info, _ = rand_vanilla_plonk_circuit(
        SPEC, num_vars, random.Random(42), random.Random(0)
    )
    circuits = [
        rand_vanilla_plonk_circuit(
            SPEC, num_vars, random.Random(42), random.Random(100 + i)
        )[1]
        for i in range(3)
    ]
    param = scheme.setup(circuit_info, random.Random(0))
    pp, vp = scheme.preprocess(param, circuit_info)
    accumulator = scheme.init_accumulator(pp)
    for circuit in circuits[:-1]:
        scheme.prove_accumulation_from_nark(
            pp, accumulator, circuit, Keccak256Transcript(SPEC)
        )
    acc_before_last = accumulator.instance.clone()
    t = Keccak256Transcript(SPEC)
    scheme.prove_decider_with_last_nark(pp, accumulator, circuits[-1], t)
    proof = t.into_proof()
    r = Keccak256Transcript.from_proof(SPEC, proof)
    scheme.verify_decider_with_last_nark(
        vp, acc_before_last, circuits[-1].instances(), r
    )
    _check_golden("protostar_kzg_decider_k3", proof)


def _hyperplonk_proof_for(pcs, num_vars: int, circuit_fn) -> bytes:
    spec = pcs.field_spec
    circuit_info, circuit = circuit_fn(
        spec, num_vars, random.Random(1), random.Random(2)
    )
    backend = HyperPlonk(pcs)
    param = backend.setup(circuit_info, random.Random(0))
    pp, vp = backend.preprocess(param, circuit_info)
    transcript = Keccak256Transcript(spec)
    backend.prove(pp, circuit, transcript)
    proof = transcript.into_proof()
    reader = Keccak256Transcript.from_proof(spec, proof)
    backend.verify(vp, circuit.instances(), reader)
    return proof


@pytest.mark.parametrize("pcs_name", ["ipa", "hyrax", "gemini", "zeromorph"])
def test_golden_hyperplonk_remaining_pcs(pcs_name):
    """Freeze the proof byte format of every PCS the r03 fixtures left
    uncovered (VERDICT r03 missing #5) — the fixtures are the only defense
    of the transcript format absent a Rust toolchain for cross-checks."""
    from plonkish_tpu.pcs.gemini import Gemini
    from plonkish_tpu.pcs.hyrax import MultilinearHyrax
    from plonkish_tpu.pcs.ipa import MultilinearIpa
    from plonkish_tpu.pcs.zeromorph import Zeromorph

    pcs = {
        "ipa": MultilinearIpa, "hyrax": MultilinearHyrax,
        "gemini": Gemini, "zeromorph": Zeromorph,
    }[pcs_name]()
    proof = _hyperplonk_proof_for(pcs, 5, rand_vanilla_plonk_circuit)
    _check_golden(f"hyperplonk_{pcs_name}_k5", proof)


def test_golden_hyperplonk_kzg_lookup():
    """Freeze the lookup (logUp) transcript segment — m/h commitments and
    the lookup sum-check were not pinned by any fixture."""
    from plonkish_tpu.models.circuits import (
        rand_vanilla_plonk_with_lookup_circuit,
    )
    from plonkish_tpu.pcs.kzg import MultilinearKzg

    proof = _hyperplonk_proof_for(
        MultilinearKzg(), 5, rand_vanilla_plonk_with_lookup_circuit
    )
    _check_golden("hyperplonk_kzg_lookup_k5", proof)
