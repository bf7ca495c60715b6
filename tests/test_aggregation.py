"""Aggregation-shaped bench circuit (models/aggregation.py): the in-circuit
EC double-and-add ladder matching the reference's default bench workload
(benchmark/src/halo2/circuit.rs:4-387).  Must both prove under HyperPlonk
and fold under Protostar (VERDICT r1 item 5)."""

import random

import pytest

from plonkish_tpu.backend.hyperplonk import HyperPlonk
from plonkish_tpu.fields import BN254_FR
from plonkish_tpu.models.aggregation import rand_aggregation_circuit
from plonkish_tpu.pcs.brakedown import MultilinearBrakedown
from plonkish_tpu.pcs.brakedown_code import BRAKEDOWN_SPEC_TEST
from plonkish_tpu.utils.transcript import Keccak256Transcript

SPEC = BN254_FR


def test_aggregation_hyperplonk_roundtrip():
    k = 6
    circuit_info, circuit = rand_aggregation_circuit(
        SPEC, k, random.Random(1), random.Random(2)
    )
    backend = HyperPlonk(MultilinearBrakedown(SPEC, BRAKEDOWN_SPEC_TEST))
    param = backend.setup(circuit_info, random.Random(0))
    pp, vp = backend.preprocess(param, circuit_info)
    t = Keccak256Transcript(SPEC)
    backend.prove(pp, circuit, t)
    proof = t.into_proof()
    r = Keccak256Transcript.from_proof(SPEC, proof)
    backend.verify(vp, circuit.instances(), r)


def test_aggregation_rejects_tampered_witness():
    k = 5
    circuit_info, circuit = rand_aggregation_circuit(
        SPEC, k, random.Random(3), random.Random(4)
    )
    # corrupt one ladder output -> the chained EC constraint must fail
    from plonkish_tpu.fields.host import Fp

    circuit._witnesses[2][3] = circuit._witnesses[2][3] + Fp.one(SPEC)
    backend = HyperPlonk(MultilinearBrakedown(SPEC, BRAKEDOWN_SPEC_TEST))
    param = backend.setup(circuit_info, random.Random(0))
    pp, vp = backend.preprocess(param, circuit_info)
    t = Keccak256Transcript(SPEC)
    backend.prove(pp, circuit, t)
    proof = t.into_proof()
    r = Keccak256Transcript.from_proof(SPEC, proof)
    with pytest.raises(ValueError):
        backend.verify(vp, circuit.instances(), r)


def test_aggregation_protostar_fold():
    # folding needs an ADDITIVE PCS (the accumulator RLC combines witness
    # commitments; reference protostar tests run Gemini/Hyrax/IPA/KZG)
    from plonkish_tpu.accumulation.protostar import Protostar
    from plonkish_tpu.pcs.kzg import MultilinearKzg

    k = 5
    circuit_info, _ = rand_aggregation_circuit(
        SPEC, k, random.Random(5), random.Random(6)
    )
    scheme = Protostar(MultilinearKzg())
    param = scheme.setup(circuit_info, random.Random(0))
    pp, vp = scheme.preprocess(param, circuit_info)
    acc = scheme.init_accumulator(pp)
    for i in range(2):
        _, circuit = rand_aggregation_circuit(
            SPEC, k, random.Random(5), random.Random(100 + i)
        )
        scheme.prove_accumulation_from_nark(
            pp, acc, circuit, Keccak256Transcript(SPEC)
        )
    t = Keccak256Transcript(SPEC)
    scheme.prove_decider(pp, acc, t)
    proof = t.into_proof()
    scheme.verify_decider(
        vp, acc.instance, Keccak256Transcript.from_proof(SPEC, proof)
    )
