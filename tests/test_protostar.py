"""Protostar/Sangria accumulation round-trips (mirrors reference
accumulation.rs:189-261 harness: fold 3 circuits then decide+verify)."""

import random

import pytest

from plonkish_tpu.accumulation.protostar import (
    Protostar,
    ProtostarStrategy,
    Sangria,
)
from plonkish_tpu.fields import BN254_FR
from plonkish_tpu.models.circuits import (
    rand_vanilla_plonk_circuit,
    rand_vanilla_plonk_with_lookup_circuit,
)
from plonkish_tpu.pcs.kzg import MultilinearKzg
from plonkish_tpu.utils.transcript import Keccak256Transcript

SPEC = BN254_FR


def run_accumulation_scheme(scheme, num_vars, circuit_fn, num_circuits=3):
    spec = scheme.pcs.field_spec
    # same structure (fixed preprocess seed), different witnesses
    circuit_info, _ = circuit_fn(spec, num_vars, 0)
    circuits = [circuit_fn(spec, num_vars, 100 + i)[1] for i in range(num_circuits)]

    param = scheme.setup(circuit_info, random.Random(0))
    pp, vp = scheme.preprocess(param, circuit_info)

    accumulator = scheme.init_accumulator(pp)
    for circuit in circuits[:-1]:
        scheme.prove_accumulation_from_nark(
            pp, accumulator, circuit, Keccak256Transcript(spec)
        )

    accumulator_before_last = accumulator.instance.clone()

    t = Keccak256Transcript(spec)
    scheme.prove_decider_with_last_nark(pp, accumulator, circuits[-1], t)
    proof = t.into_proof()

    r = Keccak256Transcript.from_proof(spec, proof)
    scheme.verify_decider_with_last_nark(
        vp, accumulator_before_last, circuits[-1].instances(), r
    )


def vanilla_fn(spec, num_vars, witness_seed):
    return rand_vanilla_plonk_circuit(
        spec, num_vars, random.Random(42), random.Random(witness_seed)
    )


def lookup_fn(spec, num_vars, witness_seed):
    return rand_vanilla_plonk_with_lookup_circuit(
        spec, num_vars, random.Random(42), random.Random(witness_seed)
    )


@pytest.mark.parametrize("num_vars", [3, 5])
def test_protostar_vanilla_plonk(num_vars):
    run_accumulation_scheme(Protostar(MultilinearKzg()), num_vars, vanilla_fn)


@pytest.mark.parametrize("num_vars", [3, 5])
def test_protostar_vanilla_plonk_with_lookup(num_vars):
    run_accumulation_scheme(Protostar(MultilinearKzg()), num_vars, lookup_fn)


def test_sangria_vanilla_plonk():
    run_accumulation_scheme(Sangria(MultilinearKzg()), 4, vanilla_fn)


def test_sangria_vanilla_plonk_with_lookup():
    run_accumulation_scheme(Sangria(MultilinearKzg()), 4, lookup_fn)


def test_accumulator_checkpoint_resume():
    """Fold one step, checkpoint the accumulator, resume in a new object,
    continue folding + decide (the reference's IVC checkpoint story:
    protostar.rs:179-187 Serialize)."""
    from plonkish_tpu.utils import serde

    scheme = Protostar(MultilinearKzg())
    spec = scheme.pcs.field_spec
    circuit_info, _ = vanilla_fn(spec, 3, 0)
    circuits = [vanilla_fn(spec, 3, 100 + i)[1] for i in range(3)]
    param = scheme.setup(circuit_info, random.Random(0))
    pp, vp = scheme.preprocess(param, circuit_info)

    acc = scheme.init_accumulator(pp)
    scheme.prove_accumulation_from_nark(
        pp, acc, circuits[0], Keccak256Transcript(spec)
    )
    blob = serde.save(acc)
    acc2 = serde.load(blob)

    scheme.prove_accumulation_from_nark(
        pp, acc2, circuits[1], Keccak256Transcript(spec)
    )
    before_last = acc2.instance.clone()
    t = Keccak256Transcript(spec)
    scheme.prove_decider_with_last_nark(pp, acc2, circuits[2], t)
    r = Keccak256Transcript.from_proof(spec, t.into_proof())
    scheme.verify_decider_with_last_nark(
        vp, before_last, circuits[2].instances(), r
    )


@pytest.mark.parametrize("pcs_name", ["ipa", "gemini", "zeromorph"])
def test_protostar_other_pcs(pcs_name):
    """Protostar over the reference's PCS matrix
    (protostar/hyperplonk.rs:650-653)."""
    from plonkish_tpu.pcs.gemini import Gemini
    from plonkish_tpu.pcs.ipa import MultilinearIpa
    from plonkish_tpu.pcs.zeromorph import Zeromorph

    pcs = {
        "ipa": MultilinearIpa,
        "gemini": Gemini,
        "zeromorph": Zeromorph,
    }[pcs_name]()
    run_accumulation_scheme(Protostar(pcs), 4, vanilla_fn)


@pytest.mark.skipif(
    __import__("os").environ.get("PLONKISH_TPU_SLOW") != "1",
    reason="slow: sha256 IVC folding (set PLONKISH_TPU_SLOW=1)",
)
def test_protostar_folds_sha256_circuit():
    """IVC-style folding of a real circuit: accumulate three SHA-256
    compression proofs (same structure, different messages) then decide —
    the reference's aggregation workload realized through folding."""
    from plonkish_tpu.models.sha256 import sha256_circuit

    def sha_fn(spec, num_vars, witness_seed):
        msg = bytes([witness_seed & 0xFF]) * 20
        info, circuit, _ = sha256_circuit(msg, k=num_vars, spec=spec)
        return info, circuit

    run_accumulation_scheme(Protostar(MultilinearKzg()), 8, sha_fn)
