"""Univariate (halo2-style) PLONK backend round trip on the same vanilla
circuits the HyperPlonk backend proves (BASELINE config: "Halo2 backend
vanilla_plonk, univariate KZG (quotient + FFT path)")."""

import random

import pytest

from plonkish_tpu.backend.univariate import UnivariatePlonk
from plonkish_tpu.fields import BN254_FR
from plonkish_tpu.fields.host import Fp
from plonkish_tpu.models.circuits import rand_vanilla_plonk_circuit
from plonkish_tpu.utils.transcript import Keccak256Transcript

SPEC = BN254_FR


def run(num_vars, seed=0):
    info, circuit = rand_vanilla_plonk_circuit(
        SPEC, num_vars, random.Random(42 + seed), random.Random(4242 + seed)
    )
    backend = UnivariatePlonk()
    param = backend.setup(info, random.Random(0))
    pp, vp = backend.preprocess(param, info)
    tr = Keccak256Transcript(SPEC)
    backend.prove(pp, circuit, tr)
    proof = tr.into_proof()
    backend.verify(
        vp, circuit.instances(), Keccak256Transcript.from_proof(SPEC, proof)
    )
    return vp, circuit, proof


@pytest.mark.parametrize("num_vars", [3, 5, 7])
def test_univariate_plonk_round_trip(num_vars):
    run(num_vars, seed=num_vars)


def test_univariate_plonk_rejects_tampered_instance():
    vp, circuit, proof = run(4)
    backend = UnivariatePlonk()
    bad = [list(circuit.instances()[0])]
    bad[0][0] = bad[0][0] + Fp(1, SPEC)
    with pytest.raises(Exception):
        backend.verify(vp, bad, Keccak256Transcript.from_proof(SPEC, proof))


def test_univariate_plonk_rejects_corrupt_proof():
    vp, circuit, proof = run(4)
    backend = UnivariatePlonk()
    bad = bytearray(proof)
    bad[len(bad) // 3] ^= 1
    with pytest.raises(Exception):
        backend.verify(
            vp, circuit.instances(),
            Keccak256Transcript.from_proof(SPEC, bytes(bad)),
        )
