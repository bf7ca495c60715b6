"""SHA-256 circuit tests (reference benchmark/src/halo2/circuit.rs:389-479).

The bit-decomposed SHA-256 circuit must (a) witness-satisfy all gates, (b)
prove+verify end-to-end with the digest as public input, (c) chain multiple
blocks (full padding semantics), and (d) reject a tampered digest.
"""

import hashlib
import random

import pytest

from plonkish_tpu.backend.circuit import MockCircuit
from plonkish_tpu.backend.hyperplonk import HyperPlonk
from plonkish_tpu.fields.host import Fp
from plonkish_tpu.models.sha256 import message_for_blocks, sha256_circuit
from plonkish_tpu.pcs.kzg import MultilinearKzg
from plonkish_tpu.fields import BN254_FR
from plonkish_tpu.utils.transcript import Keccak256Transcript


def _assert_satisfied(info, circuit):
    """Evaluate every constraint on the real witness over the whole
    hypercube (fast vector check; no proving)."""
    from plonkish_tpu.backend.hyperplonk.prover import instance_polys
    from plonkish_tpu.piop.evaluator import evaluate_on_hypercube
    from plonkish_tpu.poly.multilinear import MLPoly
    from plonkish_tpu.fields import limb

    spec = info.field_spec
    polys = [
        p.evals
        for p in instance_polys(spec, info.k, circuit.instances())
    ]
    polys += [
        MLPoly.from_fps(spec, col).evals for col in info.preprocess_polys
    ]
    polys += [
        MLPoly.from_fps(spec, col).evals for col in circuit.synthesize(0, [])
    ]
    for i, expr in enumerate(info.constraints):
        vals = evaluate_on_hypercube(spec, expr, info.k, polys, [])
        assert bool(limb.is_zero(vals).all()), f"constraint {i} unsatisfied"


def test_sha256_witness_satisfies_constraints():
    msg = b"abc"
    info, circuit, digest = sha256_circuit(msg)
    assert digest == hashlib.sha256(msg).digest()
    _assert_satisfied(info, circuit)


def test_sha256_two_blocks_witness_satisfies():
    msg = message_for_blocks(2, seed=3)
    info, circuit, digest = sha256_circuit(msg)
    assert digest == hashlib.sha256(msg).digest()
    _assert_satisfied(info, circuit)


def test_sha256_one_block_proves():
    msg = b"abc"
    info, circuit, digest = sha256_circuit(msg)
    assert digest == hashlib.sha256(msg).digest()

    pcs = MultilinearKzg()
    backend = HyperPlonk(pcs)
    param = backend.setup(info, random.Random(7))
    pp, vp = backend.preprocess(param, info)
    tx = Keccak256Transcript(BN254_FR)
    backend.prove(pp, circuit, tx)
    proof = tx.into_proof()
    tv = Keccak256Transcript.from_proof(BN254_FR, proof)
    backend.verify(vp, circuit.instances(), tv)


@pytest.mark.skipif(
    __import__("os").environ.get("PLONKISH_TPU_SLOW") != "1",
    reason="slow: full prove (set PLONKISH_TPU_SLOW=1)",
)
def test_sha256_two_blocks_chained():
    msg = message_for_blocks(2, seed=3)
    info, circuit, digest = sha256_circuit(msg)
    assert digest == hashlib.sha256(msg).digest()

    pcs = MultilinearKzg()
    backend = HyperPlonk(pcs)
    param = backend.setup(info, random.Random(7))
    pp, vp = backend.preprocess(param, info)
    tx = Keccak256Transcript(BN254_FR)
    backend.prove(pp, circuit, tx)
    proof = tx.into_proof()
    tv = Keccak256Transcript.from_proof(BN254_FR, proof)
    backend.verify(vp, circuit.instances(), tv)


def test_sha256_rejects_wrong_digest():
    msg = b"tamper me"
    info, circuit, digest = sha256_circuit(msg)
    pcs = MultilinearKzg()
    backend = HyperPlonk(pcs)
    param = backend.setup(info, random.Random(7))
    pp, vp = backend.preprocess(param, info)
    tx = Keccak256Transcript(BN254_FR)
    backend.prove(pp, circuit, tx)
    proof = tx.into_proof()

    bad = [list(circuit.instances()[0])]
    bad[0][0] = bad[0][0] + Fp(1, BN254_FR)
    tv = Keccak256Transcript.from_proof(BN254_FR, proof)
    with pytest.raises(Exception):
        backend.verify(vp, bad, tv)
