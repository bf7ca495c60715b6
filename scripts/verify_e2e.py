"""Package-boundary verification drive (.claude/skills/verify recipe):
setup -> preprocess -> prove -> verify round-trip on the public API plus
rejection probes (flipped byte / truncated proof / wrong instances)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("PLONKISH_TPU_BACKEND", "cpp")
import random

from plonkish_tpu.backend.hyperplonk import HyperPlonk
from plonkish_tpu.fields import BN254_FR
from plonkish_tpu.models.circuits import rand_vanilla_plonk_with_lookup_circuit
from plonkish_tpu.pcs.kzg import MultilinearKzg
from plonkish_tpu.utils.transcript import Keccak256Transcript

ci, circuit = rand_vanilla_plonk_with_lookup_circuit(
    BN254_FR, 6, random.Random(1), random.Random(2)
)
be = HyperPlonk(MultilinearKzg())
param = be.setup(ci, random.Random(0))
pp, vp = be.preprocess(param, ci)
tr = Keccak256Transcript(BN254_FR)
be.prove(pp, circuit, tr)
proof = tr.into_proof()
be.verify(vp, circuit.instances(),
          Keccak256Transcript.from_proof(BN254_FR, proof))
print("kzg round-trip OK, proof bytes:", len(proof))

bad = bytearray(proof)
bad[len(bad) // 2] ^= 1
probes = [
    ("flipped byte", lambda: be.verify(
        vp, circuit.instances(),
        Keccak256Transcript.from_proof(BN254_FR, bytes(bad)))),
    ("truncated", lambda: be.verify(
        vp, circuit.instances(),
        Keccak256Transcript.from_proof(BN254_FR, proof[:-8]))),
    ("wrong instances", lambda: be.verify(
        vp, [[x + x for x in circuit.instances()[0]]],
        Keccak256Transcript.from_proof(BN254_FR, proof))),
]
for label, run in probes:
    try:
        run()
    except Exception as e:
        print(f"{label}: rejected ({type(e).__name__}) OK")
    else:
        raise SystemExit(f"{label}: ACCEPTED - BUG")
print("verify_e2e OK")
