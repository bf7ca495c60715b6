"""Full HyperPlonk prove->verify with the JAX backend in the DEFAULT suite.

The flagship TPU path (PLONKISH_TPU_BACKEND=jax) must not rot while the
protocol tests run on the native host runtime.  The backend is frozen at
import time (fields/limb.py), so this runs in a subprocess with the env
flipped; sizes are modest and the persistent compile cache keeps re-runs
fast.  Matches the reference harness shape (backend.rs:202-241) at one
(PCS, k) point per EC/hash family.
"""

import os
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow  # multi-minute cold XLA compiles


SCRIPT = textwrap.dedent(
    """
    import random

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/target/jax_cache_cpu"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from plonkish_tpu.backend.hyperplonk import HyperPlonk
    from plonkish_tpu.fields import BN254_FR, limb
    from plonkish_tpu.models.circuits import rand_vanilla_plonk_circuit
    from plonkish_tpu.utils.transcript import Keccak256Transcript

    assert not limb.IS_CPP, "expected the jax backend"

    def roundtrip(pcs, num_vars):
        circuit_info, circuit = rand_vanilla_plonk_circuit(
            BN254_FR, num_vars, random.Random(1), random.Random(2)
        )
        backend = HyperPlonk(pcs)
        param = backend.setup(circuit_info, random.Random(0))
        pp, vp = backend.preprocess(param, circuit_info)
        t = Keccak256Transcript(BN254_FR)
        backend.prove(pp, circuit, t)
        proof = t.into_proof()
        r = Keccak256Transcript.from_proof(BN254_FR, proof)
        backend.verify(vp, circuit.instances(), r)
        return proof

    if PCS == "brakedown":
        from plonkish_tpu.pcs.brakedown import MultilinearBrakedown
        from plonkish_tpu.pcs.brakedown_code import BRAKEDOWN_SPEC_TEST

        proof = roundtrip(
            MultilinearBrakedown(BN254_FR, BRAKEDOWN_SPEC_TEST), K
        )
    else:
        from plonkish_tpu.pcs.kzg import MultilinearKzg

        proof = roundtrip(MultilinearKzg(), K)
    if GOLDEN:
        import pathlib

        want = pathlib.Path(GOLDEN).read_bytes()
        assert proof == want, (
            "jax-mode proof bytes diverge from the cpp-generated golden "
            f"fixture ({len(proof)}B vs {len(want)}B)"
        )
    print("OK", len(proof))
    """
)

_GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# the kzg k=5 run doubles as a cross-backend transcript check: same seeds
# as tests/test_golden_proofs.py, so the jax prover must reproduce the
# cpp-generated fixture byte-for-byte
@pytest.mark.parametrize(
    "pcs,k,golden",
    [
        ("brakedown", 8, None),
        ("kzg", 6, None),
        ("kzg", 5, os.path.join(_GOLDEN_DIR, "hyperplonk_kzg_k5.bin")),
        (
            "brakedown", 5,
            os.path.join(_GOLDEN_DIR, "hyperplonk_brakedown_k5.bin"),
        ),
    ],
)
def test_jax_mode_hyperplonk_roundtrip(pcs, k, golden):
    env = dict(os.environ)
    env.update(
        PLONKISH_TPU_BACKEND="jax",
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/root/repo/target/jax_cache_cpu",
        TF_CPP_MIN_LOG_LEVEL="3",
    )
    # the subprocess must not inherit the 8-virtual-device flag requirement;
    # keep XLA_FLAGS as-is (harmless) but pin the platform to cpu.
    proc = subprocess.run(
        [
            sys.executable, "-c",
            f"PCS={pcs!r}; K={k}; GOLDEN={golden!r}\n" + SCRIPT,
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (
        f"jax-mode round-trip failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    assert proc.stdout.strip().startswith("OK")
