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

SCRIPT = textwrap.dedent(
    """
    import random

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/plonkish_tpu_jax_cache"
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
    print("OK", len(proof))
    """
)


@pytest.mark.parametrize("pcs,k", [("brakedown", 8), ("kzg", 6)])
def test_jax_mode_hyperplonk_roundtrip(pcs, k):
    env = dict(os.environ)
    env.update(
        PLONKISH_TPU_BACKEND="jax",
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/tmp/plonkish_tpu_jax_cache",
        TF_CPP_MIN_LOG_LEVEL="3",
    )
    # the subprocess must not inherit the 8-virtual-device flag requirement;
    # keep XLA_FLAGS as-is (harmless) but pin the platform to cpu.
    proc = subprocess.run(
        [sys.executable, "-c", f"PCS={pcs!r}; K={k}\n" + SCRIPT],
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
