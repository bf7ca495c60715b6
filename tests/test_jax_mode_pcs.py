"""Jax-mode PCS round-trips for the families the e2e tests don't cover.

test_jax_mode_e2e.py pins Brakedown and KZG through the full prover; the
other four PCS share most limb kernels but have family-specific device code
(Hyrax row commitments, IPA folds, Gemini/Zeromorph univariate reductions)
that would otherwise only ever run under the cpp backend.  One subprocess,
tiny sizes, persistent compile cache."""

import os
import subprocess
import sys
import textwrap

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

    from plonkish_tpu.fields import BN254_FR as SPEC, limb
    from plonkish_tpu.fields.host import Fp
    from plonkish_tpu.poly.multilinear import MLPoly
    from plonkish_tpu.utils.transcript import Keccak256Transcript

    assert not limb.IS_CPP

    def rand_poly(num_vars, spec):
        rng = random.Random(33)
        return MLPoly.from_fps(
            spec,
            [Fp(rng.randrange(spec.p), spec) for _ in range(1 << num_vars)],
        )

    def roundtrip(pcs, num_vars):
        spec = getattr(pcs, "field_spec", SPEC)
        param = pcs.setup(1 << num_vars, 1, random.Random(7))
        pp, vp = pcs.trim(param, 1 << num_vars, 1)
        t = Keccak256Transcript(spec)
        poly = rand_poly(num_vars, spec)
        comm = pcs.commit_and_write(pp, poly, t)
        point = t.squeeze_challenges(num_vars)
        eval_ = poly.evaluate(point)
        t.write_field_element(eval_)
        pcs.open(pp, poly, comm, point, eval_, t)
        r = Keccak256Transcript.from_proof(spec, t.into_proof())
        comm = pcs.read_commitments(vp, 1, r)[0]
        point = r.squeeze_challenges(num_vars)
        eval_ = r.read_field_element()
        pcs.verify(vp, comm, point, eval_, r)

    if FAMILY == "gemini":
        from plonkish_tpu.pcs.gemini import Gemini

        roundtrip(Gemini(), 4)
    elif FAMILY == "zeromorph":
        from plonkish_tpu.pcs.zeromorph import Zeromorph

        roundtrip(Zeromorph(), 4)
    elif FAMILY == "ipa":
        from plonkish_tpu.pcs.ipa import MultilinearIpa

        # k=3: each IPA fold size compiles its own 256-step EC ladder
        # (~minutes on XLA CPU, persistently cached afterwards)
        roundtrip(MultilinearIpa(), 3)
    elif FAMILY == "hyrax":
        from plonkish_tpu.pcs.hyrax import MultilinearHyrax

        roundtrip(MultilinearHyrax(), 5)
    print("OK")
    """
)

import pytest


# ipa/hyrax: 5-9 min cold on a 4-core host (per-size EC-ladder compiles on
# XLA CPU) — slow tier so the default run keeps its <5 min budget honest.
@pytest.mark.parametrize(
    "family",
    [
        "gemini",
        "zeromorph",
        pytest.param("ipa", marks=pytest.mark.slow),
        pytest.param("hyrax", marks=pytest.mark.slow),
    ],
)
def test_jax_mode_pcs_roundtrips(family):
    env = dict(os.environ)
    env.update(
        PLONKISH_TPU_BACKEND="jax",
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR="/root/repo/target/jax_cache_cpu",
        TF_CPP_MIN_LOG_LEVEL="3",
    )
    proc = subprocess.run(
        [sys.executable, "-c", f"FAMILY={family!r}\n" + SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert proc.returncode == 0, (
        f"jax-mode PCS round-trips failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    assert proc.stdout.strip().endswith("OK")
