"""Sublane sweep of the Pallas sum-check round kernel (TPU).

zero_check sits at ~8% of the u32-mul roofline while the MSM kernel reaches
~40% (BENCH_r03); the round kernel's blocks are [T, W, S=8, 128] — each SoA
op is a single vreg, so dependent carry chains run at ~1/14 peak unless the
schedule finds ILP across digits (docs/PERF_NOTES.md round-2 microbench).
This sweep times the REAL composed vanilla-PLONK round-0 kernel at
S in {8, 16, 32} to decide whether wider blocks (more lanes per op, more
latency hiding, but more VMEM and register pressure) pay.

Usage: python scripts/sweep_sumcheck_s.py [k] [s1,s2,...]
"""

import functools
import os
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("PLONKISH_TPU_BACKEND", "jax")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "target/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plonkish_tpu import roofline
from plonkish_tpu.backend.hyperplonk.preprocessor import (
    compose,
    permutation_polys,
)
from plonkish_tpu.backend.hyperplonk.prover import (
    instance_polys,
    permutation_z_polys,
)
from plonkish_tpu.fields import BN254_FR as spec
from plonkish_tpu.fields.host import Fp
from plonkish_tpu.models.circuits import rand_vanilla_plonk_circuit
from plonkish_tpu.piop.sum_check import ProverState, VirtualPolynomial
from plonkish_tpu.poly.multilinear import MLPoly


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    sublanes = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [8, 16, 32]
    )
    rng = random.Random(42)
    circuit_info, circuit = rand_vanilla_plonk_circuit(
        spec, k, random.Random(42), random.Random(4242)
    )
    num_z, expression = compose(circuit_info)
    inst = instance_polys(spec, k, circuit.instances())
    pre = [MLPoly.from_fps(spec, col) for col in circuit_info.preprocess_polys]
    wit = [MLPoly.from_fps(spec, col) for col in circuit.synthesize(0, [])]
    perm_idx = circuit_info.permutation_polys()
    perm = permutation_polys(spec, k, perm_idx, circuit_info.permutations)
    beta = Fp(rng.randrange(spec.p), spec)
    gamma = Fp(rng.randrange(spec.p), spec)
    alpha = Fp(rng.randrange(spec.p), spec)
    base_polys = inst + pre + wit
    z = permutation_z_polys(
        num_z, list(zip(perm_idx, perm)), base_polys, beta, gamma
    )
    polys = base_polys + perm + z
    challenges = [beta, gamma, alpha]
    y = [Fp(rng.randrange(spec.p), spec) for _ in range(k)]
    vp = VirtualPolynomial(expression, polys, challenges, [y])
    state = ProverState(spec, k, Fp.zero(spec), vp)
    jax.block_until_ready(state.stacked)

    from plonkish_tpu.pallas import sumcheck as psc
    from plonkish_tpu.piop.sum_check import EvaluationsProver

    assert state.packed, "expected packed Pallas state at this k"
    keys = state.table_keys
    expr = EvaluationsProver(state).expr  # challenge-substituted
    degree = state.degree
    use_identity = ("identity",) in psc._used_leaves(expr)
    from plonkish_tpu.fields.spec import int_to_digits

    off_mont = jnp.asarray(
        int_to_digits(spec.to_mont(int(state.identity_offset) % spec.p))
    )
    c_int = ((1 << 1) * spec.r2_mod_p) % spec.p
    idc = jnp.asarray(int_to_digits(c_int))
    stp = jnp.asarray(int_to_digits(spec.to_mont(1 % spec.p)))

    pairs = (1 << k) // 2
    useful = (
        degree * roofline.expression_mul_count(spec, expr, challenges)
        * pairs * roofline.MONT_MUL_U32_MULS
    )
    for s in sublanes:
        psc.SUBLANE_OVERRIDE = s
        old = psc.SUBLANE
        psc.SUBLANE = s
        try:
            f = jax.jit(
                functools.partial(
                    psc._round_evals_jit.__wrapped__,
                    spec, expr, keys, degree, use_identity,
                )
            )
            t0 = time.time()
            out = jax.block_until_ready(
                f(state.stacked, idc, off_mont, stp)
            )
            cold = time.time() - t0
            times = []
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(f(state.stacked, idc, off_mont, stp))
                times.append(time.time() - t0)
            warm = min(times)
            pct = roofline.roofline_pct(useful, warm, "tpu")
            print(
                f"S={s:3d}: round-0 evals cold {cold:6.1f}s "
                f"warm {warm * 1e3:8.2f} ms "
                f"({pct:.1f}% of u32-mul peak)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — sweep survives OOM variants
            print(f"S={s:3d}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            psc.SUBLANE = old


if __name__ == "__main__":
    main()
