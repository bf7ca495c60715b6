"""Per-phase timing of one zero_check prove (where do the seconds go?).

Runs the vanilla-PLONK zero-check sum-check at --k and prints per-round
wall time split into message (round evals incl. host reduce), transcript,
and fold.  Usage: python scripts/profile_zero_check.py [k]
"""

import os
import pathlib
import random
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ.setdefault("PLONKISH_TPU_BACKEND", "jax")

import jax

jax.config.update("jax_compilation_cache_dir", "target/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
from plonkish_tpu.piop.sum_check import (
    EvaluationsProver,
    Evaluations,
    ProverState,
    VirtualPolynomial,
)
from plonkish_tpu.poly.multilinear import MLPoly
from plonkish_tpu.utils.transcript import Keccak256Transcript


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
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

    for run in range(2):
        tr = Keccak256Transcript(spec)
        t_all = time.perf_counter()
        t0 = time.perf_counter()
        vp = VirtualPolynomial(expression, polys, challenges, [y])
        state = ProverState(spec, k, Fp.zero(spec), vp)
        jax.block_until_ready(state.stacked)
        t_init = time.perf_counter() - t0
        prover = EvaluationsProver(state)
        aux = Evaluations.auxiliary(state.degree, spec)
        print(f"run {run}: state init {t_init * 1e3:.0f} ms "
              f"(T={len(state.table_keys)}, degree={state.degree})")
        for round_ in range(k):
            t0 = time.perf_counter()
            msg = prover.prove_round(state)
            t_msg = time.perf_counter() - t0
            t0 = time.perf_counter()
            msg.write(tr)
            challenge = tr.squeeze_challenge()
            t_tr = time.perf_counter() - t0
            t0 = time.perf_counter()
            state.next_round(msg.evaluate(aux, challenge), challenge)
            jax.block_until_ready(state.stacked)
            t_fold = time.perf_counter() - t0
            if run or round_ < 3:
                print(
                    f"  round {round_:2d} size 2^{k - round_ - 1}: "
                    f"msg {t_msg * 1e3:7.1f} ms  transcript "
                    f"{t_tr * 1e3:5.1f} ms  fold {t_fold * 1e3:7.1f} ms"
                )
        t0 = time.perf_counter()
        evals = state.into_evals()
        t_ev = time.perf_counter() - t0
        print(
            f"run {run}: total {time.perf_counter() - t_all:.2f} s "
            f"(into_evals {t_ev * 1e3:.0f} ms)"
        )


if __name__ == "__main__":
    main()
