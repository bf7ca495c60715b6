"""Proof-system benchmark harness (reference benchmark crate,
benches/proof_system.rs).

Usage:
    python -m plonkish_tpu.benchmark --system hyperplonk --circuit vanilla_plonk \
        --k 8..12 [--pcs kzg|brakedown] [--backend cpp|jax] [--breakdown]

Appends `k, avg_ms` lines to target/bench/<system> (proof_system.rs:306-319)
and, with --breakdown, prints the per-phase cost aggregation from the timer
trace (the reference's plotter input).
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time


def _sample_size(k: int) -> int:
    """proof_system.rs:321-329."""
    if k < 16:
        return 20
    if k < 20:
        return 5
    return 1


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--system",
        default="hyperplonk",
        choices=["hyperplonk", "univariate_plonk", "protostar", "sangria"],
        help="protostar/sangria time the per-step accumulation fold "
        "(reference Protostar::prove_accumulation_from_nark, "
        "accumulation/protostar/hyperplonk.rs:241-331) instead of a "
        "one-shot HyperPlonk proof",
    )
    ap.add_argument(
        "--circuit",
        default="vanilla_plonk",
        choices=[
            "vanilla_plonk", "vanilla_plonk_with_lookup", "sha256",
            "aggregation",
        ],
    )
    ap.add_argument("--k", default="8..10", help="range, e.g. 8..12")
    ap.add_argument(
        "--pcs", default="kzg", choices=["kzg", "brakedown", "gemini",
                                          "zeromorph", "ipa", "hyrax"]
    )
    ap.add_argument("--backend", default="cpp", choices=["cpp", "jax"])
    ap.add_argument("--samples", type=int, default=None)
    ap.add_argument("--breakdown", action="store_true")
    args = ap.parse_args(argv)

    os.environ.setdefault("PLONKISH_TPU_BACKEND", args.backend)
    if args.backend == "cpp":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    from plonkish_tpu.backend.hyperplonk import HyperPlonk
    from plonkish_tpu.models.circuits import (
        rand_vanilla_plonk_circuit,
        rand_vanilla_plonk_with_lookup_circuit,
    )
    from plonkish_tpu.utils import timer
    from plonkish_tpu.utils.transcript import Keccak256Transcript

    def make_pcs(name):
        if name == "kzg":
            from plonkish_tpu.pcs.kzg import MultilinearKzg

            return MultilinearKzg()
        if name == "brakedown":
            from plonkish_tpu.fields import BN254_FR
            from plonkish_tpu.pcs.brakedown import MultilinearBrakedown

            return MultilinearBrakedown(BN254_FR)
        if name == "gemini":
            from plonkish_tpu.pcs.gemini import Gemini

            return Gemini()
        if name == "zeromorph":
            from plonkish_tpu.pcs.zeromorph import Zeromorph

            return Zeromorph()
        if name == "ipa":
            from plonkish_tpu.pcs.ipa import MultilinearIpa

            return MultilinearIpa()
        from plonkish_tpu.pcs.hyrax import MultilinearHyrax

        return MultilinearHyrax()

    def rand_sha256(spec, k, _rng, _rng2):
        # as many chained 512-bit blocks as fit in 2^k rows
        # (reference sha256 bench: benchmark proof_system.rs:61-77)
        from plonkish_tpu.models.sha256 import (
            message_for_blocks,
            sha256_circuit,
        )

        m = ((1 << k) - 10) // 140
        assert m >= 1, f"k={k} too small for one sha256 block"
        info, circuit, _ = sha256_circuit(
            message_for_blocks(m, seed=42), k=k, spec=spec
        )
        return info, circuit

    def rand_aggregation(spec, k, rng1, rng2):
        from plonkish_tpu.models.aggregation import rand_aggregation_circuit

        return rand_aggregation_circuit(spec, k, rng1, rng2)

    circuit_fn = {
        "vanilla_plonk": rand_vanilla_plonk_circuit,
        "vanilla_plonk_with_lookup": rand_vanilla_plonk_with_lookup_circuit,
        "sha256": rand_sha256,
        "aggregation": rand_aggregation,
    }[args.circuit]

    lo, hi = args.k.split("..")
    ks = range(int(lo), int(hi))

    os.makedirs("target/bench", exist_ok=True)
    out_path = f"target/bench/{args.system}"
    if args.breakdown:
        timer.set_enabled(True)

    if args.system == "univariate_plonk":
        # the reference's halo2 comparison system (FFT + univariate KZG)
        from plonkish_tpu.backend.univariate import UnivariatePlonk

        assert args.circuit == "vanilla_plonk", "univariate backend: vanilla only"
        for k in ks:
            backend = UnivariatePlonk()
            spec = backend.field_spec
            circuit_info, circuit = circuit_fn(
                spec, k, random.Random(42), random.Random(4242)
            )
            param = backend.setup(circuit_info, random.Random(0))
            pp, vp = backend.preprocess(param, circuit_info)
            samples = args.samples or _sample_size(k)
            times = []
            proof = None
            for _ in range(samples):
                tr = Keccak256Transcript(spec)
                t0 = time.perf_counter()
                backend.prove(pp, circuit, tr)
                times.append(time.perf_counter() - t0)
                proof = tr.into_proof()
            backend.verify(
                vp, circuit.instances(),
                Keccak256Transcript.from_proof(spec, proof),
            )
            avg_ms = sum(times) / len(times) * 1e3
            with open(out_path, "a") as f:
                f.write(f"{k}, {avg_ms:.3f}\n")
            print(f"k={k} univariate_plonk prove avg {avg_ms:.1f} ms")
        return

    if args.system in ("protostar", "sangria"):
        from plonkish_tpu.accumulation.protostar import Protostar, Sangria

        scheme_cls = Protostar if args.system == "protostar" else Sangria
        for k in ks:
            pcs = make_pcs(args.pcs)
            spec = pcs.field_spec
            circuit_info, _ = circuit_fn(
                spec, k, random.Random(42), random.Random(4242)
            )
            scheme = scheme_cls(pcs)
            param = scheme.setup(circuit_info, random.Random(0))
            pp, vp = scheme.preprocess(param, circuit_info)
            accumulator = scheme.init_accumulator(pp)
            samples = max(2, (args.samples or _sample_size(k)) // 2)
            fold_times = []
            for i in range(samples):
                _, circuit = circuit_fn(
                    spec, k, random.Random(42), random.Random(1000 + i)
                )
                t0 = time.perf_counter()
                scheme.prove_accumulation_from_nark(
                    pp, accumulator, circuit, Keccak256Transcript(spec)
                )
                fold_times.append(time.perf_counter() - t0)
            avg_ms = sum(fold_times) / len(fold_times) * 1e3
            with open(out_path, "a") as f:
                f.write(f"{k}, {avg_ms:.3f}\n")
            print(
                f"k={k} {args.system} fold avg {avg_ms:.1f} ms "
                f"({len(fold_times)} folds)"
            )
        return

    for k in ks:
        pcs = make_pcs(args.pcs)
        spec = pcs.field_spec
        circuit_info, circuit = circuit_fn(
            spec, k, random.Random(42), random.Random(4242)
        )
        backend = HyperPlonk(pcs)
        t0 = time.perf_counter()
        param = backend.setup(circuit_info, random.Random(0))
        pp, vp = backend.preprocess(param, circuit_info)
        setup_s = time.perf_counter() - t0

        samples = args.samples or _sample_size(k)
        timer.reset_trace()
        prove_times = []
        proof = None
        for _ in range(samples):
            tr = Keccak256Transcript(spec)
            t0 = time.perf_counter()
            backend.prove(pp, circuit, tr)
            prove_times.append(time.perf_counter() - t0)
            proof = tr.into_proof()

        t0 = time.perf_counter()
        backend.verify(
            vp, circuit.instances(), Keccak256Transcript.from_proof(spec, proof)
        )
        verify_s = time.perf_counter() - t0

        avg_ms = sum(prove_times) / len(prove_times) * 1e3
        with open(out_path, "a") as f:
            f.write(f"{k}, {avg_ms:.3f}\n")
        print(
            f"k={k} pcs={args.pcs} backend={args.backend}: "
            f"prove {avg_ms:.1f} ms (avg of {samples}), "
            f"setup+preprocess {setup_s * 1e3:.1f} ms, "
            f"verify {verify_s * 1e3:.1f} ms, proof {len(proof)} B",
            flush=True,
        )
        if args.breakdown:
            print("  cost breakdown (last prove):")
            for cat, secs in timer.cost_breakdown().items():
                print(f"    {cat:14s} {secs / samples * 1e3:9.2f} ms")


if __name__ == "__main__":
    main()
