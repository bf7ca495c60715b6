"""Univariate (halo2-style) vanilla-PLONK backend over univariate KZG.

The reference benchmarks its HyperPlonk against halo2's univariate prover
(benchmark/benches/proof_system.rs:41-45 `System::Halo2`), whose pipeline is
FFT-interpolate → coset-FFT quotient → KZG.  This module is that system's
TPU-native equivalent — the BASELINE.json config "Halo2 backend
vanilla_plonk, univariate KZG (quotient + FFT path)":

- witness/selector columns interpolated on the 2^k multiplicative subgroup H
  with the Stockham NTT kernel (poly/ntt.py);
- permutation argument = classic PLONK grand product over wire cosets
  k_j·H with σ permutation polynomials (GWC19 §5);
- quotient t(X) = (gate + α·perm + α²·L1·(z−1)) / Z_H evaluated on a 4n
  coset — all elementwise limb-tensor ops between two NTTs — split into 3
  degree-<n chunks;
- single batched opening at {ζ, ωζ} through the fflonk-style univariate KZG
  batch (pcs/univariate_kzg.py).

Consumes the same vanilla-plonk `PlonkishCircuitInfo` the HyperPlonk backend
uses (1 instance column, 5 selectors, 3 wires, copy constraints on the
wires), so both backends prove the identical circuit and the benchmark
harness can compare them head-to-head.
"""

from __future__ import annotations

import dataclasses
import random
from typing import List, Sequence, Tuple

import numpy as np

from ..backend.circuit import PlonkishCircuit, PlonkishCircuitInfo
from ..backend.hyperplonk.prover import row_mapping
from ..backend.pcs_api import Evaluation
from ..fields import limb
from ..fields.host import Fp
from ..fields.spec import FieldSpec
from ..pcs.univariate_kzg import UnivariateKzg
from ..poly.ntt import coset_scale, ntt, root_of_unity
from ..poly.univariate import DUniPoly, UniPoly, powers_tensor
from ..utils.timer import span
from ..utils.transcript import Keccak256Transcript

COSET_SHIFT = 19  # multiplicative shift for the extended domain (checked)
WIRE_COSETS = (1, 7, 13)  # k_j coset representatives for the three wires


def _fps_to_tensor(spec: FieldSpec, vals: Sequence[Fp]):
    return limb.to_mont(spec, limb.from_ints([int(v) for v in vals]))


def _tensor_to_fps(spec: FieldSpec, tensor) -> List[Fp]:
    return [
        Fp(int(v), spec) for v in limb.to_ints(limb.from_mont(spec, tensor))
    ]


def _const_vec(spec: FieldSpec, value: int, n: int):
    t = limb.const(spec, value % spec.p)
    return limb.xnp.broadcast_to(t, (n, limb.L))


@dataclasses.dataclass
class UnivariatePlonkProverParam:
    spec: FieldSpec
    k: int
    kzg_pp: object
    fixed_coeffs: List[object]  # 5 selector coeff tensors [n, L]
    sigma_coeffs: List[object]  # 3 permutation coeff tensors
    fixed_comms: List[object]
    sigma_comms: List[object]
    sigma_evals: List[object]  # σ_j values on H (for the grand product)
    num_instances: int


@dataclasses.dataclass
class UnivariatePlonkVerifierParam:
    spec: FieldSpec
    k: int
    kzg_vp: object
    fixed_comms: List[object]
    sigma_comms: List[object]
    num_instances: int


class UnivariatePlonk:
    """PlonkishBackend-shaped API for the univariate vanilla-PLONK system."""

    def __init__(self, pcs: UnivariateKzg | None = None):
        self.pcs = pcs or UnivariateKzg()
        self.field_spec = self.pcs.field_spec

    # ------------------------------------------------------------- lifecycle
    def setup(self, circuit_info: PlonkishCircuitInfo, rng: random.Random):
        n = 1 << circuit_info.k
        return self.pcs.setup(4 * n, 1, rng)

    def preprocess(self, param, circuit_info: PlonkishCircuitInfo):
        spec = self.field_spec
        k = circuit_info.k
        n = 1 << k
        assert len(circuit_info.num_instances) == 1
        assert len(circuit_info.preprocess_polys) == 5, "vanilla plonk only"
        assert sum(circuit_info.num_witness_polys) == 3
        w = root_of_unity(spec, k)
        for kj in WIRE_COSETS[1:]:
            assert pow(kj, n, spec.p) != 1, "coset rep lies in H"

        kzg_pp, kzg_vp = self.pcs.trim(param, 4 * n, 1)

        fixed_coeffs, fixed_comms = [], []
        for col in circuit_info.preprocess_polys:
            coeffs = ntt(spec, _fps_to_tensor(spec, col), inverse=True)
            fixed_coeffs.append(coeffs)
            fixed_comms.append(self.pcs.commit_coeffs(kzg_pp, coeffs))

        # σ_j(ω^i) = id of the next cell in the copy cycle; identity where
        # uncopied (GWC19; reference permutation_polys preprocessor.rs:172-203)
        pow_w = [1]
        for _ in range(n - 1):
            pow_w.append(pow_w[-1] * w % spec.p)
        wire_base = 1 + 5  # flat poly index of w_l
        sigma_int = [
            [WIRE_COSETS[j] * pow_w[i] % spec.p for i in range(n)]
            for j in range(3)
        ]
        for cycle in circuit_info.permutations:
            cells = list(cycle)
            for (pa, ra), (pb, rb) in zip(cells, cells[1:] + cells[:1]):
                ja = pa - wire_base
                jb = pb - wire_base
                assert 0 <= ja < 3 and 0 <= jb < 3, "copies must be on wires"
                sigma_int[ja][ra] = WIRE_COSETS[jb] * pow_w[rb] % spec.p

        sigma_evals, sigma_coeffs, sigma_comms = [], [], []
        for j in range(3):
            evals = limb.to_mont(spec, limb.from_ints(sigma_int[j]))
            sigma_evals.append(evals)
            coeffs = ntt(spec, evals, inverse=True)
            sigma_coeffs.append(coeffs)
            sigma_comms.append(self.pcs.commit_coeffs(kzg_pp, coeffs))

        pp = UnivariatePlonkProverParam(
            spec=spec, k=k, kzg_pp=kzg_pp,
            fixed_coeffs=fixed_coeffs, sigma_coeffs=sigma_coeffs,
            fixed_comms=fixed_comms, sigma_comms=sigma_comms,
            sigma_evals=sigma_evals,
            num_instances=circuit_info.num_instances[0],
        )
        vp = UnivariatePlonkVerifierParam(
            spec=spec, k=k, kzg_vp=kzg_vp,
            fixed_comms=fixed_comms, sigma_comms=sigma_comms,
            num_instances=circuit_info.num_instances[0],
        )
        return pp, vp

    # ---------------------------------------------------------------- helpers
    def _pi_evals(self, spec, k, instances) -> List[int]:
        n = 1 << k
        mapping = row_mapping(k)
        pi = [0] * n
        for j, v in enumerate(instances):
            pi[mapping[j]] = int(v)
        return pi

    def _extend(self, spec, coeffs, n4, shift=COSET_SHIFT):
        """coeff tensor [n, L] -> evals on shift·H_{4n} (zero-padded NTT)."""
        n = coeffs.shape[0]
        pad = limb.xnp.concatenate(
            [coeffs, limb.zeros((n4 - n,))], axis=0
        )
        return ntt(spec, coset_scale(spec, pad, shift))

    # ------------------------------------------------------------------ prove
    def prove(
        self,
        pp: UnivariatePlonkProverParam,
        circuit: PlonkishCircuit,
        transcript: Keccak256Transcript,
    ) -> None:
        spec = pp.spec
        k, n = pp.k, 1 << pp.k
        n4 = 4 * n
        w = root_of_unity(spec, k)
        instances = circuit.instances()[0]
        assert len(instances) == pp.num_instances
        for v in instances:
            transcript.common_field_element(v)

        with span(f"univariate_plonk_prove-{k}"):
            witness = circuit.synthesize(0, [])
            assert len(witness) == 3
            wire_evals = [_fps_to_tensor(spec, col) for col in witness]
            wire_coeffs = [
                ntt(spec, ev, inverse=True) for ev in wire_evals
            ]
            with span("witness_commit"):
                for c in wire_coeffs:
                    transcript.write_point(
                        self.pcs.commit_coeffs(pp.kzg_pp, c)
                    )

            beta = transcript.squeeze_challenge()
            gamma = transcript.squeeze_challenge()

            # grand product z over rows (prefix product of ratios)
            with span("grand_product"):
                gamma_v = _const_vec(spec, int(gamma), n)
                num = _const_vec(spec, 1, n)
                den = _const_vec(spec, 1, n)
                xs = powers_tensor(spec, Fp(w, spec), n)
                for j in range(3):
                    bid = limb.mont_mul(
                        spec, xs,
                        limb.const(spec, int(beta) * WIRE_COSETS[j] % spec.p),
                    )
                    term_n = limb.add(
                        spec, wire_evals[j], limb.add(spec, bid, gamma_v)
                    )
                    bs = limb.mont_mul(
                        spec, pp.sigma_evals[j], limb.const(spec, int(beta))
                    )
                    term_d = limb.add(
                        spec, wire_evals[j], limb.add(spec, bs, gamma_v)
                    )
                    num = limb.mont_mul(spec, num, term_n)
                    den = limb.mont_mul(spec, den, term_d)
                ratio = limb.mont_mul(spec, num, limb.batch_inv(spec, den))
                prefix = limb.prefix_mul(spec, ratio)  # inclusive
                z_evals = limb.xnp.concatenate(
                    [limb.one(spec, (1,)), prefix[:-1]], axis=0
                )
                z_coeffs = ntt(spec, z_evals, inverse=True)
                transcript.write_point(
                    self.pcs.commit_coeffs(pp.kzg_pp, z_coeffs)
                )

            alpha = transcript.squeeze_challenge()

            # quotient on the 4n coset
            with span("quotient"):
                ext = lambda c: self._extend(spec, c, n4)
                q_ext = [ext(c) for c in pp.fixed_coeffs]
                w_ext = [ext(c) for c in wire_coeffs]
                s_ext = [ext(c) for c in pp.sigma_coeffs]
                z_ext = ext(z_coeffs)
                zw_coeffs = coset_scale(spec, z_coeffs, w)  # z(ωX)
                zw_ext = ext(zw_coeffs)
                pi_evals = limb.to_mont(
                    spec,
                    limb.from_ints(self._pi_evals(spec, k, instances)),
                )
                pi_ext = ext(ntt(spec, pi_evals, inverse=True))
                # L1 = lagrange at H row 0
                l1_evals = limb.xnp.concatenate(
                    [limb.one(spec, (1,)), limb.zeros((n - 1,))], axis=0
                )
                l1_ext = ext(ntt(spec, l1_evals, inverse=True))

                mul = lambda a, b: limb.mont_mul(spec, a, b)
                add = lambda a, b: limb.add(spec, a, b)
                sub = lambda a, b: limb.sub(spec, a, b)

                gate = add(
                    add(
                        add(mul(q_ext[0], w_ext[0]), mul(q_ext[1], w_ext[1])),
                        mul(q_ext[2], mul(w_ext[0], w_ext[1])),
                    ),
                    add(add(mul(q_ext[3], w_ext[2]), q_ext[4]), pi_ext),
                )

                # coset points shift·ω4^i
                w4 = root_of_unity(spec, k + 2)
                x_ext = limb.mont_mul(
                    spec,
                    powers_tensor(spec, Fp(w4, spec), n4),
                    limb.const(spec, COSET_SHIFT),
                )

                gamma_e = _const_vec(spec, int(gamma), n4)
                lhs = z_ext
                rhs = zw_ext
                for j in range(3):
                    bid = mul(
                        x_ext,
                        limb.const(spec, int(beta) * WIRE_COSETS[j] % spec.p),
                    )
                    lhs = mul(lhs, add(w_ext[j], add(bid, gamma_e)))
                    bs = mul(s_ext[j], limb.const(spec, int(beta)))
                    rhs = mul(rhs, add(w_ext[j], add(bs, gamma_e)))
                perm = sub(lhs, rhs)
                one_e = _const_vec(spec, 1, n4)
                l1_term = mul(l1_ext, sub(z_ext, one_e))

                alpha_c = limb.const(spec, int(alpha))
                alpha2_c = limb.const(spec, int(alpha * alpha))
                total = add(
                    gate,
                    add(mul(perm, alpha_c), mul(l1_term, alpha2_c)),
                )

                # Z_H on the coset: (shift·ω4^i)^n − 1 = shift^n·(ω4^n)^i − 1
                mu = pow(w4, n, spec.p)  # primitive 4th root
                sh_n = pow(COSET_SHIFT, n, spec.p)
                zh_vals = [
                    (sh_n * pow(mu, i, spec.p) - 1) % spec.p for i in range(4)
                ]
                zh_inv = [pow(v, spec.p - 2, spec.p) for v in zh_vals]
                zh_inv_t = limb.xnp.tile(
                    limb.to_mont(spec, limb.from_ints(zh_inv)), (n, 1)
                )
                t_ext = mul(total, zh_inv_t)
                t_coeffs = coset_scale(
                    spec, ntt(spec, t_ext, inverse=True), COSET_SHIFT,
                    invert=True,
                )
                # degree check on device: one bool fetch, not a 4n-element
                # Python round-trip
                tail_nonzero = bool(
                    limb.xnp.any(t_coeffs[3 * n :] != 0)
                )
                assert not tail_nonzero, (
                    "quotient degree overflow — constraint system unsatisfied?"
                )
                t_chunks = [
                    t_coeffs[i * n : (i + 1) * n] for i in range(3)
                ]
                for chunk in t_chunks:
                    transcript.write_point(
                        self.pcs.commit_coeffs(pp.kzg_pp, chunk)
                    )

            zeta = transcript.squeeze_challenge()

            # evaluations + batched opening at {ζ, ωζ} — all device-side
            # (DUniPoly): the host-bigint version of this phase dominated
            # the k=20 prover
            with span("open"):
                polys = [
                    DUniPoly(spec, c)
                    for c in (
                        pp.fixed_coeffs + pp.sigma_coeffs + wire_coeffs
                        + [z_coeffs] + t_chunks
                    )
                ]
                omega_zeta = zeta * Fp(w, spec)
                points = [zeta, omega_zeta]
                evals = []
                for i, poly in enumerate(polys):
                    evals.append(Evaluation(i, 0, poly.evaluate(zeta)))
                z_idx = 11
                evals.append(
                    Evaluation(z_idx, 1, polys[z_idx].evaluate(omega_zeta))
                )
                for e in evals:
                    transcript.write_field_element(e.value)
                self.pcs.batch_open(
                    pp.kzg_pp, polys, None, points, evals, transcript
                )

    # ----------------------------------------------------------------- verify
    def verify(
        self,
        vp: UnivariatePlonkVerifierParam,
        instances,
        transcript: Keccak256Transcript,
    ) -> None:
        spec = vp.spec
        k, n = vp.k, 1 << vp.k
        w = root_of_unity(spec, k)
        insts = instances[0]
        assert len(insts) == vp.num_instances
        for v in insts:
            transcript.common_field_element(v)

        wire_comms = [transcript.read_point(self.pcs.curve) for _ in range(3)]
        beta = transcript.squeeze_challenge()
        gamma = transcript.squeeze_challenge()
        z_comm = transcript.read_point(self.pcs.curve)
        alpha = transcript.squeeze_challenge()
        t_comms = [transcript.read_point(self.pcs.curve) for _ in range(3)]
        zeta = transcript.squeeze_challenge()

        num_evals = 15 + 1
        vals = [transcript.read_field_element(spec) for _ in range(num_evals)]
        (ql, qr, qm, qo, qc, s1, s2, s3, a, b, c, z, t0, t1, t2, zw) = vals

        one = Fp.one(spec)
        zeta_n = zeta ** n
        zh = zeta_n - one
        # L1(ζ) = (ζ^n − 1) / (n (ζ − 1))
        l1 = zh * (Fp(n, spec) * (zeta - one)).inv()
        # PI(ζ) = Σ inst_j · L_{m_j}(ζ),  L_i(ζ) = ω^i (ζ^n−1) / (n (ζ−ω^i))
        mapping = row_mapping(k)
        pi = Fp.zero(spec)
        n_inv = Fp(n, spec).inv()
        for j, v in enumerate(insts):
            wi = Fp(pow(w, mapping[j], spec.p), spec)
            li = wi * zh * n_inv * (zeta - wi).inv()
            pi = pi + v * li

        gate = ql * a + qr * b + qm * a * b + qo * c + qc + pi
        lhs = z
        rhs = zw
        for kj, (wv, sv) in zip(WIRE_COSETS, [(a, s1), (b, s2), (c, s3)]):
            lhs = lhs * (wv + beta * Fp(kj, spec) * zeta + gamma)
            rhs = rhs * (wv + beta * sv + gamma)
        perm = lhs - rhs
        total = gate + alpha * perm + alpha * alpha * (l1 * (z - one))
        t_at = t0 + zeta_n * t1 + zeta_n * zeta_n * t2
        if total != t_at * zh:
            raise ValueError("univariate plonk: quotient identity fails")

        comms = (
            vp.fixed_comms + vp.sigma_comms + wire_comms + [z_comm] + t_comms
        )
        omega_zeta = zeta * Fp(w, spec)
        points = [zeta, omega_zeta]
        evals = [Evaluation(i, 0, v) for i, v in enumerate(vals[:15])]
        evals.append(Evaluation(11, 1, zw))
        self.pcs.batch_verify(vp.kzg_vp, comms, points, evals, transcript)
