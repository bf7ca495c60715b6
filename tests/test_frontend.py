"""Frontend circuit-builder tests: build circuits through the DSL and prove
them end-to-end with HyperPlonk (replaces the reference's halo2-frontend e2e
test, frontend/halo2/test.rs:14-38)."""

import random

import pytest

from plonkish_tpu.backend.hyperplonk import HyperPlonk
from plonkish_tpu.fields import BN254_FR, Fp
from plonkish_tpu.frontend.builder import Cell, CircuitBuilder
from plonkish_tpu.pcs.kzg import MultilinearKzg
from plonkish_tpu.utils.transcript import Keccak256Transcript

SPEC = BN254_FR


def prove_verify(info, circuit):
    backend = HyperPlonk(MultilinearKzg())
    param = backend.setup(info, random.Random(0))
    pp, vp = backend.preprocess(param, info)
    t = Keccak256Transcript(SPEC)
    backend.prove(pp, circuit, t)
    r = Keccak256Transcript.from_proof(SPEC, t.into_proof())
    backend.verify(vp, circuit.instances(), r)


def test_builder_vanilla_gate_with_copies():
    """A multiply-add chain: acc_{i+1} = acc_i * acc_i + c_i, enforced via the
    vanilla gate and copy constraints between rows."""
    k = 4
    b = CircuitBuilder(k, SPEC)
    q_mul = b.fixed_column()
    q_c = b.fixed_column()
    w_l = b.advice_column()
    w_r = b.advice_column()
    w_o = b.advice_column()

    # gate: q_mul * (w_l * w_r - w_o) + q_c * (w_l - w_r) == 0
    b.gate(
        "mul",
        lambda q: q(q_mul.cur()) * (q(w_l.cur()) * q(w_r.cur()) - q(w_o.cur()))
        + q(q_c.cur()) * (q(w_l.cur()) - q(w_r.cur())),
    )

    rng = random.Random(5)
    num_steps = 6
    acc = Fp(3, SPEC)
    fixed = {}
    witness = {}
    for i in range(num_steps):
        row = i  # user rows 0..num_steps-1
        fixed[(0, row)] = Fp.one(SPEC)  # q_mul on
        witness[(0, row)] = acc  # w_l
        witness[(1, row)] = acc  # w_r (equal by copy)
        acc = acc * acc
        witness[(2, row)] = acc  # w_o
        b.copy(Cell(w_l, row), Cell(w_r, row))
        if i > 0:
            b.copy(Cell(w_o, row - 1), Cell(w_l, row))

    info, circuit = b.build(fixed, [], lambda phase, ch: witness)
    assert info.is_well_formed()
    prove_verify(info, circuit)


def test_builder_copy_violation_rejected():
    """A witness that breaks a copy constraint must fail verification."""
    k = 3
    b = CircuitBuilder(k, SPEC)
    q = b.fixed_column()
    w_a = b.advice_column()
    w_b = b.advice_column()
    b.gate("noop", lambda qq: qq(q.cur()) * (qq(w_a.cur()) - qq(w_a.cur())))
    b.copy(Cell(w_a, 0), Cell(w_b, 0))

    witness = {(0, 0): Fp(7, SPEC), (1, 0): Fp(8, SPEC)}  # violates copy
    info, circuit = b.build({}, [], lambda phase, ch: witness)
    backend = HyperPlonk(MultilinearKzg())
    param = backend.setup(info, random.Random(0))
    pp, vp = backend.preprocess(param, info)
    t = Keccak256Transcript(SPEC)
    with pytest.raises((ValueError, AssertionError)):
        backend.prove(pp, circuit, t)
        r = Keccak256Transcript.from_proof(SPEC, t.into_proof())
        backend.verify(vp, circuit.instances(), r)


def test_builder_lookup_range_check():
    """Range check via lookup: every value in w must appear in the table
    column t (the canonical lookup circuit shape)."""
    k = 4
    n = 1 << k
    b = CircuitBuilder(k, SPEC)
    q_range = b.fixed_column()
    t_col = b.fixed_column()
    w = b.advice_column()
    b.lookup(
        "range",
        [(lambda q: q(q_range.cur()) * q(w.cur()), lambda q: q(t_col.cur()))],
    )
    # dummy gate so the circuit has a constraint (backend requires >= 1 poly use)
    b.gate("noop", lambda q: q(q_range.cur()) * (q(w.cur()) - q(w.cur())))

    limit = 8
    rng = random.Random(6)
    fixed = {}
    witness = {}
    for row in range(limit):
        fixed[(1, row)] = Fp(row, SPEC)  # table: 0..limit-1
    for row in range(n - 2):
        fixed[(0, row)] = Fp.one(SPEC)
        witness[(0, row)] = Fp(rng.randrange(limit), SPEC)

    info, circuit = b.build(fixed, [], lambda phase, ch: witness)
    assert info.is_well_formed()
    prove_verify(info, circuit)

    # out-of-range witness must be rejected at proving time (invalid lookup)
    witness[(0, 0)] = Fp(limit + 3, SPEC)
    info2, circuit2 = b.build(fixed, [], lambda phase, ch: witness)
    backend = HyperPlonk(MultilinearKzg())
    param = backend.setup(info2, random.Random(0))
    pp, vp = backend.preprocess(param, info2)
    with pytest.raises(ValueError, match="Invalid lookup input"):
        backend.prove(pp, circuit2, Keccak256Transcript(SPEC))


def test_builder_instance_column():
    """Public input exposed through an instance column: gate w - pi == 0 at
    the instance rows."""
    k = 3
    b = CircuitBuilder(k, SPEC)
    pi = b.instance_column(2)
    q_pub = b.fixed_column()
    w = b.advice_column()
    b.gate(
        "expose",
        lambda q: q(q_pub.cur()) * (q(w.cur()) - q(pi.cur())),
    )
    values = [Fp(11, SPEC), Fp(22, SPEC)]
    fixed = {(0, 0): Fp.one(SPEC), (0, 1): Fp.one(SPEC)}
    witness = {(0, 0): values[0], (0, 1): values[1]}
    info, circuit = b.build(fixed, [values], lambda phase, ch: witness)
    prove_verify(info, circuit)

    # wrong public input rejected
    _, bad = b.build(
        fixed, [[values[0], values[1] + 1]], lambda phase, ch: witness
    )
    backend = HyperPlonk(MultilinearKzg())
    param = backend.setup(info, random.Random(0))
    pp, vp = backend.preprocess(param, info)
    t = Keccak256Transcript(SPEC)
    backend.prove(pp, circuit, t)
    r = Keccak256Transcript.from_proof(SPEC, t.into_proof())
    with pytest.raises(ValueError):
        backend.verify(vp, bad.instances(), r)


def test_builder_two_phase_challenge_circuit():
    """Phase-1 witness computed from a Fiat-Shamir challenge squeezed after
    the phase-0 commitment (halo2.rs:55-91/585-648 phase-indexed challenge
    plumbing; VERDICT r1 item 7): w1 = theta * w0 enforced by a gate that
    also references the challenge."""
    k = 4
    b = CircuitBuilder(k, SPEC)
    q = b.fixed_column()
    w0 = b.advice_column(phase=0)
    w1 = b.advice_column(phase=1)
    theta = b.challenge(phase=0)

    b.gate(
        "phase",
        lambda qf: qf(q.cur()) * (qf(w1.cur()) - qf(theta) * qf(w0.cur())),
    )

    rng = random.Random(11)
    rows = 5
    fixed = {(0, r): Fp.one(SPEC) for r in range(rows)}
    w0_vals = {r: Fp(rng.randrange(SPEC.p), SPEC) for r in range(rows)}

    def witness_fn(phase, challenges):
        if phase == 0:
            return {(0, r): v for r, v in w0_vals.items()}
        th = challenges[b.challenge_index(theta)]
        return {(1, r): th * v for r, v in w0_vals.items()}

    info, circuit = b.build(fixed, [], witness_fn)
    assert info.num_challenges[0] == 1
    assert len(info.num_witness_polys) == 2
    prove_verify(info, circuit)
