"""Device-resident Fiat-Shamir (piop/fiat_shamir.py) bit-exactness.

The device sponge must reproduce the host Keccak256 transcript exactly —
any divergence makes proofs unverifiable.  The sum-check driver itself
additionally cross-checks device vs replayed-host challenges on every prove
(sum_check.py _prove_device_fs), and tests/test_jax_mode_e2e.py runs the
full prover through this path (device_fs defaults on in jax mode).
"""

import random

import numpy as np
import jax.numpy as jnp

from plonkish_tpu.fields import BN254_FR, limb
from plonkish_tpu.fields.host import Fp
from plonkish_tpu.piop import fiat_shamir as fs
from plonkish_tpu.utils.keccak import _PyKeccak256, keccak_f as host_keccak_f
from plonkish_tpu.utils.transcript import Keccak256Transcript

SPEC = BN254_FR
RNG = random.Random(0xF5)


def test_keccak_f_bit_exact():
    for _ in range(3):
        st = [[RNG.getrandbits(64) for _ in range(5)] for _ in range(5)]
        lanes = np.array(
            [st[i % 5][i // 5] for i in range(25)], dtype=np.uint64
        )
        lo = jnp.asarray((lanes & 0xFFFFFFFF).astype(np.uint32))
        hi = jnp.asarray((lanes >> np.uint64(32)).astype(np.uint32))
        lo2, hi2 = fs.keccak_f(lo, hi)
        host = [row[:] for row in st]
        host_keccak_f(host)
        want = np.array(
            [host[i % 5][i // 5] for i in range(25)], dtype=np.uint64
        )
        got = np.asarray(lo2).astype(np.uint64) | (
            np.asarray(hi2).astype(np.uint64) << np.uint64(32)
        )
        assert np.array_equal(got, want)


def _fp_digits(fe):
    return jnp.asarray(
        np.array(
            [(int(fe) >> (16 * d)) & 0xFFFF for d in range(limb.L)],
            dtype=np.uint32,
        )
    )


def test_sponge_matches_host_transcript():
    """Seed from a mid-protocol host transcript, run absorb/squeeze rounds
    on device, challenges must match squeeze_challenge bit-for-bit —
    including block-boundary straddles (the absorb loop crosses the
    136-byte rate at varying offsets)."""
    tr = Keccak256Transcript(SPEC)
    for _ in range(11):  # pending = 352 % 136 = 80 bytes mid-block
        tr.common_field_element(Fp(RNG.randrange(SPEC.p), SPEC))
    lanes, pending = tr.export_sponge()
    sp = fs.DeviceSponge.from_host(lanes, pending)
    for _round, m in enumerate([4, 3, 7, 1, 5]):
        fes = [Fp(RNG.randrange(SPEC.p), SPEC) for _ in range(m)]
        for fe in fes:
            tr.common_field_element(fe)
            sp = sp.absorb_words(fs.digits_to_words(_fp_digits(fe)))
        ch_host = tr.squeeze_challenge()
        sp, digest = sp.squeeze()
        ch_dev = fs.challenge_digits(SPEC, digest)
        assert fs.digits_to_int(ch_dev) == int(ch_host), _round


def test_digit_sums_to_canonical():
    """Device reduction of exact u32 digit sums == host bigint reduce,
    including near-overflow magnitudes (every position at 2^32-1)."""
    cases = [
        np.array(
            [RNG.randrange(1 << 32) for _ in range(2 * limb.L)],
            dtype=np.uint32,
        )
        for _ in range(10)
    ]
    cases.append(np.full(2 * limb.L, (1 << 32) - 1, dtype=np.uint32))
    cases.append(np.zeros(2 * limb.L, dtype=np.uint32))
    for sums in cases:
        total = sum(int(s) << (16 * i) for i, s in enumerate(sums))
        want = SPEC.from_mont(total % SPEC.p)
        got = fs.digits_to_int(
            fs.digit_sums_to_canonical(SPEC, jnp.asarray(sums))
        )
        assert got == want


def test_round_message_program():
    """One _round_message_jit call == the host message/squeeze/interpolate
    sequence (Evaluations.write + squeeze_challenge + msg.evaluate)."""
    from plonkish_tpu.fields.spec import int_to_digits
    from plonkish_tpu.piop.sum_check import Evaluations, barycentric_weights

    d = 3
    tr = Keccak256Transcript(SPEC)
    tr.common_field_element(Fp(123456789, SPEC))
    lanes, pending = tr.export_sponge()
    sponge = fs.DeviceSponge.from_host(lanes, pending)

    sum_fp = Fp(RNG.randrange(SPEC.p), SPEC)
    evals_fp = [Fp(RNG.randrange(SPEC.p), SPEC) for _ in range(d)]
    off_fp = Fp(RNG.randrange(SPEC.p), SPEC)
    round_ = 2

    pts = [Fp(i, SPEC) for i in range(d + 1)]
    weights = barycentric_weights(pts)
    w_mont = jnp.asarray(
        np.stack([int_to_digits(SPEC.to_mont(int(x))) for x in weights])
    )
    pts_mont = jnp.asarray(
        np.stack([int_to_digits(SPEC.to_mont(int(x))) for x in pts])
    )
    step_mont = jnp.asarray(
        int_to_digits(SPEC.to_mont((1 << round_) % SPEC.p))
    )
    evals_canon = jnp.stack(
        [jnp.asarray(int_to_digits(int(e))) for e in evals_fp]
    )
    sum_mont = jnp.asarray(int_to_digits(SPEC.to_mont(int(sum_fp))))
    off_mont = jnp.asarray(int_to_digits(SPEC.to_mont(int(off_fp))))

    msg_canon, ch_canon, _ch_mont, next_sum, next_off, sponge = (
        fs.round_message(
            SPEC, d, sponge, evals_canon, sum_mont, off_mont,
            w_mont, pts_mont, step_mont,
        )
    )

    # host reference
    msg = Evaluations([sum_fp - evals_fp[0]] + evals_fp)
    msg.write(tr)
    ch_host = tr.squeeze_challenge()
    aux = Evaluations.auxiliary(d, SPEC)
    want_next = msg.evaluate(aux, ch_host)
    want_off = off_fp + ch_host * (1 << round_)

    got_msg = [fs.digits_to_int(row) for row in np.asarray(msg_canon)]
    assert got_msg == [int(v) for v in msg.values]
    assert fs.digits_to_int(ch_canon) == int(ch_host)
    assert SPEC.from_mont(fs.digits_to_int(next_sum)) == int(want_next)
    assert SPEC.from_mont(fs.digits_to_int(next_off)) == int(want_off)


def test_pack_unpack_digits_roundtrip():
    """Packed sum-check state words (pallas/sumcheck.py) must round-trip
    exact digits — runs here because test_pallas.py is hardware-gated."""
    from plonkish_tpu.pallas import sumcheck as psc

    rows = np.array(
        [[RNG.randrange(1 << 16) for _ in range(64)] for _ in range(limb.L)],
        dtype=np.uint32,
    )
    dm = jnp.stack([jnp.asarray(rows), jnp.asarray(rows) ^ jnp.uint32(7)])
    packed = psc.pack_digits(dm)
    assert packed.shape == (2, psc.W, 64)
    assert np.array_equal(np.asarray(psc.unpack_digits(packed)),
                          np.asarray(dm))


def test_pallas_round_evals_layout_cpu():
    """Regression: the Pallas round kernel flushes digit sums with lo/hi
    halves INTERLEAVED (out[2d] weight 2^16d, out[2d+1] weight 2^16(d+1));
    round_evals_canon must de-interleave before the positional reduction.
    A single degree-1 poly leaf keeps the interpret-mode kernel body tiny,
    so this runs on CPU (unlike the hardware-gated tests/test_pallas.py)."""
    import random as _random

    import jax

    from plonkish_tpu.pallas import sumcheck as psc
    from plonkish_tpu.utils.expression import Polynomial, Query, Rotation

    rng = _random.Random(0xABC)
    size = 128
    n = 2 * size
    vals = [rng.randrange(SPEC.p) for _ in range(n)]
    tbl = np.zeros((n, limb.L), dtype=np.uint32)
    for i, v in enumerate(vals):
        m_ = SPEC.to_mont(v)
        for d in range(limb.L):
            tbl[i, d] = (m_ >> (16 * d)) & 0xFFFF
    m = n.bit_length() - 1
    rev = psc.bitrev_perm(m)
    stacked = psc.pack_digits(
        jnp.asarray(tbl).T[None]
    )[:, :, jnp.asarray(rev)]  # [1, W, n] packed bit-reversed

    expr = Polynomial(Query(0, Rotation(0)))
    off = jnp.asarray(
        np.array(
            [(SPEC.to_mont(0) >> (16 * d)) & 0xFFFF for d in range(limb.L)],
            dtype=np.uint32,
        )
    )
    canon = psc.round_evals_canon(
        SPEC, expr, (("poly", 0, 0),), 1, 0, off, stacked
    )
    got = fs.digits_to_int(np.asarray(canon)[0])
    # degree-1 message at t=1: sum of the hi element of every pair
    want = sum(vals[2 * b + 1] for b in range(size)) % SPEC.p
    assert got == want
