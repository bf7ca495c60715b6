"""Device-resident Fiat–Shamir: the Keccak-256 transcript sponge as XLA ops.

The per-round transcript squeeze is the only host sync point in the classic
sum-check prover loop; on a network-attached TPU every sync costs a round
trip, which makes the prover latency-bound (bench: the k=18 and k=19
zero-checks both took ~4.6 s — size-independent).  Running the sponge on
device lets the driver enqueue every round's programs asynchronously and
fetch all round messages in ONE transfer at the end; the host transcript is
then replayed from the fetched messages (and must reproduce the device
challenges bit-for-bit — asserted by the driver).

Bit-exact with utils/keccak.py, which itself matches the reference
transcript semantics (/root/reference/plonkish_backend/src/util/
transcript.rs:127-131 squeeze = finalize_reset + re-absorb digest;
hash.rs:19-21 absorbs the 32-byte little-endian canonical repr).

Layout: the Keccak state is two [25] u32 arrays (lo/hi words of each 64-bit
lane), flat index i = x + 5*y — the same order the rate block absorbs words.
All permutation gathers and per-lane rotate amounts are compile-time numpy
constants, so keccak-f lowers to ~20 vector ops per round over a 24-round
`lax.scan` — a few microseconds per squeeze, but zero host round trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.spec import FieldSpec

RATE_LANES = 17  # 136-byte rate / 8
U32 = jnp.uint32


# ---------------------------------------------------------------------------
# keccak-f[1600]
# ---------------------------------------------------------------------------

def _tables():
    rot = np.array(
        [
            [0, 36, 3, 41, 18],
            [1, 44, 10, 45, 2],
            [62, 6, 43, 15, 61],
            [28, 55, 25, 21, 56],
            [27, 20, 39, 8, 14],
        ],
        dtype=np.uint32,
    )  # rot[x][y]
    rc = np.array(
        [
            0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
            0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
            0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
            0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
            0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
            0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
            0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
            0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
        ],
        dtype=np.uint64,
    )
    # rho+pi: dest lane (x'=y, y'=(2x+3y)%5) <- src lane (x, y), rotated
    perm = np.zeros(25, dtype=np.int32)  # perm[dest] = src
    rots = np.zeros(25, dtype=np.uint32)
    for x in range(5):
        for y in range(5):
            dest = y + 5 * ((2 * x + 3 * y) % 5)
            perm[dest] = x + 5 * y
            rots[dest] = rot[x][y]
    idx = np.arange(25)
    xs, ys = idx % 5, idx // 5
    chi1 = ((xs + 1) % 5 + 5 * ys).astype(np.int32)
    chi2 = ((xs + 2) % 5 + 5 * ys).astype(np.int32)
    theta_x = xs.astype(np.int32)  # lane i belongs to column x = i % 5
    return {
        "perm": perm,
        "rots": rots,
        "chi1": chi1,
        "chi2": chi2,
        "theta_x": theta_x,
        "rc_lo": (rc & 0xFFFFFFFF).astype(np.uint32),
        "rc_hi": (rc >> np.uint64(32)).astype(np.uint32),
    }


_T = _tables()


def _bshape(x, extra: int):
    """Broadcast a [25]- or [5]-lane constant over `extra` trailing dims."""
    return x.reshape(x.shape + (1,) * extra)


def _rotl64(lo, hi, s: np.ndarray):
    """Per-lane 64-bit rotate-left by constant amounts s (numpy [n]);
    lo/hi may carry trailing batch dims."""
    extra = lo.ndim - 1
    swap = _bshape(jnp.asarray((s // 32) % 2 == 1), extra)
    l_ = jnp.where(swap, hi, lo)
    h_ = jnp.where(swap, lo, hi)
    r = (s % 32).astype(np.uint32)
    rz = _bshape(jnp.asarray(r == 0), extra)
    r_ = _bshape(jnp.asarray(r), extra)
    rc_ = _bshape(jnp.asarray(((32 - r) % 32).astype(np.uint32)), extra)
    lo2 = jnp.where(rz, l_, (l_ << r_) | (h_ >> rc_))
    hi2 = jnp.where(rz, h_, (h_ << r_) | (l_ >> rc_))
    return lo2, hi2


def keccak_f(lo: jnp.ndarray, hi: jnp.ndarray):
    """keccak-f[1600] on [25, ...]-lane (lo, hi) u32 arrays (flat lane
    i = x + 5y; any trailing batch dims hash in parallel — the VPU runs
    one permutation per lane element)."""
    perm = jnp.asarray(_T["perm"])
    chi1 = jnp.asarray(_T["chi1"])
    chi2 = jnp.asarray(_T["chi2"])
    tx = jnp.asarray(_T["theta_x"])
    rcs = jnp.stack(
        [jnp.asarray(_T["rc_lo"]), jnp.asarray(_T["rc_hi"])], axis=1
    )  # [24, 2]

    def round_fn(carry, rc):
        lo, hi = carry
        # theta: c[x] = xor over y; flat reshape(5,5) is [y][x]
        l55 = lo.reshape((5, 5) + lo.shape[1:])
        h55 = hi.reshape((5, 5) + hi.shape[1:])
        c_lo = l55[0] ^ l55[1] ^ l55[2] ^ l55[3] ^ l55[4]
        c_hi = h55[0] ^ h55[1] ^ h55[2] ^ h55[3] ^ h55[4]
        left = np.array([(x - 1) % 5 for x in range(5)], dtype=np.int32)
        right = np.array([(x + 1) % 5 for x in range(5)], dtype=np.int32)
        r_lo, r_hi = _rotl64(
            c_lo[jnp.asarray(right)], c_hi[jnp.asarray(right)],
            np.ones(5, dtype=np.uint32),
        )
        d_lo = c_lo[jnp.asarray(left)] ^ r_lo
        d_hi = c_hi[jnp.asarray(left)] ^ r_hi
        lo = lo ^ d_lo[tx]
        hi = hi ^ d_hi[tx]
        # rho + pi
        b_lo, b_hi = _rotl64(lo[perm], hi[perm], _T["rots"])
        # chi
        lo = b_lo ^ (~b_lo[chi1] & b_lo[chi2])
        hi = b_hi ^ (~b_hi[chi1] & b_hi[chi2])
        # iota
        lo = lo.at[0].set(lo[0] ^ rc[0])
        hi = hi.at[0].set(hi[0] ^ rc[1])
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(round_fn, (lo, hi), rcs)
    return lo, hi


@functools.partial(jax.jit, static_argnums=1)
def keccak256_fixed(msg_words: jnp.ndarray, n_bytes: int) -> jnp.ndarray:
    """Batched Keccak-256 of N same-length messages: msg_words [M, N] u32
    (LE words, M = n_bytes/4, n_bytes % 4 == 0) -> [8, N] digest words.

    The whole batch absorbs in parallel — one keccak-f per 136-byte block
    over [25, N] lane tensors.  At VPU rates this is ~100x the multicore
    host hasher for large N (Brakedown column hashing, merkle levels)."""
    assert n_bytes % 4 == 0 and msg_words.shape[0] == n_bytes // 4
    n = msg_words.shape[1]
    blocks = n_bytes // 136 + 1
    total_words = 34 * blocks
    pad = np.zeros(total_words, dtype=np.uint32)
    pad[n_bytes // 4] |= np.uint32(0x01)  # pad10*1 domain bit
    pad[total_words - 1] |= np.uint32(0x80000000)
    stream = jnp.pad(
        msg_words, ((0, total_words - msg_words.shape[0]), (0, 0))
    ) | jnp.asarray(pad)[:, None]
    lo = jnp.zeros((25, n), dtype=U32)
    hi = jnp.zeros((25, n), dtype=U32)
    for b in range(blocks):
        blk = stream[34 * b: 34 * (b + 1)]
        lo = lo.at[:RATE_LANES].set(lo[:RATE_LANES] ^ blk[0::2])
        hi = hi.at[:RATE_LANES].set(hi[:RATE_LANES] ^ blk[1::2])
        lo, hi = keccak_f(lo, hi)
    return jnp.stack(
        [lo[0], hi[0], lo[1], hi[1], lo[2], hi[2], lo[3], hi[3]]
    )


# ---------------------------------------------------------------------------
# Sponge with static byte offsets
# ---------------------------------------------------------------------------

class DeviceSponge:
    """Functional Keccak-256 sponge whose buffered-byte count is a Python
    static (the sum-check protocol only absorbs 32-byte field reprs, so
    every offset is known at trace time).  Arrays may be tracers; methods
    return new sponges."""

    __slots__ = ("lo", "hi", "buf_lo", "buf_hi", "nbytes")

    def __init__(self, lo, hi, buf_lo, buf_hi, nbytes: int):
        assert nbytes % 8 == 0 and 0 <= nbytes <= 136
        self.lo, self.hi = lo, hi
        self.buf_lo, self.buf_hi = buf_lo, buf_hi
        self.nbytes = nbytes

    @classmethod
    def from_host(cls, lanes, pending: bytes) -> "DeviceSponge":
        """Import a host Keccak256 state (25 64-bit lane ints in absorb
        order + buffered bytes, len % 8 == 0 — all protocol absorbs are
        32-byte units)."""
        assert len(pending) % 8 == 0 and len(pending) < 136
        lanes = np.asarray(lanes, dtype=np.uint64)
        lo = jnp.asarray((lanes & 0xFFFFFFFF).astype(np.uint32))
        hi = jnp.asarray((lanes >> np.uint64(32)).astype(np.uint32))
        buf = np.zeros(RATE_LANES, dtype=np.uint64)
        for i in range(len(pending) // 8):
            buf[i] = int.from_bytes(pending[8 * i: 8 * i + 8], "little")
        buf_lo = jnp.asarray((buf & 0xFFFFFFFF).astype(np.uint32))
        buf_hi = jnp.asarray((buf >> np.uint64(32)).astype(np.uint32))
        return cls(lo, hi, buf_lo, buf_hi, len(pending))

    def _flush(self) -> "DeviceSponge":
        lo = self.lo.at[:RATE_LANES].set(self.lo[:RATE_LANES] ^ self.buf_lo)
        hi = self.hi.at[:RATE_LANES].set(self.hi[:RATE_LANES] ^ self.buf_hi)
        lo, hi = keccak_f(lo, hi)
        z = jnp.zeros(RATE_LANES, dtype=U32)
        return DeviceSponge(lo, hi, z, z, 0)

    def absorb_words(self, words: jnp.ndarray) -> "DeviceSponge":
        """Absorb [2k] u32 words (k 64-bit lanes, LE word pairs)."""
        k = words.shape[0] // 2
        lanes_lo, lanes_hi = words[0::2], words[1::2]
        s = self
        pos = 0
        while pos < k:
            off = s.nbytes // 8
            take = min(k - pos, RATE_LANES - off)
            buf_lo = s.buf_lo.at[off: off + take].set(
                lanes_lo[pos: pos + take]
            )
            buf_hi = s.buf_hi.at[off: off + take].set(
                lanes_hi[pos: pos + take]
            )
            s = DeviceSponge(
                s.lo, s.hi, buf_lo, buf_hi, s.nbytes + 8 * take
            )
            if s.nbytes == 136:
                s = s._flush()
            pos += take
        return s

    def squeeze(self):
        """finalize_reset + re-absorb digest (transcript.rs:127-131).
        Returns (new sponge, digest as [8] u32 LE words)."""
        # pad10*1: 0x01 at byte nbytes (lane lo byte 0), 0x80 at byte 135
        idx = self.nbytes // 8
        buf_lo = self.buf_lo.at[idx].set(self.buf_lo[idx] ^ jnp.uint32(1))
        buf_hi = self.buf_hi.at[16].set(
            self.buf_hi[16] ^ jnp.uint32(0x80000000)
        )
        lo = self.lo.at[:RATE_LANES].set(self.lo[:RATE_LANES] ^ buf_lo)
        hi = self.hi.at[:RATE_LANES].set(self.hi[:RATE_LANES] ^ buf_hi)
        lo, hi = keccak_f(lo, hi)
        digest = jnp.stack(
            [lo[0], hi[0], lo[1], hi[1], lo[2], hi[2], lo[3], hi[3]]
        )
        z25 = jnp.zeros(25, dtype=U32)
        z17 = jnp.zeros(RATE_LANES, dtype=U32)
        fresh = DeviceSponge(z25, z25, z17, z17, 0)
        return fresh.absorb_words(digest), digest


# ---------------------------------------------------------------------------
# Field-element <-> sponge-word packing (32-byte LE canonical reprs)
# ---------------------------------------------------------------------------

def digits_to_words(digits: jnp.ndarray) -> jnp.ndarray:
    """Canonical [L] 16-bit-digit u32 vector -> [8] u32 LE repr words."""
    d = digits.reshape(limb.L // 2, 2)
    return d[:, 0] | (d[:, 1] << jnp.uint32(16))


def words_to_digits(words: jnp.ndarray) -> jnp.ndarray:
    """[8] u32 LE words -> [16] 16-bit-digit u32 vector."""
    return jnp.stack(
        [words & jnp.uint32(0xFFFF), words >> jnp.uint32(16)], axis=1
    ).reshape(-1)


@functools.lru_cache(maxsize=8)
def _n_cond_subs(p: int) -> int:
    return ((1 << 256) - 1) // p


def challenge_digits(spec: FieldSpec, digest_words: jnp.ndarray):
    """digest (LE 256-bit) mod p as canonical digits
    (Fp.mod_from_le_bytes semantics)."""
    x = words_to_digits(digest_words)
    for _ in range(_n_cond_subs(spec.p)):
        x = limb._cond_sub_p(x, spec)
    return x


def digits_to_int(digits) -> int:
    """Host: canonical digit vector -> Python int."""
    return sum(int(v) << (16 * i) for i, v in enumerate(np.asarray(digits)))


# ---------------------------------------------------------------------------
# One fused round-message program: absorb the round polynomial, squeeze the
# challenge, interpolate the next claimed sum, update the identity offset
# ---------------------------------------------------------------------------

def _round_message_body(
    spec, degree: int, nbytes: int,
    evals_canon, sum_mont, off_mont,
    sp_lo, sp_hi, buf_lo, buf_hi,
    w_mont, pts_mont, step_mont,
):
    """evals_canon: [d, L] canonical round-poly values at t=1..d.
    Returns (msg_canon [d+1, L], ch_canon, ch_mont, next_sum_mont,
    next_off_mont, sponge lo/hi/buf_lo/buf_hi).

    - message: evals[0] = sum - evals[1] (classic/eval.rs), all absorbed as
      32-byte LE canonical reprs in order t=0..d;
    - challenge: finalize_reset digest mod p;
    - next sum: Lagrange-basis evaluation at the challenge over points 0..d
      with host-precomputed weights w_i = 1/Π_{j≠i}(i-j) — no device
      inversions (barycentric needs them; the direct form doesn't);
    - identity offset (mont): off += challenge · 2^round (step_mont)."""
    r2 = jnp.asarray(spec.r2_digits)
    evals_mont = limb._mont_mul_jax(spec, evals_canon, r2)
    eval0 = limb._sub_jax(spec, sum_mont, evals_mont[0])
    msg_mont = jnp.concatenate([eval0[None], evals_mont], axis=0)
    one_ = np.zeros((limb.L,), dtype=np.uint32)
    one_[0] = 1
    msg_canon = limb._mont_mul_jax(spec, msg_mont, jnp.asarray(one_))

    sp = DeviceSponge(sp_lo, sp_hi, buf_lo, buf_hi, nbytes)
    for i in range(degree + 1):
        sp = sp.absorb_words(digits_to_words(msg_canon[i]))
    sp, digest = sp.squeeze()
    ch_canon = challenge_digits(spec, digest)
    ch_mont = limb._mont_mul_jax(spec, ch_canon, r2)

    diffs = [
        limb._sub_jax(spec, ch_mont, pts_mont[i]) for i in range(degree + 1)
    ]
    one_m = limb.one(spec)
    prefix = [one_m]
    for i in range(degree):
        prefix.append(limb._mont_mul_jax(spec, prefix[-1], diffs[i]))
    suffix = [one_m] * (degree + 2)
    for i in range(degree, -1, -1):
        suffix[i] = limb._mont_mul_jax(spec, suffix[i + 1], diffs[i])
    next_sum = None
    for i in range(degree + 1):
        li = limb._mont_mul_jax(spec, prefix[i], suffix[i + 1])
        term = limb._mont_mul_jax(
            spec, limb._mont_mul_jax(spec, li, w_mont[i]), msg_mont[i]
        )
        next_sum = term if next_sum is None else limb._add_jax(
            spec, next_sum, term
        )

    next_off = limb._add_jax(
        spec, off_mont, limb._mont_mul_jax(spec, ch_mont, step_mont)
    )
    return (
        msg_canon, ch_canon, ch_mont, next_sum, next_off,
        sp.lo, sp.hi, sp.buf_lo, sp.buf_hi,
    )


_round_message_jit = functools.partial(jax.jit, static_argnums=(0, 1, 2))(
    _round_message_body
)


def round_message(spec, degree, sponge: DeviceSponge, evals_canon,
                  sum_mont, off_mont, w_mont, pts_mont, step_mont):
    """Driver-facing wrapper keeping the sponge's static byte offset."""
    (msg_canon, ch_canon, ch_mont, next_sum, next_off,
     lo, hi, b_lo, b_hi) = _round_message_jit(
        spec, degree, sponge.nbytes,
        evals_canon, sum_mont, off_mont,
        sponge.lo, sponge.hi, sponge.buf_lo, sponge.buf_hi,
        w_mont, pts_mont, step_mont,
    )
    # post-squeeze the sponge always holds exactly the re-absorbed digest
    new_sponge = DeviceSponge(lo, hi, b_lo, b_hi, 32)
    return msg_canon, ch_canon, ch_mont, next_sum, next_off, new_sponge


@functools.partial(jax.jit, static_argnums=(0, 1))
def _coeff_message_jit(
    spec, nbytes: int,
    v_canon, c0_base_mont, sum_mont,
    sp_lo, sp_hi, buf_lo, buf_hi,
):
    """Degree-2 Coefficients round message (classic/coeff.rs:16-39):
    v_canon = [2, L] canonical (v0, v2) kernel totals; c0 = c0_base + v0,
    c2 = v2, c1 = sum - 2c0 - c2.  Absorb [c0, c1, c2], squeeze, and
    Horner-evaluate the next claimed sum at the challenge."""
    r2 = jnp.asarray(spec.r2_digits)
    v_mont = limb._mont_mul_jax(spec, v_canon, r2)
    c0 = limb._add_jax(spec, c0_base_mont, v_mont[0])
    c2 = v_mont[1]
    c1 = limb._sub_jax(
        spec, limb._sub_jax(spec, sum_mont, limb._add_jax(spec, c0, c0)), c2
    )
    msg_mont = jnp.stack([c0, c1, c2])
    one_ = np.zeros((limb.L,), dtype=np.uint32)
    one_[0] = 1
    msg_canon = limb._mont_mul_jax(spec, msg_mont, jnp.asarray(one_))

    sp = DeviceSponge(sp_lo, sp_hi, buf_lo, buf_hi, nbytes)
    for i in range(3):
        sp = sp.absorb_words(digits_to_words(msg_canon[i]))
    sp, digest = sp.squeeze()
    ch_canon = challenge_digits(spec, digest)
    ch_mont = limb._mont_mul_jax(spec, ch_canon, r2)

    next_sum = limb._add_jax(
        spec,
        c0,
        limb._mont_mul_jax(
            spec, ch_mont,
            limb._add_jax(spec, c1, limb._mont_mul_jax(spec, ch_mont, c2)),
        ),
    )
    return (
        msg_canon, ch_canon, ch_mont, next_sum,
        sp.lo, sp.hi, sp.buf_lo, sp.buf_hi,
    )


def coeff_message(spec, sponge: DeviceSponge, v_canon, c0_base_mont,
                  sum_mont):
    """Driver-facing wrapper keeping the sponge's static byte offset."""
    (msg_canon, ch_canon, ch_mont, next_sum,
     lo, hi, b_lo, b_hi) = _coeff_message_jit(
        spec, sponge.nbytes, v_canon, c0_base_mont, sum_mont,
        sponge.lo, sponge.hi, sponge.buf_lo, sponge.buf_hi,
    )
    return (
        msg_canon, ch_canon, ch_mont, next_sum,
        DeviceSponge(lo, hi, b_lo, b_hi, 32),
    )


# ---------------------------------------------------------------------------
# Exact digit-sum reduction (device version of the Pallas round-evals
# host reduce: Σ sums[i]·2^16i mod p, then from_mont)
# ---------------------------------------------------------------------------

def digit_sums_to_canonical(spec: FieldSpec, sums: jnp.ndarray) -> jnp.ndarray:
    """[.., 2L] u32 exact digit sums of Montgomery values -> [.., L]
    canonical digits of (Σ sums[i]·2^16i)·R^{-1} mod p.

    The total can reach ~2^528 (u32 entries over 32 positions), past the
    p·R bound one REDC pass supports, so: normalize to exact digits, split
    T = lo + R·hi (R = 2^256 = 2^(16L)), and reduce each piece —
    T·R^{-1} = REDC(lo) + hi (mod p)."""
    pad = [(0, 0)] * (sums.ndim - 1) + [(0, 2)]
    t = limb._normalize(jnp.pad(sums, pad), relax_rounds=2)  # [.., 2L+2]
    lo, hi = t[..., : limb.L], t[..., limb.L:]  # hi: [.., L+2]
    lo_pad = [(0, 0)] * (lo.ndim - 1) + [(0, limb.L)]
    red_lo = limb.redc(spec, jnp.pad(lo, lo_pad))  # lo·R^{-1} mod p
    hi_lo, hi_hi = hi[..., : limb.L], hi[..., limb.L:]
    # hi_lo < 2^256: a few conditional subtractions
    for _ in range(_n_cond_subs(spec.p)):
        hi_lo = limb._cond_sub_p(hi_lo, spec)
    # hi_hi (2 digits) carries weight 2^256 = R: mont_mul(x, R²) = x·R mod p
    hh_pad = [(0, 0)] * (hi_hi.ndim - 1) + [(0, limb.L - 2)]
    hi_hi_red = limb._mont_mul_jax(
        spec, jnp.pad(hi_hi, hh_pad), jnp.asarray(spec.r2_digits)
    )
    return limb._add_jax(spec, limb._add_jax(spec, red_lo, hi_lo), hi_hi_red)
