"""Number-theoretic transform over prime-field digit tensors.

The reference gets FFTs from halo2's `best_fft` (used by its halo2/univariate
benchmark systems; this repo's HyperPlonk path is FFT-free).  TPU-first
design: the Stockham autosort formulation — every stage is a contiguous
reshape + one elementwise Montgomery multiply + an add/sub pair, no
bit-reversal gather anywhere, so the whole transform is k fused
elementwise passes that XLA pipelines back-to-back.  Twiddle tables are
precomputed host-side per (field, size) and cached as full-width arrays
(one [n/2, L] tensor per stage) so both backends run pure same-shape
elementwise ops.

Multi-chip note (SURVEY §2.8): stage s exchanges elements at stride n/2^s;
sharded over a mesh the first log2(n_dev) stages are cross-chip butterflies
(ppermute pairs), the rest shard-local — the classic distributed-FFT
decomposition.
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np

from ..fields import limb
from ..fields.spec import FieldSpec, int_to_digits

# multiplicative generators (smallest; verified by order checks in tests)
_GENERATORS = {}


def _two_adicity(p: int) -> int:
    t, s = p - 1, 0
    while t % 2 == 0:
        t //= 2
        s += 1
    return s


def root_of_unity(spec: FieldSpec, log_n: int) -> int:
    """Primitive 2^log_n-th root of unity in spec's field."""
    s = _two_adicity(spec.p)
    assert log_n <= s, f"field has 2-adicity {s} < {log_n}"
    g = _GENERATORS.get(spec.p)
    if g is None:
        for cand in (3, 5, 7, 10, 11, 13):
            w = pow(cand, (spec.p - 1) >> s, spec.p)
            if pow(w, 1 << (s - 1), spec.p) != 1:
                g = cand
                break
        _GENERATORS[spec.p] = g
    w = pow(g, (spec.p - 1) >> s, spec.p)
    return pow(w, 1 << (s - log_n), spec.p)


@functools.lru_cache(maxsize=64)
def _plan(spec: FieldSpec, log_n: int, inverse: bool):
    """Per-stage twiddle tables (Montgomery form, numpy [n/2, L]).

    DIF stage t splits each of the 2^t size-(n/2^t) sub-transforms:
    b_j = (x_j − x_{j+l})·w_t^j with w_t the root of order n/2^t, j = 0..l−1
    the row index, repeated across the 2^t sub-transform columns.
    """
    n = 1 << log_n
    w = root_of_unity(spec, log_n)
    if inverse:
        w = pow(w, spec.p - 2, spec.p)
    stages: List[np.ndarray] = []
    for t in range(log_n):
        cols = 1 << t
        l = n >> (t + 1)
        wt = pow(w, 1 << t, spec.p)  # root of order n >> t
        tw = np.empty((l, cols, limb.L), dtype=np.uint32)
        acc = 1
        for j in range(l):
            tw[j, :] = int_to_digits(spec.to_mont(acc))
            acc = (acc * wt) % spec.p
        stages.append(tw.reshape(l * cols, limb.L))
    n_inv = int_to_digits(spec.to_mont(pow(n, spec.p - 2, spec.p)))
    return stages, n_inv


def ntt(spec: FieldSpec, values, inverse: bool = False):
    """Forward/inverse NTT of a [n, L] Montgomery digit tensor (natural
    order in, natural order out — Stockham-style autosort: the new output
    bit produced by each DIF split is the most significant so far, so
    concatenating the even/odd branches along the sub-transform axis keeps
    columns index-sorted with no bit-reversal pass)."""
    n = values.shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    stages, n_inv = _plan(spec, log_n, inverse)
    xnp = limb.xnp
    x = values.reshape(n, 1, limb.L)
    for t in range(log_n):
        size = n >> t
        l = size >> 1
        cols = 1 << t
        a, b = x[:l], x[l:]
        tw = xnp.asarray(stages[t]).reshape(l, cols, limb.L)
        lo = limb.add(spec, a, b)
        hi = limb.mont_mul(spec, limb.sub(spec, a, b), tw)
        x = xnp.concatenate([lo, hi], axis=1)  # [l, 2*cols, L]
    x = x.reshape(n, limb.L)
    if inverse:
        ninv = n_inv if limb.IS_CPP else limb.jnp.asarray(n_inv)
        x = limb.mont_mul(spec, x, ninv)
    return x


def coset_scale(spec: FieldSpec, values, shift: int, invert: bool = False):
    """Multiply values[i] by shift^i (Montgomery in/out) — turns an NTT over
    H into one over the coset shift·H (quotient-polynomial evaluation)."""
    n = values.shape[0]
    s = pow(shift, spec.p - 2, spec.p) if invert else (shift % spec.p)
    pows = np.empty((n, limb.L), dtype=np.uint32)
    acc = 1
    for i in range(n):
        pows[i] = int_to_digits(spec.to_mont(acc))
        acc = (acc * s) % spec.p
    p = pows if limb.IS_CPP else limb.jnp.asarray(pows)
    return limb.mont_mul(spec, values, p)
