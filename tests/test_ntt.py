"""NTT kernel tests: naive-DFT cross-check, inverse round-trip, coset."""

import random

import numpy as np
import pytest

from plonkish_tpu.fields import BLS12_381_FR, BN254_FR, limb
from plonkish_tpu.fields.host import Fp
from plonkish_tpu.poly.ntt import coset_scale, ntt, root_of_unity


def rand_tensor(spec, n, seed=0):
    rng = random.Random(seed)
    vals = [rng.randrange(spec.p) for _ in range(n)]
    return vals, limb.to_mont(spec, limb.from_ints(vals))


@pytest.mark.parametrize("spec", [BN254_FR, BLS12_381_FR], ids=lambda s: s.name)
@pytest.mark.parametrize("log_n", [1, 3, 5])
def test_ntt_matches_naive_dft(spec, log_n):
    n = 1 << log_n
    vals, x = rand_tensor(spec, n, seed=log_n)
    w = root_of_unity(spec, log_n)
    out = limb.to_ints(limb.from_mont(spec, ntt(spec, x)))
    for k in range(n):
        want = sum(v * pow(w, j * k, spec.p) for j, v in enumerate(vals)) % spec.p
        assert int(out[k]) == want, f"k={k}"


def test_ntt_inverse_round_trip():
    spec = BN254_FR
    n = 1 << 6
    vals, x = rand_tensor(spec, n, seed=9)
    back = ntt(spec, ntt(spec, x), inverse=True)
    got = limb.to_ints(limb.from_mont(spec, back))
    assert [int(v) for v in got] == vals


def test_coset_ntt_evaluates_on_coset():
    spec = BN254_FR
    log_n, shift = 4, 5
    n = 1 << log_n
    coeffs, x = rand_tensor(spec, n, seed=3)
    w = root_of_unity(spec, log_n)
    out = limb.to_ints(
        limb.from_mont(spec, ntt(spec, coset_scale(spec, x, shift)))
    )
    for k in range(n):
        pt = (shift * pow(w, k, spec.p)) % spec.p
        want = sum(c * pow(pt, j, spec.p) for j, c in enumerate(coeffs)) % spec.p
        assert int(out[k]) == want, f"k={k}"
