"""Field-core correctness: limb-tensor ops vs exact Python-int arithmetic."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from plonkish_tpu.fields import BLS12_381_FR, BN254_FQ, BN254_FR, Fp, batch_invert, limb
from plonkish_tpu.fields.spec import R

SPECS = [BN254_FR, BN254_FQ, BLS12_381_FR]
RNG = random.Random(0xC0FFEE)


def rand_ints(spec, n):
    return [RNG.randrange(spec.p) for _ in range(n)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_roundtrip_ints(spec):
    xs = rand_ints(spec, 17) + [0, 1, spec.p - 1]
    digits = limb.from_ints(xs)
    back = limb.to_ints(digits)
    assert list(back) == xs


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    n = 33
    xs, ys = rand_ints(spec, n), rand_ints(spec, n)
    a, b = limb.from_ints(xs), limb.from_ints(ys)
    assert list(limb.to_ints(limb.add(spec, a, b))) == [
        (x + y) % spec.p for x, y in zip(xs, ys)
    ]
    assert list(limb.to_ints(limb.sub(spec, a, b))) == [
        (x - y) % spec.p for x, y in zip(xs, ys)
    ]
    assert list(limb.to_ints(limb.neg(spec, a))) == [(-x) % spec.p for x in xs]
    zero = limb.zeros((1,))
    assert list(limb.to_ints(limb.neg(spec, zero))) == [0]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_mul(spec):
    n = 33
    xs, ys = rand_ints(spec, n), rand_ints(spec, n)
    xs[:3] = [0, 1, spec.p - 1]
    ys[:3] = [spec.p - 1, 0, spec.p - 1]
    am = limb.to_mont(spec, limb.from_ints(xs))
    bm = limb.to_mont(spec, limb.from_ints(ys))
    prod = limb.from_mont(spec, limb.mont_mul(spec, am, bm))
    assert list(limb.to_ints(prod)) == [(x * y) % spec.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_form_roundtrip(spec):
    xs = rand_ints(spec, 9)
    a = limb.from_ints(xs)
    am = limb.to_mont(spec, a)
    assert list(limb.to_ints(am)) == [(x * R) % spec.p for x in xs]
    assert list(limb.to_ints(limb.from_mont(spec, am))) == xs


def test_pow_inv():
    spec = BN254_FR
    xs = rand_ints(spec, 5)
    am = limb.to_mont(spec, limb.from_ints(xs))
    cube = limb.from_mont(spec, limb.pow_const(spec, am, 3))
    assert list(limb.to_ints(cube)) == [pow(x, 3, spec.p) for x in xs]
    invs = limb.from_mont(spec, limb.inv(spec, am))
    assert list(limb.to_ints(invs)) == [pow(x, -1, spec.p) for x in xs]
    # 0 -> 0
    z = limb.to_mont(spec, limb.from_ints([0]))
    assert list(limb.to_ints(limb.inv(spec, z))) == [0]


def test_batch_inv():
    spec = BN254_FR
    xs = rand_ints(spec, 64)
    xs[7] = 0
    xs[32] = 0
    am = limb.to_mont(spec, limb.from_ints(xs))
    out = limb.from_mont(spec, limb.batch_inv(spec, am))
    expect = [pow(x, -1, spec.p) if x else 0 for x in xs]
    assert list(limb.to_ints(out)) == expect


def test_one_is_mont_one():
    spec = BN254_FR
    o = limb.one(spec, (3,))
    assert list(limb.to_ints(limb.from_mont(spec, o))) == [1, 1, 1]


def test_eq_iszero():
    spec = BN254_FR
    a = limb.from_ints([5, 0, 7])
    b = limb.from_ints([5, 1, 8])
    assert list(np.asarray(limb.eq(a, b))) == [True, False, False]
    assert list(np.asarray(limb.is_zero(a))) == [False, True, False]


def test_host_field():
    spec = BN254_FR
    a, b = Fp(12345, spec), Fp(spec.p - 3, spec)
    assert int(a + b) == (12345 - 3) % spec.p
    assert int(a * b) == (12345 * (spec.p - 3)) % spec.p
    assert int(a.inv() * a) == 1
    assert (-a) + a == Fp.zero(spec)
    assert Fp.from_le_bytes(a.to_repr(), spec) == a
    vals = [Fp(x, spec) for x in [3, 0, 17, spec.p - 1]]
    invs = batch_invert(vals)
    assert [int(v) for v in invs] == [
        pow(3, -1, spec.p),
        0,
        pow(17, -1, spec.p),
        spec.p - 1,  # (-1)^-1 = -1
    ]


def test_field_size():
    # mirrors reference test arithmetic.rs:202-205
    assert BN254_FR.num_bits == 254
