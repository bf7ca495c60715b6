"""Curve ops: device complete formulas + MSM vs host gold reference."""

import random

import jax.numpy as jnp
import pytest

from plonkish_tpu.curves.device import (
    from_affine_host,
    identity,
    padd,
    pdbl,
    to_affine_host,
    tree_sum,
)
from plonkish_tpu.curves.host import AffinePoint, msm_host
from plonkish_tpu.curves.msm import fixed_base_msm, variable_base_msm
from plonkish_tpu.curves.specs import BN254_G1, GRUMPKIN_G1
from plonkish_tpu.fields.host import Fp

RNG = random.Random(99)


def rand_points(curve, n):
    g = AffinePoint.generator(curve)
    return [g.scalar_mul(RNG.randrange(1, curve.scalar.p)) for _ in range(n)]


@pytest.mark.parametrize("curve", [BN254_G1, GRUMPKIN_G1], ids=lambda c: c.name)
def test_host_group_law(curve):
    g = AffinePoint.generator(curve)
    assert g.is_on_curve()
    assert (g + g) == g.scalar_mul(2)
    assert (g + g + g) == g.scalar_mul(3)
    assert (g - g).is_identity()
    assert (g.scalar_mul(5) + g.scalar_mul(7)) == g.scalar_mul(12)
    # order: n*G = identity
    assert g.scalar_mul(curve.scalar.p).is_identity()


def test_device_padd_pdbl_roundtrip():
    curve = BN254_G1
    pts = rand_points(curve, 8)
    dev = from_affine_host(curve, pts)
    back = to_affine_host(curve, dev)
    assert back == pts

    # pairwise adds
    a, b = dev[0::2], dev[1::2]
    sums = to_affine_host(curve, padd(curve, a, b))
    expect = [p + q for p, q in zip(pts[0::2], pts[1::2])]
    assert sums == expect

    # doubling (both via pdbl and via padd with itself — completeness)
    dbl = to_affine_host(curve, pdbl(curve, dev))
    assert dbl == [p.double() for p in pts]
    dbl2 = to_affine_host(curve, padd(curve, dev, dev))
    assert dbl2 == dbl

    # identity handling
    idn = jnp.broadcast_to(identity(curve), dev.shape)
    assert to_affine_host(curve, padd(curve, dev, idn)) == pts
    assert to_affine_host(curve, padd(curve, idn, idn)) == [
        AffinePoint.identity(curve)
    ] * len(pts)

    # opposite points -> identity
    negs = from_affine_host(curve, [-p for p in pts])
    assert to_affine_host(curve, padd(curve, dev, negs)) == [
        AffinePoint.identity(curve)
    ] * len(pts)


def test_tree_sum():
    curve = BN254_G1
    pts = rand_points(curve, 13)
    dev = from_affine_host(curve, pts)
    total = to_affine_host(curve, tree_sum(curve, dev)[None])[0]
    expect = AffinePoint.identity(curve)
    for p in pts:
        expect = expect + p
    assert total == expect


@pytest.mark.parametrize("n", [1, 7, 64])
def test_variable_base_msm(n):
    curve = BN254_G1
    pts = rand_points(curve, n)
    scalars = [Fp(RNG.randrange(curve.scalar.p), curve.scalar) for _ in range(n)]
    # include edge scalars
    if n >= 3:
        scalars[0] = Fp.zero(curve.scalar)
        scalars[1] = Fp.one(curve.scalar)
        scalars[2] = Fp(curve.scalar.p - 1, curve.scalar)
    dev = from_affine_host(curve, pts)
    got = variable_base_msm(curve, scalars, dev)
    assert got == msm_host(scalars, pts)


def test_fixed_base_msm():
    curve = BN254_G1
    g = AffinePoint.generator(curve)
    scalars = [Fp(RNG.randrange(curve.scalar.p), curve.scalar) for _ in range(9)]
    scalars[0] = Fp.zero(curve.scalar)
    out = to_affine_host(curve, fixed_base_msm(curve, g, scalars, c=8))
    assert out == [g.scalar_mul(int(s)) for s in scalars]
