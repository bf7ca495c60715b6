"""Struct-of-arrays field ops must match the tensor-form limb kernels."""

import random

import numpy as np
import pytest

import jax

from plonkish_tpu.fields import BN254_FR as SPEC
from plonkish_tpu.fields import limb, soa


def rand_tensors(n, seed=0):
    rng = random.Random(seed)
    a = limb.to_mont(SPEC, limb.from_ints([rng.randrange(SPEC.p) for _ in range(n)]))
    b = limb.to_mont(SPEC, limb.from_ints([rng.randrange(SPEC.p) for _ in range(n)]))
    return np.asarray(a, dtype=np.uint32), np.asarray(b, dtype=np.uint32)


def test_mont_sqr_matches_mont_mul():
    a_np, _ = rand_tensors(64, seed=7)
    a_np[0] = 0  # zero operand edge
    import jax.numpy as jnp

    def f(a):
        at = soa.from_tensor(a)
        return (soa.to_tensor(soa.mont_sqr(SPEC, at)),
                soa.to_tensor(soa.mont_mul(SPEC, at, at)))

    got, want = jax.jit(f)(jnp.asarray(a_np))
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("op", ["add", "sub", "mont_mul", "neg"])
def test_soa_matches_limb(op):
    a_np, b_np = rand_tensors(64, seed=hash(op) % 1000)
    a_np[0] = 0  # zero operand edge
    b_np[1] = a_np[1]  # equal operands (sub -> 0)

    def soa_fn(a, b):
        at, bt = soa.from_tensor(a), soa.from_tensor(b)
        if op == "neg":
            return soa.to_tensor(soa.neg(SPEC, at))
        return soa.to_tensor(getattr(soa, op)(SPEC, at, bt))

    import jax.numpy as jnp

    got = np.asarray(jax.jit(soa_fn)(jnp.asarray(a_np), jnp.asarray(b_np)))
    if op == "neg":
        want = np.asarray(limb._neg_jax(SPEC, jnp.asarray(a_np)))
    else:
        fn = {"add": limb._add_jax, "sub": limb._sub_jax,
              "mont_mul": limb._mont_mul_jax}[op]
        want = np.asarray(fn(SPEC, jnp.asarray(a_np), jnp.asarray(b_np)))
    assert np.array_equal(got, want), f"{op} mismatch"
