"""Cross-backend equivalence: the JAX (TPU-path) kernels must agree with the
native C++ host runtime on identical inputs — same uint32[...,16] layout in
and out.  These run the jitted `_*_jax` implementations directly even when the
suite default backend is cpp."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from plonkish_tpu.curves.device import _padd_jax, _pdbl_jax, from_affine_host
from plonkish_tpu.curves.host import AffinePoint
from plonkish_tpu.curves.specs import BN254_G1
from plonkish_tpu.fields import BN254_FR, limb

SPEC = BN254_FR
RNG = random.Random(0xABCD)


def rand_mont(n):
    return limb.to_mont(
        SPEC, limb.from_ints([RNG.randrange(SPEC.p) for _ in range(n)])
    )


def asnp(x):
    return np.asarray(x, dtype=np.uint32)


def test_mont_mul_equivalence():
    a, b = rand_mont(33), rand_mont(33)
    cpp = limb.mont_mul(SPEC, a, b)
    jax_out = limb._mont_mul_jax(SPEC, jnp.asarray(asnp(a)), jnp.asarray(asnp(b)))
    assert np.array_equal(asnp(cpp), asnp(jax_out))


def test_add_sub_equivalence():
    a, b = rand_mont(17), rand_mont(17)
    assert np.array_equal(
        asnp(limb.add(SPEC, a, b)),
        asnp(limb._add_jax(SPEC, jnp.asarray(asnp(a)), jnp.asarray(asnp(b)))),
    )
    assert np.array_equal(
        asnp(limb.sub(SPEC, a, b)),
        asnp(limb._sub_jax(SPEC, jnp.asarray(asnp(a)), jnp.asarray(asnp(b)))),
    )
    assert np.array_equal(
        asnp(limb.neg(SPEC, a)),
        asnp(limb._neg_jax(SPEC, jnp.asarray(asnp(a)))),
    )


def test_batch_inv_equivalence():
    a = rand_mont(16)
    a = limb.set_index(a, 3, np.zeros(16, dtype=np.uint32))
    cpp = limb.batch_inv(SPEC, a)
    jax_out = limb._batch_inv_jax(SPEC, jnp.asarray(asnp(a)))
    assert np.array_equal(asnp(cpp), asnp(jax_out))


def test_sum_scatter_equivalence():
    a = rand_mont(40)
    assert np.array_equal(
        asnp(limb.sum_reduce(SPEC, a)),
        asnp(limb._sum_reduce_jax(SPEC, jnp.asarray(asnp(a)))),
    )
    idx = np.asarray([RNG.randrange(7) for _ in range(40)], dtype=np.int64)
    assert np.array_equal(
        asnp(limb.scatter_sum(SPEC, a, idx, 7)),
        asnp(limb._scatter_sum_jax(SPEC, jnp.asarray(asnp(a)), jnp.asarray(idx), 7)),
    )


def test_prefix_mul_equivalence():
    a = rand_mont(23)
    assert np.array_equal(
        asnp(limb.prefix_mul(SPEC, a)),
        asnp(limb._prefix_mul_jax(SPEC, jnp.asarray(asnp(a)))),
    )


def test_blocked_prefix_and_batch_inv(monkeypatch):
    """The row-blocked large-n variants (k>=22 z-polys HBM fix) are
    bit-identical to the flat formulations, including zeros and a
    non-multiple-of-block length."""
    monkeypatch.setattr(limb, "_BLOCK", 64)
    a = rand_mont(1000)
    a = limb.set_index(a, 17, np.zeros(16, dtype=np.uint32))
    a = limb.set_index(a, 999, np.zeros(16, dtype=np.uint32))
    aj = jnp.asarray(asnp(a))
    assert np.array_equal(
        asnp(limb._prefix_mul_jax(SPEC, aj)),
        asnp(limb._prefix_mul_blocked_jax(SPEC, aj)),
    )
    assert np.array_equal(
        asnp(limb._batch_inv_jax(SPEC, aj)),
        asnp(limb._batch_inv_blocked_jax(SPEC, aj)),
    )


def test_normalized_points_msm():
    """variable_base_msm over a pre-normalized basis (the cached-SRS commit
    path, pcs/kzg.py eq()) matches the projective path and the host
    Pippenger, identity in the stream included."""
    from plonkish_tpu.curves.device import from_affine_host
    from plonkish_tpu.curves.host import msm_host
    from plonkish_tpu.curves.msm import NormalizedPoints, variable_base_msm
    from plonkish_tpu.fields.host import Fp
    from plonkish_tpu.pallas.msm import normalize_points_jit

    curve = BN254_G1
    g = AffinePoint.generator(curve)
    n = 48
    pts = [g.scalar_mul(RNG.randrange(1, 10000)) for _ in range(n)]
    pts[5] = AffinePoint.identity(curve)
    scalars = [RNG.randrange(curve.scalar.p) for _ in range(n)]
    dev = jnp.asarray(asnp(from_affine_host(curve, pts)))
    scal = jnp.asarray(asnp(limb.from_ints(scalars)))
    norm = NormalizedPoints(*normalize_points_jit(curve, dev))
    expect = msm_host([Fp(s, curve.scalar) for s in scalars], pts)
    assert variable_base_msm(curve, scal, dev) == expect
    assert variable_base_msm(curve, scal, norm) == expect


def test_ec_equivalence():
    curve = BN254_G1
    g = AffinePoint.generator(curve)
    pts = [g.scalar_mul(RNG.randrange(1, curve.scalar.p)) for _ in range(8)]
    dev = from_affine_host(curve, pts)
    a, b = dev[0::2], dev[1::2]
    from plonkish_tpu.curves.device import padd, pdbl

    assert np.array_equal(
        asnp(padd(curve, a, b)),
        asnp(_padd_jax(curve, jnp.asarray(asnp(a)), jnp.asarray(asnp(b)))),
    )
    assert np.array_equal(
        asnp(pdbl(curve, dev)),
        asnp(_pdbl_jax(curve, jnp.asarray(asnp(dev)))),
    )


def test_sum_check_round_equivalence():
    """The fused JAX round kernel must produce the same round message as the
    native-path round evaluation (one tiny shape -> one compile)."""
    from plonkish_tpu.fields import Fp
    from plonkish_tpu.piop.sum_check import (
        EvaluationsProver,
        ProverState,
        VirtualPolynomial,
    )
    from plonkish_tpu.poly.multilinear import MLPoly
    from plonkish_tpu.utils import expression as ex
    from plonkish_tpu.utils.expression import Query

    num_vars = 3
    f = [Fp(RNG.randrange(SPEC.p), SPEC) for _ in range(1 << num_vars)]
    g = [Fp(RNG.randrange(SPEC.p), SPEC) for _ in range(1 << num_vars)]
    expr = (
        ex.Polynomial(Query(0)) * ex.Polynomial(Query(1)) + ex.identity()
    ) * ex.eq_xy(0) + ex.lagrange(1) * ex.Polynomial(Query(0, ex.Rotation(1)))
    polys = [MLPoly.from_fps(SPEC, f), MLPoly.from_fps(SPEC, g)]
    y = [Fp(RNG.randrange(SPEC.p), SPEC) for _ in range(num_vars)]
    vp = VirtualPolynomial(expr, polys, [], [y])
    state = ProverState(SPEC, num_vars, Fp(12345, SPEC), vp)
    prover = EvaluationsProver(state)

    cpp_msg = prover.prove_round(state)  # cpp path (suite default backend)
    jax_msg = prover._prove_round_jax(state)
    assert [int(v) for v in cpp_msg.values] == [int(v) for v in jax_msg.values]


@pytest.mark.skipif(
    __import__("os").environ.get("PLONKISH_TPU_SLOW") != "1",
    reason="slow XLA CPU compile (set PLONKISH_TPU_SLOW=1)",
)
def test_padd_wide_equivalence():
    """Digit-major complete addition must match the layout-minor kernel."""
    import jax

    from plonkish_tpu.curves.device import _padd_wide

    rng = random.Random(11)
    curve = BN254_G1
    g = AffinePoint.generator(curve)
    pts = [g.scalar_mul(rng.randrange(1, curve.scalar.p)) for _ in range(8)]
    qts = [g.scalar_mul(rng.randrange(1, curve.scalar.p)) for _ in range(7)]
    qts.append(AffinePoint.identity(curve))
    p = jnp.asarray(np.asarray(from_affine_host(curve, pts), dtype=np.uint32))
    q = jnp.asarray(np.asarray(from_affine_host(curve, qts), dtype=np.uint32))
    want = _padd_jax(curve, p, q)
    wide = jax.jit(lambda a, b: jnp.transpose(
        _padd_wide(curve, jnp.transpose(a, (1, 2, 0)), jnp.transpose(b, (1, 2, 0))),
        (2, 0, 1),
    ))(p, q)
    assert np.array_equal(np.asarray(want), np.asarray(wide))


def test_z_polys_row_blocked_equivalence():
    # the row-blocked (lax.scan over row blocks) permutation-z path must be
    # bit-identical to the fused one — it exists purely to bound HBM temps
    # at k>=21 on a single chip (r03 TPU session OOM)
    from plonkish_tpu.backend.hyperplonk.prover import _z_polys_jax
    from plonkish_tpu.fields.spec import int_to_digits
    from plonkish_tpu.utils.bh import BooleanHypercube

    num_vars, p_cnt, nc = 6, 3, 3
    n = 1 << num_vars
    chunk_size = -(-p_cnt // nc)
    perm = jnp.asarray(asnp(rand_mont(p_cnt * n))).reshape(p_cnt, n, limb.L)
    wit = jnp.asarray(asnp(rand_mont(p_cnt * n))).reshape(p_cnt, n, limb.L)
    offsets = jnp.asarray(
        np.stack(
            [
                int_to_digits(SPEC.to_mont((g << num_vars) % SPEC.p))
                for g in range(p_cnt)
            ]
        )
    )
    beta = jnp.asarray(asnp(rand_mont(1))[0])
    gamma = jnp.asarray(asnp(rand_mont(1))[0])
    bh = BooleanHypercube(num_vars)
    order_bs = jnp.asarray(bh.iter_array[1:])
    nth_map = jnp.asarray(bh.nth_map)

    fused = _z_polys_jax(
        SPEC, num_vars, nc, chunk_size, None,
        perm, wit, offsets, beta, gamma, order_bs, nth_map,
    )
    blocked = _z_polys_jax(
        SPEC, num_vars, nc, chunk_size, 16,
        perm, wit, offsets, beta, gamma, order_bs, nth_map,
    )
    assert np.array_equal(asnp(fused[0]), asnp(blocked[0]))
    assert np.array_equal(asnp(fused[1]), asnp(blocked[1]))


def test_coeff_round_row_blocked_equivalence(monkeypatch):
    # the row-blocked coeff-round accumulation must match the fused one
    # (it exists to bound HBM temps in the k>=20 batch-open — r04 OOM)
    import jax

    from plonkish_tpu.piop import sum_check as sc

    t, size = 3, 64
    eq = jnp.asarray(asnp(rand_mont(t * 2 * size))).reshape(t, 2 * size, limb.L)
    p = jnp.asarray(asnp(rand_mont(t * 2 * size))).reshape(t, 2 * size, limb.L)
    scal = jnp.asarray(asnp(rand_mont(t)))
    mask = np.ones(size, np.uint32)
    mask[-5:] = 0
    with jax.disable_jit():
        monkeypatch.setattr(sc, "_COEFF_ROW_BLOCK", 1 << 16)
        fused = sc._coeff_round_jax(SPEC, eq, p, scal, jnp.asarray(mask))
        monkeypatch.setattr(sc, "_COEFF_ROW_BLOCK", 8)
        blocked = sc._coeff_round_jax(SPEC, eq, p, scal, jnp.asarray(mask))
    assert np.array_equal(asnp(fused), asnp(blocked))


def test_lookup_m_device_equivalence():
    # device sort/segment m-counting == host np.unique path, same m poly
    from plonkish_tpu.backend.hyperplonk import prover as hp
    from plonkish_tpu.poly.multilinear import MLPoly

    n = 64
    tbl_vals = [RNG.randrange(SPEC.p) for _ in range(n - 3)]
    tbl_vals += [tbl_vals[0], tbl_vals[1], tbl_vals[1]]  # duplicate rows
    inp_vals = [tbl_vals[RNG.randrange(n)] for _ in range(n)]
    tbl = limb.to_mont(SPEC, limb.from_ints(tbl_vals))
    inp = limb.to_mont(SPEC, limb.from_ints(inp_vals))

    host = hp.lookup_m_polys([(MLPoly(SPEC, inp), MLPoly(SPEC, tbl))])[0]

    m_dev, bad = hp._lookup_m_jax(
        SPEC, jnp.asarray(asnp(inp)), jnp.asarray(asnp(tbl))
    )
    assert not bool(bad)
    assert np.array_equal(asnp(host.evals), asnp(m_dev))

    # an input value missing from the table must be flagged
    inp_bad = limb.to_mont(
        SPEC, limb.from_ints([v + 1 for v in inp_vals])
    )
    _, bad2 = hp._lookup_m_jax(
        SPEC, jnp.asarray(asnp(inp_bad)), jnp.asarray(asnp(tbl))
    )
    assert bool(bad2)


def test_fold_all_flattened_equivalence():
    # _fold_all_jax (flattened + row-blocked) == per-table fold_pairs
    from plonkish_tpu.piop.sum_check import _fold_all_jax

    t, size = 3, 32
    stacked = jnp.asarray(asnp(rand_mont(t * 2 * size))).reshape(
        t, 2 * size, limb.L
    )
    ch = jnp.asarray(asnp(rand_mont(1))[0])
    out = _fold_all_jax(SPEC, stacked, ch)
    for ti in range(t):
        want = limb._fold_pairs_jax(SPEC, stacked[ti], ch)
        assert np.array_equal(asnp(out[ti]), asnp(want))


def test_fold_all_row_blocked_equivalence(monkeypatch):
    import jax

    from plonkish_tpu.piop import sum_check as sc

    t, size = 2, 64
    stacked = jnp.asarray(asnp(rand_mont(t * 2 * size))).reshape(
        t, 2 * size, limb.L
    )
    ch = jnp.asarray(asnp(rand_mont(1))[0])
    with jax.disable_jit():
        monkeypatch.setattr(sc, "_FOLD_ROW_BLOCK", 1 << 18)
        flat = sc._fold_all_jax(SPEC, stacked, ch)
        monkeypatch.setattr(sc, "_FOLD_ROW_BLOCK", 16)
        blocked = sc._fold_all_jax(SPEC, stacked, ch)
    assert np.array_equal(asnp(flat), asnp(blocked))
