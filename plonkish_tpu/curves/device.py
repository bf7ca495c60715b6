"""Device elliptic-curve point kernels over limb tensors.

Points are homogeneous projective (X:Y:Z) triples of Montgomery limb tensors,
shape [..., 3, 16].  Addition and doubling use the Renes–Costello *complete*
formulas for a = 0 curves (eprint 2015/1060 Algs. 7 & 9): branch-free, valid
for identity/equal/opposite inputs — the property that lets bucket
accumulation and tree reductions run as pure SIMD with no data-dependent
control flow (TPUs have no atomics and hate divergence).

Cost: add = 12M + 19A, double = 8M + 12A over the base field.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import limb
from ..fields.host import Fp
from .host import AffinePoint
from .specs import CurveSpec


def identity(curve: CurveSpec, shape=()) -> jnp.ndarray:
    """(0 : 1 : 0) in Montgomery form."""
    zero = limb.zeros((*shape, 1))
    one = limb.one(curve.base, (*shape, 1))
    return limb.xnp.concatenate([zero, one, zero], axis=-2)


def from_affine_host(curve: CurveSpec, points) -> jnp.ndarray:
    """Host AffinePoints -> device projective tensor [N, 3, 16]."""
    xs, ys, zs = [], [], []
    for p in points:
        if p.is_identity():
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(int(p.x))
            ys.append(int(p.y))
            zs.append(1)
    spec = curve.base
    x = limb.to_mont(spec, limb.from_ints(xs))
    y = limb.to_mont(spec, limb.from_ints(ys))
    z = limb.to_mont(spec, limb.from_ints(zs))
    return limb.xnp.stack([x, y, z], axis=-2)


def to_affine_host(curve: CurveSpec, points: jnp.ndarray):
    """Device projective tensor -> host AffinePoints (batch inversion)."""
    spec = curve.base
    flat = points.reshape(-1, 3, limb.L)
    z = flat[:, 2]
    zinv = limb.batch_inv(spec, z)
    x = limb.mont_mul(spec, flat[:, 0], zinv)
    y = limb.mont_mul(spec, flat[:, 1], zinv)
    xs = limb.to_ints(limb.from_mont(spec, x))
    ys = limb.to_ints(limb.from_mont(spec, y))
    zzero = limb.to_ints(z)
    out = []
    for xi, yi, zi in zip(xs, ys, zzero):
        if int(zi) == 0:
            out.append(AffinePoint.identity(curve))
        else:
            out.append(
                AffinePoint(curve, Fp(int(xi), spec), Fp(int(yi), spec))
            )
    return out


def padd(curve: CurveSpec, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    if limb.IS_CPP:
        from ..ops import field_cpp as _cpp

        return _cpp.ec_padd(curve, p, q)
    return _padd_jax(curve, p, q)


@functools.partial(jax.jit, static_argnums=0)
def _padd_jax(curve: CurveSpec, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Complete projective addition (RCB16 Alg. 7, a=0)."""
    spec = curve.base
    mul = functools.partial(limb._mont_mul_jax, spec)
    add = functools.partial(limb._add_jax, spec)
    sub = functools.partial(limb._sub_jax, spec)
    b3 = limb.const(spec, curve.b3)

    x1, y1, z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    x2, y2, z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = mul(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))
    x3 = mul(add(x1, z1), add(x2, z2))
    y3 = sub(x3, add(t0, t2))
    x3 = add(add(t0, t0), t0)
    t2 = mul(b3, t2)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = mul(b3, y3)
    x3_out = sub(mul(t3, t1), mul(t4, y3))
    y3_out = add(mul(y3, x3), mul(t1, z3))
    z3_out = add(mul(z3, t4), mul(x3, t3))
    return jnp.stack([x3_out, y3_out, z3_out], axis=-2)


def identity_wide(curve: CurveSpec, shape=()) -> jnp.ndarray:
    """(0 : 1 : 0) in digit-major layout [3, L, *shape]."""
    import numpy as np

    base = np.zeros((3, limb.L), dtype=np.uint32)
    base[1] = np.asarray(curve.base.r_digits, dtype=np.uint32)  # Mont one
    arr = jnp.asarray(base).reshape(3, limb.L, *([1] * len(shape)))
    return jnp.broadcast_to(arr, (3, limb.L, *shape))


def _padd_wide(curve: CurveSpec, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Complete projective addition in digit-major layout: p, q and the
    result are [3, L, ...batch].  Same RCB16 Alg. 7 dataflow as `_padd_jax`
    but built on the `_*_wide` limb ops, so no transposes appear anywhere in
    the fused kernel and the minor axes stay large (tile-friendly)."""
    spec = curve.base
    mul = functools.partial(limb._mont_mul_wide, spec)
    add = functools.partial(limb._add_wide, spec)
    sub = functools.partial(limb._sub_wide, spec)
    b3 = limb._to_wide(limb.const(spec, curve.b3))
    b3 = b3.reshape(limb.L, *([1] * (p.ndim - 2)))

    x1, y1, z1 = p[0], p[1], p[2]
    x2, y2, z2 = q[0], q[1], q[2]

    t0 = mul(x1, x2)
    t1 = mul(y1, y2)
    t2 = mul(z1, z2)
    t3 = mul(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mul(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))
    x3 = mul(add(x1, z1), add(x2, z2))
    y3 = sub(x3, add(t0, t2))
    x3 = add(add(t0, t0), t0)
    t2 = mul(b3 + jnp.zeros_like(t2), t2)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = mul(b3 + jnp.zeros_like(y3), y3)
    x3_out = sub(mul(t3, t1), mul(t4, y3))
    y3_out = add(mul(y3, x3), mul(t1, z3))
    z3_out = add(mul(z3, t4), mul(x3, t3))
    return jnp.stack([x3_out, y3_out, z3_out], axis=0)


def _is_zero_wide(x):
    return jnp.all(x == 0, axis=0)


def _jdbl_wide(curve: CurveSpec, p):
    """Jacobian doubling, a=0 (dbl-2009-l: 2M+5S).  p = [3, L, ...]."""
    spec = curve.base
    mul = functools.partial(limb._mont_mul_wide, spec)
    add = functools.partial(limb._add_wide, spec)
    sub = functools.partial(limb._sub_wide, spec)
    x1, y1, z1 = p[0], p[1], p[2]
    a = mul(x1, x1)
    b = mul(y1, y1)
    c = mul(b, b)
    d = mul(add(x1, b), add(x1, b))
    d = sub(sub(d, a), c)
    d = add(d, d)
    e = add(add(a, a), a)
    f = mul(e, e)
    x3 = sub(f, add(d, d))
    c8 = add(c, c)
    c8 = add(c8, c8)
    c8 = add(c8, c8)
    y3 = sub(mul(e, sub(d, x3)), c8)
    z3 = mul(y1, z1)
    z3 = add(z3, z3)
    return jnp.stack([x3, y3, z3], axis=0)


def _jmadd_wide(curve: CurveSpec, p, x2, y2, inf2):
    """Branchless Jacobian += affine (madd-2007-bl: 7M+4S) with full case
    handling by select: p at infinity (Z=0) -> (x2,y2,1); equal points ->
    Jacobian doubling; opposite points -> infinity; inf2 mask -> p.

    2.5x fewer Montgomery muls than the complete-projective formula — this
    is the MSM bucket-accumulation inner loop, where the mul count is the
    performance wall on TPU (u32 multiply throughput bound)."""
    spec = curve.base
    mul = functools.partial(limb._mont_mul_wide, spec)
    add = functools.partial(limb._add_wide, spec)
    sub = functools.partial(limb._sub_wide, spec)
    x1, y1, z1 = p[0], p[1], p[2]

    z1z1 = mul(z1, z1)
    u2 = mul(x2, z1z1)
    s2 = mul(y2, mul(z1, z1z1))
    h = sub(u2, x1)
    hh = mul(h, h)
    i4 = add(hh, hh)
    i4 = add(i4, i4)
    j = mul(h, i4)
    r = sub(s2, y1)
    r = add(r, r)
    v = mul(x1, i4)
    x3 = sub(sub(mul(r, r), j), add(v, v))
    yj = mul(y1, j)
    y3 = sub(mul(r, sub(v, x3)), add(yj, yj))
    zh = add(z1, h)
    z3 = sub(sub(mul(zh, zh), z1z1), hh)
    out = jnp.stack([x3, y3, z3], axis=0)

    p1_inf = _is_zero_wide(z1)
    h_zero = _is_zero_wide(h)
    r_zero = _is_zero_wide(r)
    dbl = jnp.logical_and(h_zero, r_zero)
    opposite = jnp.logical_and(h_zero, jnp.logical_not(r_zero))

    out = jnp.where(opposite[None, None], jnp.zeros_like(out), out)
    out = jnp.where(dbl[None, None], _jdbl_wide(curve, p), out)
    one = limb._to_wide(limb.one(spec)).reshape(
        limb.L, *([1] * (x2.ndim - 1))
    )
    embed = jnp.stack(
        [x2, y2, one + jnp.zeros_like(x2)], axis=0
    )
    out = jnp.where(p1_inf[None, None], embed, out)
    return jnp.where(inf2[None, None], p, out)


def _jadd_wide(curve: CurveSpec, p, q):
    """Branchless full Jacobian addition (add-2007-bl: 11M+5S + cases)."""
    spec = curve.base
    mul = functools.partial(limb._mont_mul_wide, spec)
    add = functools.partial(limb._add_wide, spec)
    sub = functools.partial(limb._sub_wide, spec)
    x1, y1, z1 = p[0], p[1], p[2]
    x2, y2, z2 = q[0], q[1], q[2]

    z1z1 = mul(z1, z1)
    z2z2 = mul(z2, z2)
    u1 = mul(x1, z2z2)
    u2 = mul(x2, z1z1)
    s1 = mul(y1, mul(z2, z2z2))
    s2 = mul(y2, mul(z1, z1z1))
    h = sub(u2, u1)
    h2 = add(h, h)
    i = mul(h2, h2)
    j = mul(h, i)
    r = sub(s2, s1)
    r = add(r, r)
    v = mul(u1, i)
    x3 = sub(sub(mul(r, r), j), add(v, v))
    sj = mul(s1, j)
    y3 = sub(mul(r, sub(v, x3)), add(sj, sj))
    zz = add(z1, z2)
    z3 = mul(sub(sub(mul(zz, zz), z1z1), z2z2), h)
    out = jnp.stack([x3, y3, z3], axis=0)

    p1_inf = _is_zero_wide(z1)
    p2_inf = _is_zero_wide(z2)
    h_zero = _is_zero_wide(h)
    r_zero = _is_zero_wide(r)
    both = jnp.logical_not(jnp.logical_or(p1_inf, p2_inf))
    dbl = jnp.logical_and(both, jnp.logical_and(h_zero, r_zero))
    opposite = jnp.logical_and(
        both, jnp.logical_and(h_zero, jnp.logical_not(r_zero))
    )
    out = jnp.where(opposite[None, None], jnp.zeros_like(out), out)
    out = jnp.where(dbl[None, None], _jdbl_wide(curve, p), out)
    out = jnp.where(p1_inf[None, None], q, out)
    return jnp.where(p2_inf[None, None], p, out)


def _jdbl_soa(curve: CurveSpec, p):
    """Jacobian doubling over struct-of-arrays coordinates (see fields/soa.py
    — every digit is a named array so XLA fuses the whole formula)."""
    from ..fields import soa

    spec = curve.base
    x1, y1, z1 = p
    a = soa.mont_sqr(spec, x1)
    b = soa.mont_sqr(spec, y1)
    c = soa.mont_sqr(spec, b)
    xb = soa.add(spec, x1, b)
    d = soa.mont_sqr(spec, xb)
    d = soa.sub(spec, soa.sub(spec, d, a), c)
    d = soa.add(spec, d, d)
    e = soa.add(spec, soa.add(spec, a, a), a)
    f = soa.mont_sqr(spec, e)
    x3 = soa.sub(spec, f, soa.add(spec, d, d))
    c8 = soa.add(spec, c, c)
    c8 = soa.add(spec, c8, c8)
    c8 = soa.add(spec, c8, c8)
    y3 = soa.sub(spec, soa.mont_mul(spec, e, soa.sub(spec, d, x3)), c8)
    z3 = soa.mont_mul(spec, y1, z1)
    z3 = soa.add(spec, z3, z3)
    return (x3, y3, z3)


def _jmadd_soa(curve: CurveSpec, p, x2, y2, inf2):
    """Branchless Jacobian += affine over struct-of-arrays digit lists —
    the SoA twin of `_jmadd_wide` (same formula and select logic)."""
    from ..fields import soa

    spec = curve.base
    x1, y1, z1 = p
    z1z1 = soa.mont_sqr(spec, z1)
    u2 = soa.mont_mul(spec, x2, z1z1)
    s2 = soa.mont_mul(spec, y2, soa.mont_mul(spec, z1, z1z1))
    h = soa.sub(spec, u2, x1)
    hh = soa.mont_sqr(spec, h)
    i4 = soa.add(spec, hh, hh)
    i4 = soa.add(spec, i4, i4)
    j = soa.mont_mul(spec, h, i4)
    r = soa.sub(spec, s2, y1)
    r = soa.add(spec, r, r)
    v = soa.mont_mul(spec, x1, i4)
    x3 = soa.sub(
        spec, soa.sub(spec, soa.mont_sqr(spec, r), j),
        soa.add(spec, v, v),
    )
    yj = soa.mont_mul(spec, y1, j)
    y3 = soa.sub(
        spec, soa.mont_mul(spec, r, soa.sub(spec, v, x3)),
        soa.add(spec, yj, yj),
    )
    zh = soa.add(spec, z1, h)
    z3 = soa.sub(
        spec, soa.sub(spec, soa.mont_sqr(spec, zh), z1z1), hh
    )

    p1_inf = soa.is_zero(z1)
    h_zero = soa.is_zero(h)
    r_zero = soa.is_zero(r)
    dbl = jnp.logical_and(h_zero, r_zero)
    opposite = jnp.logical_and(h_zero, jnp.logical_not(r_zero))

    dx, dy, dz = _jdbl_soa(curve, p)
    one = soa.const(spec, 1, x2)
    zero = soa.zeros_like(x2)

    def pick(out, alt, cond):
        return soa.select(cond, alt, out)

    x3 = pick(pick(pick(pick(x3, zero, opposite), dx, dbl), x2, p1_inf),
              x1, inf2)
    y3 = pick(pick(pick(pick(y3, zero, opposite), dy, dbl), y2, p1_inf),
              y1, inf2)
    z3 = pick(pick(pick(pick(z3, zero, opposite), dz, dbl), one, p1_inf),
              z1, inf2)
    return (x3, y3, z3)


def _jadd_soa(curve: CurveSpec, p, q):
    """Branchless full Jacobian addition over struct-of-arrays digit lists
    (add-2007-bl; the SoA twin of `_jadd_wide`).  p, q: (x, y, z) tuples of
    L-digit lists.  Pure elementwise ops, so XLA fuses the whole ~500-op
    formula into a handful of memory passes — used for the MSM bucket
    reduction, where the tensor-form `_jadd_wide` runs ~40x slower
    (pad/concat ops break fusion; docs/PERF_NOTES.md)."""
    from ..fields import soa

    spec = curve.base
    x1, y1, z1 = p
    x2, y2, z2 = q
    mul = lambda a, b: soa.mont_mul(spec, a, b)
    add = lambda a, b: soa.add(spec, a, b)
    sub = lambda a, b: soa.sub(spec, a, b)
    sqr = lambda a: soa.mont_sqr(spec, a)

    z1z1 = sqr(z1)
    z2z2 = sqr(z2)
    u1 = mul(x1, z2z2)
    u2 = mul(x2, z1z1)
    s1 = mul(y1, mul(z2, z2z2))
    s2 = mul(y2, mul(z1, z1z1))
    h = sub(u2, u1)
    h2 = add(h, h)
    i = sqr(h2)
    j = mul(h, i)
    r = sub(s2, s1)
    r = add(r, r)
    v = mul(u1, i)
    x3 = sub(sub(sqr(r), j), add(v, v))
    sj = mul(s1, j)
    y3 = sub(mul(r, sub(v, x3)), add(sj, sj))
    zz = add(z1, z2)
    z3 = mul(sub(sub(sqr(zz), z1z1), z2z2), h)

    p1_inf = soa.is_zero(z1)
    p2_inf = soa.is_zero(z2)
    h_zero = soa.is_zero(h)
    r_zero = soa.is_zero(r)
    both = jnp.logical_not(jnp.logical_or(p1_inf, p2_inf))
    dbl = jnp.logical_and(both, jnp.logical_and(h_zero, r_zero))
    opposite = jnp.logical_and(
        both, jnp.logical_and(h_zero, jnp.logical_not(r_zero))
    )
    dx, dy, dz = _jdbl_soa(curve, p)
    zero = soa.zeros_like(x1)

    def out(v3, dv, qv, pv):
        o = soa.select(opposite, zero, v3)
        o = soa.select(dbl, dv, o)
        o = soa.select(p1_inf, qv, o)
        return soa.select(p2_inf, pv, o)

    return (out(x3, dx, x2, x1), out(y3, dy, y2, y1), out(z3, dz, z2, z1))


def _jmadd_soa_incomplete(curve: CurveSpec, p, x2, y2, inf2):
    """Jacobian += affine WITHOUT the doubling/opposite/accumulator-infinity
    branches (madd-2007-bl, 8M+3S) — ~40% fewer Montgomery muls than the
    complete `_jmadd_soa`, whose unconditional doubling fallback dominates
    the MSM bucket kernel's per-step cost.

    Valid only when the accumulator can never equal ±the incoming point and
    is never the identity: the Pallas MSM guarantees this by initializing
    every bucket to a fresh random blind point R (subtracted exactly at the
    end), so a collision requires guessing a partial sum offset by R —
    probability ~2^-254 per add, and a miss only yields an invalid proof,
    never an unsound one.  `inf2` (padding / zero-digit points) is still
    handled: the accumulator passes through unchanged."""
    from ..fields import soa

    spec = curve.base
    x1, y1, z1 = p
    z1z1 = soa.mont_sqr(spec, z1)
    u2 = soa.mont_mul(spec, x2, z1z1)
    s2 = soa.mont_mul(spec, y2, soa.mont_mul(spec, z1, z1z1))
    h = soa.sub(spec, u2, x1)
    hh = soa.mont_sqr(spec, h)
    i4 = soa.add(spec, hh, hh)
    i4 = soa.add(spec, i4, i4)
    j = soa.mont_mul(spec, h, i4)
    r = soa.sub(spec, s2, y1)
    r = soa.add(spec, r, r)
    v = soa.mont_mul(spec, x1, i4)
    x3 = soa.sub(
        spec, soa.sub(spec, soa.mont_sqr(spec, r), j),
        soa.add(spec, v, v),
    )
    yj = soa.mont_mul(spec, y1, j)
    y3 = soa.sub(
        spec, soa.mont_mul(spec, r, soa.sub(spec, v, x3)),
        soa.add(spec, yj, yj),
    )
    zh = soa.add(spec, z1, h)
    z3 = soa.sub(
        spec, soa.sub(spec, soa.mont_sqr(spec, zh), z1z1), hh
    )
    x3 = soa.select(inf2, x1, x3)
    y3 = soa.select(inf2, y1, y3)
    z3 = soa.select(inf2, z1, z3)
    return (x3, y3, z3)


def jacobian_to_affine_host(curve: CurveSpec, points: jnp.ndarray):
    """Host conversion of Jacobian [N, 3, L] Montgomery tensors to
    AffinePoints (x/z², y/z³)."""
    spec = curve.base
    flat = limb.np.asarray(points).reshape(-1, 3, limb.L)
    out = []
    for row in flat:
        from ..fields.spec import digits_to_int

        z = spec.from_mont(digits_to_int(row[2]))
        if z == 0:
            out.append(AffinePoint.identity(curve))
            continue
        x = spec.from_mont(digits_to_int(row[0]))
        y = spec.from_mont(digits_to_int(row[1]))
        zi = pow(z, spec.p - 2, spec.p)
        zi2 = zi * zi % spec.p
        out.append(
            AffinePoint(
                curve,
                Fp(x * zi2 % spec.p, spec),
                Fp(y * zi2 % spec.p * zi % spec.p, spec),
            )
        )
    return out


def pdbl(curve: CurveSpec, p: jnp.ndarray) -> jnp.ndarray:
    if limb.IS_CPP:
        from ..ops import field_cpp as _cpp

        return _cpp.ec_pdbl(curve, p)
    return _pdbl_jax(curve, p)


@functools.partial(jax.jit, static_argnums=0)
def _pdbl_jax(curve: CurveSpec, p: jnp.ndarray) -> jnp.ndarray:
    """Complete projective doubling (RCB16 Alg. 9, a=0)."""
    spec = curve.base
    mul = functools.partial(limb._mont_mul_jax, spec)
    add = functools.partial(limb._add_jax, spec)
    sub = functools.partial(limb._sub_jax, spec)
    b3 = limb.const(spec, curve.b3)

    x, y, z = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    t0 = mul(y, y)
    z3 = add(t0, t0)
    z3 = add(z3, z3)
    z3 = add(z3, z3)
    t1 = mul(y, z)
    t2 = mul(z, z)
    t2 = mul(b3, t2)
    x3 = mul(t2, z3)
    y3 = add(t0, t2)
    z3 = mul(t1, z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)
    t0 = sub(t0, t2)
    y3 = mul(t0, y3)
    y3 = add(x3, y3)
    t1 = mul(x, y)
    x3 = mul(t0, t1)
    x3 = add(x3, x3)
    return jnp.stack([x3, y3, z3], axis=-2)


def tree_sum(curve: CurveSpec, points: jnp.ndarray) -> jnp.ndarray:
    if limb.IS_CPP:
        from ..ops import field_cpp as _cpp

        return _cpp.ec_sum(curve, points)
    return _tree_sum_jax(curve, points)


@functools.partial(jax.jit, static_argnums=0)
def _tree_sum_jax(curve: CurveSpec, points: jnp.ndarray) -> jnp.ndarray:
    """Sum along axis 0 by pairwise complete-add tree reduction."""
    while points.shape[0] > 1:
        n = points.shape[0]
        if n % 2:
            pad = identity(curve, (1,))
            points = jnp.concatenate([points, pad], axis=0)
        points = _padd_jax(curve, points[0::2], points[1::2])
    return points[0]


def select(mask, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Where mask (shape [...]) pick point a else b."""
    return limb.xnp.where(mask[..., None, None], a, b)


def scalar_mul_const(curve: CurveSpec, points: jnp.ndarray, k: int) -> jnp.ndarray:
    """k·P for every point, shared host-known scalar k."""
    from ..fields.spec import int_to_digits

    k = int(k) % curve.scalar.p
    if limb.IS_CPP:
        from ..ops import field_cpp as _cpp

        return _cpp.ec_scalar_mul(curve, points, int_to_digits(k))
    # fixed 256-bit MSB-first ladder with the bits as a TRACED input: a
    # static exponent would bake into the program and recompile the ~256-
    # step scan for every distinct scalar (~minutes per compile on CPU)
    import numpy as _np

    nbits = curve.scalar.p.bit_length()
    bits = jnp.asarray(
        _np.array(
            [(k >> (nbits - 1 - i)) & 1 for i in range(nbits)],
            dtype=_np.uint32,
        )
    )
    return _scalar_mul_bits_jax(curve, points, bits)


@functools.partial(jax.jit, static_argnums=0)
def _scalar_mul_bits_jax(curve: CurveSpec, points: jnp.ndarray, bits):
    def body(acc, bit):
        acc = _pdbl_jax(curve, acc)
        added = _padd_jax(curve, acc, points)
        acc = jnp.where((bit != 0)[..., None, None], added, acc)
        return acc, None

    init = jnp.broadcast_to(identity(curve), points.shape)
    out, _ = jax.lax.scan(body, init, bits)
    return out
