"""Multi-scalar multiplication on TPU.

Pippenger re-designed for SIMD-without-atomics (reference serial version:
/root/reference/plonkish_backend/src/util/arithmetic/msm.rs:84-181):

1. signed window digits (d' ∈ [−2^(c−1), 2^(c−1)], carry-propagated)
   extracted from 16-bit scalar limbs on device — halves the bucket count
   vs unsigned windows at the cost of a per-point conditional Y negation;
2. bucket accumulation over a digit-major [3, L, W, B, C] tensor
   (B = 2^(c−1)+1 buckets, C parallel chunks): a `fori_loop` walks each
   chunk serially; every (window, chunk) lane reads its bucket with a dense
   one-hot masked-reduce over the (small) bucket axis, complete-adds the
   point, and writes back with a one-hot select.  TPUs have no atomics and
   XLA scatters serialize, so the bucket axis is kept narrow and touched
   densely — pure streaming VPU traffic; complete formulas make collisions/
   doubling/identity branch-free.  The digit-major layout keeps the minor
   two axes (B, C) large, so XLA's (8, 128) tiling pads ~1.4x instead of
   the 8x it costs on a [..., 3, 16] layout — which is what bounds C, and
   with it the loop trip count;
3. chunk axis folded by a pairwise padd tree;
4. per-window weighted bucket sum via the running-sum trick (fori_loop);
5. final window combination on host (W points, c doublings each).

Multi-chip: shard the point axis; steps 1-2 are shard-local, step 3's tree
becomes a psum-style all-reduce of [W, B] bucket tensors over the mesh.
"""

from __future__ import annotations

import functools
import math
import os
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..fields import limb
from ..fields.host import Fp
from .device import (
    _padd_jax,
    from_affine_host,
    identity,
    padd,
    to_affine_host,
    tree_sum,
)
from .host import AffinePoint
from .specs import CurveSpec


def window_size(num_scalars: int) -> int:
    """Window size for the dense bucket kernel: per-point cost is
    ~2·W·2^c bucket-row traffic + W padds, minimized at small c."""
    if num_scalars < 32:
        return 2
    if num_scalars < (1 << 14):
        return 4
    return 5


def _window_digits(scalars, c: int, num_windows: int):
    """[N, 16] canonical scalar digits -> [num_windows, N] bucket indices.

    Dispatches on the operand (not the global backend) so it works both
    eagerly on numpy under the cpp backend and inside a jit trace (the
    sharded MSM traces this even when the ambient backend is cpp)."""
    import numpy as np

    xnp = np if isinstance(scalars, np.ndarray) else jnp

    padded = xnp.concatenate(
        [scalars, xnp.zeros((scalars.shape[0], 2), dtype=np.uint32)], axis=1
    )
    outs = []
    mask = (1 << c) - 1
    for w in range(num_windows):
        off = w * c
        d, sh = off // 16, off % 16
        lo = padded[:, d] >> sh
        if sh > 0:
            hi = padded[:, d + 1] << (16 - sh)  # uint32 shifts wrap
        else:
            hi = xnp.zeros_like(lo)
        outs.append((lo | hi) & mask)
    return xnp.stack(outs, axis=0).astype(np.int32)


def _bucket_accumulate_narrow(curve, points, digits, c, num_chunks):
    """Unsigned-digit bucket accumulation in the row-minor [W, C, B, 3, L]
    layout with complete projective adds — empirically the fastest XLA
    schedule at large n on TPU (the digit-major/signed/Jacobian variants
    below are kept for study; XLA's layout assignment currently compiles
    this one best)."""
    n = points.shape[0]
    w = digits.shape[0]
    b = 1 << c
    chunk_len = -(-n // num_chunks)
    pad = num_chunks * chunk_len - n
    if pad:
        points = jnp.concatenate(
            [points, jnp.broadcast_to(identity(curve), (pad, 3, limb.L))],
            axis=0,
        )
        digits = jnp.concatenate(
            [digits, jnp.zeros((w, pad), dtype=jnp.int32)], axis=1
        )
    points = points.reshape(num_chunks, chunk_len, 3, limb.L)
    digits = digits.reshape(w, num_chunks, chunk_len)

    buckets = jnp.broadcast_to(
        identity(curve), (w, num_chunks, b, 3, limb.L)
    )
    iota_b = jnp.arange(b, dtype=jnp.int32)

    def body(t, buckets):
        pt = points[:, t]  # [C, 3, L]
        idx = digits[:, :, t]  # [W, C]
        onehot = iota_b[None, None, :] == idx[:, :, None]  # [W, C, B]
        mask = onehot[..., None, None]
        cur = jnp.sum(
            jnp.where(mask, buckets, jnp.uint32(0)), axis=2
        )  # [W, C, 3, L]
        new = _padd_jax(curve, cur, pt[None])
        return jnp.where(mask, new[:, :, None], buckets)

    buckets = jax.lax.fori_loop(0, chunk_len, body, buckets)
    while buckets.shape[1] > 1:
        m = buckets.shape[1]
        if m % 2:
            pad_b = jnp.broadcast_to(identity(curve), (w, 1, b, 3, limb.L))
            buckets = jnp.concatenate([buckets, pad_b], axis=1)
        buckets = _padd_jax(curve, buckets[:, 0::2], buckets[:, 1::2])
    return buckets[:, 0]  # [W, B, 3, L]


def _bucket_reduce_narrow(curve, buckets):
    """[W, B, 3, L] -> [W, 3, L]: Σ_j j·bucket[j] via running sums."""
    w, b = buckets.shape[0], buckets.shape[1]
    running = jnp.broadcast_to(identity(curve), (w, 3, limb.L))
    acc = running

    def body(i, carry):
        running, acc = carry
        j = b - 1 - i
        running = _padd_jax(curve, running, buckets[:, j])
        acc = _padd_jax(curve, acc, running)
        return (running, acc)

    _, acc = jax.lax.fori_loop(0, b - 1, body, (running, acc))
    return acc


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _msm_windows_narrow_jit(curve, inputs, c, num_windows, num_chunks):
    """Fused unsigned/complete MSM window sums (projective output)."""
    scalars, points = inputs
    digits = _window_digits(scalars, c, num_windows)
    buckets = _bucket_accumulate_narrow(curve, points, digits, c, num_chunks)
    return _bucket_reduce_narrow(curve, buckets)


_BLIND_CACHE: dict = {}


def _blind_point(curve: CurveSpec):
    """Per-process random blind point for the Pallas bucket kernel: buckets
    start at R instead of the identity so the inner loop can use the
    doubling-free incomplete addition (device.py:_jmadd_soa_incomplete).
    Returns (R as AffinePoint, its Montgomery affine digits [2, L])."""
    key = curve.name
    if key not in _BLIND_CACHE:
        import secrets

        import numpy as np

        from ..fields.spec import int_to_digits

        r = secrets.randbelow(curve.scalar.p - 2) + 2
        pt = AffinePoint.generator(curve).scalar_mul(r)
        spec = curve.base
        digs = np.stack(
            [
                int_to_digits(spec.to_mont(int(pt.x))),
                int_to_digits(spec.to_mont(int(pt.y))),
            ]
        ).astype(np.uint32)
        _BLIND_CACHE[key] = (pt, jnp.asarray(digs))
    return _BLIND_CACHE[key]


def _signed_window_digits(scalars, c: int, num_windows: int):
    """[N, 16] canonical digits -> (idx [W, N] in [0, 2^(c-1)],
    sign [W, N] bool): signed-digit recoding d' ∈ [−2^(c−1), 2^(c−1)] with
    carry propagation, halving the bucket count (bucket 0 has weight 0 and
    absorbs zero digits harmlessly)."""
    raw = _window_digits(scalars, c, num_windows)  # [W, N] int32
    half = 1 << (c - 1)
    full = 1 << c
    outs_idx, outs_sign = [], []
    carry = jnp.zeros(raw.shape[1:], dtype=jnp.int32)
    for w in range(num_windows):
        d = raw[w] + carry
        neg = d >= half  # d' = d - 2^c, |d'| = 2^c - d
        idx = jnp.where(neg, full - d, d)
        outs_idx.append(idx)
        outs_sign.append(neg)
        carry = neg.astype(jnp.int32)
    return jnp.stack(outs_idx, axis=0), jnp.stack(outs_sign, axis=0)


def _bucket_accumulate_wide(curve, xs, ys, inf, idx, sign, c, num_chunks):
    """xs/ys [L, N] affine coordinates (digit-major), inf [N] identity
    flags, idx/sign [W, N] -> Jacobian buckets [3, L, W, B, C] with
    B = 2^(c-1)+1.

    The inner loop is branchless Jacobian mixed addition (11M+4S with a
    7-mul doubling fallback under select) — ~2.5x fewer Montgomery muls
    than complete projective addition, which is the wall on TPU (u32
    multiply throughput).  Everything stays digit-major: every large
    tensor ends in (..., L, F) with F = W·C flattened, so XLA's layout
    assignment has one sensible choice and no tile-padding blowup."""
    from .device import _jmadd_wide, _jadd_wide, identity_wide

    spec = curve.base
    n = xs.shape[-1]
    w = idx.shape[0]
    b = (1 << (c - 1)) + 1
    chunk_len = -(-n // num_chunks)
    pad = num_chunks * chunk_len - n
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, pad)))
        ys = jnp.pad(ys, ((0, 0), (0, pad)))
        inf = jnp.pad(inf, (0, pad), constant_values=True)
        idx = jnp.concatenate(
            [idx, jnp.zeros((w, pad), dtype=jnp.int32)], axis=1
        )
        sign = jnp.concatenate(
            [sign, jnp.zeros((w, pad), dtype=bool)], axis=1
        )
    xs = xs.reshape(limb.L, num_chunks, chunk_len)
    ys = ys.reshape(limb.L, num_chunks, chunk_len)
    inf = inf.reshape(num_chunks, chunk_len)
    idx = idx.reshape(w, num_chunks, chunk_len)
    sign = sign.reshape(w, num_chunks, chunk_len)

    f = w * num_chunks
    buckets = jnp.broadcast_to(
        identity_wide(curve).reshape(1, 3, limb.L, 1), (b, 3, limb.L, f)
    )
    iota_b = jnp.arange(b, dtype=jnp.int32)

    def body(t, buckets):
        x2 = xs[:, :, t]  # [L, C]
        y2 = ys[:, :, t]
        ix = idx[:, :, t].reshape(f)  # [F]
        sg = sign[:, :, t]  # [W, C]
        yneg = limb._neg_wide(spec, y2)
        y_signed = jnp.where(sg[:, None, :], yneg[None], y2[None])  # [W,L,C]
        y_signed = jnp.moveaxis(y_signed, 0, 1).reshape(limb.L, f)
        x2f = jnp.broadcast_to(
            x2[:, None, :], (limb.L, w, num_chunks)
        ).reshape(limb.L, f)
        inff = jnp.broadcast_to(inf[None, :, t], (w, num_chunks)).reshape(f)
        mask = (iota_b[:, None] == ix[None, :])[:, None, None]  # [B,1,1,F]
        cur = jnp.sum(
            jnp.where(mask, buckets, jnp.uint32(0)), axis=0
        )  # [3, L, F]
        new = _jmadd_wide(curve, cur, x2f, y_signed, inff)
        return jnp.where(mask, new[None], buckets)

    buckets = jax.lax.fori_loop(0, chunk_len, body, buckets)
    # [B, 3, L, W*C] -> [3, L, W, B, C] for the fold + weighted reduction
    buckets = jnp.transpose(
        buckets.reshape(b, 3, limb.L, w, num_chunks), (1, 2, 3, 0, 4)
    )

    # Fold the chunk axis with a contiguous halving tree: each level adds
    # the upper half onto the lower half, so the work series sums to ~2x
    # one full-width pass and every level is a free contiguous slice (the
    # callers keep num_chunks a power of two).
    while buckets.shape[-1] > 1:
        m = buckets.shape[-1]
        if m % 2:
            pad_b = jnp.broadcast_to(
                identity_wide(curve).reshape(3, limb.L, 1, 1, 1),
                (3, limb.L, w, b, 1),
            )
            buckets = jnp.concatenate([buckets, pad_b], axis=-1)
            m += 1
        buckets = _jadd_wide(
            curve, buckets[..., : m // 2], buckets[..., m // 2 :]
        )
    return buckets[..., 0]  # [3, L, W, B]


def _bucket_reduce_wide(curve, buckets):
    """[3, L, W, B] -> [W, 3, L] Jacobian: Σ_j j·bucket[j] via running sums
    (msm.rs:166-179); bucket 0 is skipped (weight 0)."""
    from .device import _jadd_wide, identity_wide

    w, b = buckets.shape[2], buckets.shape[3]
    init = jnp.broadcast_to(
        identity_wide(curve).reshape(3, limb.L, 1), (3, limb.L, w)
    )

    def body(i, carry):
        running, acc = carry
        j = b - 1 - i
        bj = jax.lax.dynamic_index_in_dim(buckets, j, axis=3, keepdims=False)
        running = _jadd_wide(curve, running, bj)
        acc = _jadd_wide(curve, acc, running)
        return (running, acc)

    _, acc = jax.lax.fori_loop(0, b - 1, body, (init, init))
    return jnp.transpose(acc, (2, 0, 1))  # [W, 3, L]


def _bucket_accumulate_soa(curve, xs, ys, inf, idx, sign, c, num_chunks):
    """Struct-of-arrays twin of `_bucket_accumulate_wide`: bucket state is a
    pytree of 48 digit arrays [B, F], and the whole Jacobian mixed addition
    is elementwise between named arrays — XLA fuses the ~1500-op formula
    into a few passes instead of ~100 (see fields/soa.py)."""
    from ..fields import soa
    from .device import _jmadd_soa, identity_wide

    spec = curve.base
    n = xs.shape[-1]
    w = idx.shape[0]
    b = (1 << (c - 1)) + 1
    chunk_len = -(-n // num_chunks)
    pad = num_chunks * chunk_len - n
    if pad:
        xs = jnp.pad(xs, ((0, 0), (0, pad)))
        ys = jnp.pad(ys, ((0, 0), (0, pad)))
        inf = jnp.pad(inf, (0, pad), constant_values=True)
        idx = jnp.concatenate(
            [idx, jnp.zeros((w, pad), dtype=jnp.int32)], axis=1
        )
        sign = jnp.concatenate(
            [sign, jnp.zeros((w, pad), dtype=bool)], axis=1
        )
    xs = xs.reshape(limb.L, num_chunks, chunk_len)
    ys = ys.reshape(limb.L, num_chunks, chunk_len)
    inf = inf.reshape(num_chunks, chunk_len)
    idx = idx.reshape(w, num_chunks, chunk_len)
    sign = sign.reshape(w, num_chunks, chunk_len)

    f = w * num_chunks
    import numpy as np

    mont_one = [
        jnp.full((b, f), np.uint32(d)) for d in spec.r_digits
    ]
    zero_bf = [jnp.zeros((b, f), dtype=jnp.uint32) for _ in range(limb.L)]
    buckets = (list(zero_bf), list(mont_one), list(zero_bf))  # (0,1,0) = inf
    iota_b = jnp.arange(b, dtype=jnp.int32)

    def body(t, buckets):
        bx, by, bz = buckets
        ix = idx[:, :, t].reshape(f)  # [F]
        sg = sign[:, :, t].reshape(f)
        inff = jnp.broadcast_to(inf[None, :, t], (w, num_chunks)).reshape(f)
        x2, y2 = [], []
        for d in range(limb.L):
            xd = jnp.broadcast_to(
                xs[d, None, :, t], (w, num_chunks)
            ).reshape(f)
            yd = jnp.broadcast_to(
                ys[d, None, :, t], (w, num_chunks)
            ).reshape(f)
            x2.append(xd)
            y2.append(yd)
        yneg = soa.neg(spec, y2)
        y2s = soa.select(sg, yneg, y2)
        mask = iota_b[:, None] == ix[None, :]  # [B, F]

        def gather(ds):
            return [
                jnp.sum(jnp.where(mask, d, jnp.uint32(0)), axis=0)
                for d in ds
            ]

        cur = (gather(bx), gather(by), gather(bz))
        nx, ny, nz = _jmadd_soa(curve, cur, x2, y2s, inff)

        def scatter(old, new):
            return [
                jnp.where(mask, nd[None, :], od)
                for od, nd in zip(old, new)
            ]

        return (scatter(bx, nx), scatter(by, ny), scatter(bz, nz))

    bx, by, bz = jax.lax.fori_loop(0, chunk_len, body, buckets)
    # repack to [3, L, W, B, C] for the shared fold + weighted reduction
    coords = []
    for ds in (bx, by, bz):
        t = jnp.stack(ds, axis=0)  # [L, B, F]
        coords.append(
            jnp.transpose(
                t.reshape(limb.L, b, w, num_chunks), (0, 2, 1, 3)
            )
        )
    return jnp.stack(coords, axis=0)  # [3, L, W, B, C]


def _fold_and_reduce_wide(curve, buckets):
    """Weighted bucket reduction + chunk-fold on the [3, L, W, B, C]
    Jacobian bucket tensor -> [W, 3, L] window sums.

    Both stages are `fori_loop`s over a FIXED [3, L, W, C] shape so the
    compiled program holds exactly two Jacobian-add bodies regardless of B
    and C — the earlier unrolled halving tree compiled one jadd per level
    and took minutes of XLA compile (and ~1s runtime) at bench sizes:

    1. running-sum weighted reduction over the bucket axis at full lane
       width (Σ_b b·bucket[b,c] per lane c — msm.rs:166-179 per lane);
    2. lane fold tree: each level rolls the live upper half onto the lower
       half and parks dead lanes at the identity, halving the live width.
    """
    from .device import _jadd_wide, identity_wide

    w, b, c_lanes = buckets.shape[2], buckets.shape[3], buckets.shape[4]
    if c_lanes & (c_lanes - 1):
        pow2 = 1 << (c_lanes - 1).bit_length()
        pad = jnp.broadcast_to(
            identity_wide(curve).reshape(3, limb.L, 1, 1, 1),
            (3, limb.L, w, b, pow2 - c_lanes),
        )
        buckets = jnp.concatenate([buckets, pad], axis=-1)
        c_lanes = pow2

    ident = jnp.broadcast_to(
        identity_wide(curve).reshape(3, limb.L, 1, 1),
        (3, limb.L, w, c_lanes),
    )

    def bucket_body(i, carry):
        running, acc = carry
        j = b - 1 - i
        bj = jax.lax.dynamic_index_in_dim(buckets, j, axis=3, keepdims=False)
        running = _jadd_wide(curve, running, bj)
        acc = _jadd_wide(curve, acc, running)
        return (running, acc)

    _, acc = jax.lax.fori_loop(0, b - 1, bucket_body, (ident, ident))

    lane = jnp.arange(c_lanes, dtype=jnp.int32)

    def fold_body(i, x):
        half = c_lanes >> (i + 1)
        rolled = jnp.roll(x, -half, axis=-1)
        y = _jadd_wide(curve, x, rolled)
        keep = lane < half
        return jnp.where(keep, y, ident)

    levels = c_lanes.bit_length() - 1
    folded = jax.lax.fori_loop(0, levels, fold_body, acc)
    return jnp.transpose(folded[..., 0], (2, 0, 1))  # [W, 3, L]


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _msm_windows_soa_jit(curve, inputs, c, num_windows, num_chunks):
    """Fused MSM window sums over the SoA bucket kernel (Jacobian out)."""
    spec = curve.base
    scalars, points = inputs
    idx, sign = _signed_window_digits(scalars, c, num_windows)
    z = points[:, 2]
    zinv = limb._batch_inv_jax(spec, z)
    x = limb._mont_mul_jax(spec, points[:, 0], zinv)
    y = limb._mont_mul_jax(spec, points[:, 1], zinv)
    inf = jnp.all(z == 0, axis=-1)
    xs = jnp.transpose(x, (1, 0))
    ys = jnp.transpose(y, (1, 0))
    buckets = _bucket_accumulate_soa(
        curve, xs, ys, inf, idx, sign, c, num_chunks
    )
    return _fold_and_reduce_wide(curve, buckets)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _msm_windows_jit(curve, inputs, c, num_windows, num_chunks):
    """Fully fused MSM window sums: ONE device call computes signed window
    digits, normalizes the input points to affine (batched inversion — the
    bucket loop streams affine points into Jacobian mixed additions), runs
    dense bucket accumulation, the chunk-axis fold tree, and the weighted
    bucket reduction.  Returns JACOBIAN window sums [W, 3, L].  (Per-op
    dispatch costs a network RTT on the tunneled TPU, so everything between
    host scalars and the window sums must be a single program.)"""
    spec = curve.base
    scalars, points = inputs
    idx, sign = _signed_window_digits(scalars, c, num_windows)
    z = points[:, 2]
    zinv = limb._batch_inv_jax(spec, z)  # zeros stay zero
    x = limb._mont_mul_jax(spec, points[:, 0], zinv)
    y = limb._mont_mul_jax(spec, points[:, 1], zinv)
    inf = jnp.all(z == 0, axis=-1)  # [N]
    xs = jnp.transpose(x, (1, 0))  # [L, N]
    ys = jnp.transpose(y, (1, 0))
    buckets = _bucket_accumulate_wide(
        curve, xs, ys, inf, idx, sign, c, num_chunks
    )
    return _bucket_reduce_wide(curve, buckets)


class NormalizedPoints(NamedTuple):
    """Affine-normalized MSM basis (see pallas.msm.normalize_points_jit).

    Pass one of these as `points` to variable_base_msm when the same basis
    is used across many MSMs (the KZG SRS): the per-call 2^k batch
    inversion disappears."""

    x: jnp.ndarray  # [N, L]
    y: jnp.ndarray  # [N, L]
    inf: jnp.ndarray  # [N] bool


def _norm_to_projective(curve, norm: NormalizedPoints) -> jnp.ndarray:
    """Rebuild [N, 3, L] projective (z=0 encodes identity) for the MSM
    paths that want the packed form (host/narrow/sharded)."""
    spec = curve.base
    x, y, inf = norm
    one_ = limb.one(spec, (x.shape[0],))
    z = jnp.where(inf[:, None], jnp.uint32(0), one_)
    xz = jnp.where(inf[:, None], jnp.uint32(0), x)
    # identity encodes as (0, 1, 0) — from_affine_host's convention, and
    # what the native ec_msm's complete formulas expect
    yz = jnp.where(inf[:, None], one_, y)
    return jnp.stack([xz, yz, z], axis=1)


def variable_base_msm(
    curve: CurveSpec,
    scalars: Sequence[Fp] | jnp.ndarray,
    points: jnp.ndarray | NormalizedPoints,
    num_chunks: int | None = None,
) -> AffinePoint:
    """MSM of canonical scalars against device projective points [N, 3, L]
    (or a pre-normalized NormalizedPoints basis)."""
    if isinstance(scalars, (list, tuple)):
        scalars = limb.from_ints([int(s) for s in scalars])
    norm = None
    if isinstance(points, NormalizedPoints):
        norm = points
        n = norm.x.shape[0]
        points = None
    else:
        n = points.shape[0]
    assert scalars.shape[0] == n
    if n == 0:
        return AffinePoint.identity(curve)
    if points is None and limb.IS_CPP:
        points = _norm_to_projective(curve, norm)
    if limb.IS_CPP:
        from ..ops import field_cpp as _cpp

        out = _cpp.ec_msm(curve, scalars, points.reshape(n, 3, limb.L))
        return to_affine_host(curve, out[None])[0]
    import os as _os

    kernel = _os.environ.get("PLONKISH_TPU_MSM_KERNEL", "auto")
    if kernel == "auto":
        from .. import pallas as _pallas

        if n <= int(
            _os.environ.get("PLONKISH_TPU_MSM_HOST_MAX", 1 << 11)
        ):
            # Small MSMs run the native host Pippenger: the device kernels
            # pay a per-shape XLA compile (minutes on the CPU backend) and
            # a dispatch round-trip that dwarf the actual work below ~2^11
            # points.  Bit-exact — same math, different executor.
            kernel = "host"
        else:
            kernel = "pallas" if _pallas.is_available() else "narrow"
    if kernel != "host":
        # Mesh-parallel MSM (reference msm.rs:94-115 chunks per rayon
        # thread; here points/scalars shard across chips and the tiny
        # per-window sums all_gather over ICI — SURVEY §2.8).  Every
        # commit site inherits this: batch_commit / PCS opens call in here.
        from .. import parallel as _parallel

        mesh = _parallel.get_mesh()
        if (
            mesh is not None
            and mesh.devices.size > 1
            and n % mesh.devices.size == 0
            and n // mesh.devices.size >= 4
        ):
            from ..parallel.sharded import sharded_msm

            if points is None:
                points = _norm_to_projective(curve, norm)
            return sharded_msm(
                curve, mesh, scalars, points.reshape(n, 3, limb.L)
            )
    # window-size override for hardware roofline experiments (c=6/7 trades
    # 15-27% fewer windows for 2-4x bucket state; msm.rs:8-14 analogue)
    c_env = _os.environ.get("PLONKISH_TPU_MSM_C")
    c = int(c_env) if c_env else window_size(n)
    if points is None and kernel != "pallas":
        # only the pallas kernel consumes the normalized triple directly
        points = _norm_to_projective(curve, norm)
    if kernel == "host":
        import numpy as _np

        from ..ops import field_cpp as _cpp

        out = _cpp.ec_msm(
            curve,
            _np.asarray(scalars, dtype=_np.uint32),
            _np.asarray(points, dtype=_np.uint32).reshape(n, 3, limb.L),
        )
        return to_affine_host(curve, out[None])[0]
    if kernel == "pallas":
        from ..pallas.msm import _msm_windows_pallas_jit, normalize_points_jit
        from .device import jacobian_to_affine_host

        num_windows = -(-curve.scalar.num_bits // c) + 1
        sublanes = int(_os.environ.get("PLONKISH_TPU_MSM_SUBLANES", 8))
        blind, blind_digits = _blind_point(curve)
        if norm is None:
            norm = normalize_points_jit(curve, points.reshape(n, 3, limb.L))
        windows = _msm_windows_pallas_jit(
            curve,
            (scalars, *norm, blind_digits),
            c, num_windows, sublanes,
        )
        window_points = jacobian_to_affine_host(curve, windows)
        # every bucket in every window started at the blind R; the weighted
        # reduction turns that into (B(B-1)/2)·C·R per window — subtract it
        b = (1 << (c - 1)) + 1
        lanes = sublanes * 128
        factor = ((b - 1) * b // 2 * lanes) % curve.scalar.p
        correction = -blind.scalar_mul(factor)
        window_points = [wp + correction for wp in window_points]
    elif kernel == "narrow":
        num_windows = -(-curve.scalar.num_bits // c)
        if num_chunks is None:
            # [W, C, 2^c, 3, L] bucket tensor; XLA tile-pads the (3, L)
            # minor pair ~8x and the fused padd temps add a few more x, so
            # a 48 MB unpadded budget is the safe HBM ceiling here.
            per_chunk = num_windows * (1 << c) * 3 * limb.L * 4
            num_chunks = max(1, min(48 * 2**20 // per_chunk, n // 4))
        windows = _msm_windows_narrow_jit(
            curve, (scalars, points.reshape(n, 3, limb.L)), c, num_windows,
            num_chunks,
        )
        window_points = to_affine_host(curve, windows)
    else:  # "jacobian"/"soa": signed digits + mixed adds
        num_windows = -(-curve.scalar.num_bits // c) + 1
        if num_chunks is None:
            nb = (1 << (c - 1)) + 1
            per_chunk = 3 * limb.L * num_windows * nb * 4
            cap = max(
                1, min(256 * 2**20 // per_chunk, n // (2 * nb), n // 4)
            )
            num_chunks = 1 << (cap.bit_length() - 1)
        jit_fn = (
            _msm_windows_soa_jit if kernel == "soa" else _msm_windows_jit
        )
        windows = jit_fn(
            curve, (scalars, points.reshape(n, 3, limb.L)), c, num_windows,
            num_chunks,
        )
        from .device import jacobian_to_affine_host

        window_points = jacobian_to_affine_host(curve, windows)
    acc = AffinePoint.identity(curve)
    for wp in reversed(window_points):
        for _ in range(c):
            acc = acc.double()
        acc = acc + wp
    return acc


def msm_affine(scalars, points) -> AffinePoint:
    """MSM over host AffinePoints through the active backend (verifier-side
    commitment recombination — reference pcs/multilinear.rs:237-275 sums
    commitments by MSM).  Falls back to the naive host loop for tiny inputs
    or when only the pure-Python path is available (the XLA path would pay
    a per-shape compile for host-sized problems)."""
    from .host import msm_host

    assert len(scalars) == len(points)
    if len(points) < 16 or not limb.IS_CPP:
        return msm_host(scalars, points)
    curve = points[0].curve
    dev = from_affine_host(curve, points)
    return variable_base_msm(curve, [int(s) for s in scalars], dev)


def fixed_base_msm(
    curve: CurveSpec,
    base: AffinePoint,
    scalars: Sequence[Fp] | jnp.ndarray,
    c: int = 8,
) -> jnp.ndarray:
    """[g·s_i for each scalar] as a device tensor [N, 3, L].

    Host-precomputed window table (msm.rs:16-48), device gather + padd tree
    over the window axis.
    """
    if isinstance(scalars, (list, tuple)):
        scalars = limb.from_ints([int(s) for s in scalars])
    n = scalars.shape[0]
    num_windows = -(-curve.scalar.num_bits // c)
    if not limb.IS_CPP:
        import os as _os

        if n <= int(_os.environ.get("PLONKISH_TPU_MSM_HOST_MAX", 1 << 11)):
            # small batches: window-table walk on host (the XLA gather+padd
            # tree costs a per-shape compile that dwarfs the work — the SRS
            # setup at test sizes was minutes of compile for ms of math)
            import numpy as _np

            digits_np = _window_digits(
                _np.asarray(scalars, dtype=_np.uint32), c, num_windows
            )
            steps = [base.scalar_mul(1 << (c * w)) for w in range(num_windows)]
            tables = []
            for w in range(num_windows):
                row = [AffinePoint.identity(curve)]
                for _ in range((1 << c) - 1):
                    row.append(row[-1] + steps[w])
                tables.append(row)
            out = [
                sum(
                    (tables[w][int(digits_np[w, i])] for w in range(num_windows)),
                    AffinePoint.identity(curve),
                )
                for i in range(n)
            ]
            return from_affine_host(curve, out)
    # table[w][d] = base * (d << (c*w)), host-computed
    table_points: List[AffinePoint] = []
    for w in range(num_windows):
        step = base.scalar_mul(1 << (c * w))
        acc = AffinePoint.identity(curve)
        for d in range(1 << c):
            table_points.append(acc)
            acc = acc + step
    table = from_affine_host(curve, table_points)  # [W << c, 3, L]
    table = table.reshape(num_windows, 1 << c, 3, limb.L)
    digits = _window_digits(scalars, c, num_windows)  # [W, N]

    # Window-sequential accumulation over fixed-size N-chunks.  The obvious
    # [W, N, 3, L] gather + pairwise padd tree materializes W.N points plus
    # [16, 16, W.N/2] Montgomery digit-product temps — ~14 GB at k=20 —
    # which OOMs the chip (this is the one-time SRS setup; the peak live set
    # here must stay far below the per-prove working set).  A scan keeps one
    # chunk's padd temps live at a time; digit 0 gathers the identity row
    # and padd is the complete RCB16 formula, so padded tail entries and
    # zero digits are both no-ops.
    chunk = min(
        n, int(os.environ.get("PLONKISH_TPU_FIXED_MSM_CHUNK", 1 << 15))
    )

    def run(curve, table, digits):  # digits [W, chunk]
        def step(acc, wd):
            tbl_w, d = wd
            return padd(curve, acc, tbl_w[d]), None

        acc0 = limb.xnp.broadcast_to(
            identity(curve), (digits.shape[1], 3, limb.L)
        )
        if limb.IS_CPP:
            acc = acc0
            for w in range(digits.shape[0]):
                acc, _ = step(acc, (table[w], digits[w]))
            return acc
        acc, _ = jax.lax.scan(step, acc0, (table, digits))
        return acc

    if not limb.IS_CPP:
        run = functools.partial(jax.jit, static_argnums=0)(run)
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        digits = limb.xnp.concatenate(
            [
                digits,
                limb.xnp.zeros((num_windows, n_pad - n), dtype=digits.dtype),
            ],
            axis=1,
        )
    outs = [
        run(curve, table, digits[:, i : i + chunk])
        for i in range(0, n_pad, chunk)
    ]
    out = limb.xnp.concatenate(outs, axis=0)
    return out[:n]
