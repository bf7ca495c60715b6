"""Multi-scalar multiplication on TPU.

Pippenger re-designed for SIMD-without-atomics (reference serial version:
/root/reference/plonkish_backend/src/util/arithmetic/msm.rs:84-181):

1. window digits extracted from 16-bit scalar limbs on device;
2. bucket accumulation over a [num_windows, num_chunks, num_buckets] tensor:
   a `fori_loop` walks each chunk serially; every (window, chunk) lane reads
   its bucket with a dense one-hot masked-reduce over the (small) bucket
   axis, complete-adds the point, and writes back with a one-hot select.
   TPUs have no atomics and XLA scatters serialize, so the bucket axis is
   kept narrow (2^c) and touched densely — pure streaming VPU traffic,
   2·n·W·2^c point-rows total; complete formulas make collisions/doubling/
   identity branch-free;
3. chunk axis folded by a pairwise padd tree;
4. per-window weighted bucket sum via the running-sum trick (fori_loop);
5. final window combination on host (W points, c doublings each).

Multi-chip: shard the point axis; steps 1-2 are shard-local, step 3's tree
becomes a psum-style all-reduce of [W, B] bucket tensors over the mesh.
"""

from __future__ import annotations

import functools
import math
from typing import List, Sequence

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
    """[N, 16] canonical scalar digits -> [num_windows, N] bucket indices."""
    xnp = limb.xnp
    import numpy as np

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


def _bucket_accumulate(curve, points, digits, c, num_chunks):
    """points [N,3,L], digits [W,N] -> buckets [W, B, 3, L]."""
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

    def run(curve, points, digits):
        buckets = jnp.broadcast_to(
            identity(curve), (w, num_chunks, b, 3, limb.L)
        ).copy()
        iota_b = jnp.arange(b, dtype=jnp.int32)

        def body(t, buckets):
            pt = points[:, t]  # [num_chunks, 3, L]
            idx = digits[:, :, t]  # [w, num_chunks]
            onehot = (iota_b[None, None, :] == idx[:, :, None])  # [w, C, b]
            mask = onehot[..., None, None]
            # dense gather: exactly one bucket row survives the masked sum
            cur = jnp.sum(
                jnp.where(mask, buckets, jnp.uint32(0)), axis=2
            )  # [w, C, 3, L]
            new = _padd_jax(curve, cur, pt[None])
            return jnp.where(mask, new[:, :, None], buckets)

        buckets = jax.lax.fori_loop(0, chunk_len, body, buckets)
        # fold the chunk axis with a padd tree
        while buckets.shape[1] > 1:
            m = buckets.shape[1]
            if m % 2:
                pad_b = jnp.broadcast_to(
                    identity(curve), (w, 1, b, 3, limb.L)
                )
                buckets = jnp.concatenate([buckets, pad_b], axis=1)
            buckets = _padd_jax(curve, buckets[:, 0::2], buckets[:, 1::2])
        return buckets[:, 0]  # [w, b, 3, L]

    return run(curve, points, digits)


def _bucket_reduce(curve, buckets):
    """[W, B, 3, L] -> [W, 3, L]: Σ_j j·bucket[j] via running sums
    (msm.rs:166-179)."""
    w, b = buckets.shape[0], buckets.shape[1]
    running = jnp.broadcast_to(identity(curve), (w, 3, limb.L))
    acc = running

    def body(i, carry):
        running, acc = carry
        j = b - 1 - i
        running = _padd_jax(curve, running, buckets[:, j])
        acc = _padd_jax(curve, acc, running)
        return (running, acc)

    running, acc = jax.lax.fori_loop(0, b - 1, body, (running, acc))
    return acc


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _msm_windows_jit(curve, inputs, c, num_windows, num_chunks):
    """Fully fused MSM window sums: ONE device call computes window digits,
    dense bucket accumulation, the chunk-axis padd tree, and the weighted
    bucket reduction.  (Per-op dispatch costs a network RTT on the tunneled
    TPU, so everything between host scalars and the [W,3,L] window sums must
    be a single program.)"""
    scalars, points = inputs
    digits = _window_digits(scalars, c, num_windows)
    buckets = _bucket_accumulate(curve, points, digits, c, num_chunks)
    return _bucket_reduce(curve, buckets)


def variable_base_msm(
    curve: CurveSpec,
    scalars: Sequence[Fp] | jnp.ndarray,
    points: jnp.ndarray,
    num_chunks: int | None = None,
) -> AffinePoint:
    """MSM of canonical scalars against device projective points [N, 3, L]."""
    if isinstance(scalars, (list, tuple)):
        scalars = limb.from_ints([int(s) for s in scalars])
    n = points.shape[0]
    assert scalars.shape[0] == n
    if n == 0:
        return AffinePoint.identity(curve)
    if limb.IS_CPP:
        from ..ops import field_cpp as _cpp

        out = _cpp.ec_msm(curve, scalars, points.reshape(n, 3, limb.L))
        return to_affine_host(curve, out[None])[0]
    c = window_size(n)
    num_windows = -(-curve.scalar.num_bits // c)
    if num_chunks is None:
        # bucket tensor is [W, C, 2^c, 3, L] u32.  The padd tree over the
        # chunk axis materializes ~10 REDC column temps per fused mont_mul
        # (each ~2.2x the operand, plus TPU tile padding), so the budget
        # must leave ~30x headroom against HBM: keep the tensor <= 48 MB.
        per_chunk = num_windows * (1 << c) * 3 * limb.L * 4
        num_chunks = max(1, min(48 * 2**20 // per_chunk, n // 4))
    windows = _msm_windows_jit(
        curve, (scalars, points.reshape(n, 3, limb.L)), c, num_windows,
        num_chunks,
    )
    window_points = to_affine_host(curve, windows)
    acc = AffinePoint.identity(curve)
    for wp in reversed(window_points):
        for _ in range(c):
            acc = acc.double()
        acc = acc + wp
    return acc


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

    def run(curve, table, digits):
        xnp = limb.xnp
        w = table.shape[0]
        gathered = table[xnp.arange(w)[:, None], digits]  # [W, N, 3, L]
        while gathered.shape[0] > 1:
            m = gathered.shape[0]
            if m % 2:
                pad = xnp.broadcast_to(
                    identity(curve), (1, *gathered.shape[1:])
                )
                gathered = xnp.concatenate([gathered, pad], axis=0)
            gathered = padd(curve, gathered[0::2], gathered[1::2])
        return gathered[0]

    if not limb.IS_CPP:
        run = functools.partial(jax.jit, static_argnums=0)(run)
    return run(curve, table, digits)
