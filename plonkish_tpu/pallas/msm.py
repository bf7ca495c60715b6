"""Pallas MSM bucket accumulation (Pippenger inner loop).

Reference algorithm: /root/reference/plonkish_backend/src/util/arithmetic/
msm.rs:84-181 (serial per-thread buckets).  TPU redesign:

- signed window digits (computed in an XLA prologue, curves/msm.py) so the
  bucket count per window is B = 2^(c-1)+1 with bucket 0 dead;
- grid (W, T): window-major, then T blocks of S*128 points.  Each of the
  C = S*128 VPU lanes owns a private copy of the B buckets and serially
  accumulates its point stream with one branchless Jacobian mixed addition
  per grid step (struct-of-arrays digits — curves/device.py:_jmadd_soa);
- buckets live in the OUTPUT block (VMEM-resident while the window index
  is unchanged — the Pallas accumulator pattern), stored PACKED (two
  16-bit digits per u32 word -> [3, PW=8, B] rows: half the VMEM traffic
  and half the one-hot rows of exact digits), read/written densely via
  a one-hot select over the small bucket axis (TPUs have no atomics and
  scatters serialize; dense select over B=17 rows is pure VPU traffic);
- the per-window weighted bucket reduction and the C-lane fold run in XLA
  afterwards on the [3, L, W, B, C] tensor (curves/msm.py helpers).

The kernel body compiles once (one jmadd + one-hot r/w ≈ a few K VPU ops)
regardless of n — this is what unblocks bench sizes: the fused XLA variants
of this loop OOMed the compiler at 2^18 (docs/PERF_NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import LANE, SUBLANE, TILE, interpret_mode
from ..fields import limb, soa
from ..fields.spec import FieldSpec

L = limb.L


PW = L // 2  # packed bucket words: two 16-bit digits per u32


def _bucket_kernel(curve, B, T, xs_ref, ys_ref, inf_ref, idx_ref, sgn_ref,
                   blind_ref, out_ref):
    """Grid (W, T).  out block [1, 3, PW, B, S, LANE] = this window's bucket
    state (digit PAIRS packed per u32 word — half the VMEM bucket traffic
    and half the one-hot select rows of the exact-digit layout),
    accumulated across the T point blocks.

    Buckets start at the blind point R (affine, blind_ref [2, L] SMEM), so
    the inner loop can use the doubling-free incomplete mixed addition —
    the caller subtracts the exactly-known blind multiple from each window
    sum (curves/msm.py)."""
    from ..curves.device import _jmadd_soa_incomplete

    spec = curve.base
    t = pl.program_id(1)

    def packed_const(digits):
        return [
            np.uint32(int(digits[2 * w]) | (int(digits[2 * w + 1]) << 16))
            for w in range(PW)
        ]

    @pl.when(t == 0)
    def _init():
        zero = jnp.zeros(out_ref.shape[3:], dtype=jnp.uint32)
        bl = [blind_ref[0, d] for d in range(L)]
        bl2 = [blind_ref[1, d] for d in range(L)]
        one_w = packed_const(spec.r_digits)  # Mont 1
        for w in range(PW):
            out_ref[0, 0, w] = zero + (
                bl[2 * w] | (bl[2 * w + 1] << jnp.uint32(16))
            )
            out_ref[0, 1, w] = zero + (
                bl2[2 * w] | (bl2[2 * w + 1] << jnp.uint32(16))
            )
            out_ref[0, 2, w] = zero + one_w[w]

    x2 = [xs_ref[d] for d in range(L)]  # each [S, LANE]
    y2 = [ys_ref[d] for d in range(L)]
    inf2 = inf_ref[:] != 0
    ix = idx_ref[0]  # [S, LANE] int32
    sg = sgn_ref[0] != 0

    y2 = soa.select(sg, soa.neg(spec, y2), y2)

    # Per-bucket-row loads/stores: materializing the whole [3, PW, B, S,
    # LANE] block (out_ref[0]) costs 3*PW*B vregs of register pressure and
    # spills dominate the step (measured 134us/step vs ~10us of math).
    mask = [None] * B
    for b in range(B):
        mask[b] = ix == b

    def gather(c):
        digs = []
        for w in range(PW):
            acc = jnp.zeros(ix.shape, jnp.uint32)
            for b in range(B):
                acc = jnp.where(mask[b], out_ref[0, c, w, b], acc)
            digs.append(acc & jnp.uint32(0xFFFF))
            digs.append(acc >> jnp.uint32(16))
        return digs

    cur = (gather(0), gather(1), gather(2))
    nx, ny, nz = _jmadd_soa_incomplete(curve, cur, x2, y2, inf2)
    for c, nd in ((0, nx), (1, ny), (2, nz)):
        for w in range(PW):
            word = nd[2 * w] | (nd[2 * w + 1] << jnp.uint32(16))
            for b in range(B):
                out_ref[0, c, w, b] = jnp.where(
                    mask[b], word, out_ref[0, c, w, b]
                )


def _reduce_kernel(curve, B, in_ref, out_ref):
    """Grid (W,): one window's [1, 3, PW, B, S, LANE] packed bucket block
    -> weighted bucket sum folded across all S*LANE lanes; result in lane
    (0, 0) of the [1, 3, L, S, LANE] out block (exact digits).

    Weighted reduction is the running-sum trick (msm.rs:166-179) as a
    fori_loop of two full Jacobian adds per bucket at (S, LANE) width;
    the lane fold is a roll-and-add halving tree (lanes >= half hold
    garbage, never read by later levels).  Keeping this in Mosaic avoids
    the XLA tensor-form postlude, which cost ~600ms runtime (fusion
    breaks) or unbounded compile (SoA op-count blowup)."""
    from ..curves.device import _jadd_soa

    spec = curve.base
    shape = in_ref.shape[-2:]
    zero = jnp.zeros(shape, jnp.uint32)
    ident = (
        [zero] * L,
        [zero + np.uint32(spec.r_digits[d]) for d in range(L)],
        [zero] * L,
    )

    def bucket_body(i, carry):
        running, acc = carry
        j = B - 1 - i
        bj = []
        for ci in range(3):
            digs = []
            for w in range(PW):
                v = in_ref[0, ci, w, j]
                digs.append(v & jnp.uint32(0xFFFF))
                digs.append(v >> jnp.uint32(16))
            bj.append(digs)
        running = _jadd_soa(curve, running, tuple(bj))
        acc = _jadd_soa(curve, acc, running)
        return (running, acc)

    _, acc = jax.lax.fori_loop(0, B - 1, bucket_body, (ident, ident))

    for axis, shifts in ((0, (4, 2, 1)), (1, (64, 32, 16, 8, 4, 2, 1))):
        if axis == 0 and shape[0] != 8:
            shifts = tuple(
                s for s in (shape[0] >> (i + 1) for i in range(16)) if s
            )
        for sh in shifts:
            # lane i reads lane i+sh: pltpu.roll requires a non-negative
            # shift, so roll by (size - sh) (equal mod the axis size)
            size_ax = shape[axis]
            rolled = tuple(
                [pltpu.roll(d, size_ax - sh, axis=axis) for d in ci]
                for ci in acc
            )
            acc = _jadd_soa(curve, acc, rolled)

    for ci in range(3):
        for d in range(L):
            out_ref[0, ci, d] = acc[ci][d]


@functools.partial(jax.jit, static_argnums=0)
def normalize_points_jit(curve, points):
    """Projective [N, 3, L] -> affine (x, y, inf[N]) for the bucket kernel.

    Loop-invariant for a fixed basis (the KZG SRS): callers that commit
    against the same point table repeatedly should normalize ONCE and pass
    the triple to variable_base_msm — the 2^k batch inversion here was
    ~a third of every commit's cost when recomputed per MSM (r5)."""
    spec = curve.base
    z = points[:, 2]
    zinv = limb._batch_inv_jax(spec, z)  # zeros stay zero
    # blocked products: at 2^22 points the flat full-width multiplies are
    # an HBM compile abort (limb.mont_mul_rows_blocked docstring)
    x = limb.mont_mul_rows_blocked(spec, points[:, 0], zinv)
    y = limb.mont_mul_rows_blocked(spec, points[:, 1], zinv)
    inf = jnp.all(z == 0, axis=-1)  # [N]
    return x, y, inf


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _msm_windows_pallas_jit(curve, inputs, c, num_windows, sublanes):
    """Fused MSM window sums via the Pallas bucket kernel.

    ONE device program: signed digit decomposition, the Pallas bucket grid,
    and the XLA chunk-fold + weighted bucket reduction.  Takes the basis
    pre-normalized (x, y, inf — see normalize_points_jit).  Returns
    Jacobian window sums [W, 3, L], each offset by the blind multiple
    (B(B-1)/2)·C·R that the caller subtracts on host."""
    from ..curves.msm import _signed_window_digits

    spec = curve.base
    scalars, x, y, inf, blind = inputs
    n = x.shape[0]
    w = num_windows
    b = (1 << (c - 1)) + 1
    s = sublanes
    tile = s * LANE

    idx, sign = _signed_window_digits(scalars, c, w)  # [W, N]

    pad = (-n) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
        y = jnp.pad(y, ((0, pad), (0, 0)))
        inf = jnp.pad(inf, (0, pad), constant_values=True)
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        sign = jnp.pad(sign, ((0, 0), (0, pad)))
    m = n + pad
    r = m // LANE
    t_steps = r // s

    xs = jnp.transpose(x, (1, 0)).reshape(L, r, LANE)
    ys = jnp.transpose(y, (1, 0)).reshape(L, r, LANE)
    inf_t = inf.astype(jnp.uint32).reshape(r, LANE)
    idx_t = idx.reshape(w, r, LANE)
    sgn_t = sign.astype(jnp.uint32).reshape(w, r, LANE)

    kernel = functools.partial(_bucket_kernel, curve, b, t_steps)
    buckets = pl.pallas_call(
        kernel,
        grid=(w, t_steps),
        in_specs=[
            pl.BlockSpec((L, s, LANE), lambda wi, ti: (0, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, s, LANE), lambda wi, ti: (0, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, LANE), lambda wi, ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, LANE), lambda wi, ti: (wi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, LANE), lambda wi, ti: (wi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, PW, b, s, LANE), lambda wi, ti: (wi, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((w, 3, PW, b, s, LANE), jnp.uint32),
        interpret=interpret_mode(),
    )(xs, ys, inf_t, idx_t, sgn_t, blind)

    window_sums = pl.pallas_call(
        functools.partial(_reduce_kernel, curve, b),
        grid=(w,),
        in_specs=[
            pl.BlockSpec(
                (1, 3, PW, b, s, LANE), lambda wi: (wi, 0, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, L, s, LANE), lambda wi: (wi, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((w, 3, L, s, LANE), jnp.uint32),
        interpret=interpret_mode(),
    )(buckets)
    return window_sums[:, :, :, 0, 0]  # [W, 3, L]
