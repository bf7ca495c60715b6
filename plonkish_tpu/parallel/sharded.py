"""Multi-chip sharding for the proving pipeline.

The 2^k hypercube axis is the scaling axis (SURVEY §2.8): polynomials shard
row-wise across a 1-D `Mesh(("data",))`; `fix_var` pairs (2i, 2i+1) are
shard-local when sharding is by contiguous row blocks (high-order index
bits), expression evaluation is elementwise-local, and only the per-round
message sums cross chips (one psum of d field elements per round).

This module provides shard_map-wrapped kernels used by the distributed prover
and by `__graft_entry__.dryrun_multichip`.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import limb
from ..fields.spec import FieldSpec


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def shard_rows(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    """Place [N, ..., L] with the row axis sharded over the mesh."""
    spec = P("data", *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def vanilla_gate_eval(spec: FieldSpec, polys: jnp.ndarray) -> jnp.ndarray:
    """q_l·w_l + q_r·w_r + q_m·w_l·w_r + q_o·w_o + q_c + pi over all rows.

    polys: [9, rows, L] stacked columns (the vanilla-PLONK layout,
    reference backend/hyperplonk/util.rs:30-49).  Pure elementwise —
    shard-local under any row sharding.
    """
    pi, q_l, q_r, q_m, q_o, q_c, w_l, w_r, w_o = [polys[i] for i in range(9)]
    mul = functools.partial(limb._mont_mul_jax, spec)
    add = functools.partial(limb._add_jax, spec)
    acc = mul(q_l, w_l)
    acc = add(acc, mul(q_r, w_r))
    acc = add(acc, mul(q_m, mul(w_l, w_r)))
    acc = add(acc, mul(q_o, w_o))
    acc = add(acc, q_c)
    return add(acc, pi)


def _psum_field(spec: FieldSpec, partial: jnp.ndarray, axis: str) -> jnp.ndarray:
    """All-reduce a field element across the mesh: lazy u32 digit psum then a
    single Montgomery renormalization (each shard contributes digits < 2^16,
    so up to 2^16 chips fit without overflow)."""
    lazy = jax.lax.psum(partial, axis)  # [L] u32 lanes < n_dev * 2^16
    pad = [(0, 0)] * (lazy.ndim - 1) + [(0, limb.L + 1)]
    canon = limb.redc(spec, jnp.pad(lazy, pad), relax_rounds=3)
    return limb._mont_mul_jax(spec, canon, jnp.asarray(spec.r2_digits))


@functools.lru_cache(maxsize=None)
def _sharded_round_step_jit(spec: FieldSpec, mesh: Mesh):
    def step(polys_local, challenge):
        gate = vanilla_gate_eval(spec, polys_local)  # [rows_local, L]
        partial = limb._sum_reduce_jax(spec, gate)
        total = _psum_field(spec, partial, "data")
        folded = jax.vmap(
            lambda p: limb._fold_pairs_jax(spec, p, challenge)
        )(polys_local)
        return total, folded

    return jax.jit(
        jax.shard_map(
            step,
            mesh=mesh,
            in_specs=(P(None, "data", None), P(None)),
            out_specs=(P(None), P(None, "data", None)),
            check_vma=False,
        )
    )


def sharded_round_step(
    spec: FieldSpec, mesh: Mesh, polys: jnp.ndarray, challenge: jnp.ndarray
):
    """One sum-check-style prover step, sharded over the hypercube axis:

    1. evaluate the gate at every (shard-local) row;
    2. psum the per-shard partial sums over ICI -> the round message;
    3. fold every polynomial with `fix_var` (shard-local pairs).

    polys: [9, rows, L]; returns (round_sum [L], folded polys [9, rows/2, L]).
    This is the communication structure of the full prover: 32 bytes of
    collective traffic per round, everything else local.  jit-compiled once
    per (spec, mesh) — shard_map outside jit would dispatch eagerly
    per-primitive, which is orders of magnitude slower.
    """
    return _sharded_round_step_jit(spec, mesh)(polys, challenge)


@functools.lru_cache(maxsize=None)
def _sharded_msm_windows_jit(curve, mesh: Mesh, c: int, num_windows: int,
                             chunks_per_dev: int):
    from ..curves.msm import _msm_windows_jit
    from ..curves.device import _jadd_wide

    def local(scalars_local, points_local):
        wins = _msm_windows_jit(
            curve, (scalars_local, points_local), c, num_windows,
            chunks_per_dev,
        )  # [W, 3, L] Jacobian
        all_wins = jax.lax.all_gather(wins, "data")  # [D, W, 3, L]
        acc = jnp.transpose(all_wins[0], (1, 2, 0))  # [3, L, W] wide
        for d in range(1, all_wins.shape[0]):
            acc = _jadd_wide(
                curve, acc, jnp.transpose(all_wins[d], (1, 2, 0))
            )
        return jnp.transpose(acc, (2, 0, 1))

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P("data", None), P("data", None, None)),
            out_specs=P(None, None, None),
            check_vma=False,
        )
    )


def sharded_msm_windows(curve, mesh: Mesh, scalars, points,
                        c: int, num_windows: int, chunks_per_dev: int):
    """Data-parallel MSM across the mesh: points/scalars sharded on the
    point axis, per-device dense bucket accumulation + weighted reduction
    (the fused single-program kernel), then an all_gather of the tiny
    [W, 3, L] window sums and a local complete-add fold.

    Collective traffic: num_devices × W × 192 bytes total (the bucket sums),
    riding ICI — the communication structure SURVEY §2.8 prescribes.
    """
    return _sharded_msm_windows_jit(curve, mesh, c, num_windows,
                                    chunks_per_dev)(scalars, points)


def sharded_msm(curve, mesh: Mesh, scalars, points, num_bits: int | None = None):
    """Full multi-chip MSM returning a host AffinePoint.

    `num_bits` optionally bounds the scalar width (fewer windows) when the
    caller knows the scalars are small — also keeps the virtual-CPU-mesh
    test compile tractable."""
    from ..curves.device import jacobian_to_affine_host
    from ..curves.host import AffinePoint
    from ..curves.msm import window_size

    n = points.shape[0]
    n_dev = mesh.devices.size
    assert n % n_dev == 0
    c = window_size(n // n_dev)
    num_windows = -(-(num_bits or curve.scalar.num_bits) // c) + 1
    nb = (1 << (c - 1)) + 1
    per_chunk = 3 * 16 * num_windows * nb * 4
    n_local = n // n_dev
    cap = max(
        1, min(192 * 2**20 // per_chunk, n_local // (2 * nb), n_local // 4)
    )
    chunks_per_dev = 1 << (cap.bit_length() - 1)
    windows = sharded_msm_windows(
        curve, mesh, scalars, points, c, num_windows, chunks_per_dev
    )
    window_points = jacobian_to_affine_host(curve, windows)
    acc = AffinePoint.identity(curve)
    for wp in reversed(window_points):
        for _ in range(c):
            acc = acc.double()
        acc = acc + wp
    return acc
