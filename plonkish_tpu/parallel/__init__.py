"""Multi-chip parallelism: mesh context + sharded kernels.

The scaling axis is the 2^k hypercube (SURVEY §2.8).  A 1-D
`Mesh(("data",))` shards every O(2^k) tensor row-wise (contiguous blocks =
high-order index bits, so `fix_var` pairs stay shard-local); XLA GSPMD then
partitions the jitted prover programs and inserts the collectives — psum for
the per-round message sums, all-gathers once the folded axis shrinks past
the shard count (the last log2(n_dev) sum-check rounds), and the carry
exchange inside the grand-product prefix scan.

Activate with `parallel.use_mesh(mesh)` (context manager) or
`parallel.set_mesh(mesh)`; the jax-backend prover then places its tables
with `maybe_shard_rows` and everything downstream inherits the sharding.
"""

from __future__ import annotations

import contextlib
from typing import Optional

_ACTIVE_MESH = None


def set_mesh(mesh) -> None:
    """Install `mesh` as the active device mesh (None to disable)."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def get_mesh():
    return _ACTIVE_MESH


@contextlib.contextmanager
def use_mesh(mesh):
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def maybe_shard_rows(arr):
    """Place a [N, ...] device array with its row axis sharded over the
    active mesh; no-op when no mesh is set or N doesn't divide evenly."""
    return maybe_shard_axis(arr, 0)


def maybe_shard_axis(arr, axis: int):
    """Shard `axis` of a device array over the active mesh (the hypercube
    axis of a stacked table tensor); no-op when no mesh is set or the axis
    doesn't divide evenly."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return arr
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    if (
        arr.ndim <= axis
        or arr.shape[axis] % n_dev != 0
        or arr.shape[axis] < 2 * n_dev
    ):
        return arr
    names = [None] * arr.ndim
    names[axis] = "data"
    return jax.device_put(arr, NamedSharding(mesh, P(*names)))
