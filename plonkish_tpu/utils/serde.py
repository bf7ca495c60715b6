"""Checkpoint/resume serialization.

The reference's long-running-work checkpoint object is the Protostar
accumulator (its instance is Serialize — protostar.rs:179-187), with
SRS/params persistable via serde+bincode.  All framework objects (Fp,
AffinePoint, MLPoly with digit tensors, params dataclasses) pickle cleanly;
device tensors are normalized to numpy for portability across backends.
"""

from __future__ import annotations

import pickle
from typing import Any

import numpy as np


def _normalize(obj):
    """Convert device arrays to numpy for backend-portable checkpoints."""
    from ..poly.multilinear import MLPoly

    if isinstance(obj, MLPoly):
        return MLPoly(obj.spec, np.asarray(obj.evals, dtype=np.uint32))
    if isinstance(obj, list):
        return [_normalize(x) for x in obj]
    if isinstance(obj, tuple):
        return tuple(_normalize(x) for x in obj)
    if isinstance(obj, dict):
        return {k: _normalize(v) for k, v in obj.items()}
    return obj


def save(obj: Any) -> bytes:
    """Serialize accumulators / params / SRS objects."""
    import copy

    if hasattr(obj, "witness_polys"):  # ProtostarAccumulator
        obj = copy.copy(obj)
        obj.witness_polys = _normalize(obj.witness_polys)
        obj.e_poly = _normalize(obj.e_poly)
    return pickle.dumps(obj)


def load(data: bytes) -> Any:
    """Deserialize; device tensors are re-materialized lazily on first use
    (numpy arrays are accepted by both backends)."""
    from ..fields import limb

    obj = pickle.loads(data)
    if hasattr(obj, "witness_polys") and not limb.IS_CPP:
        from ..poly.multilinear import MLPoly

        obj.witness_polys = [
            MLPoly(p.spec, limb.jnp.asarray(p.evals))
            for p in obj.witness_polys
        ]
        obj.e_poly = MLPoly(obj.e_poly.spec, limb.jnp.asarray(obj.e_poly.evals))
    return obj
