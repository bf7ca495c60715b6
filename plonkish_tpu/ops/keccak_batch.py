"""Batched Keccak-256 hashing for commitment-sized workloads.

Brakedown commits hash thousands of columns (brakedown.rs:152-184); this
module provides a batch interface with a native C++ backend (built on demand
via the system toolchain) and a pure-Python fallback.
"""

from __future__ import annotations

from typing import List

_native = None
_native_tried = False


def _load_native():
    global _native, _native_tried
    if _native_tried:
        return _native
    _native_tried = True
    try:
        from . import _keccak_native

        _native = _keccak_native
    except Exception:
        _native = None
    return _native


def keccak256_many(blobs: List[bytes]) -> List[bytes]:
    native = _load_native()
    if native is not None:
        return native.keccak256_many(blobs)
    from ..utils.keccak import keccak256

    return [keccak256(b) for b in blobs]
