"""ctypes binding for the native batch Keccak-256 kernel.

Builds `keccak_native.cpp` with the system C++ toolchain on first import and
caches the shared object next to this file.  Import fails cleanly if no
compiler is available; `keccak_batch` falls back to pure Python.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import List

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "keccak_native.cpp")
_SO = os.path.join(_HERE, "_keccak_native.so")


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    with tempfile.NamedTemporaryFile(
        suffix=".so", dir=_HERE, delete=False
    ) as tmp:
        tmp_path = tmp.name
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", tmp_path,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp_path, _SO)
    return _SO


_lib = ctypes.CDLL(_build())
_lib.keccak256_batch.argtypes = [
    ctypes.c_char_p,
    ctypes.POINTER(ctypes.c_uint64),
    ctypes.c_uint64,
    ctypes.c_char_p,
]
_lib.keccak256_batch.restype = None


def keccak256_many(blobs: List[bytes]) -> List[bytes]:
    n = len(blobs)
    if n == 0:
        return []
    buf = b"".join(blobs)
    offsets = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    out = ctypes.create_string_buffer(32 * n)
    _lib.keccak256_batch(
        buf,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        out,
    )
    raw = out.raw
    return [raw[32 * i: 32 * i + 32] for i in range(n)]
