"""ctypes binding for the native host field/curve runtime.

Builds `field_native.cpp` on first import (system g++) and exposes batched
field/EC operations on numpy uint32[..., 16] digit arrays.  Layout is
bit-identical to the device tensors, so values round-trip freely between the
JAX (TPU) and native (host) execution paths.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import tempfile

import numpy as np

from ..fields.spec import FieldSpec, int_to_digits

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "field_native.cpp")
_SO = os.path.join(_HERE, "_field_native.so")


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    with tempfile.NamedTemporaryFile(suffix=".so", dir=_HERE, delete=False) as tmp:
        tmp_path = tmp.name
    subprocess.run(
        ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
         "-std=c++17", _SRC, "-o", tmp_path],
        check=True,
        capture_output=True,
    )
    os.replace(tmp_path, _SO)
    return _SO


_lib = ctypes.CDLL(_build())

_u32p = ctypes.POINTER(ctypes.c_uint32)
_i64p = ctypes.POINTER(ctypes.c_long)

for name, argtypes in {
    "register_field": [_u32p, _u32p, _u32p, ctypes.c_uint64],
    "register_curve": [ctypes.c_int, _u32p],
    "fe_add": [ctypes.c_int, _u32p, _u32p, _u32p, ctypes.c_long, ctypes.c_long],
    "fe_sub": [ctypes.c_int, _u32p, _u32p, _u32p, ctypes.c_long, ctypes.c_long],
    "fe_neg": [ctypes.c_int, _u32p, _u32p, ctypes.c_long],
    "fe_mul": [ctypes.c_int, _u32p, _u32p, _u32p, ctypes.c_long, ctypes.c_long,
               ctypes.c_long],
    "fe_pow": [ctypes.c_int, _u32p, _u32p, _u32p, ctypes.c_long],
    "fe_inv_batch": [ctypes.c_int, _u32p, _u32p, ctypes.c_long],
    "fe_sum": [ctypes.c_int, _u32p, _u32p, ctypes.c_long],
    "fe_sum_axis0": [ctypes.c_int, _u32p, _u32p, ctypes.c_long, ctypes.c_long],
    "fe_prefix_mul": [ctypes.c_int, _u32p, _u32p, ctypes.c_long],
    "fe_scatter_sum": [ctypes.c_int, _u32p, _i64p, _u32p, ctypes.c_long,
                       ctypes.c_long],
    "fe_fix_var": [ctypes.c_int, _u32p, _u32p, _u32p, ctypes.c_long],
    "fe_fold_halves": [ctypes.c_int, _u32p, _u32p, _u32p, _u32p, ctypes.c_long],
    "ec_padd": [ctypes.c_int, _u32p, _u32p, _u32p, ctypes.c_long, ctypes.c_long],
    "ec_pdbl": [ctypes.c_int, _u32p, _u32p, ctypes.c_long],
    "ec_sum": [ctypes.c_int, _u32p, _u32p, ctypes.c_long],
    "ec_scalar_mul": [ctypes.c_int, _u32p, _u32p, _u32p, ctypes.c_long],
    "ec_msm": [ctypes.c_int, _u32p, _u32p, _u32p, ctypes.c_long, ctypes.c_int],
}.items():
    fn = getattr(_lib, name)
    fn.argtypes = argtypes
    fn.restype = ctypes.c_int if name.startswith("register") else None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_u32p)


def _prep(a, shape=None) -> np.ndarray:
    out = np.ascontiguousarray(np.asarray(a, dtype=np.uint32))
    return out


@functools.lru_cache(maxsize=16)
def field_id(spec: FieldSpec) -> int:
    n0inv64 = (-pow(spec.p, -1, 1 << 64)) % (1 << 64)
    p = np.ascontiguousarray(spec.p_digits)
    r = np.ascontiguousarray(spec.r_digits)
    r2 = np.ascontiguousarray(spec.r2_digits)
    return _lib.register_field(_ptr(p), _ptr(r), _ptr(r2), n0inv64)


@functools.lru_cache(maxsize=16)
def curve_id(curve) -> int:
    fid = field_id(curve.base)
    b3 = np.ascontiguousarray(int_to_digits(curve.base.to_mont(curve.b3)))
    return _lib.register_curve(fid, _ptr(b3))


# -- wrappers: broadcast-aware over [..., 16] arrays ------------------------

def _binary(op, spec, a, b):
    a = _prep(a)
    b = _prep(b)
    if a.shape != b.shape:
        if b.ndim == 1:
            pass  # broadcast single element
        elif a.ndim == 1:
            a, b = np.broadcast_arrays(a, b)
            a = np.ascontiguousarray(a)
            b = np.ascontiguousarray(b)
        else:
            a, b = np.broadcast_arrays(a, b)
            a = np.ascontiguousarray(a)
            b = np.ascontiguousarray(b)
    n = a.size // 16
    sb = 0 if (b.size // 16) == 1 and n > 1 else 1
    out = np.empty_like(a)
    op(field_id(spec), _ptr(a), _ptr(b), _ptr(out), n, sb)
    return out


def add(spec, a, b):
    return _binary(_lib.fe_add, spec, a, b)


def sub(spec, a, b):
    return _binary(_lib.fe_sub, spec, a, b)


def mul(spec, a, b):
    a = _prep(a)
    b = _prep(b)
    na, nb = a.size // 16, b.size // 16
    if na == nb and a.shape == b.shape:
        out = np.empty_like(a)
        _lib.fe_mul(field_id(spec), _ptr(a), _ptr(b), _ptr(out), na, 1, 1)
        return out
    if nb == 1:
        out = np.empty_like(a)
        _lib.fe_mul(field_id(spec), _ptr(a), _ptr(b), _ptr(out), na, 1, 0)
        return out
    if na == 1:
        out = np.empty_like(b)
        _lib.fe_mul(field_id(spec), _ptr(a), _ptr(b), _ptr(out), nb, 0, 1)
        return out
    a2, b2 = np.broadcast_arrays(a, b)
    a2 = np.ascontiguousarray(a2)
    b2 = np.ascontiguousarray(b2)
    out = np.empty_like(a2)
    _lib.fe_mul(field_id(spec), _ptr(a2), _ptr(b2), _ptr(out), a2.size // 16, 1, 1)
    return out


def neg(spec, a):
    a = _prep(a)
    out = np.empty_like(a)
    _lib.fe_neg(field_id(spec), _ptr(a), _ptr(out), a.size // 16)
    return out


def pow_const(spec, a, e: int):
    a = _prep(a)
    assert 0 <= e < (1 << 256)
    ed = np.ascontiguousarray(int_to_digits(e))
    out = np.empty_like(a)
    _lib.fe_pow(field_id(spec), _ptr(a), _ptr(ed), _ptr(out), a.size // 16)
    return out


def inv_batch(spec, a):
    a = _prep(a)
    out = np.empty_like(a)
    _lib.fe_inv_batch(field_id(spec), _ptr(a), _ptr(out), a.size // 16)
    return out


def sum_reduce(spec, a):
    """Sum along axis 0 of [n, ..., 16]."""
    a = _prep(a)
    n = a.shape[0]
    inner = a.size // 16 // n
    out = np.empty(a.shape[1:], dtype=np.uint32)
    if inner == 1:
        _lib.fe_sum(field_id(spec), _ptr(a), _ptr(out), n)
    else:
        _lib.fe_sum_axis0(field_id(spec), _ptr(a), _ptr(out), n, inner)
    return out


def prefix_mul(spec, a):
    a = _prep(a)
    assert a.ndim == 2
    out = np.empty_like(a)
    _lib.fe_prefix_mul(field_id(spec), _ptr(a), _ptr(out), a.shape[0])
    return out


def scatter_sum(spec, terms, idx, size: int):
    terms = _prep(terms)
    idx = np.ascontiguousarray(np.asarray(idx, dtype=np.int64))
    if terms.ndim == 2:
        out = np.empty((size, 16), dtype=np.uint32)
        _lib.fe_scatter_sum(
            field_id(spec), _ptr(terms),
            idx.ctypes.data_as(_i64p), _ptr(out), terms.shape[0], size,
        )
        return out
    assert terms.ndim == 3
    outs = [scatter_sum(spec, terms[i], idx, size) for i in range(terms.shape[0])]
    return np.stack(outs, axis=0)


def fix_var(spec, evals, x):
    evals = _prep(evals)
    x = _prep(x)
    half = evals.shape[0] // 2
    out = np.empty((half, 16), dtype=np.uint32)
    _lib.fe_fix_var(field_id(spec), _ptr(evals), _ptr(x), _ptr(out), half)
    return out


def fold_halves(spec, lo, hi, x):
    lo, hi, x = _prep(lo), _prep(hi), _prep(x)
    out = np.empty_like(lo)
    _lib.fe_fold_halves(
        field_id(spec), _ptr(lo), _ptr(hi), _ptr(x), _ptr(out), lo.shape[0]
    )
    return out


# -- curve wrappers ---------------------------------------------------------

def ec_padd(curve, p, q):
    p = _prep(p)
    q = _prep(q)
    n = p.size // 48
    nq = q.size // 48
    if nq == 1 and n > 1:
        sq = 0
    elif p.shape == q.shape:
        sq = 1
    else:
        p2, q2 = np.broadcast_arrays(p, q)
        p = np.ascontiguousarray(p2)
        q = np.ascontiguousarray(q2)
        n = p.size // 48
        sq = 1
    out = np.empty_like(p)
    _lib.ec_padd(curve_id(curve), _ptr(p), _ptr(q), _ptr(out), n, sq)
    return out


def ec_pdbl(curve, p):
    p = _prep(p)
    out = np.empty_like(p)
    _lib.ec_pdbl(curve_id(curve), _ptr(p), _ptr(out), p.size // 48)
    return out


def ec_sum(curve, p):
    p = _prep(p)
    out = np.empty((3, 16), dtype=np.uint32)
    _lib.ec_sum(curve_id(curve), _ptr(p), _ptr(out), p.size // 48)
    return out


def ec_scalar_mul(curve, points, k_digits):
    points = _prep(points)
    k = _prep(k_digits)
    out = np.empty_like(points)
    _lib.ec_scalar_mul(curve_id(curve), _ptr(points), _ptr(k), _ptr(out),
                       points.size // 48)
    return out


def ec_msm(curve, scalars, points, window_bits: int | None = None):
    scalars = _prep(scalars)
    points = _prep(points)
    n = points.size // 48
    assert scalars.size // 16 == n
    if window_bits is None:
        window_bits = max(2, min(16, n.bit_length() - 1)) if n > 1 else 2
    out = np.empty((3, 16), dtype=np.uint32)
    _lib.ec_msm(
        curve_id(curve), _ptr(scalars), _ptr(points), _ptr(out), n, window_bits
    )
    return out
