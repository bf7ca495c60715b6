"""Checkpoint/resume serialization with an explicit schema (no pickle).

The reference's long-running-work checkpoint object is the Protostar
accumulator (its instance is Serialize — protostar.rs:179-187).  Checkpoints
here are a self-describing container: a JSON header (field/curve names,
instance scalars and commitments as hex ints) plus an .npz blob of the
accumulator's digit tensors, wrapped with a BLAKE2b digest.  Nothing in the
format can execute code on load, and corruption/tampering of the payload is
detected by the digest check (the digest is integrity, not authenticity —
store checkpoints somewhere trusted if forgery is a concern).
"""

from __future__ import annotations

import hashlib
import io
import json
from typing import Any

import numpy as np

_MAGIC = b"PLTPUACC2"


def _spec_by_name(name: str):
    from ..fields import spec as spec_mod

    for attr in dir(spec_mod):
        obj = getattr(spec_mod, attr)
        if getattr(obj, "__class__", None).__name__ == "FieldSpec":
            if obj.name == name:
                return obj
    raise ValueError(f"unknown field spec {name!r}")


def _curve_by_name(name: str):
    from ..curves import specs as curve_mod

    for attr in dir(curve_mod):
        obj = getattr(curve_mod, attr)
        if getattr(obj, "__class__", None).__name__ == "CurveSpec":
            if obj.name == name:
                return obj
    raise ValueError(f"unknown curve {name!r}")


def _enc_fp(v) -> str:
    return hex(int(v))


def _enc_comm(comm) -> dict:
    from ..curves.host import AffinePoint

    if isinstance(comm, AffinePoint):
        return {
            "kind": "point",
            "curve": comm.curve.name,
            "x": _enc_fp(comm.x),
            "y": _enc_fp(comm.y),
            "inf": bool(comm.infinity),
        }
    root = getattr(comm, "root", None)
    if isinstance(root, bytes):
        return {"kind": "root", "type": type(comm).__name__,
                "root": root.hex()}
    raise TypeError(f"unsupported commitment type {type(comm).__name__}")


def _dec_comm(d: dict):
    from ..fields.host import Fp

    if d["kind"] == "point":
        from ..curves.host import AffinePoint

        curve = _curve_by_name(d["curve"])
        return AffinePoint(
            curve,
            Fp(int(d["x"], 16), curve.base),
            Fp(int(d["y"], 16), curve.base),
            infinity=d["inf"],
        )
    if d["kind"] == "root":
        if d["type"] == "BrakedownCommitment":
            from ..pcs.brakedown import BrakedownCommitment

            return BrakedownCommitment(root=bytes.fromhex(d["root"]))
        raise ValueError(f"unknown root commitment type {d['type']!r}")
    raise ValueError(f"unknown commitment kind {d['kind']!r}")


def save(obj: Any) -> bytes:
    """Serialize a ProtostarAccumulator checkpoint."""
    if not hasattr(obj, "witness_polys"):
        raise TypeError(
            "serde.save supports ProtostarAccumulator checkpoints only"
        )
    inst = obj.instance
    spec = obj.e_poly.spec
    header = {
        "spec": spec.name,
        "instance": {
            "instances": [[_enc_fp(v) for v in col] for col in inst.instances],
            "witness_comms": [_enc_comm(c) for c in inst.witness_comms],
            "challenges": [_enc_fp(c) for c in inst.challenges],
            "u": _enc_fp(inst.u),
            "e_comm": _enc_comm(inst.e_comm),
            "compressed_e_sum": (
                None
                if inst.compressed_e_sum is None
                else _enc_fp(inst.compressed_e_sum)
            ),
        },
        "num_witness_polys": len(obj.witness_polys),
    }
    arrays = {
        f"wp{i}": np.asarray(p.evals, dtype=np.uint32)
        for i, p in enumerate(obj.witness_polys)
    }
    arrays["e_poly"] = np.asarray(obj.e_poly.evals, dtype=np.uint32)
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    blob = buf.getvalue()
    hdr = json.dumps(header, separators=(",", ":")).encode()
    payload = len(hdr).to_bytes(8, "little") + hdr + blob
    digest = hashlib.blake2b(payload, digest_size=32).digest()
    return _MAGIC + digest + payload


def load(data: bytes) -> Any:
    """Deserialize a checkpoint produced by `save`; verifies the integrity
    digest and rebuilds device tensors for the active backend."""
    from ..accumulation.protostar import (
        ProtostarAccumulator,
        ProtostarAccumulatorInstance,
    )
    from ..fields import limb
    from ..fields.host import Fp
    from ..poly.multilinear import MLPoly

    if data[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a plonkish_tpu checkpoint")
    digest, payload = (
        data[len(_MAGIC): len(_MAGIC) + 32],
        data[len(_MAGIC) + 32:],
    )
    if hashlib.blake2b(payload, digest_size=32).digest() != digest:
        raise ValueError("checkpoint integrity check failed")
    hdr_len = int.from_bytes(payload[:8], "little")
    header = json.loads(payload[8: 8 + hdr_len].decode())
    arrays = np.load(io.BytesIO(payload[8 + hdr_len:]))

    spec = _spec_by_name(header["spec"])
    fp = lambda h: Fp(int(h, 16), spec)  # noqa: E731
    hi = header["instance"]
    instance = ProtostarAccumulatorInstance(
        instances=[[fp(v) for v in col] for col in hi["instances"]],
        witness_comms=[_dec_comm(c) for c in hi["witness_comms"]],
        challenges=[fp(c) for c in hi["challenges"]],
        u=fp(hi["u"]),
        e_comm=_dec_comm(hi["e_comm"]),
        compressed_e_sum=(
            None
            if hi["compressed_e_sum"] is None
            else fp(hi["compressed_e_sum"])
        ),
    )

    def mk_poly(arr):
        evals = arr if limb.IS_CPP else limb.jnp.asarray(arr)
        return MLPoly(spec, evals)

    witness_polys = [
        mk_poly(arrays[f"wp{i}"])
        for i in range(header["num_witness_polys"])
    ]
    return ProtostarAccumulator(
        instance=instance,
        witness_polys=witness_polys,
        e_poly=mk_poly(arrays["e_poly"]),
    )
