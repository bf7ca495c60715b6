"""Multilinear Brakedown PCS [GLSTW21].

Protocol mirrors /root/reference/plonkish_backend/src/pcs/multilinear/
brakedown.rs: commit = reshape evals to a [num_rows, row_len] matrix, encode
every row (device-batched), hash columns, merklize; open = proximity rows +
t0-combined row in clear + spot-checked column openings with merkle paths.

No elliptic curves anywhere — this is the first PCS brought up end-to-end.
Row encoding runs entirely on device; column hashing streams canonical bytes
through Keccak on host (C++ batch hasher hook point).
"""

from __future__ import annotations

import dataclasses
import random
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields import limb
from ..fields.host import Fp
from ..fields.spec import FieldSpec
from ..poly.multilinear import MLPoly, eq_xy
from ..utils.keccak import Keccak256
from ..utils.transcript import Keccak256Transcript
from ..backend.pcs_api import Evaluation
from .brakedown_code import Brakedown, BrakedownSpec, BRAKEDOWN_SPEC_6

ZERO_HASH = b"\x00" * 32


@dataclasses.dataclass
class BrakedownParams:
    num_vars: int
    num_rows: int
    code: Brakedown

    @property
    def spec(self) -> FieldSpec:
        return self.code.spec


@dataclasses.dataclass
class BrakedownCommitment:
    root: bytes
    rows: np.ndarray | None = None  # canonical digits [num_rows, cw, 16] u16-in-u32
    intermediate_hashes: List[bytes] | None = None


class MultilinearBrakedown:
    """PCS object; field spec + Brakedown spec are constructor params."""

    def __init__(self, spec: FieldSpec, bspec: BrakedownSpec = BRAKEDOWN_SPEC_6):
        self.field_spec = spec
        self.bspec = bspec

    # ------------------------------------------------------------- lifecycle
    def setup(self, poly_size: int, batch_size: int, rng: random.Random):
        assert poly_size & (poly_size - 1) == 0
        num_vars = poly_size.bit_length() - 1
        n_0 = min(20, (1 << num_vars) - 1)
        code = Brakedown.new_multilinear(
            self.field_spec, self.bspec, num_vars, n_0, rng
        )
        return BrakedownParams(
            num_vars=num_vars,
            num_rows=(1 << num_vars) // code.row_len,
            code=code,
        )

    def trim(self, param: BrakedownParams, poly_size: int, batch_size: int):
        if poly_size != 1 << param.num_vars:
            raise ValueError("cannot trim Brakedown params to different size")
        return param, param

    def dummy_commitment(self):
        return BrakedownCommitment(root=ZERO_HASH)

    # ----------------------------------------------------------------- commit
    def commit(self, pp: BrakedownParams, poly: MLPoly) -> BrakedownCommitment:
        assert poly.num_vars == pp.num_vars
        spec = pp.spec
        code = pp.code
        matrix = poly.evals.reshape(pp.num_rows, code.row_len, limb.L)
        if not limb.IS_CPP:
            # rows encode independently: shard the row axis over the active
            # mesh (SURVEY §2.8 parallelize -> shard; the SpMV chain and RS
            # base case stay shard-local)
            from .. import parallel

            matrix = parallel.maybe_shard_axis(matrix, 0)
        encoded = code.encode(matrix)  # [num_rows, cw, L] Montgomery
        if not limb.IS_CPP:
            # device-resident hashing: the whole column batch + every
            # merkle level keccaks in parallel on the VPU
            # (piop/fiat_shamir.keccak256_fixed), ONE fetch at the end —
            # the host hasher streamed ~cw serial multi-KB messages
            canon_dev = limb.from_mont(spec, encoded)
            canon = np.asarray(canon_dev)
            hashes, root = _merklize_device(
                spec, canon_dev, code.codeword_len
            )
            return BrakedownCommitment(
                root=root, rows=canon, intermediate_hashes=hashes
            )
        canon = np.asarray(limb.from_mont(spec, encoded))

        column_bytes = _column_bytes(canon)
        column_hashes = _hash_many(column_bytes)
        intermediate, root = _merklize(code.codeword_len, column_hashes)
        return BrakedownCommitment(
            root=root, rows=canon, intermediate_hashes=intermediate
        )

    def batch_commit(self, pp, polys):
        return [self.commit(pp, p) for p in polys]

    def commit_and_write(self, pp, poly, transcript: Keccak256Transcript):
        comm = self.commit(pp, poly)
        transcript.write_commitment_hash(comm.root)
        return comm

    def batch_commit_and_write(self, pp, polys, transcript):
        comms = self.batch_commit(pp, polys)
        for c in comms:
            transcript.write_commitment_hash(c.root)
        return comms

    def read_commitments(self, vp, n, transcript) -> List[BrakedownCommitment]:
        return [
            BrakedownCommitment(root=transcript.read_commitment_hash())
            for _ in range(n)
        ]

    # ------------------------------------------------------------------- open
    def open(
        self,
        pp: BrakedownParams,
        poly: MLPoly,
        comm: BrakedownCommitment,
        point: Sequence[Fp],
        eval_: Fp,
        transcript: Keccak256Transcript,
    ) -> None:
        spec = pp.spec
        code = pp.code
        row_len = code.row_len
        cw = code.codeword_len
        t_0, t_1 = _point_to_tensor(spec, pp.num_rows, point)

        matrix = poly.evals.reshape(pp.num_rows, row_len, limb.L)

        def combine(coeffs: Sequence[Fp]) -> List[Fp]:
            cvec = limb.to_mont(
                spec, limb.from_ints([int(c) for c in coeffs])
            )  # [num_rows, L]
            prod = limb.mont_mul(spec, matrix, cvec[:, None, :])
            total = limb.sum_reduce(spec, prod)  # [row_len, L]
            vals = limb.to_ints(limb.from_mont(spec, total))
            return [Fp(int(v), spec) for v in vals]

        if pp.num_rows > 1:
            for _ in range(code.num_proximity_testing):
                coeffs = transcript.squeeze_challenges(pp.num_rows)
                transcript.write_field_elements(combine(coeffs))
            t0_combined = combine(t_0)
        else:
            t0_combined = poly.to_fps()
        transcript.write_field_elements(t0_combined)

        # sanity: <t_0 row, t_1> == eval
        acc = Fp.zero(spec)
        for a, b in zip(t0_combined, t_1):
            acc = acc + a * b
        assert acc == eval_, "brakedown open: consistency sanity check failed"

        depth = (cw - 1).bit_length()
        for _ in range(code.num_column_opening):
            column = _squeeze_challenge_idx(transcript, cw)
            for r in range(pp.num_rows):
                transcript.write_field_element(
                    Fp(_digits_to_int(comm.rows[r, column]), spec)
                )
            offset = 0
            for idx in range(depth):
                width = 1 << (depth - idx)
                neighbor = (column >> idx) ^ 1
                transcript.write_commitment_hash(
                    comm.intermediate_hashes[offset + neighbor]
                )
                offset += width

    def batch_open(self, pp, polys, comms, points, evals, transcript):
        for e in evals:
            self.open(
                pp, polys[e.poly], comms[e.poly], points[e.point], e.value,
                transcript,
            )

    # ----------------------------------------------------------------- verify
    def verify(
        self,
        vp: BrakedownParams,
        comm: BrakedownCommitment,
        point: Sequence[Fp],
        eval_: Fp,
        transcript: Keccak256Transcript,
    ) -> None:
        spec = vp.spec
        code = vp.code
        row_len = code.row_len
        cw = code.codeword_len
        t_0, t_1 = _point_to_tensor(spec, vp.num_rows, point)

        combined_rows: List[Tuple[List[Fp], List[Fp]]] = []

        def encode_row(row: List[Fp]) -> List[Fp]:
            tensor = limb.to_mont(spec, limb.from_ints([int(v) for v in row]))
            encoded = code.encode_single(tensor)
            vals = limb.to_ints(limb.from_mont(spec, encoded))
            return [Fp(int(v), spec) for v in vals]

        if vp.num_rows > 1:
            for _ in range(code.num_proximity_testing):
                coeffs = transcript.squeeze_challenges(vp.num_rows)
                row = transcript.read_field_elements(row_len)
                combined_rows.append((coeffs, encode_row(row)))
        row = transcript.read_field_elements(row_len)
        t0_combined_row = row
        combined_rows.append((t_0, encode_row(row)))

        depth = (cw - 1).bit_length()
        # read every opening first (same transcript order), then verify
        # hashes/proximity in BATCH: the per-column loop made
        # num_column_opening*(depth+1) serial hasher calls and a Python
        # Fp multiply per (opening, row) — thousands of each per proof
        openings = []
        for _ in range(code.num_column_opening):
            column = _squeeze_challenge_idx(transcript, cw)
            items = transcript.read_field_elements(vp.num_rows)
            path = [transcript.read_commitment_hash() for _ in range(depth)]
            openings.append((column, items, path))

        # proximity: combined[o] = Σ_r coeffs[r]·items[o][r], vectorized
        items_mat = limb.to_mont(
            spec,
            limb.from_ints(
                [int(v) for (_, items, _) in openings for v in items]
            ),
        ).reshape(len(openings), vp.num_rows, limb.L)
        for coeffs, encoded in combined_rows:
            if vp.num_rows > 1:
                cvec = limb.to_mont(
                    spec, limb.from_ints([int(c) for c in coeffs])
                )
                prods = limb.mont_mul(spec, items_mat, cvec[None])
                combined = limb.sum_reduce(
                    spec, limb.xnp.swapaxes(prods, 0, 1)
                )  # [n_open, L]
            else:
                combined = items_mat[:, 0]
            got = limb.to_ints(limb.from_mont(spec, combined))
            for (column, _, _), item in zip(openings, got):
                if int(item) != int(encoded[column]):
                    raise ValueError("Proximity failure")

        # merkle paths: batch each level's 64-byte messages
        outputs = _hash_many(
            [
                b"".join(it.to_repr() for it in items)
                for (_, items, _) in openings
            ]
        )
        for idx in range(depth):
            blobs = []
            for (column, _, path), output in zip(openings, outputs):
                neighbor = path[idx]
                if (column >> idx) & 1 == 0:
                    blobs.append(output + neighbor)
                else:
                    blobs.append(neighbor + output)
            outputs = _hash_many(blobs)
        for output in outputs:
            if output != comm.root:
                raise ValueError("Invalid merkle tree opening")

        acc = Fp.zero(spec)
        for a, b in zip(t0_combined_row, t_1):
            acc = acc + a * b
        if acc != eval_:
            raise ValueError("Consistency failure")

    def batch_verify(self, vp, comms, points, evals, transcript):
        for e in evals:
            self.verify(vp, comms[e.poly], points[e.point], e.value, transcript)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _point_to_tensor(spec, num_rows: int, point: Sequence[Fp]):
    """(t_0 over high vars [num_rows], t_1 over low vars [row_len])
    (brakedown.rs:419-425)."""
    assert num_rows & (num_rows - 1) == 0
    split = len(point) - (num_rows.bit_length() - 1)
    lo_vars, hi_vars = list(point[:split]), list(point[split:])
    t_0 = eq_xy(spec, hi_vars).to_fps() if hi_vars else [Fp.one(spec)]
    t_1 = eq_xy(spec, lo_vars).to_fps() if lo_vars else [Fp.one(spec)]
    return t_0, t_1


def _squeeze_challenge_idx(transcript: Keccak256Transcript, cap: int) -> int:
    challenge = transcript.squeeze_challenge()
    return int.from_bytes(challenge.to_repr()[:4], "little") % cap


def _digits_to_int(digits) -> int:
    acc = 0
    for i, d in enumerate(digits):
        acc |= int(d) << (16 * i)
    return acc


def _column_bytes(canon: np.ndarray) -> List[bytes]:
    """Per-column concatenated canonical 32-byte LE reprs, row-major."""
    cols = np.ascontiguousarray(
        canon.transpose(1, 0, 2).astype("<u2")
    )  # [cw, rows, 16]
    return [cols[j].tobytes() for j in range(cols.shape[0])]


def _hash_many(blobs: List[bytes]) -> List[bytes]:
    from ..ops.keccak_batch import keccak256_many

    return keccak256_many(blobs)


def _merklize_device(spec, canon_dev, codeword_len: int):
    """Device twin of _column_bytes + _hash_many + _merklize: one batched
    keccak program per level, identical bytes/layout.  canon_dev is the
    [rows, cw, L] canonical digit tensor on device."""
    from ..piop import fiat_shamir as fs

    rows, cw, _ = canon_dev.shape
    # column j's message words: row-major 32-byte LE reprs
    words = canon_dev[..., 0::2] | (canon_dev[..., 1::2] << jnp.uint32(16))
    words = jnp.transpose(words, (0, 2, 1)).reshape(rows * 8, cw)
    cur = fs.keccak256_fixed(words, 32 * rows)  # [8, cw]

    depth = (codeword_len - 1).bit_length()
    width = 1 << depth
    if cw < width:
        zero_words = np.zeros((8, width - cw), dtype=np.uint32)
        for i in range(8):
            zero_words[i, :] = int.from_bytes(
                ZERO_HASH[4 * i: 4 * i + 4], "little"
            )
        cur = jnp.concatenate([cur, jnp.asarray(zero_words)], axis=1)
    levels = [cur]
    while cur.shape[1] > 1:
        pair_words = jnp.concatenate([cur[:, 0::2], cur[:, 1::2]], axis=0)
        cur = fs.keccak256_fixed(pair_words, 64)
        levels.append(cur)

    flat = np.asarray(jnp.concatenate(levels, axis=1))  # [8, 2^(d+1)-1]
    blobs = [
        b"".join(
            int(flat[i, j]).to_bytes(4, "little") for i in range(8)
        )
        for j in range(flat.shape[1])
    ]
    return blobs[:-1], blobs[-1]


def _merklize(codeword_len: int, column_hashes: List[bytes]):
    """brakedown.rs:152-190: pad leaves to 2^depth with zero-hashes, hash
    pairs level by level; returns (all intermediate levels flat, root)."""
    depth = (codeword_len - 1).bit_length()
    hashes: List[bytes] = [ZERO_HASH] * ((2 << depth) - 1)
    hashes[: len(column_hashes)] = column_hashes
    offset = 0
    for width in (1 << d for d in range(depth, 0, -1)):
        inputs = hashes[offset: offset + width]
        blobs = [
            inputs[2 * i] + inputs[2 * i + 1] for i in range(width // 2)
        ]
        outputs = _hash_many(blobs)
        hashes[offset + width: offset + width + len(outputs)] = outputs
        offset += width
    root = hashes[-1]
    return hashes[:-1], root
