"""Roofline accounting: achieved useful-op throughput vs measured peaks.

SURVEY §5 requires "%-of-roofline per kernel" reporting and BASELINE.md sets
the ≥80% target; this module owns the op-count models and the measured peak
table so every bench (bench.py, plonkish_tpu.benchmark) prints the same
honestly-derived `roofline_pct`.

Peaks are MEASURED numbers, not datasheet flops (docs/PERF_NOTES.md):
- `u32_mul`: 0.96 Tops/s — Mosaic microbenchmark of dense u32 multiplies on
  (512, 128) blocks on the TPU v5e (round 2, "Corrected cost model").  This
  is ~1 mul/lane/cycle, the VPU's real integer-multiply rate; the bf16 MXU
  peak is irrelevant to 254-bit modular arithmetic.
- `hbm`: 819 GB/s — v5e HBM bandwidth (public spec; the round-2 SoA cost
  model's implied measurement was ~768 GB/s, consistent).

Convention: "useful ops" = the u32 digit multiplies mandated by the
algorithm's Montgomery-multiply count (the same count every implementation
of the schoolbook+REDC algorithm executes).  Carries, masks, adds and
selects are overhead and NOT counted, so `roofline_pct` can never flatter a
kernel that does extra bookkeeping: 100% means the chip multiplies as fast
as the microbenchmark peak with zero overhead.
"""

from __future__ import annotations

from typing import Optional

# Measured peak rates per jax backend (see module docstring for provenance).
PEAKS = {
    "tpu": {"u32_mul": 0.96e12, "hbm_bytes": 819e9},
}

# soa.mont_mul (fields/soa.py): schoolbook a*b (16x16 = 256 u32 muls) +
# m = t*p' mod R (triangular low half: 136) + m*p (256)  -> 648 per modmul.
MONT_MUL_U32_MULS = 648
# soa.mont_sqr: cross products once + diagonal (136) + the same REDC tail.
MONT_SQR_U32_MULS = 136 + 136 + 256

# curves/device._jmadd_soa_incomplete: madd-2007-bl 7M+4S (z1z1, hh, r²,
# zh² are mont_sqr since round 3).
MADD_INCOMPLETE_U32_MULS = 7 * MONT_MUL_U32_MULS + 4 * MONT_SQR_U32_MULS


def msm_u32_mul_ops(curve, n: int, c: Optional[int] = None) -> int:
    """Useful u32 multiplies of the Pippenger window-sums kernel at size n.

    Per (point, window) the bucket accumulation performs one incomplete
    mixed add (pallas/msm.py); the window-reduction kernel's running sums
    are field additions (uncounted) plus a per-(window, lane) fold that is
    O(W·2^c) point ops — negligible against n·W for bench sizes and
    therefore excluded, keeping this a lower bound on executed muls.
    """
    from .curves.msm import window_size

    c = c or window_size(n)
    num_windows = -(-curve.scalar.num_bits // c) + 1  # signed digits
    return n * num_windows * MADD_INCOMPLETE_U32_MULS


def expression_mul_count(spec, expr, challenges=None) -> int:
    """Montgomery multiplies per row for one evaluation of `expr`, counted
    on the CSE'd tape (piop/tape.py) — the same DAG the round kernels
    evaluate.  Challenge leaves must be substituted (as the prover does)
    before the tape compiles; pass the challenge values used."""
    from .piop.tape import OP_MUL, tape_for

    if challenges:
        expr = expr.simplified(challenges)
    tape = tape_for(expr, spec)
    return int((tape.instrs[:, 0] == OP_MUL).sum())


def sumcheck_u32_mul_ops(
    spec, expr, k: int, num_polys: int, challenges=None
) -> int:
    """Useful u32 multiplies of a full k-round EvaluationsProver sum-check.

    Round r (r = 0..k-1) has 2^(k-1-r) pairs; the round kernel evaluates the
    expression at t = 1..degree per pair (pallas/sumcheck.py grid), and the
    fold kernel then performs one field mul per (poly slot, pair):
    lo + t·(hi − lo).  eq_xy table construction and the transcript are
    uncounted (o(2^k) or host-side).
    """
    degree = expr.degree()
    muls_per_pair = (
        degree * expression_mul_count(spec, expr, challenges) + num_polys
    )
    pairs_total = (1 << k) - 1  # sum over rounds of 2^(k-1-r)
    return pairs_total * muls_per_pair * MONT_MUL_U32_MULS


def msm_hbm_bytes(curve, n: int, c: Optional[int] = None) -> int:
    """HBM traffic of the window-sums kernel: the grid is window-major
    (pallas/msm.py), so each of the W window passes re-streams the point
    coordinates (xs, ys: 2·L·4 B/point) and its digit/sign rows (8 B);
    bucket state is VMEM-resident per window and flushed once."""
    from .curves.msm import window_size

    c = c or window_size(n)
    num_windows = -(-curve.scalar.num_bits // c) + 1
    point_stream = n * num_windows * (2 * 16 * 4 + 8)
    # bucket state is packed (two 16-bit digits per u32, pallas/msm.py PW)
    bucket_flush = num_windows * ((1 << (c - 1)) + 1) * 3 * 8 * 4 * 1024
    return point_stream + bucket_flush


def sumcheck_hbm_bytes(k: int, num_polys: int) -> int:
    """HBM traffic of a full k-round sum-check over the packed state
    ([T, 8, n] u32 = 32 B/element, pallas/sumcheck.py): per round the eval
    kernel streams lo+hi once, the fold kernel streams them again and
    writes the halved state."""
    per_elem = 32
    total_elems = num_polys * ((1 << (k + 1)) - 2)  # sum of 2^(k-r)
    return total_elems * per_elem * 5 // 2  # 2 reads + 0.5 write


def roofline_pct(
    ops: int, seconds: float, backend: str, kind: str = "u32_mul"
) -> Optional[float]:
    """Achieved/peak in percent, or None when no peak is measured for the
    backend (e.g. the CPU emulation path — a CPU 'roofline' against a TPU
    peak would be meaningless)."""
    peak = PEAKS.get(backend, {}).get(kind)
    if peak is None or seconds <= 0:
        return None
    return 100.0 * ops / seconds / peak
