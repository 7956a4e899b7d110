"""Embedding quantization: per-vector symmetric int8 compression.

A 100 TB embedding store is usually memory-bound, not compute-bound: fp32
vectors at 4 bytes/dim dominate both the ANN index's working set and the
shuffle volume of every similarity join.  Per-vector symmetric int8 (one
fp scale + 1 byte/dim) cuts that 4× with ~1e-2 cosine error at dim=64 —
the standard first rung of the PQ/OPQ ladder and usually all a dedup or
retrieval-recall workload needs.

All expressions are pure Catalyst array ops (``transform``/``aggregate``) —
no Python, codegen-eligible, pipelining inside the scan stage — and every
arithmetic step uses the house cross-engine form (``floor(x + 0.5)``
quantizer, not ``round``: half-up vs banker's vs away-from-zero rounding
differs across engines, while floor-shift is bit-identical) so the DuckDB
oracle can replay the exact computation.

Generalizes the reference's feature-scaling intent (codes.py:208-210
StandardScaler — a per-COLUMN affine compression) to the per-VECTOR affine
compression an embedding pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _abs_max(vec: Column) -> Column:
    return F.array_max(F.transform(vec, lambda x: F.abs(x)))


def int8_scale(vec: Column) -> Column:
    """Per-vector symmetric scale: max|x| / 127, floored at a tiny epsilon
    so an all-zero vector quantizes to zeros instead of dividing by zero."""
    return F.greatest(_abs_max(vec) / F.lit(127.0), F.lit(1e-30))


def quantize_int8(vec: Column, scale: Column) -> Column:
    """fp32 → int8 codes: floor(x/scale + 0.5), clamped to [−127, 127].

    The floor-shift quantizer is deliberately NOT ``round()`` — its
    half-way behavior is engine-identical (see module docstring).  Codes
    are kept as array<int> on the wire; a columnar sink stores them as
    bytes (parquet INT8 physical annotation) for the 4× size win.
    """
    return F.transform(
        vec,
        lambda x: F.greatest(
            F.lit(-127), F.least(F.lit(127), F.floor(x / scale + F.lit(0.5)).cast("int"))
        ),
    )


def dequantize(q: Column, scale: Column) -> Column:
    """int8 codes → fp reconstruction (code · scale)."""
    return F.transform(q, lambda c: c.cast("double") * scale)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def quantization_report(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector compression fidelity: ``(id, scale, max_abs_err,
    cos_orig_deq)`` where err is |dequantized − original| ∞-norm and cos is
    the cosine between the original vector and its reconstruction — the
    observability relation a pipeline records before switching its ANN
    index to quantized codes.

    One scan, zero shuffle: every metric is a per-row array expression.
    """
    vec = F.col(vec_col)
    scale = int8_scale(vec)
    deq = dequantize(quantize_int8(vec, scale), scale)
    err = F.array_max(
        F.zip_with(vec, deq, lambda x, y: F.abs(x.cast("double") - y))
    )
    # null (not NaN) for a zero-norm vector: 0/0 NaN is engine-dependent
    denom = F.sqrt(_dot(vec, vec) * _dot(deq, deq))
    cos = F.when(denom > 0, _dot(vec, deq) / denom)
    flr6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731 — house rounding
    return df.select(
        F.col(id_col),
        flr6(scale).alias("scale"),
        flr6(err).alias("max_abs_err"),
        flr6(cos).alias("cos_orig_deq"),
    )
