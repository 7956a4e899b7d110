"""Unit tests for per-vector int8 embedding quantization
(operators/quantize.py) — hand-checkable vectors; registry parity at
sf0.001 is covered by test_registry_parity.py (embedding_quantize_int8)."""

from __future__ import annotations

from cdc_wastewater_analysis_ml_spark.operators import quantize as Q


def _report(spark, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return {r["vec_id"]: r for r in Q.quantization_report(df).collect()}


def test_quantize_exact_codes_and_error(spark):
    out = _report(spark, [(1, [1.0, -0.5, 0.25, 0.0])])
    r = out[1]
    # scale = max|x|/127 = 1/127
    assert r["scale"] == 0.007874
    # worst element: -0.5 → floor(-63.5 + 0.5) = -63 → deq -63/127,
    # err = 0.5/127 = 0.003937...
    assert r["max_abs_err"] == 0.003937
    assert r["cos_orig_deq"] is not None and r["cos_orig_deq"] > 0.9999


def test_quantize_zero_vector_is_defined(spark):
    out = _report(spark, [(2, [0.0, 0.0, 0.0])])
    r = out[2]
    assert r["scale"] == 0.0  # 1e-30 floors to 0 at 1e-6 rounding
    assert r["max_abs_err"] == 0.0
    assert r["cos_orig_deq"] is None  # null, never engine-dependent NaN


def test_quantize_codes_clamped_and_reconstruction_monotone(spark):
    # a vector whose max element lands exactly on the clamp boundary and a
    # negative mirror: codes must stay within [-127, 127] so the byte
    # representation is storable as INT8
    out = _report(spark, [(3, [2.54, -2.54, 1.27, -0.01])])
    r = out[3]
    assert r["scale"] == 0.02  # 2.54/127
    # max err bounded by scale/2 for in-range elements
    assert r["max_abs_err"] <= 0.02 / 2 + 1e-9
    assert r["cos_orig_deq"] > 0.9999
