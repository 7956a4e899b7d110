"""Property-based semantic tests (SURVEY §5.2.4): the null/edge conventions
of the scalar kernels against a pandas-on-driver oracle, randomized inputs.

Each hypothesis example generates a batch of values and runs one Spark plan
over the batch (not one plan per value) to keep the suite fast.
"""


import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.functions import scalars as S

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

floats_with_nulls = st.lists(
    st.one_of(
        st.none(),
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=60,
)


def _df(spark, values):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v double"
    )


@_settings
@given(floats_with_nulls)
def test_derive_binary_label_null_is_zero(spark, values):
    got = (
        _df(spark, values)
        .select("id", S.derive_binary_label("v").alias("y"))
        .orderBy("id")
        .toPandas()["y"]
    )
    s = pd.Series(values, dtype="float64")
    expected = (s > 0).astype(int)  # pandas: NaN > 0 → False → 0 (codes.py:50)
    assert (got.to_numpy() == expected.to_numpy()).all()


@_settings
@given(floats_with_nulls)
def test_clip_upper_preserves_null(spark, values):
    got = (
        _df(spark, values)
        .select("id", S.clip_upper("v", 100.0).alias("y"))
        .orderBy("id")
        .toPandas()["y"]
    )
    s = pd.Series(values, dtype="float64")
    expected = np.clip(s, a_min=None, a_max=100)  # codes.py:90: NaN stays NaN
    assert np.allclose(got, expected, equal_nan=True)


@_settings
@given(
    st.lists(
        st.floats(min_value=0.0, max_value=1e9, allow_nan=False),
        min_size=1,
        max_size=60,
    )
)
def test_log1p_matches_numpy_on_valid_domain(spark, values):
    got = (
        _df(spark, values)
        .select("id", S.log1p_("v").alias("y"))
        .orderBy("id")
        .toPandas()["y"]
    )
    assert np.allclose(got, np.log1p(values))


@_settings
@given(st.lists(st.integers(min_value=0, max_value=40000), min_size=1, max_size=60))
def test_weekday_matches_pandas_monday0(spark, day_offsets):
    df = spark.createDataFrame(
        [(i, int(d)) for i, d in enumerate(day_offsets)], "id long, d int"
    ).select(
        "id", F.date_add(F.to_date(F.lit("1970-01-01")), F.col("d")).alias("dt")
    )
    got = df.select("id", S.date_weekday("dt").alias("y")).orderBy("id").toPandas()["y"]
    expected = pd.Series(
        pd.Timestamp("1970-01-01") + pd.to_timedelta(day_offsets, unit="D")
    ).dt.dayofweek  # Monday=0 (codes.py:31)
    assert (got.to_numpy() == expected.to_numpy()).all()


@_settings
@given(floats_with_nulls)
def test_bucketize_left_closed_matches_pd_cut(spark, values):
    edges = [0.0, 10.0, 100.0, 1000.0, float("inf")]
    labels = ["a", "b", "c", "d"]
    got = (
        _df(spark, values)
        .select("id", S.bucketize("v", edges, labels).alias("y"))
        .orderBy("id")
        .toPandas()["y"]
    )
    expected = pd.cut(
        pd.Series(values, dtype="float64"), bins=edges, labels=labels, right=False
    ).astype(object)
    for g, e in zip(got, expected):
        assert (g is None and (e is None or e != e)) or g == e


@_settings
@given(
    st.lists(
        st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=60
    )
)
def test_mode_smallest_value_tiebreak(spark, values):
    from cdc_wastewater_analysis_ml_spark.operators.aggregates import mode_scalar

    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = mode_scalar(df, "v")
    expected = pd.Series(values).mode()[0]  # pandas sorts modes asc (codes.py:83)
    assert got == expected


# ---------------------------------------------------------------------------
# join_asof vs pandas.merge_asof (independent oracle for the merge strategy)
# ---------------------------------------------------------------------------

from cdc_wastewater_analysis_ml_spark.operators import relational as R  # noqa: E402

_asof_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=50),     # ts (seconds offset)
    ),
    min_size=1,
    max_size=40,
)


@_settings
@given(_asof_events, _asof_events)
def test_join_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {
            "k": [k for k, _ in left_rows],
            "ts": [base + pd.Timedelta(seconds=t) for _, t in left_rows],
        }
    )
    lpdf["lid"] = range(len(lpdf))
    # right side must be unique per (k, ts): the tie survivor is unspecified
    # in both engines (documented op contract), so dedupe like a caller would
    rpdf = pd.DataFrame(
        {
            "k": [k for k, _ in right_rows],
            "rts": [base + pd.Timedelta(seconds=t) for _, t in right_rows],
        }
    ).drop_duplicates(["k", "rts"])
    rpdf["v"] = [float(i) for i in range(len(rpdf))]

    left = spark.createDataFrame(lpdf, "k long, ts timestamp, lid long")
    right = spark.createDataFrame(rpdf, "k long, rts timestamp, v double")
    got = (
        R.join_asof(left, right, ["k"], "ts", "rts", ["v"])
        .select("lid", "v")
        .toPandas()
        .set_index("lid")["v"]
        .to_dict()
    )
    expected_df = pd.merge_asof(
        lpdf.sort_values("ts", kind="stable"),
        rpdf.sort_values("rts", kind="stable"),
        left_on="ts",
        right_on="rts",
        by="k",
        direction="backward",
    )
    expected = expected_df.set_index("lid")["v"].to_dict()
    for lid, v in expected.items():
        g = got[lid]
        assert (pd.isna(v) and pd.isna(g)) or v == g, (lid, v, g)


# ---------------------------------------------------------------------------
# chunking / quantization invariants (round-5 ops)
# ---------------------------------------------------------------------------

texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c"),  # forces multi-token and empty cases
        min_size=0,
        max_size=120,
    ),
    min_size=1,
    max_size=12,
)


@_settings
@given(texts, st.integers(2, 7), st.integers(1, 6))
def test_chunk_documents_cover_and_reconstruct(spark, docs, chunk, stride):
    """Invariants for every (text, chunk_tokens, stride): (a) every token
    index is covered by ≥1 chunk; (b) concatenating each chunk's first
    `stride` tokens (plus the last chunk's tail) reconstructs the token
    stream; (c) n_chunk_tokens matches the chunk's own token count."""
    from hypothesis import assume

    from cdc_wastewater_analysis_ml_spark.operators.corpus import chunk_documents
    from cdc_wastewater_analysis_ml_spark.operators.text import normalize_text

    assume(stride <= chunk)  # overlapping-window contract
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = (
        chunk_documents(df, "text", "doc_id", chunk, stride)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    norm = (
        df.select("doc_id", normalize_text("text").alias("n")).orderBy("doc_id").collect()
    )
    for row in norm:
        toks = row["n"].split(" ")  # matches tokenize(): "" -> [""]
        chunks = [r for r in out if r["doc_id"] == row["doc_id"]]
        assert chunks, (row, out)
        rebuilt: list[str] = []
        for r in chunks:
            ctoks = r["chunk_text"].split(" ")
            assert r["n_chunk_tokens"] == len(ctoks)
            rebuilt.extend(ctoks if r is chunks[-1] else ctoks[:stride])
        assert rebuilt == toks, (toks, [r["chunk_text"] for r in chunks])


vectors = st.lists(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=16,
    ),
    min_size=1,
    max_size=10,
)


@_settings
@given(vectors)
def test_quantization_error_bounded_by_half_scale(spark, vecs):
    """For every vector: max|x − deq(q(x))| ≤ scale/2 + ulp slack (the
    floor-shift quantizer's worst case), and scale reflects max|x|/127."""
    from cdc_wastewater_analysis_ml_spark.operators.quantize import (
        quantization_report,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    rows = quantization_report(df).collect()
    assert len(rows) == len(vecs)
    for r in rows:
        v = vecs[r["vec_id"]]
        amax = max(abs(np.float32(x)) for x in v)
        scale = max(amax / 127.0, 1e-30)
        # reported scale is floor-rounded to 1e-6
        assert abs(r["scale"] - scale) <= 1e-6
        assert r["max_abs_err"] <= scale / 2 + 1e-6


@given(
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=0, max_value=10**6),
    st.floats(min_value=1e-6, max_value=1.0),
)
def test_size_ratio_prefilter_never_drops_a_passing_pair(na, nb, inter, t):
    """Float-level proof obligation of _size_ratio_prefilter (r12): for ANY
    set sizes and intersection (inter <= min <= max), the IEEE-evaluated
    jaccard = inter/(na+nb-inter) never exceeds the IEEE-evaluated ratio
    min/max — exact-rational ordering (jaccard <= min/max) survives
    float rounding because fl() is monotone and both quotients are single
    divisions of exact integers.  Hence `ratio < t` implies `jaccard < t`:
    the prefilter can only drop pairs the threshold filter would drop."""
    inter = min(inter, na, nb)
    jaccard = inter / (na + nb - inter)
    ratio = min(na, nb) / max(na, nb)
    assert jaccard <= ratio
    if ratio < t:
        assert jaccard < t
