"""Edge-case tests for operators/analytic.py (r7 judge task 1: the module
landed with zero tests and a latent negative-slice crash — these pin the
empty/null/boundary behaviors the registry fixtures can't reach)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators import analytic as AN
from cdc_wastewater_analysis_ml_spark.operators import text as T


def test_top_bigrams_survives_empty_and_null_token_arrays(spark):
    """The r7 ADVICE crash: size(empty)=0 / size(null)=-1 made the slice
    length negative, a Spark runtime error on the first empty document.
    Empty, single-token, and null-array docs must contribute zero bigrams
    without failing the query."""
    df = spark.createDataFrame(
        [
            ("a b c",),
            ("a b",),
            ("solo",),
            ("",),
            (None,),
        ],
        "text string",
    )
    toks = F.when(F.col("text").isNull(), F.lit(None)).otherwise(
        T.tokenize("text")
    )
    got = {(r["bigram"], r["n"]) for r in AN.top_bigrams(df, toks, 10).collect()}
    assert got == {("a b", 2), ("b c", 1)}


def test_top_bigrams_tiebreak_and_limit(spark):
    df = spark.createDataFrame(
        [("z y",), ("a b",), ("m n",)], "text string"
    )
    rows = AN.top_bigrams(df, T.tokenize("text"), 2).collect()
    # all counts tie at 1 -> lexicographic bigram order decides the cut
    assert [r["bigram"] for r in rows] == ["a b", "m n"]


def test_ntile_matches_sql_ntile_and_handles_n_lt_k(spark):
    df = spark.range(10).select(F.col("id").alias("k"))
    got = {
        (r["k"], r["tile"])
        for r in AN.ntile_scalable(df, ["k"], 3).collect()
    }
    from pyspark.sql import Window

    want = {
        (r["k"], r["tile"])
        for r in df.select(
            "k", F.ntile(3).over(Window.orderBy("k")).alias("tile")
        ).collect()
    }
    assert got == want
    # n < k: every row gets its own tile 1..n, never a division error
    tiny = spark.range(3).select(F.col("id").alias("k"))
    got_tiny = sorted(
        (r["k"], r["tile"]) for r in AN.ntile_scalable(tiny, ["k"], 7).collect()
    )
    assert got_tiny == [(0, 1), (1, 2), (2, 3)]


def test_ntile_zero_rows(spark):
    empty = spark.range(0).select(F.col("id").alias("k"))
    assert AN.ntile_scalable(empty, ["k"], 4).count() == 0


def test_locf_leading_nulls_stay_null_and_keys_are_isolated(spark):
    df = spark.createDataFrame(
        [
            ("u1", 1, None),
            ("u1", 2, 10.0),
            ("u1", 3, None),
            ("u2", 1, None),  # u2 must NOT inherit u1's 10.0
            ("u2", 2, 5.0),
        ],
        "uid string, seq int, v double",
    )
    got = {
        (r["uid"], r["seq"]): r["v_filled"]
        for r in AN.locf_fill(df, "v", ["seq"], ["uid"]).collect()
    }
    assert got == {
        ("u1", 1): None,
        ("u1", 2): 10.0,
        ("u1", 3): 10.0,
        ("u2", 1): None,
        ("u2", 2): 5.0,
    }


def test_histogram_clamps_underflow_and_overflow(spark):
    df = spark.createDataFrame(
        [(-100,), (0,), (999,), (1000,), (5000,)], "cents long"
    )
    got = {
        r["bin"]: (r["bin_lo_cents"], r["n"], r["sum_cents"])
        for r in AN.histogram_fixed(df, "cents", 1000, 3).collect()
    }
    # -100 clamps into bin 0; 5000 (bin 5) clamps into last bin 2
    assert got == {
        0: (0, 3, 899),
        1: (1000, 1, 1000),
        2: (2000, 1, 5000),
    }


def test_date_spine_single_day(spark):
    df = spark.createDataFrame(
        [("2024-03-05 10:00:00",), ("2024-03-05 23:00:00",)], "s string"
    ).select(F.col("s").cast("timestamp").alias("ts"))
    rows = AN.date_spine(df, "ts").collect()
    assert [str(r["day"]) for r in rows] == ["2024-03-05"]


def test_edit_distance_verify_threshold_abandons(spark):
    docs = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcdeX"), (3, "zzzzzzzzzzzzzzzz")],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(1, 2), (1, 3)], "id_a long, id_b long"
    )
    rows = AN.edit_distance_verify(cand, docs, "text", "doc_id", 3).collect()
    # (1,3) exceeds max_dist -> threshold variant returns -1 -> dropped
    assert [(r["id_a"], r["id_b"], r["lev"]) for r in rows] == [(1, 2, 1)]
