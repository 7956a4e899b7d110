"""Column profiler + CDC merge/upsert unit tests."""

import pytest
from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators.cdc import merge_upsert
from cdc_wastewater_analysis_ml_spark.operators.profile import profile_columns


def test_profile_hand_computed_with_nulls(spark):
    df = spark.createDataFrame(
        [(1, 2.5, "a"), (2, None, "b"), (3, 1.25, None), (3, 1.25, "a")],
        "k long, v double, s string",
    )
    rows = {r["column"]: r for r in
            profile_columns(df, ["k", "v"], ["s"]).collect()}
    assert set(rows) == {"k", "v", "s"}
    k = rows["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 0, 3)
    assert (k["min_num"], k["max_num"]) == (1.0, 3.0)
    assert k["min_str"] is None and k["max_str"] is None
    v = rows["v"]
    assert (v["n_nulls"], v["n_distinct"]) == (1, 2)
    assert (v["min_num"], v["max_num"]) == (1.25, 2.5)
    s = rows["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert s["min_num"] is None and s["max_num"] is None


def test_profile_requires_columns(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        profile_columns(df)


def test_profile_single_table_scan(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_columns(df, ["id", "v"]).explain("formatted")
    plan = buf.getvalue()
    # all stats in one aggregate over one scan (Expand, not repeated scans)
    assert plan.count("Scan ") <= 1, plan


def test_merge_upsert_actions(spark):
    cur = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, bal double",
    )
    delta = spark.createDataFrame(
        [(2, "b2", 25.0), (9, "new", 99.0)], "k long, name string, bal double"
    )
    out = {r["k"]: r for r in merge_upsert(cur, delta, ["k"]).collect()}
    assert set(out) == {1, 2, 3, 9}
    assert (out[1]["action"], out[1]["bal"]) == ("keep", 10.0)
    assert (out[2]["action"], out[2]["name"], out[2]["bal"]) == ("update", "b2", 25.0)
    assert (out[3]["action"],) == ("keep",)
    assert (out[9]["action"], out[9]["name"]) == ("insert", "new")


def test_merge_upsert_null_values_from_delta_win(spark):
    # an update may legitimately null a value column; presence markers (not
    # value nullness) must drive the side selection
    cur = spark.createDataFrame([(1, "x")], "k long, name string")
    delta = spark.createDataFrame([(1, None)], "k long, name string")
    r = merge_upsert(cur, delta, ["k"]).collect()[0]
    assert r["action"] == "update"
    assert r["name"] is None


def test_merge_upsert_schema_mismatch_raises(spark):
    cur = spark.createDataFrame([(1, "x")], "k long, name string")
    bad = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        merge_upsert(cur, bad, ["k"])
    with pytest.raises(ValueError):
        merge_upsert(cur, cur, [])


def test_merge_upsert_action_collision_raises(spark):
    cur = spark.createDataFrame([(1, "x")], "k long, action string")
    with pytest.raises(ValueError):
        merge_upsert(cur, cur, ["k"])


@pytest.mark.parametrize("marker", ["__in_cur", "__in_dlt"])
def test_merge_upsert_marker_collision_raises(spark, marker):
    """r6 ADVICE: an input column named like an internal presence marker
    would be silently overwritten and corrupt side selection — reject it
    as loudly as an action_col collision."""
    cur = spark.createDataFrame([(1, True)], f"k long, {marker} boolean")
    with pytest.raises(ValueError, match=marker):
        merge_upsert(cur, cur, ["k"])


def test_profile_all_null_column(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None)], "k long, v double"
    )
    rows = {r["column"]: r for r in profile_columns(df, ["k", "v"]).collect()}
    v = rows["v"]
    assert (v["n_rows"], v["n_nulls"], v["n_distinct"]) == (2, 2, 0)
    assert v["min_num"] is None and v["max_num"] is None
