"""Batch/streaming parity (SURVEY §5.2.5): the streaming variants computed
over the events fixture must agree with the batch operators once all data is
processed."""


import pytest
from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.operators import aggregates as A
from cdc_wastewater_analysis_ml_spark.operators import windows as W
from cdc_wastewater_analysis_ml_spark.sources import load_table
from cdc_wastewater_analysis_ml_spark.streaming import (
    read_events_stream,
    stream_conditional_rate,
    stream_lag_per_key,
    stream_weekly_mean,
)


@pytest.fixture(scope="module")
def stream_dir(spark, sf_small, tmp_path_factory):
    """Materialize events (with repaired timestamps) into a streaming source
    dir — the raw fixture stores nanos timestamps streaming readers can't
    take directly, so this mirrors a real bronze→silver layout."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_small, "events").write.mode("overwrite").parquet(d)
    return d


def _run_to_memory(spark, sdf, name, mode):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_weekly_mean_matches_batch(spark, sf_small, stream_dir):
    # complete mode: append would withhold the trailing windows the watermark
    # has not closed when the finite stream ends (correct streaming behavior;
    # parity here is about the *values*, so emit every window).
    sdf = stream_weekly_mean(read_events_stream(spark, stream_dir))
    got = _run_to_memory(spark, sdf, "weekly_mean_sink", "complete").toPandas()
    expected = (
        A.agg_mean_resampled(load_table(spark, sf_small, "events"), "ts", "value")
        .toPandas()
    )
    got = got.sort_values("week_start").reset_index(drop=True)
    expected = expected.sort_values("week_start").reset_index(drop=True)
    assert len(got) == len(expected)
    assert (got["week_start"].to_numpy() == expected["week_start"].to_numpy()).all()
    assert (abs(got["avg_value"] - expected["avg_value"]) < 1e-9).all()


def test_stream_conditional_rate_matches_batch(spark, sf_small, stream_dir):
    sdf = stream_conditional_rate(read_events_stream(spark, stream_dir), 50.0)
    got = _run_to_memory(spark, sdf, "cond_rate_sink", "complete").toPandas()
    ev = load_table(spark, sf_small, "events").withColumn(
        "flag", F.when(F.col("value") > 50.0, 1).otherwise(0)
    ).withColumn("day_start", F.date_trunc("day", "ts"))
    expected = (
        ev.groupBy("day_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("total"),
            (F.lit(100.0) * F.avg("flag")).alias("detection_rate"),
        )
        .toPandas()
    )
    key = ["day_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    expected = expected.sort_values(key).reset_index(drop=True)
    assert len(got) == len(expected)
    assert (got["total"].to_numpy() == expected["total"].to_numpy()).all()
    assert (abs(got["detection_rate"] - expected["detection_rate"]) < 1e-9).all()


def test_stream_lag_matches_batch(spark, sf_small, stream_dir):
    sdf = stream_lag_per_key(read_events_stream(spark, stream_dir))
    got = _run_to_memory(spark, sdf, "lag_sink", "append").toPandas()
    expected = (
        W.window_lag(
            load_table(spark, sf_small, "events"),
            ["user_id"],
            ["ts", "event_id"],
            "value",
            offsets=(1, 2),
            default=0.0,
        )
        .select("event_id", "value_lag1", "value_lag2")
        .toPandas()
    )
    got = got.sort_values("event_id").reset_index(drop=True)
    expected = expected.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(expected)
    assert (abs(got["value_lag1"] - expected["value_lag1"]) < 1e-9).all()
    assert (abs(got["value_lag2"] - expected["value_lag2"]) < 1e-9).all()


def test_stream_session_windows_prefix_of_batch(spark, sf_small, stream_dir):
    from cdc_wastewater_analysis_ml_spark.streaming import stream_session_windows

    sdf = stream_session_windows(read_events_stream(spark, stream_dir))
    got = _run_to_memory(spark, sdf, "session_sink", "append").toPandas()
    batch = A.agg_session_windows(
        load_table(spark, sf_small, "events"), "user_id", "ts", "30 minutes"
    ).toPandas()
    key = ["user_id", "session_start", "session_end", "n_events"]
    got_set = {tuple(r) for r in got[key].itertuples(index=False)}
    batch_set = {tuple(r) for r in batch[key].itertuples(index=False)}
    # append emits only watermark-closed sessions: exact subset, no phantoms
    assert got_set <= batch_set
    assert len(got_set) > 0  # the 1h watermark closes almost every session
    missing = batch_set - got_set
    # only trailing sessions (near the max event time) may be withheld
    max_end = max(e for _, _, e, _ in batch_set)
    import pandas as pd

    for _, _, end, _ in missing:
        assert end >= max_end - pd.Timedelta(hours=2), (end, max_end)
