"""Registry part 5: Structured Streaming variants run to completion
(SURVEY §2.11).

Each query materializes the events fixture into a silver parquet dir (the
raw fixture stores TIMESTAMP(NANOS), which streaming file sources cannot
take), runs the streaming op with ``trigger(availableNow=True)`` into a
memory sink, and returns the final table — so the same DuckDB oracle that
gates the batch op gates the streaming variant end-to-end.  Batch/streaming
parity over identical input is the §5.2.5 contract; here the ORACLE is the
arbiter rather than the batch plan.
"""

from __future__ import annotations

import hashlib
import itertools
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..streaming import (
    read_events_stream,
    stream_conditional_rate,
    stream_lag_per_key,
    stream_weekly_mean,
)
from .registry import register

#: Silver dirs already materialized this session (fixture content is static).
_SILVERED: set[str] = set()
_SEQ = itertools.count()


def _silver_events_dir(spark: SparkSession, sf_dir: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{tempfile.gettempdir()}/spark_graft_stream_{tag}"
    if path not in _SILVERED:
        load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(path)
        _SILVERED.add(path)
    return path


def _run_to_completion(spark: SparkSession, sdf: DataFrame, mode: str) -> DataFrame:
    name = f"stream_sink_{next(_SEQ)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


@register(
    "stream_weekly_mean",
    "SELECT date_trunc('week', ts) AS week_start, round(avg(value), 6) AS avg_value"
    " FROM events GROUP BY 1",
)
def q_stream_weekly_mean(spark, sf_dir):
    """Streaming agg_mean_resampled (codes.py:119): watermarked tumbling
    ISO-week window, complete mode so the final table holds every closed
    window."""
    src = read_events_stream(spark, _silver_events_dir(spark, sf_dir))
    out = _run_to_completion(spark, stream_weekly_mean(src), "complete")
    return out.select("week_start", F.round("avg_value", 6).alias("avg_value"))


@register(
    "stream_conditional_rate",
    """
    SELECT date_trunc('day', ts) AS day_start, event_type,
           count(*) AS total,
           round(100.0 * avg(CASE WHEN value > 50 THEN 1 ELSE 0 END), 6)
               AS detection_rate
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_conditional_rate(spark, sf_dir):
    """Streaming agg_conditional_rate (codes.py:143-147): per (day × type)
    detection rate as a windowed streaming aggregation."""
    src = read_events_stream(spark, _silver_events_dir(spark, sf_dir))
    out = _run_to_completion(spark, stream_conditional_rate(src), "complete")
    return out.select(
        "day_start",
        "event_type",
        "total",
        F.round("detection_rate", 6).alias("detection_rate"),
    )


@register(
    "stream_lag_per_key",
    """
    SELECT user_id, event_id, round(value, 6) AS value,
           round(lag(value, 1, 0.0) OVER w, 6) AS value_lag1,
           round(lag(value, 2, 0.0) OVER w, 6) AS value_lag2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_stream_lag_per_key(spark, sf_dir):
    """Streaming window_lag (codes.py:55-59) via applyInPandasWithState.

    The fixture arrives as one file → one micro-batch, so the in-batch
    (ts, event_id) sort makes the keyed state walk equal to the batch lag
    window — which is exactly what the SQL oracle checks."""
    src = read_events_stream(spark, _silver_events_dir(spark, sf_dir))
    out = _run_to_completion(spark, stream_lag_per_key(src), "append")
    return out.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round("value_lag1", 6).alias("value_lag1"),
        F.round("value_lag2", 6).alias("value_lag2"),
    )
