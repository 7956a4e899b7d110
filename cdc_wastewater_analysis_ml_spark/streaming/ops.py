"""Structured Streaming variants of the reference's time-series operators
(SURVEY §2.11).

The reference is pure batch, but its three core time-series ops are exactly
the stateful-streaming primitives; the engine exposes event-time versions with
watermarked late-data handling.  Batch/streaming parity over the same input is
the correctness contract (SURVEY §5.2.5): once the watermark closes a window,
the streaming result must equal the batch aggregate.

Scale notes: windowed aggs keep one state row per (key, window) — bounded by
the watermark horizon; the keyed-lag op keeps O(lag depth) state per key.
Shuffles are identical to the batch plans (hash by key / window).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(spark: SparkSession, dir_path: str) -> DataFrame:
    """File-source stream of events parquet (schema must be provided —
    streaming sources cannot infer)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(dir_path)


def stream_weekly_mean(
    events: DataFrame, watermark: str = "7 days", value_col: str = "value"
) -> DataFrame:
    """Streaming ≙ agg_mean_resampled (codes.py:119): tumbling ISO-week
    event-time window + watermark for late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 week", "1 week", "4 days").alias("w"))
        .agg(F.avg(value_col).alias("avg_value"))
        .select(F.col("w.start").alias("week_start"), "avg_value")
    )


def stream_conditional_rate(
    events: DataFrame,
    threshold: float = 50.0,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming ≙ agg_conditional_rate (codes.py:143-147): per event-type ×
    day detection rate, updated as events arrive."""
    flag = F.when(F.col("value") > threshold, 1).otherwise(0)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("total"),
            (F.lit(100.0) * F.avg(flag)).alias("detection_rate"),
        )
        .select(
            F.col("w.start").alias("day_start"),
            "event_type",
            "total",
            "detection_rate",
        )
    )


_LAG_OUT_SCHEMA = (
    "user_id long, event_id long, value double, value_lag1 double, value_lag2 double"
)
_LAG_STATE_SCHEMA = "lag1 double, lag2 double"


def stream_lag_per_key(events: DataFrame) -> DataFrame:
    """Per-user lag1/lag2 via ``applyInPandasWithState`` — the custom
    stateful-operator escape hatch (SURVEY §2.11, §2.12); streaming ≙
    window_lag (codes.py:55-59).

    Rows within each micro-batch are ordered by (ts, event_id); state carries
    the last two values across batches.  A key's rows can span multiple Arrow
    chunks (``spark.sql.execution.arrow.maxRecordsPerBatch``), so the chunks
    are concatenated and sorted ONCE per (key, micro-batch) before emitting —
    sorting each chunk independently would mis-lag out-of-order rows that
    straddle a chunk boundary.  Correctness contract: events must arrive
    batch-monotonically per key (file/kafka sources with event-time ordered
    partitions); out-of-order *within* a batch is handled, across batches is
    not — the documented divergence from the batch op.

    Memory bound: concat-then-sort materializes a key's ENTIRE micro-batch
    in the Python worker (required for cross-chunk ordering) — chunked
    iteration's bounded-memory property does not hold here.  Size
    micro-batches (``maxFilesPerTrigger`` / ``maxOffsetsPerTrigger``) so the
    hottest key's batch slice fits in worker memory; a hot key in a huge
    ``availableNow`` batch can otherwise OOM the worker.

    The state function is a closure (NOT a module-level function) so
    cloudpickle ships it BY VALUE — Python UDF workers need no access to this
    package on their import path.
    """

    def lag_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        lag1, lag2 = state.get if state.exists else (0.0, 0.0)
        chunks = list(pdfs)
        if not chunks:  # unreachable under NoTimeout; defensive for timeouts
            return
        pdf = (chunks[0] if len(chunks) == 1 else pd.concat(chunks)).sort_values(
            ["ts", "event_id"]
        )
        out_l1, out_l2 = [], []
        for v in pdf["value"]:
            out_l1.append(lag1)
            out_l2.append(lag2)
            lag2, lag1 = lag1, float(v)
        state.update((lag1, lag2))
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "value": pdf["value"].to_numpy(),
                "value_lag1": out_l1,
                "value_lag2": out_l2,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        lag_fn,
        outputStructType=_LAG_OUT_SCHEMA,
        stateStructType=_LAG_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming sessionization ≙ aggregates.agg_session_windows: merging
    session windows with an inactivity ``gap``; append mode emits a session
    once the watermark passes its end.

    On a finite stream the trailing sessions (end > final watermark) are
    correctly withheld — the batch/streaming parity contract is therefore
    prefix equality: every emitted session equals the batch session exactly
    (tested in test_streaming_parity.py); only watermark-open sessions are
    absent."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window(F.col("ts"), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
