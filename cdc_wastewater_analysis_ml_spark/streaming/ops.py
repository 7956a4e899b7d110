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


def read_events_stream(spark: SparkSession, dir_path: str, **options) -> DataFrame:
    """File-source stream of events parquet (schema must be provided —
    streaming sources cannot infer).

    ``options`` are SOURCE options (``maxFilesPerTrigger``, ``latestFirst``,
    …) and must be set here on the reader — setting them on ``writeStream``
    silently does nothing for a file source.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(dir_path)


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


def stream_lag_per_key_reordered(
    events: DataFrame, delay: str = "30 minutes"
) -> DataFrame:
    """Cross-batch-disorder-tolerant keyed lag (DEVNOTES item 4) on the
    ``applyInPandasWithState`` API — closes the documented gap in
    :func:`stream_lag_per_key`, which requires batch-monotonic arrival.

    Semantics: rows buffer in per-key state and are emitted in EVENT-TIME
    order (ts, event_id) once the watermark passes them — a row arriving in a
    later micro-batch than a newer-timestamped sibling still lags correctly
    while the disorder stays within ``delay`` (the watermark contract; rows
    later than that are dropped like in every watermarked op).  An
    event-time timeout set at the oldest still-buffered row flushes the
    remainder as the watermark advances without new data for the key
    (including availableNow's trailing no-data batch).  State per key is
    O(rows within the watermark horizon) — the price of reordering.
    """

    def lag_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        wm = state.getCurrentWatermarkMs()
        if state.exists:
            lag1, lag2, emitted_ts, bts, beid, bval = state.get
            buf = list(zip(bts or [], beid or [], bval or []))
        else:
            lag1, lag2, emitted_ts, buf = 0.0, 0.0, -(2**62), []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_ms = pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
                buf.extend(
                    zip(ts_ms.tolist(), pdf["event_id"].tolist(), pdf["value"].tolist())
                )
        else:
            list(pdfs)  # drain the (empty) iterator of a timed-out call
        ready = sorted((r for r in buf if r[0] <= wm), key=lambda r: (r[0], r[1]))
        keep = [r for r in buf if r[0] > wm]
        out = {"user_id": [], "event_id": [], "value": [],
               "value_lag1": [], "value_lag2": []}
        for ts_ms, eid, v in ready:
            if ts_ms < emitted_ts:
                continue  # beyond-horizon late row: dropped (contract)
            out["user_id"].append(key[0])
            out["event_id"].append(eid)
            out["value"].append(float(v))
            out["value_lag1"].append(lag1)
            out["value_lag2"].append(lag2)
            lag2, lag1 = lag1, float(v)
            emitted_ts = ts_ms
        state.update(
            (lag1, lag2, emitted_ts,
             [r[0] for r in keep], [r[1] for r in keep], [r[2] for r in keep])
        )
        if keep:
            # fire as soon as the watermark can release the OLDEST kept row
            # (must be strictly above the current watermark)
            state.setTimeoutTimestamp(max(wm + 1, min(r[0] for r in keep) + 1))
        if out["event_id"]:
            yield pd.DataFrame(out)

    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            lag_fn,
            outputStructType=_LAG_OUT_SCHEMA,
            stateStructType=(
                "lag1 double, lag2 double, emitted_ts long, "
                "buf_ts array<bigint>, buf_eid array<bigint>, buf_val array<double>"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_lag_per_key_event_time(events: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """Cross-batch-disorder-tolerant keyed lag via the Spark 4
    ``transformWithStateInPandas`` state API (DEVNOTES item 4) — same
    buffer-until-watermark semantics as :func:`stream_lag_per_key_reordered`
    on the newer typed-state API (list state for the buffer, value state for
    the lag chain, explicit event-time timers).

    GATED CAPABILITY: the transformWithState Python runner speaks a
    protobuf-based state protocol; in environments without the
    ``protobuf`` package the query's driver worker cannot start, so this
    raises ``ImportError`` up front with the actionable message instead of a
    mid-query crash.  :func:`stream_lag_per_key_reordered` is the
    dependency-free equivalent.

    Semantics: rows buffer in per-key list state and are emitted in EVENT-TIME
    order (ts, event_id) once the watermark passes them — so a row that
    arrives in a later micro-batch than a newer-timestamped sibling still
    lags correctly, as long as the disorder is within ``delay`` (the
    watermark contract; rows later than that are dropped, exactly like every
    watermarked op).  lag1/lag2 carry in value state across emissions.

    Mechanics: ``handleInputRows`` appends the batch's rows to the buffer and
    flushes the ≤-watermark prefix; an event-time timer at the newest
    buffered timestamp flushes the remainder as the watermark advances
    (including availableNow's final no-data batch).  State per key is
    O(rows within the watermark horizon) — the price of reordering; the
    horizon bounds it.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``).
    """
    try:
        import google.protobuf  # noqa: F401 — the TWS state protocol needs it
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package for "
            "its state-server protocol; install protobuf or use "
            "stream_lag_per_key_reordered (same semantics, no dependency)"
        ) from e
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    out_schema = (
        "user_id long, event_id long, value double, "
        "value_lag1 double, value_lag2 double"
    )

    class _LagProcessor(StatefulProcessor):
        def init(self, handle):
            self._handle = handle
            self._buf = handle.getListState(
                "buffer", "ts_ms long, event_id long, value double"
            )
            self._st = handle.getValueState(
                "lags", "lag1 double, lag2 double, emitted_ts long"
            )

        def _flush(self, key, wm):
            import pandas as pd

            rows = [tuple(r) for r in self._buf.get()]
            if not rows:
                return None
            lag1, lag2, emitted_ts = (
                self._st.get() if self._st.exists() else (0.0, 0.0, -(2**62))
            )
            ready = sorted(
                (r for r in rows if r[0] <= wm), key=lambda r: (r[0], r[1])
            )
            keep = [r for r in rows if r[0] > wm]
            if not ready:
                return None
            out = {"user_id": [], "event_id": [], "value": [],
                   "value_lag1": [], "value_lag2": []}
            uid = key[0]
            for ts_ms, eid, v in ready:
                if ts_ms < emitted_ts:
                    continue  # beyond-horizon late row: dropped (contract)
                out["user_id"].append(uid)
                out["event_id"].append(eid)
                out["value"].append(float(v))
                out["value_lag1"].append(lag1)
                out["value_lag2"].append(lag2)
                lag2, lag1 = lag1, float(v)
                emitted_ts = ts_ms
            self._st.update((lag1, lag2, emitted_ts))
            self._buf.clear()
            if keep:
                self._buf.put(keep)
                # flush the remainder when the watermark reaches it
                self._handle.registerTimer(max(r[0] for r in keep))
            return pd.DataFrame(out) if out["event_id"] else None

        def handleInputRows(self, key, rows, timerValues):
            new = []
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                ts_ms = (
                    pdf["ts"].to_numpy().astype("datetime64[ms]").astype("int64")
                )
                new.extend(
                    zip(ts_ms.tolist(), pdf["event_id"].tolist(),
                        pdf["value"].tolist())
                )
            if new:
                self._buf.appendList(new)
            pdf_out = self._flush(key, timerValues.getCurrentWatermarkInMs())
            if pdf_out is not None:
                yield pdf_out

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            pdf_out = self._flush(key, timerValues.getCurrentWatermarkInMs())
            if pdf_out is not None:
                yield pdf_out

        def close(self):
            pass

    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_LagProcessor(),
            outputStructType=out_schema,
            outputMode="append",
            timeMode="eventTime",
        )
    )


def stream_dedup_exact(
    events: DataFrame, key_cols: list[str] | None = None
) -> DataFrame:
    """Streaming exact dedup ≙ the batch fingerprint groupBy
    (operators/dedup.py:dedup_exact) on an unbounded source: emit each
    distinct key ONCE, at first arrival.

    ``dropDuplicates`` keeps one state row per distinct key FOREVER — exact
    DISTINCT semantics, state O(#distinct keys).  That is the right call for
    a bounded backfill (availableNow) or a corpus whose key cardinality fits
    the state store; for a forever-running ingest use
    :func:`stream_dedup_within_watermark`, which bounds state by the
    event-time horizon at the cost of re-admitting duplicates farther apart
    than the horizon.

    Only the key columns are emitted: WHICH duplicate row arrives first is a
    race between source partitions, so projecting away the non-key columns
    is what makes the op deterministic (same contract as the batch op's
    canonical-row variant ``dedup_rows_keep_min``).
    """
    keys = key_cols or ["user_id", "event_type"]
    return events.select(*keys).dropDuplicates(keys)


def stream_dedup_within_watermark(
    events: DataFrame, key_cols: list[str] | None = None, delay: str = "1 day"
) -> DataFrame:
    """Bounded-state streaming dedup: like :func:`stream_dedup_exact` but a
    key's state row is dropped once the watermark passes its event time, so
    state is O(keys within the horizon) — the forever-running ingest shape.

    Contract change vs exact: two duplicates farther apart in EVENT TIME
    than ``delay`` both emit (the first's state has expired).  Eviction runs
    at the END of each micro-batch with that batch's incoming watermark, so
    an expired key is actually re-admitted only from the NEXT batch on — a
    beyond-horizon duplicate landing in the very batch where its
    predecessor's state expires is still dropped (asserted in
    tests/test_streaming_parity.py).  Emits the key columns plus ``ts``
    (the surviving arrival's event time — required:
    ``dropDuplicatesWithinWatermark`` needs the watermark column present).
    """
    keys = key_cols or ["user_id", "event_type"]
    return (
        events.withWatermark("ts", delay)
        .select("ts", *keys)
        .dropDuplicatesWithinWatermark(keys)
    )


def stream_interval_join(
    events: DataFrame,
    key: str = "user_id",
    left_type: str = "purchase",
    right_type: str = "click",
    lookback: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream INTERVAL join: for every ``left_type``
    event, the ``right_type`` events of the same ``key`` whose event time
    falls in ``[l_ts − lookback, l_ts]`` — the attribution shape ("which
    clicks preceded this purchase") and the remaining §2.11 join family
    (stream-static is :func:`stream_enrich_static`; this is
    stream-STREAM).

    Mechanics: both branches carry their own watermark, and the join
    condition pairs the key equality with an event-time RANGE — exactly
    what Spark needs to bound join state (left rows evict once the right
    watermark passes ``l_ts``, right rows once the left watermark passes
    ``r_ts + lookback``).  Inner join ⇒ every match is emitted in append
    mode; the watermark only bounds STATE, so on a bounded source whose
    files land in one micro-batch the emitted set equals the batch join —
    the oracle contract.  State per key is O(events in the lookback
    horizon), the scale knob a production attribution pipeline actually
    tunes.

    Deliberately INNER-only: an outer variant emits unmatched rows only
    when a LATER trigger advances the watermark past them — probed
    empirically: under ``trigger(availableNow=True)`` Spark stops after the
    data batches without a final watermark-only flush, so unmatched rows
    never surface on a bounded source and "left_outer" would silently
    behave as inner.  On a continuous source the same composition with
    ``how="left_outer"`` is valid.
    """
    left = (
        events.filter(F.col("event_type") == left_type)
        .select(
            F.col(key),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("l_id"),
        )
        .withWatermark("l_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col(key).alias("__rk"),
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("r_id"),
        )
        .withWatermark("r_ts", watermark)
    )
    cond = (
        (F.col(key) == F.col("__rk"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("r_ts") <= F.col("l_ts"))
    )
    return left.join(right, cond, "inner").select(
        key, "l_id", "l_ts", "r_id", "r_ts"
    )


def stream_enrich_static(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static equi-join: enrich an unbounded stream with a bounded
    dimension (inner join).  Spark plans the static side as a broadcast hash
    relation re-resolved per micro-batch — no stream-side state, no
    watermark needed; the canonical "attach user/document metadata on
    ingest" shape of a training-data pipeline."""
    return stream.join(dim, on=on, how="inner")


def stream_sink_parquet(
    sdf: DataFrame, path: str, checkpoint: str, available_now: bool = True
):
    """Exactly-once parquet sink: the file sink's transaction log (_spark_
    metadata) + the source checkpoint give end-to-end exactly-once for file
    →file pipelines — a restart after adding new source files appends ONLY
    the new rows, an interrupted batch is atomically retried.  Returns the
    started StreamingQuery (caller awaits termination).
    """
    w = (
        sdf.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
