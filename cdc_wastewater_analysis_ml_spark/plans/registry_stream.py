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

from ..operators.windows import global_row_number
from ..sources import load_table
from ..streaming import (
    read_events_stream,
    stream_conditional_rate,
    stream_dedup_exact,
    stream_enrich_static,
    stream_interval_join,
    stream_lag_per_key,
    stream_lag_per_key_reordered,
    stream_session_windows,
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
           100.0 * avg(CASE WHEN value > 50 THEN 1 ELSE 0 END)
               AS detection_rate
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_conditional_rate(spark, sf_dir):
    """Streaming agg_conditional_rate (codes.py:143-147): per (day × type)
    detection rate as a windowed streaming aggregation."""
    src = read_events_stream(spark, _silver_events_dir(spark, sf_dir))
    out = _run_to_completion(spark, stream_conditional_rate(src), "complete")
    return out.select("day_start", "event_type", "total", "detection_rate")


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


#: Watermark delay for the cross-batch-disorder query.  Must exceed 2× the
#: swapped-block time extent (≈1 day at every SF: 2·(n/60) rows over a 30-day
#: span) so no row is ever beyond-horizon → the emitted set is exactly the
#: deterministic watermark prefix the oracle computes.
_REORDER_DELAY_MS = 3 * 24 * 3600 * 1000


def _disordered_events_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize events as THREE parquet files with deterministic
    cross-file disorder: rows sorted by (ts, event_id), blocks of n//60 rows
    SWAPPED across each file boundary (so a row's newer-timestamped siblings
    arrive one micro-batch earlier), plus a seeded in-file shuffle.  File
    mtimes are forced increasing — the file source processes oldest-first.

    Spark-side end-to-end (VERDICT r12 task 4 — the old builder pulled the
    whole table through ``toPandas``): the global (ts, event_id) position
    comes from the distributed two-phase partition-offset ranker, the file
    assignment is an expression over it, the in-file shuffle is a
    deterministic ``xxhash64(file, event_id)`` sort, and each file is
    written by an executor task.  The only driver collect is the row COUNT
    (file-boundary arithmetic); the post-write rename + mtime stamps touch
    file metadata, never row data.
    """
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{tempfile.gettempdir()}/spark_graft_reorder_{tag}"
    if path in _SILVERED:
        return path
    import os
    import shutil

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    n = ev.count()  # bounded scalar: boundary arithmetic only
    b = max(1, n // 60)
    n1, n2 = n // 3, 2 * n // 3
    ranked = global_row_number(ev, ["ts", "event_id"], out="__i").withColumn(
        "__i", F.col("__i") - F.lit(1)
    )
    i = F.col("__i")
    assigned = ranked.withColumn(
        "__f",
        F.when(((i >= 0) & (i < n1 - b)) | ((i >= n1) & (i < n1 + b)), F.lit(0))
        .when(
            ((i >= n1 - b) & (i < n1))
            | ((i >= n1 + b) & (i < n2 - b))
            | ((i >= n2) & (i < n2 + b)),
            F.lit(1),
        )
        .otherwise(F.lit(2)),
    ).persist()
    try:
        os.makedirs(path, exist_ok=True)
        for k in range(3):
            tmp = f"{path}/_tmp{k}"
            (
                assigned.filter(F.col("__f") == k)
                .withColumn("__shuf", F.xxhash64(F.lit(k), F.col("event_id")))
                .coalesce(1)
                .sortWithinPartitions("__shuf")
                .drop("__i", "__f", "__shuf")
                .write.mode("overwrite")
                .parquet(tmp)
            )
            (part_file,) = [
                f for f in os.listdir(tmp) if f.endswith(".parquet")
            ]
            f = f"{path}/f{k}.parquet"
            os.replace(f"{tmp}/{part_file}", f)
            shutil.rmtree(tmp)
            os.utime(f, (1_700_000_000 + 1000 * k,) * 2)
    finally:
        assigned.unpersist()
    _SILVERED.add(path)
    return path


@register(
    "stream_lag_reordered",
    f"""
    SELECT user_id, event_id, round(value, 6) AS value,
           round(value_lag1, 6) AS value_lag1,
           round(value_lag2, 6) AS value_lag2
    FROM (
        SELECT user_id, event_id, value,
               lag(value, 1, 0.0) OVER w AS value_lag1,
               lag(value, 2, 0.0) OVER w AS value_lag2,
               epoch_ms(ts) AS __ms
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE __ms <= (SELECT max(epoch_ms(ts)) - {_REORDER_DELAY_MS} FROM events)
    """,
)
def q_stream_lag_reordered(spark, sf_dir):
    """Cross-batch-disorder keyed lag (streaming/ops.py
    stream_lag_per_key_reordered; DEVNOTES item 4): a 3-file source with
    blocks swapped across file boundaries, ``maxFilesPerTrigger=1`` so each
    file IS a micro-batch.  Rows buffer in per-key state and emit in
    event-time order once the watermark passes them, so the emitted set is
    exactly the rows with epoch_ms(ts) ≤ final watermark (max ms − delay —
    both engines truncate µs→ms) and every lag equals the batch window_lag
    (codes.py:55-59).  The plain stream_lag_per_key documents this arrival
    pattern as unhandled; this query is the closure, under the hard gate."""
    src = read_events_stream(
        spark, _disordered_events_dir(spark, sf_dir), maxFilesPerTrigger=1
    )
    out = _run_to_completion(
        spark, stream_lag_per_key_reordered(src, "3 days"), "append"
    )
    return out.select(
        "user_id",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round("value_lag1", 6).alias("value_lag1"),
        F.round("value_lag2", 6).alias("value_lag2"),
    )


@register(
    "stream_session_windows",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM g),
      sess AS (SELECT user_id, min(ts) AS session_start,
                      max(ts) + INTERVAL 30 MINUTE AS session_end,
                      count(*) AS n_events
               FROM s GROUP BY user_id, sess_id)
    SELECT user_id, session_start, session_end, n_events
    FROM sess
    WHERE epoch_us(session_end)
          <= (SELECT (max(epoch_ms(ts)) - 3600 * 1000) * 1000 FROM events)
    """,
)
def q_stream_session_windows(spark, sf_dir):
    """Streaming sessionization (streaming/ops.py stream_session_windows ≙
    agg_session_windows, SURVEY §2.11) under the HARD gate: append mode
    emits a session exactly when the final watermark (ms-truncated max event
    time − 1 h — Spark keeps event-time stats in ms) passes its end, so the
    emitted set is the deterministic gaps-and-islands result filtered to
    epoch_us(session_end) ≤ watermark·1000.  Sessions still open at end of
    input are withheld — which is the point: the oracle pins the watermark
    semantics, not just batch parity (the pytest prefix test only bounds the
    withheld tail).  Boundary note: a session ending INSIDE the watermark's
    truncated millisecond could differ between ≤ and < — no fixture session
    does (probed at sf0.001/sf0.01), and the fixture is static."""
    src = read_events_stream(spark, _silver_events_dir(spark, sf_dir))
    out = _run_to_completion(
        spark, stream_session_windows(src, "30 minutes", "1 hour"), "append"
    )
    return out.select("user_id", "session_start", "session_end", "n_events")


@register(
    "stream_dedup_exact",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup_exact(spark, sf_dir):
    """Streaming exact dedup (streaming/ops.py stream_dedup_exact ≙ batch
    dedup_exact, SURVEY §7 dedup family): first-arrival-wins DISTINCT over
    an unbounded source, state one row per key.  Emitting only the key
    columns makes the result deterministic (which duplicate arrives first is
    a source-partition race) — so the oracle is plain SELECT DISTINCT."""
    src = read_events_stream(spark, _silver_events_dir(spark, sf_dir))
    out = _run_to_completion(
        spark, stream_dedup_exact(src, ["user_id", "event_type"]), "append"
    )
    return out.select("user_id", "event_type")


@register(
    "stream_enrich_static",
    """
    SELECT e.event_id, e.user_id, c.c_mktsegment AS mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_stream_enrich_static(spark, sf_dir):
    """Stream-static dimension enrichment (streaming/ops.py
    stream_enrich_static): the customer dim joins the event stream as a
    broadcast hash relation re-resolved per micro-batch — stateless,
    watermark-free, the canonical attach-metadata-on-ingest shape."""
    src = read_events_stream(spark, _silver_events_dir(spark, sf_dir))
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    out = _run_to_completion(
        spark,
        stream_enrich_static(src, dim, "user_id").select(
            "event_id", "user_id", "mktsegment"
        ),
        "append",
    )
    return out.select("event_id", "user_id", "mktsegment")


@register(
    "stream_interval_join",
    """
    SELECT p.user_id, p.event_id AS l_id, p.ts AS l_ts,
           c.event_id AS r_id, c.ts AS r_ts
    FROM events p JOIN events c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 6 HOUR AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def q_stream_interval_join(spark, sf_dir):
    """Watermarked stream-stream interval join (streaming/ops.py
    stream_interval_join): clicks within 6 h before each same-user purchase.
    INNER join ⇒ append mode emits every match (the watermark bounds join
    STATE, not the inner-join result), and the silver dir's ≤32 part files
    land in one availableNow micro-batch (file-source default
    maxFilesPerTrigger=1000), so no row is ever evicted before its match
    arrives — the emitted set is exactly the batch interval join, which is
    the oracle."""
    src = read_events_stream(spark, _silver_events_dir(spark, sf_dir))
    out = _run_to_completion(
        spark,
        stream_interval_join(
            src, "user_id", "purchase", "click", "6 hours", "1 hour"
        ),
        "append",
    )
    return out.select("user_id", "l_id", "l_ts", "r_id", "r_ts")


def _stream_sample_sql() -> str:
    from ..operators.sampling import fraction_to_hex_threshold

    thr = fraction_to_hex_threshold(0.2)
    return f"""
    SELECT event_type, count(*) AS n,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_value_cents
    FROM events
    WHERE substr(md5(concat('42:', CAST(event_id AS VARCHAR))), 1, 8) < '{thr}'
    GROUP BY event_type
    """


@register("stream_sample_fraction", _stream_sample_sql())
def q_stream_sample_fraction(spark, sf_dir):
    """Deterministic 20% sample on an unbounded source: the IDENTICAL
    operator function as the batch `sample_hash_fraction` query applied to a
    streaming DataFrame — hash-threshold sampling is a stateless
    deterministic filter, so it streams with zero state and zero semantic
    drift (df.sample()/rand() cannot make that claim: their row choice
    depends on partition iteration order, which differs per micro-batch)."""
    from ..operators.sampling import sample_fraction_hash

    src = read_events_stream(spark, _silver_events_dir(spark, sf_dir))
    sampled = sample_fraction_hash(src, "event_id", 0.2, seed=42)
    agg = sampled.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("sum_value_cents"),
    )
    out = _run_to_completion(spark, agg, "complete")
    return out.select("event_type", "n", "sum_value_cents")
