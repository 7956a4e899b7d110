"""Aggregation operators (SURVEY §2.4) with pinned semantics.

All are single-pass grouped aggregations: Spark plans them as partial
(map-side) + final hash aggregates, so the shuffle carries one row per group,
not per input row — the property that makes these viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def agg_median_global(df: DataFrame, col: str, out: str = "median") -> DataFrame:
    """Exact whole-column median, nulls skipped.

    ≙ ``df[c].median()`` (codes.py:35,39,85).  Uses ``F.median`` (exact,
    interpolates the middle pair for even n — matches pandas), NOT
    ``approx_percentile``.
    """
    return df.select(F.median(F.col(col)).alias(out))


def median_scalar(df: DataFrame, col: str) -> float:
    """Driver-side scalar median, feeding a fill literal (codes.py:35-36).

    Mirrors the reference's two-query structure: aggregate → scalar → next
    plan.  One tiny collect; the aggregate itself is distributed.
    """
    return df.select(F.median(F.col(col))).first()[0]


def agg_mode_global(df: DataFrame, col: str, out: str = "mode") -> DataFrame:
    """Whole-column mode with deterministic smallest-value tie-break.

    ≙ ``df[c].mode()[0]`` (codes.py:83,84,87) — pandas sorts modes ascending
    and takes the first.  Spark's builtin ``F.mode`` is nondeterministic on
    ties, so the engine uses the explicit count-then-rank form.
    """
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .count()
        .orderBy(F.desc("count"), F.asc(col))
        .limit(1)
        .select(F.col(col).alias(out))
    )


def mode_scalar(df: DataFrame, col: str):
    """Driver-side scalar mode (fill literal, codes.py:82-87)."""
    row = agg_mode_global(df, col).first()
    return None if row is None else row[0]


def agg_mean_by_key(
    df: DataFrame, key: str, col: str, out: str = "mean"
) -> DataFrame:
    """Per-group mean ≙ ``groupby(k)[c].mean()`` (codes.py:67).

    This IS the target-encoding fit: the output relation is the key→mean map
    that :func:`..operators.relational.join_broadcast_map` broadcasts back.
    """
    return df.groupBy(key).agg(F.avg(F.col(col)).alias(out))


def agg_count_by_key(df: DataFrame, key: str, out: str = "count") -> DataFrame:
    """Per-group row count ≙ ``groupby(k).size()`` (codes.py:143-144)."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias(out))


def agg_value_counts(df: DataFrame, col: str, out: str = "count") -> DataFrame:
    """Frequency table, descending, deterministic tie-break.

    ≙ ``df[col].value_counts()`` (codes.py:168); nulls excluded like pandas.
    """
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias(out))
        .orderBy(F.desc(out), F.asc(col))
    )


def agg_conditional_rate(
    df: DataFrame,
    key: str,
    flag_col: str,
    rate_out: str = "detection_rate",
    total_out: str = "total",
) -> DataFrame:
    """Per-group rate: 100 × count(flag=1) / count(*) — single pass.

    ≙ the two-agg + left-join + fillna(0) composite at codes.py:143-147, but
    fused into ONE grouped aggregation (one shuffle instead of two plus a
    join).  Groups with no flagged rows naturally yield 0 — identical to the
    reference's ``fillna(0)`` — because every group member contributes a 0/1.
    """
    flagged = F.when(F.col(flag_col) == 1, F.lit(1)).otherwise(F.lit(0))
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias(total_out),
        (F.lit(100.0) * F.avg(flagged)).alias(rate_out),
    )


def agg_conditional_rate_joined(
    df: DataFrame,
    key: str,
    flag_col: str,
    rate_out: str = "detection_rate",
) -> DataFrame:
    """Literal reference plan: two grouped counts → left join → coalesce → rate
    (codes.py:143-147).  Kept for plan-parity demonstration; the fused
    :func:`agg_conditional_rate` is the production form.
    """
    total = df.groupBy(key).agg(F.count(F.lit(1)).alias("total_rows"))
    detected = (
        df.filter(F.col(flag_col) == 1)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("detected_rows"))
    )
    return (
        total.join(detected, on=key, how="left")
        .withColumn("detected_rows", F.coalesce(F.col("detected_rows"), F.lit(0)))
        .withColumn(
            rate_out, F.lit(100.0) * F.col("detected_rows") / F.col("total_rows")
        )
    )


def agg_mean_resampled(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    width: str = "1 week",
    start_shift: str = "4 days",
    out: str = "avg_value",
    label: str = "week_start",
) -> DataFrame:
    """Calendar-bucketed mean over event time.

    ≙ ``set_index(date)[c].resample('W').mean()`` (codes.py:119).  Spark's
    tumbling ``F.window`` aligns buckets to the Unix epoch (a Thursday);
    ``start_shift='4 days'`` moves the boundary to Monday 00:00 so buckets are
    ISO weeks.  pandas ``'W'`` labels the *right* edge (Sunday); the engine
    emits the Monday ``week_start`` as the canonical label (DuckDB
    ``date_trunc('week', ts)`` equivalent) — callers wanting pandas' label add
    6 days.  Buckets with no rows are absent, matching resample+mean-of-empty
    being dropped by the plots.
    """
    w = F.window(F.col(ts_col), width, width, start_shift)
    return (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(w.alias("w"))
        .agg(F.avg(F.col(value_col)).alias(out))
        .select(F.col("w.start").alias(label), F.col(out))
    )


def agg_quantiles_by_key(
    df: DataFrame, key: str, col: str, probs: tuple[float, ...] = (0.25, 0.5, 0.75)
) -> DataFrame:
    """Per-group exact quantiles — generalization of the violin-plot relation
    (codes.py:129-133, SURVEY §2.13)."""
    aggs = [
        F.percentile(F.col(col), F.lit(p)).alias(f"p{int(p * 100)}") for p in probs
    ]
    return df.groupBy(key).agg(*aggs)


def _level_aggs(value_col: str):
    return [
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col(value_col)), 6).alias("sum_value"),
    ]


def agg_rollup(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Hierarchical subtotals over ``keys`` (SURVEY §2.4 free generalization
    of the monthly/weekly EDA aggregates — grand total, per-k1, per-(k1,k2)).

    One shuffle; Spark expands grouping sets map-side, so the pass over the
    fact table is still single.  ``gid`` is Spark's ``grouping_id()`` (bit per
    key, most-significant = first key), which disambiguates subtotal rows from
    natural-null groups.
    """
    return (
        df.rollup(*keys)
        .agg(F.grouping_id().cast("int").alias("gid"), *_level_aggs(value_col))
        .select(*keys, "gid", "n", "sum_value")
    )


def agg_cube(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """All 2^k grouping combinations (SURVEY §2.4 free generalization)."""
    return (
        df.cube(*keys)
        .agg(F.grouping_id().cast("int").alias("gid"), *_level_aggs(value_col))
        .select(*keys, "gid", "n", "sum_value")
    )


def agg_distinct_count_by_key(
    df: DataFrame, key: str, col: str, out: str = "distinct_n"
) -> DataFrame:
    """Exact per-group distinct count (SURVEY §2.4). Two-phase under the hood
    (expand-distinct then count) — exact but shuffle-heavy at scale; prefer
    :func:`agg_approx_distinct_by_key` for 100 TB cardinality estimation."""
    return df.groupBy(key).agg(F.countDistinct(F.col(col)).alias(out))


def agg_approx_distinct_by_key(
    df: DataFrame, key: str, col: str, rsd: float = 0.05, out: str = "approx_n"
) -> DataFrame:
    """HyperLogLog++ distinct estimate — single-pass, mergeable sketch, the
    scale path for cardinality (SURVEY §2.4). No SQL oracle (sketch values
    are implementation-defined); gated by a tolerance test against the exact
    count."""
    return df.groupBy(key).agg(
        F.approx_count_distinct(F.col(col), rsd=rsd).alias(out)
    )


def agg_approx_quantiles_by_key(
    df: DataFrame,
    key: str,
    col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
) -> DataFrame:
    """Sketch-based per-group quantiles — the 100 TB path beside the exact
    :func:`agg_quantiles_by_key`: single pass, mergeable partials, bounded
    error 1/accuracy.  No SQL oracle (sketch is partition-order dependent);
    gated by a tolerance test against the exact percentiles."""
    aggs = [
        F.approx_percentile(F.col(col), F.lit(p), F.lit(accuracy)).alias(
            f"p{int(p * 100)}"
        )
        for p in probs
    ]
    return df.groupBy(key).agg(*aggs)


def agg_session_windows(
    df: DataFrame, key: str, ts_col: str, gap: str = "30 minutes"
) -> DataFrame:
    """Per-key session windows: events closer than ``gap`` merge; a session
    ends ``gap`` after its last event (Spark ``session_window`` semantics —
    a new session starts when the inter-event gap is ≥ ``gap``).

    Single shuffle on the key; state is one open window per key — the same
    shape Structured Streaming keeps, so the batch and streaming variants
    share semantics exactly (SURVEY §2.11 generalization; sessionization is
    the canonical event-analytics op the reference's monthly buckets
    approximate).
    """
    return (
        df.groupBy(F.col(key), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def topk_approx_freqitems(
    df: DataFrame, col: str, support: float = 0.01
) -> DataFrame:
    """Approximate heavy hitters via Spark's ``freqItems`` (Karp-Papadimitriou-
    Shenker single-pass counters) — the sketch companion to the exact
    :func:`..operators.relational.topk_categories`: one pass, no shuffle of
    per-key counts, mergeable partials; may contain false positives (verify
    with an exact count over the candidate set when precision matters)."""
    items = df.stat.freqItems([col], support)
    return items.select(F.explode(F.col(f"{col}_freqItems")).alias(col))


def agg_mode_by_key(
    df: DataFrame, key: str, col: str, out: str = "mode"
) -> DataFrame:
    """Per-group mode with the same deterministic tie-break as
    :func:`agg_mode_global` (highest count, then smallest value): two grouped
    aggregations — (key, value) counts, then ``min_by`` on (−count, value).
    Both phases map-side combine; no window, no sort."""
    counts = df.groupBy(key, col).agg(F.count(F.lit(1)).alias("__n"))
    pick = F.min_by(F.col(col), F.struct((-F.col("__n")).alias("neg"), F.col(col)))
    return counts.groupBy(key).agg(pick.alias(out))
