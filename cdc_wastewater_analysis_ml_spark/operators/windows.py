"""Window / time-series operators (SURVEY §2.5) — the reference's signature
capability, re-expressed as Spark Window functions.

Scale note: a window ``partitionBy(key)`` shuffles once on the key and then
computes per-partition with no further exchange.  Low-cardinality keys (the
reference's ~50 jurisdictions) under-parallelize — AQE cannot split a window
partition — so callers with few groups should pre-aggregate or accept the
ceiling; the engine documents rather than hides this.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _ordered_window(part_keys: Sequence[str], order_keys: Sequence[str]):
    order = [F.asc_nulls_last(c) for c in order_keys]
    return Window.partitionBy(*part_keys).orderBy(*order)


def window_lag(
    df: DataFrame,
    part_keys: Sequence[str],
    order_keys: Sequence[str],
    col: str,
    offsets: Sequence[int] = (1, 2),
    default: float = 0.0,
    out_prefix: str | None = None,
) -> DataFrame:
    """Per-key lagged values with fill for the leading rows.

    ≙ ``df.sort_values([key, ts]); groupby(key)[c].shift(n).fillna(0)``
    (codes.py:55-59).  The reference's tie order on equal timestamps is
    nondeterministic (quicksort); the engine requires the caller to include a
    deterministic tiebreak column in ``order_keys`` (SURVEY §7 hard-part 1).
    """
    w = _ordered_window(part_keys, order_keys)
    prefix = out_prefix or f"{col}_lag"
    out = df
    for n in offsets:
        out = out.withColumn(f"{prefix}{n}", F.lag(F.col(col), n, default).over(w))
    return out


def window_lead(
    df: DataFrame,
    part_keys: Sequence[str],
    order_keys: Sequence[str],
    col: str,
    n: int = 1,
    out: str | None = None,
) -> DataFrame:
    """Forward counterpart of lag (engine extension, same primitive)."""
    w = _ordered_window(part_keys, order_keys)
    return df.withColumn(out or f"{col}_lead{n}", F.lead(F.col(col), n).over(w))


def window_row_number(
    df: DataFrame,
    part_keys: Sequence[str],
    order_keys: Sequence[str],
    out: str = "rn",
) -> DataFrame:
    """Deterministic per-key row numbering (engine extension)."""
    return df.withColumn(out, F.row_number().over(_ordered_window(part_keys, order_keys)))


def window_running_sum(
    df: DataFrame,
    part_keys: Sequence[str],
    order_keys: Sequence[str],
    col: str,
    out: str = "running_sum",
) -> DataFrame:
    """Cumulative sum within key over event order (engine extension; also the
    building block of the ROC/PR metric queries, SURVEY §2.10)."""
    w = _ordered_window(part_keys, order_keys).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out, F.sum(F.col(col)).over(w))


def window_rolling_mean(
    df: DataFrame,
    part_keys: Sequence[str],
    order_keys: Sequence[str],
    col: str,
    n: int,
    out: str | None = None,
) -> DataFrame:
    """Trailing n-row mean within key (engine extension — the time-series
    smoothing counterpart of the reference's weekly resample)."""
    w = _ordered_window(part_keys, order_keys).rowsBetween(-(n - 1), Window.currentRow)
    return df.withColumn(out or f"{col}_rollmean{n}", F.avg(F.col(col)).over(w))


def window_trailing_mean_time(
    df: DataFrame,
    part_keys: Sequence[str],
    ts_col: str,
    col: str,
    trailing_seconds: int = 7 * 86400,
    out: str = "trailing_mean",
) -> DataFrame:
    """Time-based trailing mean: avg of ``col`` over rows of the same key
    whose event time falls in ``[ts - trailing_seconds + 1s, ts]`` (epoch-
    second granularity) — the irregular-series counterpart of
    :func:`window_rolling_mean` (row frames break when sampling is uneven;
    SURVEY §2.5 generalization).

    ``rangeBetween`` over the timestamp's epoch seconds: one shuffle on the
    key, sorted range frame per partition — same cost shape as any keyed
    window, independent of how many rows fall inside the time span.
    """
    w = (
        Window.partitionBy(*part_keys)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-(trailing_seconds - 1), Window.currentRow)
    )
    return df.withColumn(out, F.avg(F.col(col)).over(w))


def global_row_number(
    df: DataFrame,
    order_keys: Sequence[str],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global row number over a total order — the scale-safe
    replacement for ``row_number().over(Window.orderBy(...))``, whose empty
    ``partitionBy`` funnels the entire relation through ONE task.

    Two-phase partition-offset ranking (the ``binary_curve`` pattern):
    range-repartition on the order keys and freeze the assignment (lazy
    ``localCheckpoint`` — the rank pass and the count pass must see the same
    boundaries), rank within each partition, then add broadcast prefix
    offsets computed from per-partition counts (a window over ≤ #partitions
    rows, never over data).  Exact wherever the sampled range boundaries
    land, provided ``order_keys`` is a total order (include a unique
    tiebreak column).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    order = [F.asc(k) for k in order_keys]
    part = (
        df.repartitionByRange(num_partitions, *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = Window.partitionBy("__pid").orderBy(*order)
    ranked = part.withColumn("__rn_in", F.row_number().over(w_in))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = (
        part.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
        )
    )
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .withColumn(out, F.col("__rn_in") + F.col("__off"))
        .drop("__pid", "__rn_in", "__off")
    )
