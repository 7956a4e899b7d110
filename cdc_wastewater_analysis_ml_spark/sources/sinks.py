"""Sinks.

- ``sink_csv`` ≙ ``df.to_csv(out, index=False)`` (codes.py:177): header, no
  index column.  ``single_file=True`` coalesces to one partition for
  byte-layout parity with the reference; the default keeps one file per
  partition (the only sane layout at scale).
- ``sink_parquet``: the engine-native sink; optional partition columns give
  downstream scans partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def sink_csv(df: DataFrame, path: str, single_file: bool = False, mode: str = "overwrite") -> None:
    out = df.coalesce(1) if single_file else df
    out.write.option("header", True).mode(mode).csv(path)


def sink_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def sink_parquet_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — the co-located-join layout (SURVEY §4.2).

    Writing both sides of a hot join bucketed by the join key lets Spark plan
    a SortMergeJoin with ZERO exchanges (and zero sort when ``sort_cols``
    matches): at 100 TB this turns the nightly fact-fact join from a full
    shuffle into a per-bucket local merge.  Managed-table only (bucketing
    metadata lives in the catalog).
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def sink_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Line-delimited JSON sink (interchange format: one object per line,
    splittable, so a 100 TB export still scans in parallel).

    ``timestampFormat`` is pinned to microseconds: Spark's default JSON
    format truncates to MILLIS, silently losing precision on a round trip
    (caught by tests/test_sinks.py) — columnar sinks don't have this trap.
    """
    df.write.mode(mode).option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).json(path)


def sink_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink — the second columnar substrate (pushdown/pruning like
    parquet; native to Hive-side consumers)."""
    df.write.mode(mode).orc(path)
