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
