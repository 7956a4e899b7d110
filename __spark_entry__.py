"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``cdc_wastewater_analysis_ml_spark``; this module
just re-exports the registry (``plans/registry.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_wastewater_analysis_ml_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: weekly detection-rate trend
    (scan → binary label → event-time weekly bucket → fused rate agg → sort).
    """
    return registry.QUERIES["flagship_weekly_detection_rate"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; ops without a SQL equivalent are
    omitted (driver records a rows-only check for those)."""
    return {k: v for k, v in registry.ORACLES.items() if v is not None}
