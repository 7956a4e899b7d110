"""Distributed global prefix sums over a total order.

The scale-safe replacement for ``sum(x).over(Window.orderBy(...))`` with an
empty ``partitionBy`` — which funnels the ENTIRE relation through one task
(the same failure mode :func:`~.windows.global_row_number` exists to avoid,
and the one Spark anti-pattern that silently works at sf0.1 and dies at
100 TB).

Two-phase partition-offset scheme (the ``binary_curve`` /
``global_row_number`` pattern):

1. range-repartition on the order keys and FREEZE the partition assignment
   (lazy ``localCheckpoint`` — the in-partition pass and the offset pass
   must see identical boundaries);
2. running sum within each partition (a window over one partition's rows,
   executed partition-locally);
3. add broadcast per-partition prefix offsets computed from the per
   -partition totals — a window over ≤ #partitions rows, never over data.

Exact wherever the sampled range boundaries land, provided ``order_keys``
is a total order (include a unique tiebreak column).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(
    df: DataFrame,
    order_keys: Sequence[str],
    value_col: str,
    out: str = "prefix_sum",
    exclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out`` = the global running sum of ``value_col`` over the total
    order given by ``order_keys``.

    ``exclusive=True`` (default) yields the sum of all STRICTLY-preceding
    rows (0 for the first row) — the "start offset" form consumed by
    token-stream packing; ``exclusive=False`` includes the current row.
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
    bound = (
        w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
        if exclusive
        else w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    summed = part.withColumn(
        "__sum_in", F.coalesce(F.sum(value_col).over(bound), F.lit(0))
    )
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = (
        part.groupBy("__pid")
        .agg(F.sum(value_col).alias("__tot"))
        .select(
            "__pid",
            F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
        )
    )
    return (
        summed.join(F.broadcast(offsets), "__pid")
        .withColumn(out, F.col("__sum_in") + F.col("__off"))
        .drop("__pid", "__sum_in", "__off")
    )
