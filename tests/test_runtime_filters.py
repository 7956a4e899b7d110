"""Runtime bloom-filter join injection (SPARK-32268): the semi-join
reduction Spark applies on its own once a selective dimension filter exists
on the creation side of a shuffle join.

Why this is tested at all: the engine's house rule broadcasts known-small
dims explicitly, but at 100 TB a *mid-size* filtered dim (too big to
broadcast, very selective after its predicate) joins fact tables as a
shuffle join — and the runtime bloom filter is what keeps the fact side
from shuffling rows that cannot match.  This test pins that the mechanism
actually fires under the engine's session defaults (AQE on, conservative
broadcast caps), so a conf added later can't silently disable it.

The production thresholds (creation side ≤ 10 MB plan size, application
side ≥ 10 GB scan) are sized for clusters; the test lowers only the
application-side threshold to make a local fixture eligible — the rewrite
itself is unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def _bloom_confs(spark):
    """Lower the application-side eligibility threshold and forbid broadcast
    (a broadcast join needs no bloom filter — the small side IS the filter);
    restore everything afterwards so the shared session stays pristine."""
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_runtime_bloom_filter_injected_on_shuffle_join(
    spark, tmp_path, _bloom_confs
):
    """fact ⋈ (dim WHERE selective): the optimized plan must carry a
    might_contain(bloom_filter_agg(...)) guard on the fact side, i.e. fact
    rows are pre-filtered by the dim's surviving keys BEFORE the join
    shuffle."""
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    spark.range(50_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("payload")
    ).write.parquet(fact_path)
    spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("grp")
    ).write.parquet(dim_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.read.parquet(dim_path).filter(F.col("grp") == 7)  # 2% of keys
    joined = fact.join(dim, "k")

    optimized = (
        joined._jdf.queryExecution().optimizedPlan().toString().lower()
    )
    assert "might_contain" in optimized, (
        "runtime bloom filter was not injected — check "
        "spark.sql.optimizer.runtime.bloomFilter.* confs"
    )
    # and it still computes the right thing (20 dim keys × 50 fact rows each)
    assert joined.count() == 1000


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Hive-partitioned fact ⋈ (dim WHERE selective): the fact scan's
    PartitionFilters must carry a dynamicpruning subquery — partitions whose
    keys the filtered dim cannot match are never listed or read.  This is
    the partition-level complement of the bloom filter's row-level
    reduction, and the reason the shard/IVF layouts write hive-partitioned
    directories."""
    fact_path = str(tmp_path / "pfact")
    spark.range(20_000).select(
        (F.col("id") % 20).alias("pt"), F.col("id").alias("payload")
    ).write.partitionBy("pt").parquet(fact_path)

    fact = spark.read.parquet(fact_path)
    dim = spark.range(20).select(
        F.col("id").alias("pt"), (F.col("id") % 10).alias("grp")
    ).filter(F.col("grp") == 3)  # keeps pt ∈ {3, 13}
    joined = fact.join(dim, "pt")

    physical = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in physical, (
        "dynamic partition pruning was not planned — check "
        "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    )
    assert joined.count() == 2000
