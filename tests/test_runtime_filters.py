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


@pytest.fixture()
def _skew_confs(spark):
    """Shrink the skew thresholds so a local fixture qualifies (production
    defaults are 256 MB partitions); forbid broadcast so the join actually
    shuffles.  Restored afterwards."""
    keys = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark, _skew_confs):
    """One hot key owning ~90% of the fact side: AQE must re-plan the sort
    merge join with the skewed partition SPLIT (skew=true in the final
    adaptive plan) instead of letting one task carry the hot key — the
    engine-level backstop behind the explicit join_salted operator.

    Two traps this fixture had to dodge, both worth remembering:
    - the aggregate is GLOBAL, not a groupBy on the join key —
      OptimizeSkewedJoin bails out when a downstream operator would reuse
      the join's hash partitioning (splitting would force a new shuffle);
    - the high-entropy payload must SURVIVE the shuffle (min(pay) keeps it
      alive past column pruning): skew detection reads COMPRESSED map
      output sizes, and a hot partition of 500k identical 8-byte keys
      compresses below any threshold — the same compressed-stats
      deception behind the engine's 4 MB broadcast caps.
    """
    hot = spark.range(500_000).select(
        F.lit(0).alias("k"), F.md5(F.col("id").cast("string")).alias("pay")
    )
    tail = spark.range(50_000).select(
        (F.col("id") % 100 + 1).alias("k"),
        F.md5((F.col("id") + 7).cast("string")).alias("pay"),
    )
    fact = hot.unionAll(tail)
    dim = spark.range(101).select(F.col("id").alias("k"), F.col("id").alias("attr"))
    joined = fact.join(dim, "k").agg(
        F.min("pay").alias("m"), F.count(F.lit(1)).alias("n")
    )
    joined.collect()  # AQE finalizes the plan only on execution
    final = joined._jdf.queryExecution().executedPlan().toString().lower()
    assert "isfinalplan=true" in final
    assert "skew=true" in final, (
        "AQE did not split the skewed partition — check "
        "spark.sql.adaptive.skewJoin.* confs"
    )
    assert joined.collect()[0].n == 550_000
