"""Deterministic training-shard layout: seeded shuffle, shard assignment,
and sorted-shard parquet writing.

The last step of a training-data pipeline is not a query — it is a LAYOUT:
the curated corpus must land on disk as N shards whose membership and
internal order are (a) pseudo-random with respect to every upstream
grouping (source, time, duplication cluster), and (b) exactly reproducible
across runs and engines, so a resumed/re-run job reproduces byte-identical
shards.  (The reference stops at a cleaned DataFrame — codes.py:96 — this
is the generalization its output would feed at 100 TB.)

Determinism comes from the house md5 draw (`operators/sampling.py` uses the
same construction): ``md5(seed || ':' || key)`` is a uniform 128-bit draw
that both Spark and DuckDB compute bit-identically — no RNG, no
partition-order dependence.

Scale shape:

- shard id = first-8-hex-chars of the draw, mod ``n_shards`` — a pure
  map-side expression, pipelined into the scan.
- position-in-shard NEVER uses ``row_number() OVER (PARTITION BY shard)``
  directly when shards are few and huge (each shard's window would be one
  task); it reuses the two-phase partition-offset prefix sum
  (:mod:`~.prefix`) over the total order ``(shard, draw, key)`` and
  subtracts broadcast per-shard start offsets — every window in the plan is
  keyed by the range-partition id or runs over ≤ #partitions rows.
- the writer sorts within partitions and writes ``partitionBy(shard)`` so
  each shard is one sorted parquet directory; readers stream it in order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .caching import scoped_persist
from .prefix import global_prefix_sum


def shard_draw(key: Column | str, seed: int = 0) -> Column:
    """The uniform draw: first 8 hex chars of md5(seed:key) (the same
    construction as ``sampling.hash_draw`` — engine-portable)."""
    key = F.col(key) if isinstance(key, str) else key
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8
    )


def assign_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos_in_shard",
) -> DataFrame:
    """Add ``shard`` (0..n_shards-1) and ``pos_in_shard`` (0-based, dense,
    ordered by the draw) — a deterministic global shuffle of ``df`` into
    ``n_shards`` pseudo-random shards.

    ``(shard, draw, key)`` is a total order (the key tiebreak makes draw
    collisions harmless), so ``pos_in_shard`` is exact and reproducible.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    base = df.withColumn("__draw", shard_draw(key_col, seed)).withColumn(
        shard_col,
        (F.conv(F.col("__draw"), 16, 10).cast("long") % n_shards).cast("int"),
    )
    laid = global_prefix_sum(
        base.withColumn("__one", F.lit(1)),
        [shard_col, "__draw", key_col],
        "__one",
        out="__gpos",
        exclusive=True,
    ).persist()
    # Per-shard start offset = min global position in the shard: ≤ n_shards
    # rows, broadcast back.  `laid` is persisted (scope-released with the
    # result) so the prefix chain runs once for both consumers.
    starts = laid.groupBy(shard_col).agg(F.min("__gpos").alias("__start"))
    out = (
        laid.join(F.broadcast(starts), shard_col)
        .withColumn(pos_col, (F.col("__gpos") - F.col("__start")).cast("long"))
        .drop("__draw", "__one", "__gpos", "__start")
    )
    return scoped_persist(out, laid)


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    max_records_per_file: int | None = None,
) -> None:
    """Materialize ``df`` as ``n_shards`` sorted parquet shard directories:
    ``path/shard=K/``, rows ordered by ``pos_in_shard`` within each file.

    One range shuffle (inside the prefix sum) + a repartition on the shard
    column so each shard directory is written by one task family; with
    ``max_records_per_file`` Spark splits oversized shards into sorted
    chunk files (order is preserved — the sort happens after the exchange).
    """
    sharded = assign_shards(df, key_col, n_shards, seed=seed)
    writer = (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos_in_shard")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(max_records_per_file))
    writer.parquet(path)
