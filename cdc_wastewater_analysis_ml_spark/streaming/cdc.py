"""Streaming CDC upsert — correction deltas arriving as a stream, merged
into a keyed snapshot per micro-batch behind ``foreachBatch``.

This is the canonical streaming SINK pattern at scale (Delta Lake's
``MERGE INTO`` inside foreachBatch): the batch primitive is
:func:`~..operators.cdc.merge_upsert`; this module runs it per micro-batch
against the (static within a run) snapshot and emits the CHANGED rows
(insert/update) retry-idempotently into per-batch partitions.

Semantics contract (the same static-store argument as
``streaming/neardup.py``): with a static snapshot and delta keys unique
across the whole stream, micro-batches are independent and the union of
per-batch changed-row sets equals the one-shot batch merge restricted to
delta keys — which is what lets one engine-independent DuckDB oracle gate
the streaming form.  A production pipeline whose store grows between
triggers is order-dependent by nature (last-writer-wins per key) and has
no such oracle; its per-batch mechanics are identical.

Retry-idempotence: each batch overwrites its own ``batch_id=N`` partition
directory — a retried batch replaces itself, never duplicates.

Scale: per-batch cost is one keyed join of |batch| against the snapshot;
at 100 TB the snapshot is bucketed by the key so the (small) delta
co-locates without reshuffling the store.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..operators.cdc import merge_upsert


def read_delta_stream(
    spark: SparkSession, dir_path: str, schema: StructType, **options
) -> DataFrame:
    """File-source CDC delta stream.  ``maxFilesPerTrigger=1`` processes
    one correction drop per micro-batch."""
    reader = spark.readStream.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(dir_path)


def stream_merge_upsert(
    delta_stream: DataFrame,
    snapshot: DataFrame,
    key_cols: Sequence[str],
    sink_dir: str,
    checkpoint_dir: str,
):
    """Start the foreachBatch CDC-merge stream; returns the
    StreamingQuery (caller awaits termination).  Each micro-batch's
    changed rows (action ∈ insert/update) land under
    ``{sink_dir}/batch_id=N/``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        changed = merge_upsert(snapshot, batch_df, key_cols).filter(
            F.col("action") != "keep"
        )
        changed.write.mode("overwrite").parquet(
            f"{sink_dir}/batch_id={batch_id}"
        )

    return (
        delta_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
