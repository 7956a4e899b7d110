"""Streaming incremental near-dup dedup — the daily-ingest corpus pipeline
as an end-to-end stream (VERDICT r5 task 7).

The batch delta shape exists in ``operators/dedup.py``
(:func:`~..operators.dedup.dedup_incremental_near`: banded-LSH candidates
of the delta AGAINST the store, exact-Jaccard verify, anti-join).  This
module runs exactly that per micro-batch behind ``foreachBatch``: documents
stream in, each micro-batch is near-dup-checked against the (static within
a run) fingerprint store, and survivors land in a parquet sink.

Semantics contract: with a static store, micro-batches are independent, so
the union of all per-batch survivor sets equals the one-shot batch result
over the whole delta — which is what lets the SAME DuckDB oracle gate the
streaming form (asserted in tests/test_streaming_parity.py and driver-gated
as ``stream_dedup_incremental_near``).  Intra-delta near-dups are out of
scope on both paths (documented in the batch op); a production pipeline
that must also catch NEW-vs-NEW pairs appends each batch's survivors to
the store between triggers (the growing-store variant is order-dependent
by nature and therefore has no engine-independent oracle).

Retry-idempotence: each batch writes ``overwrite`` into its own
``batch_id=N`` partition directory, the standard foreachBatch recipe — a
batch retried after a mid-write crash atomically replaces its own
directory and never duplicates rows (the plain ``append`` mode would).

Scale notes: per micro-batch cost is O(|batch| + matching buckets), never
store × batch — the store side is banded once per run and persisted; at
100 TB the store's banded signatures are a PRE-BUILT staging table bucketed
by (band_id, band_key), making the candidate join exchange-free on the
store side (see the batch op's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..operators.dedup import dedup_incremental_near

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def read_docs_stream(spark: SparkSession, dir_path: str, **options) -> DataFrame:
    """File-source document stream (``doc_id``, ``text``).  Pass
    ``maxFilesPerTrigger=1`` to process one ingest file per micro-batch —
    the daily-drop shape."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(dir_path)


def stream_dedup_incremental_near(
    new_docs: DataFrame,
    store_df: DataFrame,
    sink_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
):
    """Start the foreachBatch near-dedup stream; returns the
    StreamingQuery (caller awaits termination).  Survivor rows of each
    micro-batch land under ``{sink_dir}/batch_id=N/``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = dedup_incremental_near(
            batch_df,
            store_df,
            text_col,
            id_col,
            threshold=threshold,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
        )
        out.write.mode("overwrite").parquet(f"{sink_dir}/batch_id={batch_id}")

    return (
        new_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
