"""Streaming line-level dedup — the CCNet daily-crawl ingest as an
end-to-end stream (VERDICT r8 task 4).

The batch delta shape exists in ``operators/lines.py``
(:func:`~..operators.lines.remove_hot_lines_vs_store`: a delta line is hot
when its delta-internal occurrences plus its store count cross the
threshold; :func:`~..operators.lines.build_line_store` /
:func:`~..operators.lines.merge_line_counts` maintain the digest store).
This module runs exactly that per micro-batch behind ``foreachBatch``:
ingest files stream in, each micro-batch is cleaned against the (static
within a run) line store, survivors land in a parquet sink — and, in the
same batch function, the batch's OWN line counts land in a counts sink, so
the post-run store refresh is one re-sum over (static store ∪ all batch
counts).

Semantics contract (mirrors ``streaming/neardup.py``): with a static
store, per-batch hotness is batch-internal + store, so the union of
per-batch cleaned outputs equals the one-shot
``remove_hot_lines_vs_store`` over the whole delta PROVIDED no line
crosses the threshold only by accumulating occurrences ACROSS micro-
batches (store-hot boilerplate strips identically either way; a brand-new
banner flooding one batch is caught in that batch).  That proviso is the
same one the near-dup twin documents for NEW-vs-NEW pairs; the parity test
asserts equality on the registry fixture, where boilerplate heat is
store-side.  The STORE side-output has no proviso at all: summation is
commutative, so store ∪ batch-counts re-summed equals the one-shot
:func:`merge_line_counts` regardless of batch boundaries — which is what
lets the batch merge oracle gate the streaming store refresh verbatim.

Retry-idempotence: each batch ``overwrite``-writes into its own
``batch_id=N`` directory in BOTH sinks (the standard foreachBatch recipe)
— a batch retried after a mid-write crash atomically replaces its own
directories and never double-counts a line or duplicates a survivor row.

Scale notes: per micro-batch cost is O(|batch lines| + delta-vocabulary
store lookups), never store × batch — the store side joins only the
batch's distinct-line digests (operators/lines.py docstring), and at
100 TB the store at rest is bucketed by ``line_dig``
(tests/test_line_dedup.py pins the exchange-free merge/lookup plan), so
the per-batch lookup shuffles only the batch vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.lines import build_line_store, remove_hot_lines_vs_store


def stream_line_dedup(
    new_docs: DataFrame,
    store_df: DataFrame,
    sink_dir: str,
    counts_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_occurrences: int = 2,
    min_chars: int = 0,
):
    """Start the foreachBatch line-dedup stream; returns the
    StreamingQuery (caller awaits termination).  Cleaned documents of each
    micro-batch land under ``{sink_dir}/batch_id=N/``; the batch's line
    counts under ``{counts_dir}/batch_id=N/`` — fold them into the store
    after the run with one re-sum (see :func:`merged_store`)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # Two consumers read the batch source (the clean pass and the
        # counts side-output): pin it so the micro-batch's text is scanned
        # once, not re-read per write.
        batch_df = batch_df.persist()
        try:
            cleaned = remove_hot_lines_vs_store(
                batch_df,
                store_df,
                text_col=text_col,
                id_col=id_col,
                max_occurrences=max_occurrences,
                min_chars=min_chars,
            )
            cleaned.write.mode("overwrite").parquet(
                f"{sink_dir}/batch_id={batch_id}"
            )
            build_line_store(batch_df, text_col).write.mode("overwrite").parquet(
                f"{counts_dir}/batch_id={batch_id}"
            )
        finally:
            batch_df.unpersist()

    return (
        new_docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def merged_store(store_df: DataFrame, counts: DataFrame) -> DataFrame:
    """Post-run store refresh: the static store plus every micro-batch's
    counts, re-summed on the digest key.  Order-independent by
    construction (sum over a union), so it equals the one-shot
    ``merge_line_counts(store, whole_delta)`` exactly."""
    from pyspark.sql import functions as F

    return (
        store_df.unionByName(counts.select("line_dig", "n"))
        .groupBy("line_dig")
        .agg(F.sum("n").alias("n"))
    )
