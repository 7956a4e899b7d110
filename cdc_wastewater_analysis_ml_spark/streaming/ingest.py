"""Streaming incremental-ingest composite — the WHOLE daily-crawl chain
(line clean → exact dedup → near dedup → quality gate) per micro-batch
(r9 VERDICT "What's missing #4": the foreachBatch twin of
``plans/registry_lines.q_pipeline_incremental_ingest``).

Every stage twin already exists (``streaming/lines.py`` for the line
stage, ``streaming/neardup.py`` for the near stage, the exact stage is a
per-batch anti-join); this module chains them inside ONE batch function so
an arriving crawl file flows through all four gates in a single
micro-batch and lands exactly once.

Semantics contract — the composite inherits the per-stage contracts, and
their union is what lets the BATCH composite's oracle (truncated at the
quality gate) gate the stream verbatim:

* line stage: per-batch hotness is batch-internal + store, so per-batch
  union = one-shot ``remove_hot_lines_vs_store`` PROVIDED no line crosses
  the threshold only by accumulating occurrences ACROSS micro-batches
  (``streaming/lines.py``; store-hot boilerplate strips identically
  either way).
* exact + near stages: both are strictly delta-vs-store
  (``operators/dedup.py``), so micro-batches are independent and the
  per-batch survivor union equals the one-shot result
  (``streaming/neardup.py``); intra-delta pairs are out of scope on both
  paths by the batch ops' documented contract.
* quality gate: stateless per row — trivially batch-invariant.

Ordering is load-bearing exactly as in the batch composite: cleaning runs
FIRST because site chrome pushes unrelated documents over the near-dup
threshold (the CCNet clean-before-MinHash rule).

The counts side-output makes the stream produce BOTH production
artifacts: survivors (per-batch sink partitions) and the line-store
refresh inputs — summation is commutative, so store ∪ all batch counts
re-summed equals the one-shot merge regardless of batch boundaries
(:func:`~.lines.merged_store`), the same invariant
``pipeline_ingest_store_refresh`` oracle-gates on the batch side.

Retry-idempotence: each batch ``overwrite``-writes into its own
``batch_id=N`` directory in both sinks (the standard foreachBatch recipe)
— a retried batch atomically replaces its own directories and never
duplicates a survivor or double-counts a line.

Scale notes: per micro-batch cost is O(|batch| + matched store rows) —
the line store joins only the batch's distinct-line digests, the
fingerprint anti-join carries (fp, id) never bodies, the LSH candidate
join is delta-banded-vs-store-banded, and the digest-keyed verify
(r10 adoption) engages its semi-join reduction whenever the batch's
candidate id set fits the broadcast budget (always, for a daily file).
At 100 TB the store artifacts are PRE-BUILT bucketed staging tables
(line digests by ``line_dig``, fingerprints by ``__fp``, banded
signatures by (band_id, band_key)) so every store-side join is
exchange-free; within one run they are static DataFrames the batch
function reuses across triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.dedup import dedup_incremental_exact, dedup_incremental_near
from ..operators.lines import build_line_store, remove_hot_lines_vs_store
from ..operators.text import token_count


def stream_incremental_ingest(
    new_docs: DataFrame,
    line_store: DataFrame,
    store_df: DataFrame,
    sink_dir: str,
    counts_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_occurrences: int = 2,
    min_chars: int = 0,
    threshold: float = 0.3,
    min_tokens: int = 6,
):
    """Start the foreachBatch ingest-composite stream; returns the
    StreamingQuery (caller awaits termination).  Survivors of each
    micro-batch land under ``{sink_dir}/batch_id=N/`` with columns
    (``id_col``, ``text_col``); the batch's raw line counts under
    ``{counts_dir}/batch_id=N/`` (fold into the line store after the run
    via :func:`~.lines.merged_store`)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # Two consumers scan the batch source (the clean pass and the
        # counts side-output): pin it so the micro-batch text is read once.
        batch_df = batch_df.persist()
        try:
            cleaned = remove_hot_lines_vs_store(
                batch_df,
                line_store,
                text_col=text_col,
                id_col=id_col,
                max_occurrences=max_occurrences,
                min_chars=min_chars,
            )
            cleaned_docs = cleaned.select(
                id_col, cleaned["text_clean"].alias(text_col)
            )
            survivors_exact = dedup_incremental_exact(
                cleaned_docs, store_df, text_col, id_col
            )
            survivors_near = dedup_incremental_near(
                survivors_exact, store_df, text_col, id_col, threshold=threshold
            )
            qual = survivors_near.filter(token_count(text_col) >= min_tokens)
            # The near stage carries cache scopes (shingle cache +
            # candidate pins); `survivors_near` stays referenced until the
            # write below completes, so the weakref finalizers cannot fire
            # before the action runs (the r8 scale-killer pattern the
            # batch composite guards with transfer_cache_scope).
            qual.write.mode("overwrite").parquet(f"{sink_dir}/batch_id={batch_id}")
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
