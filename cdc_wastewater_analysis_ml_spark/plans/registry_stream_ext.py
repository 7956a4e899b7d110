"""Registry part 6: streaming corpus-curation pipelines (VERDICT r5 task 7).

``stream_dedup_incremental_near`` runs the daily-ingest near-dedup delta
shape end-to-end as a stream: the SAME delta the batch query
``dedup_incremental_near`` checks against the corpus is written as three
ingest files, streamed one file per micro-batch through the foreachBatch
pipeline (``streaming/neardup.py``), and the union of the per-batch
survivor sets is returned — which, with a static store, must equal the
one-shot batch result, so the batch query's DuckDB oracle gates the
streaming form verbatim (batch/streaming parity, SURVEY §5.2.5).
"""

from __future__ import annotations

import itertools
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..streaming import read_docs_stream, stream_dedup_incremental_near
from .registry import register
from .registry_ext import _AUG_OFFSET, _NOVEL_OFFSET

_SEQ = itertools.count()


def _delta_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-ingest delta (same derivation as the batch query
    ``dedup_incremental_near``): half near-dup re-crawls of stored docs
    (3-token tail appended), half genuinely novel text."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(_AUG_OFFSET)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near dup tail")).alias("text"),
    )
    fresh = docs.filter(F.col("doc_id") % 5 == 1).select(
        (F.col("doc_id") + F.lit(_NOVEL_OFFSET)).alias("doc_id"),
        F.concat(
            F.lit("novel "),
            F.col("doc_id").cast("string"),
            F.lit(" content unlike anything stored before now"),
        ).alias("text"),
    )
    return near.unionByName(fresh)


def _stream_sql() -> str:
    from .registry_scale import _incremental_near_sql

    return _incremental_near_sql()


@register("stream_dedup_incremental_near", _stream_sql())
def q_stream_dedup_incremental_near(spark, sf_dir):
    """Daily-ingest near-dedup as an end-to-end stream: delta docs arrive
    one ingest file per micro-batch (maxFilesPerTrigger=1, 3 files), each
    micro-batch is banded-LSH-matched + Jaccard-verified against the static
    corpus inside foreachBatch, and survivors land retry-idempotently in
    per-batch sink partitions.  Same oracle as the batch query — with a
    static store the per-batch union IS the batch result."""
    work = tempfile.mkdtemp(prefix=f"spark_graft_neardup_{next(_SEQ)}_")
    src_dir, sink_dir, ckpt = f"{work}/in", f"{work}/out", f"{work}/ckpt"
    # 3 ingest files -> 3 micro-batches under maxFilesPerTrigger=1
    _delta_docs(spark, sf_dir).repartition(3).write.mode("overwrite").parquet(src_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    q = stream_dedup_incremental_near(
        read_docs_stream(spark, src_dir, maxFilesPerTrigger=1),
        docs,
        sink_dir,
        ckpt,
        threshold=0.3,
    )
    q.awaitTermination(300)
    return spark.read.parquet(sink_dir).select("doc_id")


# ---------------------------------------------------------------------------
# Streaming CDC upsert (per-batch MERGE INTO behind foreachBatch)
# ---------------------------------------------------------------------------


def _cdc_stream_sql() -> str:
    # Batch-equivalence oracle: with a static snapshot and stream-unique
    # delta keys, the union of per-batch changed rows equals the one-shot
    # merge restricted to delta keys (see streaming/cdc.py contract).
    # The delta fixture is SHARED with cdc_merge_upsert (registry_scale) —
    # the equivalence argument only holds for the identical delta.
    from .registry_scale import _CDC_DELTA_CTE

    return f"""
    WITH {_CDC_DELTA_CTE}
    SELECT d.c_custkey, d.c_name, d.c_nationkey, d.c_acctbal, d.c_mktsegment,
           CASE WHEN c.c_custkey IS NOT NULL THEN 'update'
                ELSE 'insert' END AS action
    FROM delta d LEFT JOIN customer c ON d.c_custkey = c.c_custkey
    """


@register("stream_cdc_upsert", _cdc_stream_sql())
def q_stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cdc_merge_upsert delta arriving as a STREAM: three correction
    drops (maxFilesPerTrigger=1 → three micro-batches), each merged into
    the static customer snapshot inside foreachBatch
    (streaming/cdc.py) with changed rows landing retry-idempotently in
    per-batch partitions.  Stream-unique delta keys + static snapshot ⇒
    the per-batch union equals the one-shot batch merge restricted to
    delta keys, so an engine-independent oracle gates the streaming form."""
    from ..streaming.cdc import read_delta_stream, stream_merge_upsert
    from .registry_scale import _cdc_delta

    work = tempfile.mkdtemp(prefix=f"spark_graft_cdcstream_{next(_SEQ)}_")
    src_dir, sink_dir, ckpt = f"{work}/in", f"{work}/out", f"{work}/ckpt"
    cust = load_table(spark, sf_dir, "customer")
    delta = _cdc_delta(cust)
    delta.repartition(3).write.mode("overwrite").parquet(src_dir)
    q = stream_merge_upsert(
        read_delta_stream(spark, src_dir, delta.schema, maxFilesPerTrigger=1),
        cust,
        ["c_custkey"],
        sink_dir,
        ckpt,
    )
    q.awaitTermination(300)
    return spark.read.parquet(sink_dir).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
        "action",
    )
