"""Registry part 11 (r8): line-level dedup queries (operators/lines.py).

The documents fixture is one line per doc with no repeated text at sf0.01,
so — following the ``corpus_pii_redact`` injection precedent — both engines
construct the SAME multi-line corpus by wrapping every document in site
boilerplate (a banner line, a blank line, a footer line).  The banner and
footer then occur once per document (corpus-hot, must be stripped), the
blank line is equally hot but exempted by the ``min_chars`` floor, and the
document body is unique (must survive, byte-identical, via the
pos-sorted reassembly).  This makes the gate exercise every branch of the
operator rather than hash-matching a vacuous pass-through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import lines as LN
from ..sources import fan_out, load_table
from .registry import register
from .registry_ext import _AUG_OFFSET, _NOVEL_OFFSET

_BANNER = "accept cookies to continue reading this site"
_FOOTER = "copyright example corp all rights reserved"

#: Same string both engines: banner \n blank \n body \n footer.
_LINED_CTE = (
    "WITH base AS (SELECT doc_id, "
    f"'{_BANNER}' || chr(10) || '' || chr(10) || text || chr(10) || "
    f"'{_FOOTER}' AS text FROM documents) "
)


def _lined_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    return docs.select(
        "doc_id",
        F.concat_ws(
            "\n", F.lit(_BANNER), F.lit(""), F.col("text"), F.lit(_FOOTER)
        ).alias("text"),
    )


@register(
    "corpus_line_dedup",
    _LINED_CTE
    + """
    , l AS (
      SELECT doc_id, u.line, u.pos
      FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM base) d,
           LATERAL (SELECT unnest(parts) AS line,
                           generate_subscripts(parts, 1) AS pos) u
    ), hot AS (
      SELECT line FROM l WHERE length(line) >= 1
      GROUP BY line HAVING count(*) > 2
    ), kept AS (
      SELECT doc_id, pos, line FROM l ANTI JOIN hot USING (line)
    ), agg AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
             count(*) AS lines_kept
      FROM kept GROUP BY doc_id
    ), tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id)
    SELECT t.doc_id,
           coalesce(a.text_clean, '') AS text_clean,
           CAST(coalesce(a.lines_kept, 0) AS BIGINT) AS lines_kept,
           CAST(t.n_lines - coalesce(a.lines_kept, 0) AS BIGINT)
             AS lines_removed
    FROM tot t LEFT JOIN agg a USING (doc_id)
    """,
)
def q_corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style hot-line removal over the boilerplate-wrapped corpus:
    banner/footer lines (one per doc, corpus-hot) are stripped, the blank
    separator survives via the ``min_chars=1`` exemption, and each unique
    body line survives byte-identically through the pos-ordered
    reassembly.  Counting shuffles (digest, count) pairs, never line text;
    the hot set is two digests — broadcast-sized by construction."""
    return LN.remove_hot_lines(
        _lined_docs(spark, sf_dir),
        text_col="text",
        id_col="doc_id",
        max_occurrences=2,
        min_chars=1,
    )


@register(
    "corpus_hot_lines",
    _LINED_CTE
    + """
    SELECT line,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
          FROM base) l
    GROUP BY line HAVING count(*) > 2
    """,
)
def q_corpus_hot_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boilerplate head of the line-occurrence distribution (the
    diagnostic run before choosing a removal threshold): exactly the
    injected banner, blank, and footer lines at one occurrence per doc.
    No top-k LIMIT — the threshold predicate alone keeps the result set
    deterministic (a LIMIT would tie-break at the boundary)."""
    counts = LN.line_occurrence_counts(
        _lined_docs(spark, sf_dir), text_col="text", id_col="doc_id"
    )
    return counts.filter(F.col("n_occurrences") > 2).select(
        "line",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
    )


# ---------------------------------------------------------------------------
# incremental ingest: clean a delta against the historical line store
# ---------------------------------------------------------------------------

#: Delta derivation shared with the document-dedup incremental family
#: (registry_scale._incremental_near_sql newb CTE): near-dup re-crawls +
#: genuinely novel docs, wrapped in the same boilerplate as the store.
_DELTA_LINED_CTE = (
    _LINED_CTE
    + f""", delta0 AS (
      SELECT doc_id + {_AUG_OFFSET} AS doc_id,
             concat(text, ' near dup tail') AS text
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + {_NOVEL_OFFSET} AS doc_id,
             concat('novel ', CAST(doc_id AS VARCHAR),
                    ' content unlike anything stored before now') AS text
      FROM documents WHERE doc_id % 5 = 1
    ), delta AS (
      SELECT doc_id, '{_BANNER}' || chr(10) || '' || chr(10) || text ||
             chr(10) || '{_FOOTER}' AS text FROM delta0
    ) """
)


def _lined_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry_stream_ext import _delta_docs

    d = _delta_docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.concat_ws(
            "\n", F.lit(_BANNER), F.lit(""), F.col("text"), F.lit(_FOOTER)
        ).alias("text"),
    )


#: Shared by the batch query and its streaming twin (stream_line_dedup):
#: with a static store, the union of per-micro-batch cleaned outputs
#: equals the one-shot clean (streaming/lines.py contract), so the same
#: oracle gates both forms verbatim.
_INCR_CLEAN_SQL = (
    _DELTA_LINED_CTE
    + """
    , sc AS (
      SELECT line, count(*) AS n
      FROM (SELECT unnest(string_split(text, chr(10))) AS line FROM base) s
      GROUP BY line
    ), dl AS (
      SELECT doc_id, u.line, u.pos
      FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM delta) d,
           LATERAL (SELECT unnest(parts) AS line,
                           generate_subscripts(parts, 1) AS pos) u
    ), dc AS (
      SELECT line, count(*) AS nd FROM dl WHERE length(line) >= 1
      GROUP BY line
    ), hot AS (
      SELECT dc.line FROM dc LEFT JOIN sc USING (line)
      WHERE dc.nd + coalesce(sc.n, 0) > 2
    ), kept AS (
      SELECT doc_id, pos, line FROM dl ANTI JOIN hot USING (line)
    ), agg AS (
      SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
             count(*) AS lines_kept
      FROM kept GROUP BY doc_id
    ), tot AS (SELECT doc_id, count(*) AS n_lines FROM dl GROUP BY doc_id)
    SELECT t.doc_id,
           coalesce(a.text_clean, '') AS text_clean,
           CAST(coalesce(a.lines_kept, 0) AS BIGINT) AS lines_kept,
           CAST(t.n_lines - coalesce(a.lines_kept, 0) AS BIGINT)
             AS lines_removed
    FROM tot t LEFT JOIN agg a USING (doc_id)
    """
)


@register("corpus_line_dedup_incremental", _INCR_CLEAN_SQL)
def q_corpus_line_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest line cleaning: the delta (near-dup re-crawls + novel
    docs, boilerplate-wrapped like the store) is cleaned against
    store+delta occurrence counts — banner/footer are hot purely from the
    STORE side (one delta occurrence suffices to strip them), the blank
    separator stays exempt, and each unique body survives byte-exact.
    The store side joins only against the delta's distinct-line digests,
    so a 100 TB store never shuffles more than the delta vocabulary."""
    store = LN.build_line_store(_lined_docs(spark, sf_dir))
    return LN.remove_hot_lines_vs_store(
        _lined_delta(spark, sf_dir),
        store,
        max_occurrences=2,
        min_chars=1,
    )


@register(
    "corpus_line_store_merge",
    _DELTA_LINED_CTE
    + """
    SELECT md5(line) AS line_dig, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT unnest(string_split(text, chr(10))) AS line FROM base
      UNION ALL
      SELECT unnest(string_split(text, chr(10))) AS line FROM delta
    ) l
    GROUP BY md5(line)
    """,
)
def q_corpus_line_store_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store evolution after an ingest: the delta's counts folded into the
    historical digest store (union of two pre-aggregated relations,
    re-summed on the 16-byte key — never touches line text).  Equals a
    from-scratch count of store ∪ delta, which is exactly what the oracle
    computes."""
    store = LN.build_line_store(_lined_docs(spark, sf_dir))
    return LN.merge_line_counts(store, _lined_delta(spark, sf_dir))


# ---------------------------------------------------------------------------
# streaming twin: the daily-crawl line cleaning as micro-batches
# ---------------------------------------------------------------------------


@register("stream_line_dedup", _INCR_CLEAN_SQL)
def q_stream_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest line cleaning as an end-to-end stream
    (streaming/lines.py): the SAME boilerplate-wrapped delta the batch
    query cleans arrives one ingest file per micro-batch
    (maxFilesPerTrigger=1, 3 files), each micro-batch is cleaned against
    the static line store inside foreachBatch, and cleaned docs land
    retry-idempotently in per-batch sink partitions — the per-batch counts
    side-output feeds the post-run store refresh (order-independent sum,
    gated by test_streaming_parity's merged-store assertion).  Same oracle
    as the batch query: boilerplate heat is store-side here, so per-batch
    union = one-shot clean."""
    import tempfile

    from ..streaming import read_docs_stream, stream_line_dedup
    from .registry_stream_ext import _SEQ

    work = tempfile.mkdtemp(prefix=f"spark_graft_linestream_{next(_SEQ)}_")
    src_dir, sink_dir = f"{work}/in", f"{work}/out"
    counts_dir, ckpt = f"{work}/counts", f"{work}/ckpt"
    _lined_delta(spark, sf_dir).repartition(3).write.mode("overwrite").parquet(
        src_dir
    )
    store = LN.build_line_store(_lined_docs(spark, sf_dir))
    q = stream_line_dedup(
        read_docs_stream(spark, src_dir, maxFilesPerTrigger=1),
        store,
        sink_dir,
        counts_dir,
        ckpt,
        max_occurrences=2,
        min_chars=1,
    )
    q.awaitTermination(300)
    return spark.read.parquet(sink_dir).select(
        "doc_id", "text_clean", "lines_kept", "lines_removed"
    )
