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
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "stream_line_dedup: availableNow stream did not drain in 300 s "
            "— failing loudly instead of returning a partial sink"
        )
    return spark.read.parquet(sink_dir).select(
        "doc_id", "text_clean", "lines_kept", "lines_removed"
    )


# ---------------------------------------------------------------------------
# End-to-end incremental-ingest composite: the daily-crawl story as ONE query
# (r9; the delta-vs-store counterpart of pipeline_corpus_curation)
# ---------------------------------------------------------------------------

#: Two more delta slices beyond the shared near/novel recipe: byte-identical
#: re-crawls (die at the EXACT stage) and too-short ad junk (dies at the
#: QUALITY gate) — every stage of the composite kills a designated slice, so
#: the oracle hash is non-vacuous at each step.
_RECRAWL_OFFSET = 30_000_000_000
_JUNK_OFFSET = 40_000_000_000


def _ingest_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily crawl: near-dup re-crawls, novel docs, exact re-crawls and
    short junk, every page wrapped in the same site boilerplate the store
    carries."""
    docs = fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(_AUG_OFFSET)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near dup tail")).alias("text"),
    )
    novel = docs.filter(F.col("doc_id") % 5 == 1).select(
        (F.col("doc_id") + F.lit(_NOVEL_OFFSET)).alias("doc_id"),
        F.concat(
            F.lit("novel "),
            F.col("doc_id").cast("string"),
            F.lit(" content unlike anything stored before now"),
        ).alias("text"),
    )
    recrawl = docs.filter(F.col("doc_id") % 5 == 2).select(
        (F.col("doc_id") + F.lit(_RECRAWL_OFFSET)).alias("doc_id"), "text"
    )
    junk = docs.filter(F.col("doc_id") % 5 == 3).select(
        (F.col("doc_id") + F.lit(_JUNK_OFFSET)).alias("doc_id"),
        F.concat(F.lit("ad "), F.col("doc_id").cast("string"), F.lit(" click")).alias(
            "text"
        ),
    )
    batch = near.unionByName(novel).unionByName(recrawl).unionByName(junk)
    return batch.select(
        "doc_id",
        F.concat_ws(
            "\n", F.lit(_BANNER), F.lit(""), F.col("text"), F.lit(_FOOTER)
        ).alias("text"),
    )


#: The composite's 4-slice crawl (near-dup re-crawls, novel docs, exact
#: re-crawls, ad junk), boilerplate-wrapped — shared between the composite's
#: oracle and the store-refresh oracle so both gate the SAME delta.
_INGEST_DELTA_CTE = (
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
      UNION ALL
      SELECT doc_id + {_RECRAWL_OFFSET} AS doc_id, text
      FROM documents WHERE doc_id % 5 = 2
      UNION ALL
      SELECT doc_id + {_JUNK_OFFSET} AS doc_id,
             concat('ad ', CAST(doc_id AS VARCHAR), ' click') AS text
      FROM documents WHERE doc_id % 5 = 3
    ), delta AS (
      SELECT doc_id, '{_BANNER}' || chr(10) || '' || chr(10) || text ||
             chr(10) || '{_FOOTER}' AS text FROM delta0
    )"""
)


def _ingest_stages_sql() -> str:
    """The composite's CTE chain up to (and including) the quality gate —
    shared between the batch composite's oracle (which appends the packing
    tail) and the streaming twin's oracle (which selects ``qual``
    directly: packing is a global prefix sum, out of scope per-batch)."""
    from .registry_ext import _minhash_sql, _shingles_sql_d

    sig_cols = ", ".join(_minhash_sql(i) for i in range(8))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"concat(minhash_{2 * b}, '|', minhash_{2 * b + 1}) AS band_key FROM {{sig}}"
        for b in range(4)
    )
    norm = r"regexp_replace(trim(lower(text)), '\s+', ' ', 'g')"
    return (
        _INGEST_DELTA_CTE
        + f""", sc AS (
      SELECT line, count(*) AS n
      FROM (SELECT unnest(string_split(text, chr(10))) AS line FROM base) s
      GROUP BY line
    ), dl AS (
      SELECT doc_id, u.line, u.pos
      FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM delta) d,
           LATERAL (SELECT unnest(parts) AS line,
                           generate_subscripts(parts, 1) AS pos) u
    ), dc AS (
      SELECT line, count(*) AS nd FROM dl GROUP BY line
    ), hot AS (
      SELECT dc.line FROM dc LEFT JOIN sc USING (line)
      WHERE dc.nd + coalesce(sc.n, 0) > 2
    ), keptl AS (
      SELECT doc_id, pos, line FROM dl ANTI JOIN hot USING (line)
    ), cleaned AS (
      SELECT t.doc_id, coalesce(a.text_clean, '') AS text
      FROM (SELECT doc_id FROM dl GROUP BY doc_id) t
      LEFT JOIN (SELECT doc_id,
                        string_agg(line, chr(10) ORDER BY pos) AS text_clean
                 FROM keptl GROUP BY doc_id) a USING (doc_id)
    ), ex AS (
      SELECT doc_id, text FROM cleaned
      WHERE md5({norm}) NOT IN (SELECT DISTINCT md5({norm}) FROM documents)
    ),
    sig_s AS (SELECT d.doc_id, {sig_cols} FROM documents d),
    sig_n AS (SELECT d.doc_id, {sig_cols} FROM ex d),
    band_s AS ({bands.format(sig="sig_s")}),
    band_n AS ({bands.format(sig="sig_n")}),
    cand AS (SELECT DISTINCT n.doc_id AS id_new, s.doc_id AS id_store
             FROM band_n n JOIN band_s s
               ON n.band_id = s.band_id AND n.band_key = s.band_key),
    shs_s AS (SELECT d.doc_id, list_distinct({_shingles_sql_d()}) AS shs
              FROM documents d),
    shs_n AS (SELECT d.doc_id, list_distinct({_shingles_sql_d()}) AS shs
              FROM ex d),
    matched AS (
      SELECT DISTINCT id_new FROM cand
      JOIN shs_n a ON a.doc_id = id_new
      JOIN shs_s b ON b.doc_id = id_store
      WHERE len(list_intersect(a.shs, b.shs)) * 1.0
            / (len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs)))
            >= 0.3),
    qual AS (
      SELECT doc_id, text FROM ex
      WHERE doc_id NOT IN (SELECT id_new FROM matched)
        AND len(string_split({norm}, ' ')) >= 6
    )"""
    )


def _ingest_sql() -> str:
    from .registry_corpus import _pack_tail_sql

    return _ingest_stages_sql() + ",\n    " + _pack_tail_sql("qual")


@register("pipeline_incremental_ingest", _ingest_sql())
def q_pipeline_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE daily-crawl ingest as ONE composite — the incremental
    (delta-vs-store) counterpart of ``pipeline_corpus_curation``: line-level
    boilerplate cleaning against the historical line store → exact dedup
    against the corpus fingerprint store → near-dup dedup against the
    corpus via delta-driven LSH → token-count quality gate → pack survivors
    into 512-token training windows.

    Line cleaning runs FIRST, and that order is load-bearing: with the
    site chrome still attached, unrelated short documents share enough
    banner/footer shingles to cross the near-dup threshold (J ≥ 0.3), so
    dedup-before-clean would silently discard novel content — the reason
    CCNet strips hot lines before MinHash.

    Each delta slice dies at its designated stage: boilerplate lines at
    the line stage (store-side heat — one delta occurrence suffices),
    byte-identical re-crawls at the exact stage, near-dup re-crawls
    (3-token tail) at the near stage, ad junk (3 tokens) at the quality
    gate; only novel docs reach packing.  Store documents whose text is
    duplicated in the corpus (the fixture's ~0.16% exact-dup rows) make
    their re-crawl bodies line-hot (2 store + 1 delta occurrences > 2), so
    the stripped-to-empty path is exercised too — those die at the quality
    gate in both engines.

    At 100 TB every stage is delta-driven: the line store joins only the
    delta's distinct-line digests (operators/lines.py), the fingerprint
    anti-join carries (fp, id) never bodies against a bucketed-at-rest
    store (operators/dedup.py dedup_incremental_exact), the LSH candidates
    equi-join the delta's banded signatures against a precomputed store
    signature table (minhash_lsh_candidates_vs_store), and packing is the
    two-phase partition-offset prefix sum — no stage shuffles more than
    O(|delta| + matched store rows).
    """
    from ..operators import corpus as C
    from ..operators import dedup as D
    from ..operators import text as T
    from ..operators.caching import transfer_cache_scope
    from .registry_corpus import _PACK_LEN

    store_raw = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    line_store = LN.build_line_store(_lined_docs(spark, sf_dir))
    cleaned = LN.remove_hot_lines_vs_store(
        _ingest_delta(spark, sf_dir), line_store, max_occurrences=2, min_chars=0
    )
    cleaned_docs = cleaned.select("doc_id", F.col("text_clean").alias("text"))
    survivors_exact = D.dedup_incremental_exact(
        cleaned_docs, store_raw, "text", "doc_id"
    )
    survivors_near = D.dedup_incremental_near(
        survivors_exact, store_raw, "text", "doc_id", threshold=0.3
    )
    qual = survivors_near.filter(T.token_count("text") >= 6)
    out = C.pack_token_stream(qual, "text", "doc_id", context_len=_PACK_LEN)
    # Both upstream operators carry cache scopes (the delta line relation;
    # the near stage's shingle cache + candidate pins).  Deriving `out` and
    # dropping their handles would fire the weakref finalizers before the
    # caller's action runs — the r8 dedup_incremental_near scale-killer —
    # so ownership transfers onto the DataFrame actually executed.
    out = transfer_cache_scope(cleaned, out)
    return transfer_cache_scope(survivors_near, out)


@register(
    "pipeline_ingest_store_refresh",
    _INGEST_DELTA_CTE
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
def q_pipeline_ingest_store_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest composite's OTHER production artifact (r9 VERDICT task
    5): the post-batch line-store refresh, store′ = merge(store, delta
    counts), computed from the composite's OWN 4-slice crawl — the oracle
    proves the refreshed store equals a from-scratch count of
    store ∪ delta.  Counts fold in for EVERY arriving page regardless of
    which docs survive the downstream gates (line heat is
    occurrence-based over everything seen, so tomorrow's delta strips
    today's new boilerplate from its first occurrence).

    Runs the exchange-free-capable plan (merge_line_counts_bucketed: full
    outer join on the 16-byte digest + summed sides) rather than the
    union+re-sum shape corpus_line_store_merge gates — at 100 TB the store
    scan's at-rest bucketing satisfies the join's distribution and only
    the delta vocabulary is exchanged (plan-pinned in
    tests/test_line_dedup.py); result-identical here where the store is
    derived in-plan."""
    store = LN.build_line_store(_lined_docs(spark, sf_dir))
    return LN.merge_line_counts_bucketed(store, _ingest_delta(spark, sf_dir))


@register(
    "stream_incremental_ingest",
    _ingest_stages_sql() + "\n    SELECT doc_id, text FROM qual",
)
def q_stream_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest composite as an end-to-end STREAM (streaming/ingest.py —
    r9 VERDICT "What's missing #4"): the SAME 4-slice crawl the batch
    composite gates arrives one ingest file per micro-batch
    (maxFilesPerTrigger=1, 3 files), each micro-batch flows through
    line-clean → exact-vs-store → near-vs-store → quality gate inside ONE
    foreachBatch function, survivors land retry-idempotently in per-batch
    sink partitions and each batch's line counts in the counts side-output
    (the store-refresh feed, gated batch-side by
    ``pipeline_ingest_store_refresh``).

    Oracle: the batch composite's OWN stage chain truncated at the quality
    gate (packing is a global prefix sum over the whole surviving corpus —
    a post-run batch step, not a per-batch one).  Equality holds because
    every stage is batch-invariant against a static store: line heat is
    store-side on this fixture, the exact/near stages are delta-vs-store
    by contract, the gate is stateless (module docstring spells out each
    contract)."""
    import tempfile

    from ..streaming import read_docs_stream, stream_incremental_ingest
    from .registry_stream_ext import _SEQ

    work = tempfile.mkdtemp(prefix=f"spark_graft_ingeststream_{next(_SEQ)}_")
    src_dir, sink_dir = f"{work}/in", f"{work}/out"
    counts_dir, ckpt = f"{work}/counts", f"{work}/ckpt"
    _ingest_delta(spark, sf_dir).repartition(3).write.mode("overwrite").parquet(
        src_dir
    )
    store_raw = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    line_store = LN.build_line_store(_lined_docs(spark, sf_dir))
    q = stream_incremental_ingest(
        read_docs_stream(spark, src_dir, maxFilesPerTrigger=1),
        line_store,
        store_raw,
        sink_dir,
        counts_dir,
        ckpt,
        max_occurrences=2,
        min_chars=0,
        threshold=0.3,
        min_tokens=6,
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "stream_incremental_ingest: availableNow stream did not drain "
            "in 300 s — failing loudly instead of returning a partial sink"
        )
    return spark.read.parquet(sink_dir).select("doc_id", "text")
