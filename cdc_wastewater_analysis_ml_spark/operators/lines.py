"""Line-level corpus deduplication (CCNet-style boilerplate removal).

Web-scale corpora repeat LINES far more than documents: navigation menus,
cookie banners, license footers, share buttons — identical strings pasted
across millions of otherwise-distinct pages.  Document-level dedup
(operators/dedup.py) never sees them; the standard counter-move (CCNet,
Wenzek et al. 2020; also the Gopher/MassiveText rules) is to hash every
line, count occurrences across the corpus, and strip lines that repeat
more than a handful of times.

Two deployment shapes, mirroring the document-dedup family:

- **batch** (:func:`remove_hot_lines`): one corpus, self-contained counts;
- **incremental ingest** (:func:`build_line_store` →
  :func:`remove_hot_lines_vs_store` → :func:`merge_line_counts`): a
  persistent ``(line_dig, n)`` occurrence store accumulated over prior
  ingests; each delta is cleaned against store+delta counts, then folded
  into the store — the daily-crawl shape where yesterday's corpus can't
  be re-counted from scratch.

Scale shape (the reason this is NOT "explode and groupBy the text"):

- occurrence counting groups by ``md5(line)`` — after map-side partial
  aggregation the count shuffle carries (16-byte digest, long) pairs, not
  line text (measured: exponent 0.234 at the 100× probe, PROBE_r08);
- the hot set (digests with count > threshold) is the *head* of the line
  distribution — tiny relative to the corpus — so the removal anti-join's
  build side is broadcast-sized in realistic corpora (AQE decides, bounded
  by the engine's 4 MB cap; a pathological hot set degrades to a shuffle
  join, still correct);
- reassembly shuffles only SURVIVING (id, pos, line) rows by document id —
  the one unavoidable clustering shuffle — and rebuilds the text with
  ``array_sort(collect_list(struct(pos, line)))``, pure Catalyst;
- the exploded line relation feeds both the counting and the removal
  sides, so it is persisted once with result-scoped lifetime
  (operators/caching.py) instead of re-splitting the corpus text twice;
- the digest-keyed store merge is the CDC count-accumulation shape: at
  100 TB the store is bucketed by ``line_dig`` so the merge and the
  per-delta hot lookup co-locate.

No UDFs anywhere; everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .caching import scoped_persist

__all__ = [
    "line_occurrence_counts",
    "remove_hot_lines",
    "build_line_store",
    "merge_line_counts",
    "merge_line_counts_bucketed",
    "remove_hot_lines_vs_store",
]


def _exploded_lines(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, __pos, __line) — one row per line, position preserved."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    )


def _dig(col: str = "__line") -> Column:
    return F.md5(F.col(col))


#: Gate for broadcasting a digest set (md5 strings): 200k 32-char digests
#: build a ~20 MB broadcast hash relation — cheap to ship to every
#: executor, far below any per-executor memory budget, and the
#: alternative (AQE deciding) was measured REFUSING the broadcast at
#: sf10mf (r14 broadcast audit: the hot-set anti-join planned as
#: SortMergeJoin LeftAnti, shuffling the corpus-sized exploded-line
#: relation on ``__dig``) because its estimate for an
#: aggregate-after-filter is guesswork — the same failure mode r13 fixed
#: on the dedup semi-join reductions.  Above the gate (adversarial /
#: boilerplate-flooded corpora) the join is pinned sort-merge instead:
#: determinism over estimates in BOTH directions, per the
#: ``_bucket_guard`` precedent in operators/dedup.py.
_DIGEST_BROADCAST_MAX = 200_000


def _strip_and_reassemble(
    lines: DataFrame, hot_digests: DataFrame, id_col: str
) -> DataFrame:
    """Anti-join the exploded (id, __pos, __line) relation against the hot
    digest set and rebuild per-doc text in original order; every input doc
    keeps a row (fully-boilerplate docs return '').

    The hot set is persisted and counted (one eager action — both
    consumers run inside batch/foreachBatch contexts), and the anti-join
    strategy is chosen deterministically on that count: an explicit
    ``F.broadcast`` under :data:`_DIGEST_BROADCAST_MAX` — so the
    corpus-sized line relation NEVER shuffles for the removal — and a
    pinned merge join above it (see the gate's docstring)."""
    hot = hot_digests.persist()
    n_hot = hot.count()
    hot_side = (
        F.broadcast(hot) if n_hot <= _DIGEST_BROADCAST_MAX else hot.hint("merge")
    )
    kept = lines.withColumn("__dig", _dig()).join(
        hot_side, "__dig", "left_anti"
    )
    survived = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda x: x["__line"],
            ),
            "\n",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("lines_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n_lines"))
    out = totals.join(survived, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        F.coalesce(F.col("lines_kept"), F.lit(0)).cast("long").alias(
            "lines_kept"
        ),
        (F.col("__n_lines") - F.coalesce(F.col("lines_kept"), F.lit(0)))
        .cast("long")
        .alias("lines_removed"),
    )
    return scoped_persist(out, hot)


def line_occurrence_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-wide occurrence count per distinct line: ``(line, n_docs,
    n_occurrences)`` — the diagnostic to eyeball before choosing a removal
    threshold (the head of this distribution IS the site boilerplate)."""
    lines = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), "\n")).alias("line")
    )
    return lines.groupBy("line").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


def remove_hot_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_occurrences: int = 2,
    min_chars: int = 0,
) -> DataFrame:
    """Strip every line occurring more than ``max_occurrences`` times across
    the corpus; returns ``(id_col, text_clean, lines_kept, lines_removed)``
    with surviving lines rejoined in original order (every input document
    keeps a row — a fully-boilerplate document comes back with
    ``text_clean = ''``).

    ``min_chars`` exempts short lines from removal (they can never be
    "hot"): blank lines and one-character separators repeat everywhere by
    nature, and stripping them mangles formatting without deduplicating
    anything — CCNet applies the same length floor before counting.
    """
    if max_occurrences < 1:
        raise ValueError("max_occurrences must be >= 1")
    lines = _exploded_lines(df, text_col, id_col).persist()
    hot = (
        lines.filter(F.length("__line") >= min_chars)
        .select(_dig().alias("__dig"))
        .groupBy("__dig")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_occurrences)
        .select("__dig")
    )
    return scoped_persist(_strip_and_reassemble(lines, hot, id_col), lines)


def build_line_store(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Digest-keyed occurrence store ``(line_dig, n)`` for the incremental
    ingest path — the only state the per-delta cleaning needs, 24 bytes a
    row regardless of line length.  Counts are OCCURRENCE-based (how many
    times the line appears corpus-wide), not per-document — the store
    needs no document identity, which is why there is no ``id_col``
    parameter here.  At rest, write it bucketed by ``line_dig``
    (sources/sinks.py sink_parquet_bucketed) so every future merge and
    hot-lookup joins exchange-free.  Size the bucket count AT LEAST the
    cluster's ``spark.sql.shuffle.partitions``: EnsureRequirements rides an
    existing hash layout only when that doesn't lower join parallelism
    below the session target — a store with fewer buckets than partitions
    gets re-shuffled UP and the exchange-free property silently vanishes
    (plan-pinned in tests/test_line_dedup.py)."""
    return (
        df.select(F.explode(F.split(F.col(text_col), "\n")).alias("__line"))
        .select(_dig().alias("line_dig"))
        .groupBy("line_dig")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def merge_line_counts(
    store: DataFrame,
    delta_docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Fold a new ingest's line counts into the store: union + re-sum on
    the digest key (both inputs are pre-aggregated, so the shuffle carries
    one (digest, n) row per distinct line per side — the count-accumulator
    CDC shape).  Occurrence-based like :func:`build_line_store` — no
    document identity involved."""
    delta_counts = build_line_store(delta_docs, text_col)
    return (
        store.unionByName(delta_counts)
        .groupBy("line_dig")
        .agg(F.sum("n").alias("n"))
    )


def merge_line_counts_bucketed(
    store: DataFrame,
    delta_docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Store-side-exchange-free merge for a store that is bucketed at rest
    on ``line_dig`` (sink_parquet_bucketed): a full-outer join on the
    bucket key + summed sides.  Result-identical to
    :func:`merge_line_counts` (sum over a disjoint union), but the plan is
    different where it matters at 100 TB: the union+re-sum shape must
    shuffle the ENTIRE store again on every ingest, while here the store
    scan's bucketing satisfies the join's distribution — only the delta
    vocabulary is exchanged (plan-pinned in tests/test_line_dedup.py).
    Write the merged result back bucketed to keep the invariant for the
    next ingest."""
    delta_counts = build_line_store(delta_docs, text_col)
    s = store.select("line_dig", F.col("n").alias("__ns"))
    d = delta_counts.select("line_dig", F.col("n").alias("__nd"))
    return s.join(d, "line_dig", "full_outer").select(
        "line_dig",
        (
            F.coalesce(F.col("__ns"), F.lit(0))
            + F.coalesce(F.col("__nd"), F.lit(0))
        ).alias("n"),
    )


def remove_hot_lines_vs_store(
    delta: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_occurrences: int = 2,
    min_chars: int = 0,
) -> DataFrame:
    """Clean an ingest delta against the historical line store: a delta
    line is hot when its delta-internal occurrences PLUS its store count
    exceed ``max_occurrences`` — so boilerplate already known from prior
    crawls is stripped from the very first delta occurrence, and a NEW
    banner that floods a single delta still gets caught without waiting
    for the store update.  Same output contract as
    :func:`remove_hot_lines`; fold the delta into the store afterwards
    with :func:`merge_line_counts`.

    Store-side scale shape (r14, broadcast audit): the hot lookup is a
    LEFT join driven by the delta's distinct-line relation, and Spark can
    only broadcast the RIGHT (store) side of a left-outer join — so the
    naive join shuffles the ENTIRE store on ``line_dig`` on every ingest,
    silently contradicting this operator's whole point.  The fix is the
    r13 gated-reduction pattern: the delta's digest vocabulary is counted
    (one eager action — all consumers are batch/foreachBatch), and when
    it fits :data:`_DIGEST_BROADCAST_MAX` the store is first semi-reduced
    by an explicit broadcast of the delta digest set (the store is
    scanned and filtered MAP-SIDE — zero store-side shuffle), after which
    the reduced store (≤ delta-vocabulary rows by construction) is itself
    explicitly broadcast into the hot lookup.  Above the gate (a
    corpus-sized delta) the plain sort-merge join is the right plan and
    is left alone.  Result-identical either way: store rows outside the
    delta vocabulary can never produce a hot digest, because the lookup
    is left-driven by delta digests.
    """
    if max_occurrences < 1:
        raise ValueError("max_occurrences must be >= 1")
    lines = _exploded_lines(delta, text_col, id_col).persist()
    delta_counts = (
        lines.filter(F.length("__line") >= min_chars)
        .select(_dig().alias("__dig"))
        .groupBy("__dig")
        .agg(F.count(F.lit(1)).alias("__nd"))
    ).persist()
    n_delta_digs = delta_counts.count()
    store_side = store.select(F.col("line_dig").alias("__dig"), "n")
    if n_delta_digs <= _DIGEST_BROADCAST_MAX:
        store_side = F.broadcast(
            store_side.join(
                F.broadcast(delta_counts.select("__dig")), "__dig", "left_semi"
            )
        )
    hot = (
        delta_counts.join(store_side, "__dig", "left")
        .filter(F.col("__nd") + F.coalesce(F.col("n"), F.lit(0)) > max_occurrences)
        .select("__dig")
    )
    return scoped_persist(
        _strip_and_reassemble(lines, hot, id_col), lines, delta_counts
    )
