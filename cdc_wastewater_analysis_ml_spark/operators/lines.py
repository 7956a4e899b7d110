"""Line-level corpus deduplication (CCNet-style boilerplate removal).

Web-scale corpora repeat LINES far more than documents: navigation menus,
cookie banners, license footers, share buttons — identical strings pasted
across millions of otherwise-distinct pages.  Document-level dedup
(operators/dedup.py) never sees them; the standard counter-move (CCNet,
Wenzek et al. 2020; also the Gopher/MassiveText rules) is to hash every
line, count occurrences across the corpus, and strip lines that repeat
more than a handful of times.

Scale shape (the reason this is NOT "explode and groupBy the text"):

- occurrence counting groups by ``md5(line)`` — after map-side partial
  aggregation the count shuffle carries (16-byte digest, long) pairs, not
  line text;
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
  (operators/caching.py) instead of re-splitting the corpus text twice.

No UDFs anywhere; everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .caching import scoped_persist

__all__ = ["line_occurrence_counts", "remove_hot_lines"]


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
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line"),
    ).persist()
    digested = lines.withColumn("__dig", F.md5(F.col("__line")))
    hot = (
        digested.filter(F.length("__line") >= min_chars)
        .groupBy("__dig")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_occurrences)
        .select("__dig")
    )
    kept = digested.join(hot, "__dig", "left_anti")
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
    out = (
        totals.join(survived, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            F.coalesce(F.col("lines_kept"), F.lit(0)).cast("long").alias(
                "lines_kept"
            ),
            (F.col("__n_lines") - F.coalesce(F.col("lines_kept"), F.lit(0)))
            .cast("long")
            .alias("lines_removed"),
        )
    )
    return scoped_persist(out, lines)
