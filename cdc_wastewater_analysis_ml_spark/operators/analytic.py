"""Analytic extension operators (r7 session 3).

Distributed forms of five analytics the reference's pandas EDA reaches for
via single-process idioms (reference: codes.py:96-135 — fillna/groupby/
value_counts chains), plus a candidate-verify stage for the dedup family:

- :func:`locf_fill` — last-observation-carried-forward gap fill, the
  time-series imputation ``DataFrame.ffill`` performs in pandas, as a
  per-key running window (never a global single-task window).
- :func:`ntile_scalable` — SQL-standard ``NTILE(k)`` over a total order
  WITHOUT ``Window.orderBy`` on the whole relation (which funnels every row
  through one task): two-phase global row number + pure integer bucket
  arithmetic from the 1-row total count.
- :func:`histogram_fixed` — fixed-width histogram over integer units
  (cents): one map-side-combinable groupBy, bin id by integer division.
- :func:`date_spine` — distributed calendar spine (1-row min/max agg →
  ``sequence`` → ``explode``) for zero-filling gaps in resampled series.
- :func:`top_bigrams` — corpus-level bigram frequency top-k; the adjacent
  pairing runs as Catalyst array expressions inside the scan stage
  (``slice`` + ``zip_with`` — no UDF, no shuffle until the count).
- :func:`edit_distance_verify` — Levenshtein verification of near-dup
  CANDIDATE pairs (never all pairs); uses Spark's threshold variant so the
  quadratic DP abandons early at ``max_dist`` — the verify-stage guard
  that keeps edit-distance dedup affordable on long documents.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .windows import global_row_number


def locf_fill(
    df: DataFrame,
    value_col: str,
    order_keys: Sequence[str],
    partition_keys: Sequence[str],
    out: str | None = None,
) -> DataFrame:
    """Forward-fill nulls in ``value_col`` with the last non-null value
    within each partition, ordered by ``order_keys`` (which must form a
    total order per partition — include a unique tiebreak column).

    Scale: the window is partitioned by the entity key, so state never
    exceeds one entity's history per task; ``F.last(ignorenulls=True)``
    over a running frame is a single pass, no self-join.
    """
    w = (
        Window.partitionBy(*partition_keys)
        .orderBy(*[F.asc(k) for k in order_keys])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out or f"{value_col}_filled", F.last(value_col, ignorenulls=True).over(w)
    )


def ntile_scalable(
    df: DataFrame,
    order_keys: Sequence[str],
    n_tiles: int,
    out: str = "tile",
) -> DataFrame:
    """SQL-standard ``NTILE(n_tiles)`` over the total order ``order_keys``
    without a single-task global window.

    Standard allocation: with n rows, the first ``n % k`` tiles hold
    ``ceil(n/k)`` rows, the rest ``floor(n/k)``.  Computed from the
    two-phase :func:`global_row_number` plus the broadcast 1-row count —
    all integer arithmetic, so the tile of every row is exact and
    engine-portable.  The ``greatest(small, 1)`` guard keeps the unused
    else-branch division defined when n < k (every row then lands in the
    rn <= r*big branch).
    """
    rn = global_row_number(df, list(order_keys), out="__rn")
    tot = rn.agg(F.count(F.lit(1)).alias("__n"))
    small = F.floor(F.col("__n") / n_tiles).cast("bigint")
    r = (F.col("__n") % n_tiles).cast("bigint")
    big = small + 1
    rnc = F.col("__rn")
    tile = (
        F.when(rnc <= r * big, F.floor((rnc - 1) / big) + 1)
        .otherwise(
            r + F.floor((rnc - r * big - 1) / F.greatest(small, F.lit(1))) + 1
        )
        .cast("int")
    )
    return rn.crossJoin(F.broadcast(tot)).withColumn(out, tile).drop("__n", "__rn")


def histogram_fixed(
    df: DataFrame,
    cents_col: str,
    bin_width_cents: int,
    n_bins: int,
) -> DataFrame:
    """Fixed-width histogram over an integer-cents column: ``n_bins`` bins
    of ``bin_width_cents``, underflow clamped to bin 0 and overflow to the
    last bin.  One map-side-combinable aggregate; bin ids and sums stay
    integer end-to-end, so the histogram is bit-identical on any engine."""
    b = (
        F.least(
            F.greatest(F.floor(F.col(cents_col) / F.lit(bin_width_cents)), F.lit(0)),
            F.lit(n_bins - 1),
        )
        .cast("int")
        .alias("bin")
    )
    return (
        df.groupBy(b)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(cents_col).cast("bigint").alias("sum_cents"),
        )
        .select(
            "bin",
            (F.col("bin").cast("bigint") * bin_width_cents).alias("bin_lo_cents"),
            "n",
            "sum_cents",
        )
    )


def date_spine(df: DataFrame, ts_col: str) -> DataFrame:
    """One row per calendar day between the relation's min and max
    ``ts_col`` (inclusive): 1-row min/max aggregate → ``sequence`` →
    ``explode``.  The spine is |days| rows regardless of input size, so
    downstream gap-fill joins treat it as the broadcast side."""
    bounds = df.agg(
        F.min(F.to_date(ts_col)).alias("__lo"), F.max(F.to_date(ts_col)).alias("__hi")
    )
    return bounds.select(
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr("interval 1 day"))
        ).alias("day")
    )


def top_bigrams(df: DataFrame, tokens: Column, k: int) -> DataFrame:
    """Corpus top-``k`` adjacent token pairs by frequency, ties broken by
    bigram text.  Pairing is ``slice``+``zip_with`` over the token array —
    Catalyst expressions in the scan stage; the only shuffle is the count
    aggregate, and the top-k is ``TakeOrderedAndProject`` (per-partition
    heads merged at the driver — never a global sort of all bigrams)."""
    # size(NULL) is -1 with ANSI off and an empty array gives 0, so the raw
    # n-1 slice length would be -2 / -1 — Spark's slice rejects negative
    # lengths at runtime (r7 ADVICE).  greatest(n-1, 0) makes both cases a
    # zero-length slice; zip_with over NULL yields NULL and explode drops
    # NULL/empty arrays, so empty and null documents contribute no bigrams.
    m = F.greatest(F.size(tokens) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(tokens, 1, m),
        F.slice(tokens, 2, m),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        df.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(k)
    )


def edit_distance_verify(
    candidates: DataFrame,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int,
) -> DataFrame:
    """Verify candidate pairs (``id_a`` < ``id_b``) by exact Levenshtein
    distance, keeping pairs with distance ≤ ``max_dist``.

    The verify stage runs ONLY on candidate pairs (LSH/SimHash output),
    never all pairs — at scale the candidate relation is near-linear in
    corpus size while all-pairs is quadratic.  Spark's threshold variant
    of ``levenshtein`` abandons the O(|a|·|b|) DP once the running
    distance exceeds ``max_dist`` (returns -1), so cost per pair is
    O(max_dist · max(|a|,|b|)) instead of quadratic in document length;
    kept rows carry the exact distance."""
    ta = docs.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta"))
    tb = docs.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb"))
    lev = F.levenshtein("__ta", "__tb", max_dist)
    return (
        candidates.join(ta, "id_a")
        .join(tb, "id_b")
        .select("id_a", "id_b", lev.alias("lev"))
        .filter((F.col("lev") >= 0) & (F.col("lev") <= max_dist))
    )
