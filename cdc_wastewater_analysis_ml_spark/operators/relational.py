"""Relational operators: project / filter / dedup / joins / sort / top-k / set ops.

Pure ``DataFrame -> DataFrame`` functions (SURVEY §2.2, §2.3, §2.6, §2.7) with
pinned tie-break and null semantics.  All built-in expressions — Catalyst gets
full pushdown/pruning visibility, and small-side joins are explicitly
broadcast so a 100 TB fact table never shuffles against a kB-sized dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def project_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """≙ ``df[features]`` (codes.py:196). Column pruning reaches the scan."""
    return df.select(*cols)


def drop_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """≙ ``df.drop(columns=[...], errors='ignore')`` (codes.py:72-79).

    Spark ``drop`` ignores missing names natively — same observable behavior.
    """
    return df.drop(*cols)


def filter_eq(df: DataFrame, col: str, value) -> DataFrame:
    """≙ ``df[df[col] == v]`` (codes.py:144)."""
    return df.filter(F.col(col) == F.lit(value))


def filter_isin(df: DataFrame, col: str, values: Sequence) -> DataFrame:
    """≙ ``df[df[col].isin(lst)]`` (codes.py:169)."""
    return df.filter(F.col(col).isin(list(values)))


def filter_notnull(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """≙ ``df.dropna(subset=[...])`` (codes.py:117,141,195)."""
    return df.na.drop(subset=list(cols))


def dedup_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """≙ ``df.drop_duplicates()`` (codes.py:96).

    pandas keeps the *first* occurrence (positional); Spark keeps an arbitrary
    row per group.  For full-row dedup the surviving values are identical by
    definition, so the relations agree.  For keyed dedup with a deterministic
    survivor use :func:`dedup_rows_keep_min`.
    """
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def dedup_rows_keep_min(df: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """Keyed dedup with deterministic survivor: min ``order_col`` per key group.

    Spark-first replacement for pandas' positional "keep first": one shuffle on
    the keys, no window materialization (``min_by`` on the non-key columns via
    a row_number would be an alternative; the groupBy form map-side combines).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def join_left_equi(left: DataFrame, right: DataFrame, on: Sequence[str] | str) -> DataFrame:
    """≙ ``pd.merge(a, b, on=key, how='left')`` (codes.py:145)."""
    return left.join(right, on=on, how="left")


def join_broadcast_map(
    df: DataFrame,
    map_df: DataFrame,
    key: str,
    value_col: str,
    default=None,
) -> DataFrame:
    """Dictionary-style enrichment ≙ ``series.map(dict)`` + ``fillna(default)``
    (codes.py:68-69).

    Explicit ``broadcast`` of the mapping table: at scale the fact side never
    shuffles; the map ships to every executor once.
    """
    out = df.join(F.broadcast(map_df), on=key, how="left")
    if default is not None:
        out = out.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(default)))
    return out


def topk_categories(
    df: DataFrame, col: str, k: int, tiebreak_asc: bool = True
) -> DataFrame:
    """k most frequent values of ``col`` with pinned tie-break.

    ≙ ``value_counts().index[:10]`` (codes.py:168).  pandas tie order at the
    k-boundary is positional/undefined; the engine pins ``asc(col)`` so the
    result is a deterministic relation (SURVEY §2.6).
    """
    order = [F.desc("count"), F.asc(col) if tiebreak_asc else F.desc(col)]
    return df.groupBy(col).count().orderBy(*order).limit(k)


def join_semi_topk(df: DataFrame, col: str, k: int) -> DataFrame:
    """Filter rows to the top-k categories of ``col``.

    ≙ ``df[df[col].isin(top_10)]`` (codes.py:168-169), expressed as a
    left-semi join against the top-k relation — the top-k side is tiny, so
    Catalyst broadcasts it; no second scan of the fact table on the driver.
    """
    topk = topk_categories(df, col, k).select(col)
    return df.join(F.broadcast(topk), on=col, how="left_semi")


def sort_rows(df: DataFrame, cols: Sequence[str], ascending: bool = True) -> DataFrame:
    """Global multi-key sort, nulls last ≙ ``sort_values`` (codes.py:55).

    pandas puts NaN last for both directions; Spark defaults differ by
    direction, so null placement is pinned explicitly.
    """
    keys = [
        F.asc_nulls_last(c) if ascending else F.desc_nulls_last(c) for c in cols
    ]
    return df.orderBy(*keys)


def limit_head(df: DataFrame, n: int, order: Sequence[str] | None = None) -> DataFrame:
    """≙ ``df.head(n)`` (notebook cell 1).

    Spark has no row order, so a deterministic head requires an explicit
    ``order``; without it this is just ``limit`` (any-n-rows).
    """
    return (sort_rows(df, order) if order else df).limit(n)


def join_asof(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right_ts <= left_ts`` (``direction="backward"``, default) or the
    earliest with ``right_ts >= left_ts`` (``"forward"``) within the same key
    group (SURVEY §2.3 extension — the natural generalization of the
    reference's lag features, codes.py:56-59, to irregular series).

    Spark-first merge strategy: tag both sides, union, ONE shuffle on the key,
    then ``last(value, ignorenulls=True)`` over an unbounded-preceding row
    window ordered by ``(ts, side)`` — right rows sort before left rows at
    equal timestamps, so an exactly-simultaneous right row matches (``<=``
    semantics, same as DuckDB/pandas ``merge_asof``).  No per-row probe, no
    range join, no broadcast needed: scales to 100 TB as a single sort-merge
    pass per key partition.

    ``value_cols`` must not collide with left columns.  If the right side can
    hold several rows per ``(keys, right_ts)``, pre-aggregate it first — the
    survivor among exact ties is otherwise unspecified (same caveat as
    DuckDB's ASOF JOIN).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    backward = direction == "backward"
    # backward: right rows sort BEFORE left at equal ts and `last` looks back;
    # forward: right rows sort AFTER left at equal ts and `first` looks ahead —
    # either way an exactly-simultaneous right row matches (<= / >=).
    l_tagged = left.withColumn("__side", F.lit(1 if backward else 0))
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(left_ts),
        *[F.col(c) for c in value_cols],
    ).withColumn("__side", F.lit(0 if backward else 1))
    merged = r_tagged.unionByName(l_tagged, allowMissingColumns=True)
    base = Window.partitionBy(*keys).orderBy(
        F.col(left_ts).asc(), F.col("__side").asc()
    )
    if backward:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    for c in value_cols:
        merged = merged.withColumn(c, pick(c))
    return merged.filter(F.col("__side") == (1 if backward else 0)).drop("__side")


def join_range(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_expr: str,
) -> DataFrame:
    """Equi+range join: right rows with ``left_ts - window < right_ts <=
    left_ts`` for the same key (SURVEY §2.3 extension).

    The equi component (``key``) drives a sort-merge/shuffled-hash join —
    Catalyst plans the range predicate as a post-join filter within each key
    group, so there is no cross product across keys.  ``window_expr`` is a SQL
    interval literal body, e.g. ``"INTERVAL 1 HOUR"``.
    """
    lo = F.col(f"__l.{left_ts}") - F.expr(window_expr)
    cond = (
        (F.col(f"__l.{key}") == F.col(f"__r.{key}"))
        & (F.col(f"__r.{right_ts}") > lo)
        & (F.col(f"__r.{right_ts}") <= F.col(f"__l.{left_ts}"))
    )
    return left.alias("__l").join(right.alias("__r"), on=cond, how="left")


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bag union by column name (engine extension, SURVEY §2.7)."""
    return a.unionByName(b)


def intersect_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """Set intersection (engine extension, SURVEY §2.7)."""
    return a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame, keep_duplicates: bool = True) -> DataFrame:
    """Bag/set difference (engine extension, SURVEY §2.7)."""
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)


def join_salted(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: left keys get a salt in [0, salt); the right
    side replicates salt× and joins on (key, salt).

    Result is identical to ``left.join(right, key, how)`` for the SUPPORTED
    join types — inner / left / left_semi / left_anti (and Spark's bare
    ``semi`` / ``anti`` aliases, which are left-driven too), where every
    output row is driven by a left row carrying exactly one salt value.  Right/full
    outer are rejected: an unmatched right row would surface once per salt
    replica (salt× duplicates); salt the other side instead.  The salt only
    spreads a hot key across ``salt`` shuffle partitions.  AQE's skew-join
    split covers most cases at runtime; explicit salting remains the tool
    when a single key exceeds what one task can hold (SURVEY §4.2) or the
    join sits where AQE cannot re-plan (e.g. inside streaming).  Cost: the
    right side shuffles salt× its size — use only when right ≪ left and the
    skew is real.
    """
    supported = {"inner", "left", "leftouter", "left_outer", "left_semi",
                 "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in supported:
        raise ValueError(
            f"join_salted supports {sorted(supported)} joins, not {how!r}: "
            "unmatched right rows would be replicated salt times under "
            "right/full outer"
        )
    l_salted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r_replicated = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<bigint>"))
    )
    return l_salted.join(r_replicated, on=[key, "__salt"], how=how).drop("__salt")


def pivot_wide(
    df: DataFrame,
    key: str,
    pivot_col: str,
    pivot_values: Sequence,
    agg_col: str,
) -> DataFrame:
    """Long → wide: one column per pinned ``pivot_values`` entry, cells =
    sum(agg_col).  Values are pinned explicitly — at scale the
    discover-distinct-values pass ``pivot()`` otherwise runs is a full extra
    scan, and an unpinned schema breaks downstream contracts.
    ≙ the 2×2 ``confusion_matrix`` layout (codes.py:296, SURVEY §2.10)."""
    return (
        df.groupBy(key)
        .pivot(pivot_col, list(pivot_values))
        .sum(agg_col)
        .na.fill(0)
    )


def unpivot_long(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long (melt): one row per (id, value column).  Spark-native
    ``unpivot`` — a zero-shuffle projection+explode."""
    return df.unpivot(list(ids), list(value_cols), var_name, value_name)
