"""CDC-style table maintenance: key-based merge/upsert of a delta into a
current snapshot (the batch form of Delta Lake's ``MERGE INTO``).

A curated-corpus store is not write-once: crawls re-fetch pages, dims get
corrections, scores get recomputed.  The maintenance primitive is the
keyed merge — new keys insert, matched keys take the delta's values,
unmatched current rows carry forward — annotated with what happened so
downstream consumers (and audits) can see the churn.

Scale shape: ONE shuffle join on the key; at 100 TB the snapshot is
bucketed/partitioned by the key so the delta (typically ≪ snapshot)
co-locates without reshuffling the store — the same layout argument as
the incremental-dedup store (`operators/dedup.py:dedup_incremental_*`).
The full-outer join is the general form; when deletes are impossible it
degrades to delta ∪ (current ⟕ anti delta), which Catalyst derives from
the same plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    current: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    action_col: str = "action",
) -> DataFrame:
    """Merge ``delta`` into ``current`` by ``key_cols``.

    Output has the union of rows by key: value columns come from the
    delta where the key matches (or is new), else from the current
    snapshot; ``action_col`` records ``'insert'`` (key only in delta),
    ``'update'`` (key in both) or ``'keep'`` (key only in current).
    Both inputs must share the same schema.
    """
    keys = list(key_cols)
    if not keys:
        raise ValueError("merge_upsert needs at least one key column")
    if set(current.columns) != set(delta.columns):
        raise ValueError(
            f"schema mismatch: {sorted(current.columns)} vs {sorted(delta.columns)}"
        )
    # The presence markers below are plain columns on the join inputs; an
    # input that already carries one would be silently overwritten and
    # corrupt side selection (r6 ADVICE) — same collision class as
    # action_col, same loud failure.
    for reserved in (action_col, "__in_cur", "__in_dlt"):
        if reserved in current.columns:
            raise ValueError(
                f"column {reserved!r} collides with an input column"
            )
    value_cols = [c for c in current.columns if c not in keys]
    cur = current.alias("cur")
    dlt = delta.alias("dlt")
    cond = [F.col(f"cur.{k}").eqNullSafe(F.col(f"dlt.{k}")) for k in keys]
    # presence markers survive the outer join even when every value column
    # is legitimately NULL on one side
    joined = cur.withColumn("__in_cur", F.lit(True)).join(
        dlt.withColumn("__in_dlt", F.lit(True)), cond, "full_outer"
    )
    in_cur = F.col("__in_cur").isNotNull()
    in_dlt = F.col("__in_dlt").isNotNull()
    out_cols = [
        F.coalesce(F.col(f"dlt.{k}"), F.col(f"cur.{k}")).alias(k) for k in keys
    ]
    out_cols += [
        F.when(in_dlt, F.col(f"dlt.{c}")).otherwise(F.col(f"cur.{c}")).alias(c)
        for c in value_cols
    ]
    out_cols.append(
        F.when(in_cur & in_dlt, F.lit("update"))
        .when(in_dlt, F.lit("insert"))
        .otherwise(F.lit("keep"))
        .alias(action_col)
    )
    return joined.select(*out_cols)
