"""Single-pass table profiling: per-column null counts, exact distinct
counts, and min/max — the data-quality report a pipeline runs before and
after every major transform (the generalization of the reference's
defensive range checks, codes.py:89-93, to ANY table).

Scale shape: ONE aggregate over the table computes every statistic (no
per-column scans — profiling a 100-column 100 TB table must not read it
100 times); the result is a 1-row relation reshaped into one row per
column with a literal explode, which is free.  Multiple exact
``count(distinct …)`` in one aggregate plan via Catalyst's Expand (a
#cols× row multiplier inside the scan stage — the price of exactness; at
100 TB swap in ``approx_count_distinct``, same plan otherwise — the
sketch family in `operators/aggregates.py` is the precedent).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
    round_decimals: int = 6,
) -> DataFrame:
    """One row per profiled column:
    ``(column, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str)`` — numeric min/max floor-rounded to ``round_decimals``
    (house rule), string min/max lexicographic; the inapplicable pair is
    NULL.  Numeric and string stats stay in separate typed columns so the
    output schema is engine-portable (stringified doubles are NOT — Spark
    and SQL engines format exponents differently).
    """
    cols = list(numeric_cols) + list(string_cols)
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    scale = 10**round_decimals
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs.append(F.count(c).cast("bigint").alias(f"__cnt_{c}"))
        aggs.append(F.countDistinct(c).cast("bigint").alias(f"__nd_{c}"))
    for c in numeric_cols:
        aggs.append(
            (F.floor(F.min(c).cast("double") * scale + F.lit(0.5)) / scale)
            .alias(f"__min_{c}")
        )
        aggs.append(
            (F.floor(F.max(c).cast("double") * scale + F.lit(0.5)) / scale)
            .alias(f"__max_{c}")
        )
    for c in string_cols:
        aggs.append(F.min(c).alias(f"__smin_{c}"))
        aggs.append(F.max(c).alias(f"__smax_{c}"))
    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    rows = []
    for c in cols:
        is_num = c in set(numeric_cols)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__cnt_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                (F.col(f"__min_{c}") if is_num else null_d).alias("min_num"),
                (F.col(f"__max_{c}") if is_num else null_d).alias("max_num"),
                (null_s if is_num else F.col(f"__smin_{c}")).alias("min_str"),
                (null_s if is_num else F.col(f"__smax_{c}")).alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
