"""Registry part 10 (r8): data-layout queries.

Driver gate for ``operators/layout.py`` — the Z-order clustering key that
``cluster_write`` uses to co-locate rows for multi-dimensional scan pruning
(the Delta OPTIMIZE ZORDER BY / Iceberg sort-order layout, expressed as
plain Catalyst integer arithmetic over vanilla parquet).  The write/prune
halves are exercised by ``tests/test_layout.py`` (file-manifest pruning
ratios + PushedFilters plan audit); the KEY computation — the only
value-producing part — is hash-gated here.

Oracle notes: the bucket math is IEEE-double-order-pinned (subtract,
multiply by the cell count, divide by the span — identical term order both
sides, so the floor sees bit-identical doubles); the bit interleave is pure
integer shift/mask, generated from the same (bit, column) → position map as
the Catalyst expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import layout as L
from ..sources import load_table
from .registry import register

_ZBITS = 8
_ZCOLS = ("l_extendedprice", "l_quantity")


def _bucket_sql(col: str, lo: str, hi: str, cells: int) -> str:
    """SQL mirror of layout._bucket (same operation order; lineitem has no
    nulls, so the operator's null→0 coalesce is vacuous here, and the
    greatest(…, 0) lower clamp — which guards caller-supplied ranges
    against out-of-domain values — is vacuous under the global min but
    mirrored term for term anyway)."""
    return (
        f"CASE WHEN ({hi} - {lo}) <= 0 THEN 0 "
        f"ELSE least(greatest(CAST(floor((CAST({col} AS DOUBLE) - {lo}) * "
        f"{float(cells)} / ({hi} - {lo})) AS BIGINT), 0), {cells - 1}) END"
    )


def _interleave_sql(bucket_names: list[str], bits: int) -> str:
    """SQL mirror of layout._interleave: bit j of bucket i → position
    j*k + (k-1-i)."""
    k = len(bucket_names)
    terms = [
        f"((({b} >> {j}) & 1) << {j * k + (k - 1 - i)})"
        for i, b in enumerate(bucket_names)
        for j in range(bits)
    ]
    return " | ".join(terms)


_ZORDER_SQL = f"""
WITH r AS (
  SELECT min(CAST(l_extendedprice AS DOUBLE)) AS pmin,
         max(CAST(l_extendedprice AS DOUBLE)) AS pmax,
         min(CAST(l_quantity AS DOUBLE)) AS qmin,
         max(CAST(l_quantity AS DOUBLE)) AS qmax
  FROM lineitem
), b AS (
  SELECT l_orderkey, l_linenumber,
         {_bucket_sql("l_extendedprice", "pmin", "pmax", 1 << _ZBITS)} AS b0,
         {_bucket_sql("l_quantity", "qmin", "qmax", 1 << _ZBITS)} AS b1
  FROM lineitem, r
)
SELECT l_orderkey, l_linenumber,
       CAST({_interleave_sql(["b0", "b1"], _ZBITS)} AS BIGINT) AS zkey
FROM b
"""


@register("layout_zorder_key", _ZORDER_SQL)
def q_layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering key over (price, quantity): each dimension
    width-bucketed into 256 cells over its global range (computed by the
    operator's own broadcast-agg path — the lazy, single-extra-tiny-agg
    shape), bits Morton-interleaved into one LONG.  Rows adjacent in zkey
    are near in BOTH dimensions, which is exactly what makes the clustered
    write's per-file min/max stats selective on either column at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    keyed = L.zorder_key(li, list(_ZCOLS), bits=_ZBITS, key_col="zkey")
    return keyed.select("l_orderkey", "l_linenumber", "zkey")
