"""Scalar column functions with pinned null/edge semantics (SURVEY §2.8).

Each function returns a Column expression built exclusively from built-in
``pyspark.sql.functions`` — whole-stage-codegen eligible, no Python on the hot
path.  The docstrings pin the divergence-prone semantics against the reference
(pandas/numpy) behavior with ``codes.py:<line>`` citations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def cast_timestamp(c: Column | str, fmt: str | None = None) -> Column:
    """Parse string → timestamp; unparsable → null.

    ≙ ``pd.to_datetime(col, errors='coerce')`` (codes.py:28).  Uses
    ``try_to_timestamp``: Spark 4 runs ANSI mode by default, where plain
    ``to_timestamp`` *throws* on malformed input instead of yielding null.
    """
    c = _col(c)
    return F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)


def date_month(c: Column | str) -> Column:
    """Month 1-12 ≙ ``dt.month`` (codes.py:29)."""
    return F.month(_col(c))


def date_isoweek(c: Column | str, null_value: int = -1) -> Column:
    """ISO-8601 week of year; null date → ``null_value``.

    ≙ ``dt.isocalendar().week.fillna(-1).astype(int)`` (codes.py:30).
    Spark ``weekofyear`` is ISO — matches pandas ``isocalendar``.
    """
    return F.coalesce(F.weekofyear(_col(c)), F.lit(null_value)).cast("int")


def date_weekday(c: Column | str) -> Column:
    """Day of week, Monday=0 … Sunday=6 ≙ ``dt.dayofweek`` (codes.py:31).

    Uses ``F.weekday`` (Monday=0), NOT ``F.dayofweek`` (Sunday=1).
    """
    return F.weekday(_col(c))


def derive_binary_label(c: Column | str, threshold: float = 0.0) -> Column:
    """``(col > threshold)`` as 0/1 with null → 0.

    ≙ ``(df[c] > 0).astype(int)`` (codes.py:50): pandas ``NaN > 0`` is False
    → 0.  A bare Spark ``(col > 0).cast("int")`` would yield **null** for null
    input; the ``when/otherwise`` form pins the pandas semantics.
    """
    return F.when(_col(c) > F.lit(threshold), F.lit(1)).otherwise(F.lit(0))


def null_indicator(c: Column | str) -> Column:
    """1 if null else 0 ≙ ``isnull().astype(int)`` (codes.py:34)."""
    return _col(c).isNull().cast("int")


def log1p_(c: Column | str) -> Column:
    """ln(1+x) ≙ ``np.log1p`` (codes.py:46,47,51).

    Edge divergence (documented, not hit by real data which is ≥ 0): for
    x ≤ −1 numpy returns −inf/NaN while Spark returns null.
    """
    return F.log1p(_col(c))


def clip_upper(c: Column | str, hi: float) -> Column:
    """Cap values at ``hi``, preserving nulls.

    ≙ ``np.clip(c, None, 100)`` (codes.py:90).  Bare ``least(col, lit)``
    would turn null → ``hi`` (Spark ``least`` skips nulls), so nulls are
    routed around the clamp explicitly.
    """
    c = _col(c)
    return F.when(c.isNotNull(), F.least(c, F.lit(hi)))


def fill_null(c: Column | str, value) -> Column:
    """``fillna(value)`` (codes.py:36,39,58,59,69,83-87,146)."""
    return F.coalesce(_col(c), F.lit(value))


def interaction(a: Column | str, b: Column | str) -> Column:
    """Elementwise product feature ≙ ``a * b`` (codes.py:108-109)."""
    return _col(a) * _col(b)


def bucketize(
    c: Column | str,
    edges: Sequence[float],
    labels: Sequence[str],
    right_closed: bool = False,
) -> Column:
    """Bin a numeric column into ordered labeled buckets.

    ≙ ``pd.cut(c, bins=edges, labels=labels, right=False)`` (codes.py:61-63):
    left-closed ``[lo, hi)`` intervals; values outside the edges and nulls →
    null.  Implemented as a chained CASE expression (exact label and edge
    control — ``ml.feature.Bucketizer`` would also work but yields indices).
    ``len(edges) == len(labels) + 1``; an edge of ``float('inf')`` is allowed.
    """
    if len(edges) != len(labels) + 1:
        raise ValueError("need len(edges) == len(labels) + 1")
    c = _col(c)
    expr = None
    for i, lab in enumerate(labels):
        lo, hi = float(edges[i]), float(edges[i + 1])
        if right_closed:
            cond = (c > F.lit(lo)) & (c <= F.lit(hi))
        else:
            cond = (c >= F.lit(lo)) & (c < F.lit(hi))
        expr = F.when(cond, F.lit(lab)) if expr is None else expr.when(cond, F.lit(lab))
    return expr.otherwise(F.lit(None).cast("string"))


def ordinal_encode(c: Column | str, order: Sequence[str], missing: int = -1) -> Column:
    """Ordered category → code 0..k-1; null/unknown → ``missing``.

    ≙ ``astype(CategoricalDtype(categories, ordered=True)).cat.codes``
    (codes.py:99-104).  A pinned CASE map — NOT MLlib ``StringIndexer``,
    whose frequency ordering is the wrong tool for a *fixed* order.
    """
    c = _col(c)
    expr = None
    for i, lab in enumerate(order):
        expr = F.when(c == F.lit(lab), F.lit(i)) if expr is None else expr.when(
            c == F.lit(lab), F.lit(i)
        )
    return expr.otherwise(F.lit(missing)).cast("int")


def json_get_int(c: Column | str, field: str) -> Column:
    """Extract an integer field from a JSON string column (semi-structured
    path: SURVEY §1.3 notes map/struct are unexercised by the reference but
    free in Spark; ``get_json_object`` keeps extraction JVM-side and
    Catalyst-prunable — at scale prefer parsing ONCE via ``from_json`` with
    an explicit schema when several fields are read)."""
    return F.get_json_object(_col(c), f"$.{field}").cast("int")
