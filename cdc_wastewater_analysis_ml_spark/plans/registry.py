"""Named-query registry: one entry per implemented operator (SURVEY §2).

Single source of truth consumed by ``__spark_entry__.py``:
- ``QUERIES[name]``   : ``(spark, sf_dir) -> DataFrame`` — PySpark implementation
  built from the engine's operator library.
- ``ORACLES[name]``   : equivalent ANSI SQL for DuckDB over the same parquet
  fixtures (tables pre-registered as views by the driver).  ``None`` for
  non-SQL-expressible ops (rows-only check).

Conventions for oracle parity (driver compares row-count + schema +
order-insensitive value hash):
- every computed column is aliased identically on both sides;
- floating-point outputs of aggregations are ``round(x, 6)`` on both sides
  (sums of many doubles: ``round(x, 2)``) so engine-order-dependent last-ulp
  differences cannot flip the hash;
- every op with a tie (mode, top-k) pins an explicit deterministic tiebreak;
- the fixtures contain no nulls, so null-path ops derive a deterministic
  nullable column ``v`` (null where ``event_id % 10 = 0``) on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalars as S
from ..operators import aggregates as A
from ..operators import relational as R
from ..operators import windows as W
from ..sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str | None] = {}


def register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        ORACLES[name] = oracle
        return fn

    return deco


def _events_with_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + deterministic nullable measure ``v`` (null-path substrate)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "v",
        F.when(F.col("event_id") % 10 == 0, F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )


_V_CTE = (
    "WITH t AS (SELECT *, CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS v"
    " FROM events) "
)


# ---------------------------------------------------------------------------
# §2.1 scans + flagship
# ---------------------------------------------------------------------------


@register(
    "flagship_weekly_detection_rate",
    """
    SELECT date_trunc('week', ts) AS week_start,
           count(*) AS total,
           100.0 * avg(CASE WHEN value > 50 THEN 1 ELSE 0 END)
               AS detection_rate
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: weekly detection-rate trend (scan → derive_binary_label →
    event-time bucket → fused conditional-rate agg → sort).

    Spark analogue of the reference's monthly positivity query
    (codes.py:141-147) + weekly resample (codes.py:119) on the ``events``
    fixture.  Single shuffle: partial aggregates combine map-side.
    """
    ev = load_table(spark, sf_dir, "events")
    labeled = ev.withColumn("influenza_a_detected", S.derive_binary_label("value", 50.0))
    w = F.window(F.col("ts"), "1 week", "1 week", "4 days")
    return (
        labeled.groupBy(w.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            (F.lit(100.0) * F.avg("influenza_a_detected")).alias(
                "detection_rate"
            ),
        )
        .select(F.col("w.start").alias("week_start"), "total", "detection_rate")
        .orderBy("week_start")
    )


# ---------------------------------------------------------------------------
# §2.2 projections / filters / column transforms
# ---------------------------------------------------------------------------


@register(
    "project_columns",
    "SELECT c_custkey, c_name, c_acctbal FROM customer",
)
def q_project(spark, sf_dir):
    """≙ df_model[features] (codes.py:196); pruning reaches the parquet scan."""
    return R.project_columns(
        load_table(spark, sf_dir, "customer"), ["c_custkey", "c_name", "c_acctbal"]
    )


@register(
    "drop_columns",
    "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,"
    " l_extendedprice, l_discount FROM lineitem",
)
def q_drop(spark, sf_dir):
    """≙ df.drop(columns=[...], errors='ignore') (codes.py:72-79)."""
    return R.drop_columns(
        load_table(spark, sf_dir, "lineitem"),
        ["l_tax", "l_returnflag", "l_linestatus", "l_shipdate", "no_such_column"],
    )


@register(
    "filter_eq",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem"
    " WHERE l_returnflag = 'R'",
)
def q_filter_eq(spark, sf_dir):
    """≙ df[df[c] == v] (codes.py:144); predicate pushes to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return R.project_columns(
        R.filter_eq(li, "l_returnflag", "R"),
        ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
    )


@register(
    "filter_isin",
    "SELECT o_orderkey, o_orderpriority FROM orders"
    " WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')",
)
def q_filter_isin(spark, sf_dir):
    """≙ df[df[c].isin(lst)] (codes.py:169)."""
    o = load_table(spark, sf_dir, "orders")
    return R.project_columns(
        R.filter_isin(o, "o_orderpriority", ["1-URGENT", "2-HIGH"]),
        ["o_orderkey", "o_orderpriority"],
    )


@register(
    "filter_notnull",
    _V_CTE + "SELECT event_id, v FROM t WHERE v IS NOT NULL",
)
def q_filter_notnull(spark, sf_dir):
    """≙ df.dropna(subset=[...]) (codes.py:117,141,195)."""
    return R.project_columns(
        R.filter_notnull(_events_with_v(spark, sf_dir), ["v"]), ["event_id", "v"]
    )


@register(
    "derive_binary_label",
    _V_CTE
    + "SELECT event_id, CASE WHEN v > 50 THEN 1 ELSE 0 END AS influenza_a_detected"
    " FROM t",
)
def q_label(spark, sf_dir):
    """≙ (col > 0).astype(int) with NaN→0 (codes.py:50)."""
    return _events_with_v(spark, sf_dir).select(
        "event_id", S.derive_binary_label("v", 50.0).alias("influenza_a_detected")
    )


@register(
    "null_indicator",
    _V_CTE + "SELECT event_id, CAST(v IS NULL AS INTEGER) AS v_missing FROM t",
)
def q_null_indicator(spark, sf_dir):
    """≙ isnull().astype(int) (codes.py:34)."""
    return _events_with_v(spark, sf_dir).select(
        "event_id", S.null_indicator("v").alias("v_missing")
    )


@register(
    "dedup_rows",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_dedup_rows(spark, sf_dir):
    """≙ df.drop_duplicates() (codes.py:96) on a projected relation."""
    li = load_table(spark, sf_dir, "lineitem")
    return R.dedup_rows(R.project_columns(li, ["l_returnflag", "l_linestatus"]))


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "join_left_equi",
    """
    SELECT c.c_mktsegment AS segment,
           count(*) AS cnt,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q_join_left(spark, sf_dir):
    """≙ pd.merge(a, b, how='left') (codes.py:145); dim side broadcasts."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    joined = R.join_left_equi(o, F.broadcast(c), "o_custkey")
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@register(
    "join_broadcast_map",
    _V_CTE
    + """
    , lab AS (SELECT event_id, user_id,
                     CASE WHEN v > 50 THEN 1 ELSE 0 END AS label FROM t),
      m AS (SELECT user_id, avg(label) AS user_mean FROM lab GROUP BY user_id)
    SELECT lab.event_id,
           round(coalesce(m.user_mean, 0.5), 6) AS user_mean
    FROM lab LEFT JOIN m USING (user_id)
    """,
)
def q_join_broadcast_map(spark, sf_dir):
    """Target encoding ≙ series.map(group-mean dict) + fillna(0.5)
    (codes.py:67-69): fit the key→mean map, broadcast it back onto the facts.
    """
    lab = _events_with_v(spark, sf_dir).select(
        "event_id", "user_id", S.derive_binary_label("v", 50.0).alias("label")
    )
    m = A.agg_mean_by_key(lab, "user_id", "label", out="user_mean")
    enriched = R.join_broadcast_map(lab, m, "user_id", "user_mean", default=0.5)
    return enriched.select("event_id", F.round("user_mean", 6).alias("user_mean"))


@register(
    "join_semi_topk",
    """
    WITH topk AS (
        SELECT user_id FROM (
            SELECT user_id, count(*) AS cnt FROM events
            GROUP BY user_id ORDER BY cnt DESC, user_id ASC LIMIT 10)
    )
    SELECT e.event_id, e.user_id FROM events e
    WHERE e.user_id IN (SELECT user_id FROM topk)
    """,
)
def q_join_semi_topk(spark, sf_dir):
    """≙ isin(top_10_categories) (codes.py:168-169) as a broadcast semi-join."""
    ev = load_table(spark, sf_dir, "events")
    return R.project_columns(
        R.join_semi_topk(ev, "user_id", 10), ["event_id", "user_id"]
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_median_global",
    "SELECT round(median(l_quantity), 6) AS median_qty FROM lineitem",
)
def q_median(spark, sf_dir):
    """Exact interpolated median ≙ df[c].median() (codes.py:35)."""
    out = A.agg_median_global(
        load_table(spark, sf_dir, "lineitem"), "l_quantity", out="median_qty"
    )
    return out.select(F.round("median_qty", 6).alias("median_qty"))


@register(
    "agg_mode_global",
    """
    SELECT o_orderpriority AS mode FROM (
        SELECT o_orderpriority, count(*) AS c FROM orders
        GROUP BY o_orderpriority ORDER BY c DESC, o_orderpriority ASC LIMIT 1)
    """,
)
def q_mode(spark, sf_dir):
    """Deterministic smallest-value-tiebreak mode ≙ mode()[0] (codes.py:83)."""
    return A.agg_mode_global(load_table(spark, sf_dir, "orders"), "o_orderpriority")


@register(
    "agg_mean_by_key",
    "SELECT event_type, round(avg(value), 6) AS mean_value FROM events"
    " GROUP BY event_type",
)
def q_mean_by_key(spark, sf_dir):
    """≙ groupby(k)[c].mean() (codes.py:67)."""
    out = A.agg_mean_by_key(
        load_table(spark, sf_dir, "events"), "event_type", "value", out="mean_value"
    )
    return out.select("event_type", F.round("mean_value", 6).alias("mean_value"))


@register(
    "agg_count_by_key",
    "SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id",
)
def q_count_by_key(spark, sf_dir):
    """≙ groupby(k).size() (codes.py:143-144)."""
    return A.agg_count_by_key(load_table(spark, sf_dir, "events"), "user_id", out="cnt")


@register(
    "agg_value_counts",
    "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type"
    " ORDER BY cnt DESC, event_type ASC",
)
def q_value_counts(spark, sf_dir):
    """≙ value_counts() (codes.py:168), descending with pinned tiebreak."""
    return A.agg_value_counts(
        load_table(spark, sf_dir, "events"), "event_type", out="cnt"
    )


@register(
    "agg_conditional_rate",
    """
    SELECT event_type,
           count(*) AS total,
           100.0 * avg(CASE WHEN value > 50 THEN 1 ELSE 0 END)
               AS detection_rate
    FROM events GROUP BY event_type
    """,
)
def q_conditional_rate(spark, sf_dir):
    """Fused single-pass per-group rate (codes.py:143-147; SURVEY §2.4).

    RAW quotient publication (r12, the quality_linear_score rule):
    ``100.0 * avg(0/1)`` is one int-quotient division plus one
    deterministic IEEE multiply, mirrored op-for-op in the oracle —
    bit-identical cross-engine, so ``round(·, 6)`` only ADDED the
    .5-at-the-7th-digit boundary class."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "flag", S.derive_binary_label("value", 50.0)
    )
    out = A.agg_conditional_rate(ev, "event_type", "flag")
    return out.select("event_type", "total", "detection_rate")


@register(
    "agg_conditional_rate_joined",
    """
    WITH lab AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
                        CASE WHEN value > 50 THEN 1 ELSE 0 END AS flag
                 FROM events),
         total AS (SELECT day, count(*) AS total_rows FROM lab GROUP BY day),
         det AS (SELECT day, count(*) AS detected_rows FROM lab
                 WHERE flag = 1 GROUP BY day)
    SELECT t.day, t.total_rows,
           coalesce(d.detected_rows, 0) AS detected_rows,
           100.0 * coalesce(d.detected_rows, 0) / t.total_rows
               AS detection_rate
    FROM total t LEFT JOIN det d USING (day)
    """,
)
def q_conditional_rate_joined(spark, sf_dir):
    """Literal reference plan: two grouped counts → left join → coalesce →
    rate (codes.py:143-147).  RAW quotient publication (r12): the
    left-associative ``100.0 * detected / total`` is mirrored op-for-op in
    the oracle — ``100.0 * int`` is exact, the division is the single
    divergence-free IEEE op."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").cast("string").alias("day"),
        S.derive_binary_label("value", 50.0).alias("flag"),
    )
    out = A.agg_conditional_rate_joined(ev, "day", "flag")
    return out.select("day", "total_rows", "detected_rows", "detection_rate")


@register(
    "agg_mean_resampled",
    "SELECT date_trunc('week', ts) AS week_start, round(avg(value), 6) AS avg_value"
    " FROM events GROUP BY 1",
)
def q_mean_resampled(spark, sf_dir):
    """Weekly event-time mean ≙ resample('W').mean() (codes.py:119), ISO-week
    anchored via window startTime='4 days' (SURVEY §7 hard-part 2)."""
    out = A.agg_mean_resampled(load_table(spark, sf_dir, "events"), "ts", "value")
    return out.select("week_start", F.round("avg_value", 6).alias("avg_value"))


@register(
    "agg_quantiles_by_key",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75
    FROM events GROUP BY event_type
    """,
)
def q_quantiles_by_key(spark, sf_dir):
    """Per-group exact quantiles (violin-plot relation, codes.py:129-133)."""
    out = A.agg_quantiles_by_key(
        load_table(spark, sf_dir, "events"), "event_type", "value"
    )
    return out.select(
        "event_type",
        F.round("p25", 6).alias("p25"),
        F.round("p50", 6).alias("p50"),
        F.round("p75", 6).alias("p75"),
    )


# ---------------------------------------------------------------------------
# §2.5 windows / time series
# ---------------------------------------------------------------------------


@register(
    "window_lag",
    """
    SELECT event_id, user_id,
           lag(value, 1, 0.0) OVER w AS value_lag1,
           lag(value, 2, 0.0) OVER w AS value_lag2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag(spark, sf_dir):
    """Per-key lag1/lag2 with 0-fill ≙ groupby.shift(n).fillna(0)
    (codes.py:55-59); deterministic tiebreak on event_id."""
    ev = load_table(spark, sf_dir, "events")
    out = W.window_lag(
        ev, ["user_id"], ["ts", "event_id"], "value", offsets=(1, 2), default=0.0
    )
    return out.select("event_id", "user_id", "value_lag1", "value_lag2")


@register(
    "window_lead",
    """
    SELECT event_id, user_id,
           lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS value_lead1
    FROM events
    """,
)
def q_window_lead(spark, sf_dir):
    """Forward shift (engine extension, same Window primitive)."""
    ev = load_table(spark, sf_dir, "events")
    out = W.window_lead(ev, ["user_id"], ["ts", "event_id"], "value", 1)
    return out.select("event_id", "user_id", "value_lead1")


@register(
    "window_running_sum",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS running_sum
    FROM events
    """,
)
def q_running_sum(spark, sf_dir):
    """Per-key cumulative sum (engine extension; ROC/PR building block)."""
    ev = load_table(spark, sf_dir, "events")
    out = W.window_running_sum(ev, ["user_id"], ["ts", "event_id"], "value")
    return out.select(
        "event_id", "user_id", F.round("running_sum", 6).alias("running_sum")
    )


@register(
    "window_rolling_mean",
    """
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS value_rollmean4
    FROM events
    """,
)
def q_rolling_mean(spark, sf_dir):
    """Trailing 4-row mean per key (engine extension)."""
    ev = load_table(spark, sf_dir, "events")
    out = W.window_rolling_mean(ev, ["user_id"], ["ts", "event_id"], "value", 4)
    return out.select(
        "event_id", "user_id", F.round("value_rollmean4", 6).alias("value_rollmean4")
    )


# ---------------------------------------------------------------------------
# §2.6 sorts / top-k / limit
# ---------------------------------------------------------------------------


@register(
    "sort_rows_ranked",
    "SELECT event_id, row_number() OVER (ORDER BY user_id, ts, event_id) AS rn"
    " FROM events",
)
def q_sort_ranked(spark, sf_dir):
    """Global multi-key sort made observable via a global row number
    ≙ sort_values (codes.py:55).

    Scale shape: NOT a single-partition window — ranks come from
    :func:`windows.global_row_number` (range-partition + in-partition rank +
    broadcast prefix offsets, the binary_curve pattern), so no task ever
    sorts more than one range partition.
    """
    ev = load_table(spark, sf_dir, "events")
    out = W.global_row_number(ev, ["user_id", "ts", "event_id"], out="rn")
    return out.select("event_id", "rn")


@register(
    "topk_categories",
    """
    SELECT p_brand, cnt FROM (
        SELECT p_brand, count(*) AS cnt FROM part
        GROUP BY p_brand ORDER BY cnt DESC, p_brand ASC LIMIT 10)
    """,
)
def q_topk(spark, sf_dir):
    """k most frequent categories, pinned tiebreak ≙ value_counts().index[:10]
    (codes.py:168)."""
    out = R.topk_categories(load_table(spark, sf_dir, "part"), "p_brand", 10)
    return out.select("p_brand", F.col("count").alias("cnt"))


@register(
    "limit_head",
    "SELECT o_orderkey, o_custkey, o_totalprice FROM orders"
    " ORDER BY o_orderkey LIMIT 5",
)
def q_limit_head(spark, sf_dir):
    """Deterministic head: explicit order + limit ≙ df.head() (notebook)."""
    o = load_table(spark, sf_dir, "orders")
    return R.project_columns(
        R.limit_head(o, 5, order=["o_orderkey"]),
        ["o_orderkey", "o_custkey", "o_totalprice"],
    )


# ---------------------------------------------------------------------------
# §2.7 set operations (engine extensions)
# ---------------------------------------------------------------------------


@register(
    "set_union_all",
    "SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'"
    " UNION ALL "
    "SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'MACHINERY'",
)
def q_union(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return R.union_all(
        R.filter_eq(c, "c_mktsegment", "BUILDING"),
        R.filter_eq(c, "c_mktsegment", "MACHINERY"),
    )


@register(
    "set_intersect",
    "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'"
    " INTERSECT "
    "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'",
)
def q_intersect(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderstatus")
    return R.intersect_rows(
        R.filter_eq(o, "o_orderstatus", "O").select("o_custkey"),
        R.filter_eq(o, "o_orderstatus", "F").select("o_custkey"),
    )


@register(
    "set_except",
    "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders",
)
def q_except(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    return R.except_rows(c, o, keep_duplicates=False)


# ---------------------------------------------------------------------------
# §2.8 scalar functions
# ---------------------------------------------------------------------------


@register(
    "date_parts",
    """
    SELECT o_orderkey,
           CAST(month(o_orderdate) AS INTEGER) AS collection_month,
           CAST(coalesce(week(o_orderdate), -1) AS INTEGER) AS collection_week,
           CAST(isodow(o_orderdate) - 1 AS INTEGER) AS collection_dayofweek
    FROM orders
    """,
)
def q_date_parts(spark, sf_dir):
    """month / ISO week (null→−1) / weekday Monday=0 (codes.py:29-31)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        S.date_month("o_orderdate").alias("collection_month"),
        S.date_isoweek("o_orderdate").alias("collection_week"),
        S.date_weekday("o_orderdate").cast("int").alias("collection_dayofweek"),
    )


@register(
    "math_scalars",
    _V_CTE
    + """
    SELECT event_id,
           round(ln(1 + value), 6) AS log_value,
           round(CASE WHEN v IS NULL THEN NULL ELSE least(v, 100.0) END, 6)
               AS v_clipped,
           round(value * v, 6) AS interaction_vv
    FROM t
    """,
)
def q_math_scalars(spark, sf_dir):
    """log1p (codes.py:46-51), null-preserving clip (codes.py:89-93),
    interaction product (codes.py:108-109)."""
    t = _events_with_v(spark, sf_dir)
    return t.select(
        "event_id",
        F.round(S.log1p_("value"), 6).alias("log_value"),
        F.round(S.clip_upper("v", 100.0), 6).alias("v_clipped"),
        F.round(S.interaction("value", "v"), 6).alias("interaction_vv"),
    )


@register(
    "fill_null_median",
    _V_CTE
    + """
    SELECT event_id,
           round(coalesce(v, (SELECT median(v) FROM t)), 6) AS v_filled
    FROM t
    """,
)
def q_fill_null_median(spark, sf_dir):
    """Median-impute ≙ fillna(df[c].median()) (codes.py:34-36): distributed
    aggregate → driver scalar → literal in the next plan (the reference's own
    two-query structure, SURVEY §3 EP1)."""
    t = _events_with_v(spark, sf_dir)
    med = A.median_scalar(t, "v")
    return t.select(
        "event_id", F.round(S.fill_null("v", med), 6).alias("v_filled")
    )


@register(
    "fill_null_mode",
    """
    WITH t AS (SELECT *, CASE WHEN event_id % 10 = 0 THEN NULL ELSE event_type END
                   AS etype FROM events),
         m AS (SELECT etype AS mode FROM (
                   SELECT etype, count(*) AS c FROM t WHERE etype IS NOT NULL
                   GROUP BY etype ORDER BY c DESC, etype ASC LIMIT 1))
    SELECT event_id, coalesce(etype, (SELECT mode FROM m)) AS etype_filled FROM t
    """,
)
def q_fill_null_mode(spark, sf_dir):
    """Mode-impute with deterministic tiebreak ≙ fillna(mode()[0])
    (codes.py:82-87)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "etype",
        F.when(F.col("event_id") % 10 == 0, F.lit(None).cast("string")).otherwise(
            F.col("event_type")
        ),
    )
    mode = A.mode_scalar(ev, "etype")
    return ev.select(
        "event_id", S.fill_null("etype", mode).alias("etype_filled")
    )


@register(
    "bucketize",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal >= -1000 AND c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal >= 0 AND c_acctbal < 3000 THEN 'low'
                WHEN c_acctbal >= 3000 AND c_acctbal < 7000 THEN 'mid'
                WHEN c_acctbal >= 7000 THEN 'high'
                ELSE NULL END AS acctbal_group
    FROM customer
    """,
)
def q_bucketize(spark, sf_dir):
    """Left-closed labeled binning ≙ pd.cut(..., right=False) (codes.py:61-63)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        S.bucketize(
            "c_acctbal",
            [-1000, 0, 3000, 7000, float("inf")],
            ["negative", "low", "mid", "high"],
        ).alias("acctbal_group"),
    )


@register(
    "ordinal_encode",
    """
    SELECT o_orderkey,
           CASE o_orderpriority
                WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
                WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
                WHEN '5-LOW' THEN 4 ELSE -1 END AS priority_encoded
    FROM orders
    """,
)
def q_ordinal_encode(spark, sf_dir):
    """Fixed-order categorical → code, unknown→−1 ≙ cat.codes (codes.py:99-104)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        S.ordinal_encode(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        ).alias("priority_encoded"),
    )


@register(
    "cast_timestamp",
    """
    SELECT event_id,
           TRY_CAST(concat(CAST(CAST(ts AS DATE) AS VARCHAR), ' 00:00:00')
               AS TIMESTAMP) AS parsed_ts
    FROM events
    """,
)
def q_cast_timestamp(spark, sf_dir):
    """String → timestamp with null-on-failure ≙ pd.to_datetime(errors='coerce')
    (codes.py:28).  Round-trips ts through a string to exercise the parser."""
    ev = load_table(spark, sf_dir, "events")
    s = F.concat(F.col("ts").cast("date").cast("string"), F.lit(" 00:00:00"))
    return ev.select("event_id", S.cast_timestamp(s).alias("parsed_ts"))


@register(
    "dedup_exact_text",
    "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text",
)
def q_dedup_exact_text(spark, sf_dir):
    """Exact content dedup with deterministic survivor (min doc_id) — the
    scale-safe generalization of drop_duplicates (codes.py:96): one shuffle
    on the content key, map-side combinable."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id", "text"
    )


# Parts 2+3 of the registry (metrics + dedup/similarity/text extensions; EP1
# composite + ML queries) live in sibling modules; importing them populates
# QUERIES/ORACLES via @register.
from . import registry_ext  # noqa: E402,F401  (intentional tail import)
from . import registry_ml  # noqa: E402,F401  (intentional tail import)
from . import registry_scale  # noqa: E402,F401  (intentional tail import)
from . import registry_stream  # noqa: E402,F401  (intentional tail import)
from . import registry_corpus  # noqa: E402,F401  (intentional tail import)
from . import registry_stream_ext  # noqa: E402,F401  (intentional tail import)
from . import registry_quality  # noqa: E402,F401  (intentional tail import)
from . import registry_analytic  # noqa: E402,F401  (intentional tail import)
from . import registry_layout  # noqa: E402,F401  (intentional tail import)
from . import registry_lines  # noqa: E402,F401  (intentional tail import)
