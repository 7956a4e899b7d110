"""Registry part 4: scale-path extensions — as-of/range joins, grouping-set
aggregates, embedding near-dup, IVF similarity, multimodal plumbing.

SURVEY §2.3 (join backlog), §2.4 (free generalizations), §7 phase 4.  Every
oracle follows the house rules: identical column aliases, ``round(x, 6)`` on
float outputs computed on BOTH sides, explicit casts so DuckDB's wider
integer types (HUGEINT sums) land on the same dtypes as Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import aggregates as A
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import relational as R
from ..operators import similarity as SIM
from ..sources import fan_out, load_table
from .registry import register
from .registry_ext import _AUG_OFFSET, _NOVEL_OFFSET, _cos_sql, _rhp_sig_sql

# ---------------------------------------------------------------------------
# Temporal joins (SURVEY §2.3 extension backlog)
# ---------------------------------------------------------------------------


@register(
    "join_asof",
    """
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         r AS (SELECT user_id, ts, round(max(value), 6) AS purchase_value
               FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT l.event_id, l.user_id, r.purchase_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each click gets the latest prior-or-simultaneous
    purchase value for the same user (generalizes codes.py:56-59 lags to
    irregular series).  Single shuffle on user_id (merge strategy)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 6).alias("purchase_value"))
    )
    return R.join_asof(
        clicks, purchases, ["user_id"], "ts", "ts", ["purchase_value"]
    ).select("event_id", "user_id", "purchase_value")


@register(
    "join_range",
    """
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         r AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'view')
    SELECT l.event_id,
           count(r.event_id) AS views_1h,
           round(coalesce(sum(r.value), 0), 6) AS view_value_1h
    FROM l LEFT JOIN r
      ON l.user_id = r.user_id
     AND r.ts > l.ts - INTERVAL 1 HOUR AND r.ts <= l.ts
    GROUP BY l.event_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi+range join: per click, count/sum same-user views in the trailing
    hour.  The user_id equi key keeps the join keyed (no cross product);
    range predicate evaluates inside each key group."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = R.join_range(clicks, views, "user_id", "ts", "ts", "INTERVAL 1 HOUR")
    return joined.groupBy(F.col("__l.event_id").alias("event_id")).agg(
        F.count(F.col("__r.event_id")).alias("views_1h"),
        F.round(F.coalesce(F.sum(F.col("__r.value")), F.lit(0.0)), 6).alias(
            "view_value_1h"
        ),
    )


# ---------------------------------------------------------------------------
# Grouping-set aggregates (SURVEY §2.4 free generalizations)
# ---------------------------------------------------------------------------

_ROLLUP_SQL = """
    WITH t AS (SELECT event_type, CAST(month(ts) AS INTEGER) AS month, value
               FROM events)
    SELECT event_type, month,
           CAST(grouping_id(event_type, month) AS INTEGER) AS gid,
           count(*) AS n, round(sum(value), 6) AS sum_value
    FROM t GROUP BY {sets} (event_type, month)
"""


def _grouped_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_type", F.month("ts").alias("month"), "value"
    )


@register("agg_rollup", _ROLLUP_SQL.format(sets="ROLLUP"))
def q_agg_rollup(spark, sf_dir):
    """Hierarchical subtotals (type, month) → (type) → grand total; one
    shuffle, grouping sets expanded map-side."""
    return A.agg_rollup(_grouped_events(spark, sf_dir), ["event_type", "month"], "value")


@register("agg_cube", _ROLLUP_SQL.format(sets="CUBE"))
def q_agg_cube(spark, sf_dir):
    """All 2^k grouping combinations of (type, month)."""
    return A.agg_cube(_grouped_events(spark, sf_dir), ["event_type", "month"], "value")


@register(
    "agg_distinct_count",
    """
    SELECT event_type, count(DISTINCT user_id) AS distinct_n
    FROM events GROUP BY event_type
    """,
)
def q_agg_distinct_count(spark, sf_dir):
    """Exact per-type distinct users (SURVEY §2.4)."""
    ev = load_table(spark, sf_dir, "events")
    return A.agg_distinct_count_by_key(ev, "event_type", "user_id")


@register(
    "agg_approx_distinct",
    """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_n,
           TRUE AS within_tol
    FROM events GROUP BY event_type
    """,
)
def q_agg_approx_distinct(spark, sf_dir):
    """HLL++ distinct estimate, ORACLE-GATED (r11, VERDICT r10 task 5): the
    sketch value itself is implementation-defined (no engine can reproduce
    another's HLL registers), so the published relation carries the exact
    per-key cardinality plus ``within_tol`` — the sketch's own accuracy
    contract (|approx − exact| ≤ 3·rsd·exact, a 3σ bound on the rsd=0.05
    standard error) evaluated Spark-side against the sketch.  The oracle
    computes the exact column and asserts the boolean TRUE, so an HLL
    estimate drifting out of tolerance flips the value hash instead of
    hiding behind a rows-only check.  At 100 TB you run only the sketch
    half; this query is the verification harness that certifies it."""
    ev = load_table(spark, sf_dir, "events")
    # One rsd constant feeds both the sketch and its 3-sigma gate (r11
    # review): restating the operator default inline would silently detach
    # the tolerance from the sketch if the rsd is ever tuned.
    rsd = 0.05
    approx = A.agg_approx_distinct_by_key(ev, "event_type", "user_id", rsd=rsd)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_n")
    )
    return (
        exact.join(approx, "event_type")
        .select(
            "event_type",
            "exact_n",
            (
                F.abs(F.col("approx_n") - F.col("exact_n"))
                <= 3 * rsd * F.col("exact_n")
            ).alias("within_tol"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (SURVEY §7 phase 4 — generalizes dedup_rows)
# ---------------------------------------------------------------------------


@register(
    "dedup_embedding_cosine",
    f"""
    WITH scored AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_cos_sql('a', 'b')}, 6) AS cos
      FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.35
    """,
)
def q_dedup_embedding_cosine(spark, sf_dir):
    """Exact embedding near-dup pairs (cos ≥ 0.35) — correctness baseline
    for the LSH-pruned scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return D.near_dup_embedding_pairs(emb, "vec_id", "embedding", 0.35)


@register(
    "dedup_embedding_cosine_lsh",
    f"""
    WITH sig AS (SELECT e.vec_id, e.embedding,
                        {_rhp_sig_sql('e', 4)} AS rhp_sig
                 FROM embeddings e),
      scored AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({_cos_sql('a', 'b')}, 6) AS cos
        FROM sig a JOIN sig b USING (rhp_sig)
        WHERE a.vec_id < b.vec_id)
    SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.35
    """,
)
def q_dedup_embedding_cosine_lsh(spark, sf_dir):
    """LSH-bucketed near-dup: candidates restricted to equal 4-plane
    signatures — the equi-join scale path (recall < 1 by design; the oracle
    replicates the bucketing so the check is exact)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return D.near_dup_embedding_lsh(emb, "vec_id", "embedding", 0.35, planes=4)


# ---------------------------------------------------------------------------
# IVF similarity search (SURVEY §7 phase 4 — ANN scale path #2)
# ---------------------------------------------------------------------------

_IVF_SQL = f"""
    WITH cent AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 8),
      assign AS (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e', 'c')} DESC, c.cid ASC) AS rn
        FROM embeddings e, cent c),
      cells AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1),
      q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      qp AS (
        SELECT q.vec_id AS query_id, q.embedding, c.cid,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_cos_sql('q', 'c')} DESC, c.cid ASC) AS rn
        FROM q, cent c),
      probes AS (SELECT query_id, embedding, cid FROM qp WHERE rn <= 2),
      scored AS (
        SELECT p.query_id, s.vec_id AS neighbor_id,
               round({_cos_sql('p', 's')}, 6) AS cos
        FROM probes p JOIN cells s USING (cid) WHERE p.query_id <> s.vec_id),
      ranked AS (SELECT *, CAST(row_number() OVER (
                     PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC)
                     AS INTEGER) AS rank
                 FROM scored)
    SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 5
"""


@register("sim_cosine_ivf", _IVF_SQL)
def q_sim_cosine_ivf(spark, sf_dir):
    """IVF top-5: fixed coarse quantizer (centroids = vec_id < 8), nprobe=2.
    Cell assignment is a zero-shuffle map-side argmax over inlined centroid
    literals; probes equi-join the bucketed corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    ]
    return SIM.cosine_topk_ivf(
        emb.filter(F.col("vec_id") < 10), emb, centroids, "vec_id", "embedding",
        k=5, nprobe=2,
    )


#: sf_dir -> built index path (fixture content is static per session).
_IVF_INDEXED: dict[str, str] = {}


def _ivf_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Session-scoped persisted-IVF index for ``sf_dir`` (built once).

    The index lives in a fresh ``mkdtemp`` directory (mode 0700, random
    suffix), NOT a name derived from ``sf_dir``: a fixed, predictable /tmp
    path is racy under concurrent processes (pytest-xdist / parallel bench
    overwriting while another reads) and symlink-squattable on shared hosts
    (ADVICE r5 #3).  Cross-process reuse was never real — memoization is
    per-process either way — so a private per-process dir loses nothing.
    """
    import tempfile

    from ..operators import ann_index as ANN

    path = _IVF_INDEXED.get(sf_dir)
    if path is None:
        path = tempfile.mkdtemp(prefix="spark_graft_ivf_") + "/index"
        emb = load_table(spark, sf_dir, "embeddings")
        centroids = [
            (r["vec_id"], list(r["embedding"]))
            for r in emb.filter(F.col("vec_id") < 8)
            .select("vec_id", "embedding")
            .collect()
        ]
        ANN.save_ivf_index(emb, centroids, path, "vec_id", "embedding")
        _IVF_INDEXED[sf_dir] = path
    return path


@register("sim_ivf_index_persisted", _IVF_SQL)
def q_sim_ivf_index_persisted(spark, sf_dir):
    """IVF top-5 over a SAVED index (operators/ann_index.py): the corpus
    cell assignment is materialized once as cell-partitioned parquet +
    centroid table; queries probe the loaded quantizer and scan only the
    probed cell directories (broadcast equi-join on the partition column).
    Same quantizer/queries/k as sim_cosine_ivf ⇒ same oracle."""
    from ..operators import ann_index as ANN

    path = _ivf_index_dir(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    return ANN.query_ivf_index(
        spark, path, emb.filter(F.col("vec_id") < 10), "vec_id", "embedding",
        k=5, nprobe=2,
    )


_RECALL_SQL = f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
      ex_scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round({_cos_sql('q', 'c')}, 6) AS cos
        FROM q, embeddings c WHERE q.vec_id <> c.vec_id),
      exact AS (
        SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC) AS rn
          FROM ex_scored) WHERE rn <= 5),
      sig AS (SELECT e.vec_id, e.embedding, {_rhp_sig_sql('e')} AS rhp_sig
              FROM embeddings e),
      lsh_scored AS (
        SELECT s.vec_id AS query_id, c.vec_id AS neighbor_id,
               round({_cos_sql('s', 'c')}, 6) AS cos
        FROM sig s JOIN sig c ON s.rhp_sig = c.rhp_sig AND s.vec_id <> c.vec_id
        WHERE s.vec_id < 10),
      lsh AS (
        SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC) AS rn
          FROM lsh_scored) WHERE rn <= 5),
      cent AS (SELECT vec_id AS cid, embedding FROM embeddings WHERE vec_id < 8),
      assign AS (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_cos_sql('e', 'c')} DESC, c.cid ASC) AS rn
        FROM embeddings e, cent c),
      cells AS (SELECT vec_id, embedding, cid FROM assign WHERE rn = 1),
      qp AS (
        SELECT q.vec_id AS query_id, q.embedding, c.cid,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_cos_sql('q', 'c')} DESC, c.cid ASC) AS rn
        FROM q, cent c),
      probes AS (SELECT query_id, embedding, cid FROM qp WHERE rn <= 2),
      ivf_scored AS (
        SELECT p.query_id, s.vec_id AS neighbor_id,
               round({_cos_sql('p', 's')}, 6) AS cos
        FROM probes p JOIN cells s USING (cid) WHERE p.query_id <> s.vec_id),
      ivf AS (
        SELECT query_id, neighbor_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC) AS rn
          FROM ivf_scored) WHERE rn <= 5),
      tn AS (SELECT count(*) AS n FROM exact)
    SELECT 'ivf' AS method,
           CAST((SELECT count(*) FROM ivf JOIN exact USING (query_id, neighbor_id))
                AS BIGINT) AS hits,
           CAST((SELECT n FROM tn) AS BIGINT) AS truth_n,
           (SELECT count(*) FROM ivf JOIN exact USING (query_id, neighbor_id))
           * 1.0 / (SELECT n FROM tn) AS recall
    UNION ALL
    SELECT 'lsh',
           CAST((SELECT count(*) FROM lsh JOIN exact USING (query_id, neighbor_id))
                AS BIGINT),
           CAST((SELECT n FROM tn) AS BIGINT),
           (SELECT count(*) FROM lsh JOIN exact USING (query_id, neighbor_id))
           * 1.0 / (SELECT n FROM tn)
"""


@register("sim_recall_at_k", _RECALL_SQL)
def q_sim_recall_at_k(spark, sf_dir):
    """Recall@5 of both ANN paths (8-plane RHP-LSH, IVF nprobe=2) against
    brute-force ground truth over the same queries (vec_id < 10) — the
    quality measurement that justifies (or indicts) each approximate index.
    All three top-k relations are |Q|·k rows, so the recall join is free."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = SIM.cosine_topk_bruteforce(q, emb, "vec_id", "embedding", k=5)
    lsh = SIM.cosine_topk_lsh(q, emb, "vec_id", "embedding", k=5, planes=8)
    centroids = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    ]
    ivf = SIM.cosine_topk_ivf(
        q, emb, centroids, "vec_id", "embedding", k=5, nprobe=2
    )
    return SIM.recall_at_k(exact, {"lsh": lsh, "ivf": ivf})


# ---------------------------------------------------------------------------
# Multimodal plumbing (brief: opaque binary + typed metadata; decode stubbed)
# ---------------------------------------------------------------------------


def _media_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic media table from documents: payload = UTF-8 bytes of text,
    modality round-robins by doc_id.  Deterministic, oracle-replicable."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


@register(
    "multimodal_media_stats",
    """
    WITH m AS (SELECT doc_id AS media_id,
                      CASE CAST(doc_id % 3 AS INTEGER)
                           WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS modality,
                      encode(text) AS payload
               FROM documents)
    SELECT modality, count(*) AS n,
           CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
           avg(octet_length(payload)) AS avg_bytes,
           CAST(sum(CASE WHEN payload IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_payloads
    FROM m GROUP BY modality
    """,
)
def q_multimodal_media_stats(spark, sf_dir):
    """Per-modality payload statistics — the sanity gate before decode; pure
    built-ins over the binary column (no UDF)."""
    # avg_bytes is published RAW (r12): avg of exact int byte lengths is
    # a single int-quotient division, bit-identical cross-engine; round(·, 6)
    # only added the .5-at-the-7th-digit boundary class.
    return M.media_stats(_media_frame(spark, sf_dir))


@register(
    "multimodal_decode_features",
    """
    SELECT doc_id AS media_id,
           CAST(1 + CAST(concat('0x', substr(md5(text), 1, 2)) AS INTEGER) % 64
                AS INTEGER) AS width,
           CAST(1 + CAST(concat('0x', substr(md5(text), 3, 2)) AS INTEGER) % 64
                AS INTEGER) AS height
    FROM documents
    """,
)
def q_multimodal_decode_features(spark, sf_dir):
    """Arrow-batched mapInPandas decode (deterministic fake codec — md5-digest
    dimensions; real decode is the clearly-marked stub).  The oracle recomputes
    the digest arithmetic, so the UDF plumbing (batch shape, schema, binary
    round-trip) is value-checked end-to-end."""
    decoded = M.decode_images(_media_frame(spark, sf_dir))
    return decoded.select("media_id", "width", "height")


# ---------------------------------------------------------------------------
# Multi-table analytical queries over the TPC-H-ish fixtures — the canonical
# scan→multi-join→agg shapes a 100 TB warehouse runs daily.  Dimension sides
# (region/nation/supplier) are broadcast; the lineitem fact never shuffles
# before aggregation.
# ---------------------------------------------------------------------------


@register(
    "tpch_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           avg(l_quantity) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: single-pass partial-aggregated scan of the fact table
    — filter pushed to parquet, one shuffle of ~|groups| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            # RAW avg (r12): integral-valued doubles sum exactly below
            # 2^53 in any order, so avg is an int quotient — bit-identical
            # cross-engine without the 6dp boundary class.
            F.avg("l_quantity").alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _tpch_q3_sql() -> str:
    return """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """


@register("tpch_shipping_priority", _tpch_q3_sql())
def q_tpch_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority; fixture carries o_orderpriority in
    place of o_shippriority): segment-filtered customer broadcasts into
    orders, the date-filtered orders side shuffles against lineitem on the
    order key, one grouped agg, global top-10 via TakeOrderedAndProject (a
    per-partition top-k merge on the driver — no global sort materializes).
    Tiebreak pinned (revenue desc, o_orderdate, l_orderkey) so the LIMIT
    membership is deterministic cross-engine."""
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).join(
        F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_revenue_by_nation",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_tpch_revenue_by_nation(spark, sf_dir):
    """TPC-H Q5 shape: fact ⨝ 5 dims with explicit broadcasts for the small
    sides — the lineitem scan shuffles once (on l_orderkey for the orders
    join under AQE, or not at all when orders also broadcasts locally);
    region/nation/supplier ship to executors as hash relations."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@register(
    "tpch_top_spenders",
    """
    WITH big AS (
      SELECT l_orderkey, round(sum(l_quantity), 6) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
    SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
           o.o_totalprice, b.sum_qty
    FROM orders o
    JOIN big b ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q_tpch_top_spenders(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): the group-then-topk pattern
    the Q1/Q3/Q5 trio doesn't exercise — aggregate the fact table per order
    key WITH a selective HAVING, join the survivors back to orders/customer,
    global top-100 by order value.

    Scale notes: the per-orderkey aggregate is map-side combinable (lineitem
    rows per order are bounded, so no skew); the HAVING keeps ~1-2% of
    orders, and the survivor relation's size is DATA-DEPENDENT — so the
    orders join is deliberately left unhinted for AQE to pick broadcast
    when the survivors fit (they do at every test SF) and sort-merge when
    they don't (the honest 100 TB answer — a forced broadcast here would be
    a literal OOM at scale).  The final LIMIT plans as
    TakeOrderedAndProject: per-partition top-100 + driver merge, never a
    global sort.  Tiebreak pinned (o_totalprice DESC, o_orderkey ASC) so
    LIMIT membership is deterministic cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 6).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "o_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_dormant_customers",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           floor(avg(c_acctbal) * 1000000 + 0.5) / 1000000 AS avg_acctbal
    FROM customer c
    WHERE c_acctbal > 0
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def q_tpch_dormant_customers(spark, sf_dir):
    """TPC-H Q21/Q22 shape (NOT EXISTS → anti join): positive-balance
    customers with NO orders since 2000, counted per market segment — the
    churn/exclusion pattern the existing join suite doesn't cover.

    Scale notes: the date predicate pushes into the orders parquet scan
    (plan-tested), so the anti join's right side is only the recent rows;
    LEFT ANTI needs no dedup of the order keys (semi/anti joins short-
    circuit on first match) and shuffles both sides once on the customer
    key.  avg uses the house floor-rounding so boundary doubles hash
    identically cross-engine."""
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    return (
        cu.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.floor(F.avg("c_acctbal") * 1000000 + F.lit(0.5)) / 1000000).alias(
                "avg_acctbal"
            ),
        )
    )


@register(
    "scan_csv_roundtrip",
    """
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_scan_csv_roundtrip(spark, sf_dir):
    """sink_csv → scan_csv round trip (codes.py:21,177): write orders to CSV,
    re-read with full-file schema inference, aggregate.  The oracle aggregates
    the parquet source directly, so the check proves the CSV text round-trip
    is lossless (Spark writes shortest-round-trip doubles)."""
    import hashlib
    import tempfile

    from ..sources import scan_csv, sink_csv

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{tempfile.gettempdir()}/spark_graft_csv_{tag}"
    sink_csv(o, path)
    back = scan_csv(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "join_salted",
    """
    WITH r AS (SELECT user_id, round(avg(value), 6) AS user_avg
               FROM events GROUP BY user_id)
    SELECT e.event_id, e.user_id, round(e.value, 6) AS value, r.user_avg
    FROM events e JOIN r USING (user_id)
    """,
)
def q_join_salted(spark, sf_dir):
    """Skew-resistant salted equi-join — result identical to the plain join
    (the oracle IS the plain join); the salt spreads any hot user_id across
    8 shuffle partitions."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", F.round("value", 6).alias("value"))
    right = ev.groupBy("user_id").agg(F.round(F.avg("value"), 6).alias("user_avg"))
    return R.join_salted(left, right, "user_id", salt=8)


@register(
    "agg_approx_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.50), 6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           TRUE AS within_tol
    FROM events GROUP BY event_type
    """,
)
def q_agg_approx_quantiles(spark, sf_dir):
    """Sketch quantiles, ORACLE-GATED (r11, VERDICT r10 task 5): the sketch
    output is partition-order dependent, so the published columns are the
    EXACT interpolated percentiles (R-7, identical definition in Spark's
    ``percentile`` and DuckDB's ``quantile_cont``; 6dp-rounded — the
    interpolation's float arithmetic differs in op order cross-engine) plus
    ``within_tol``, evaluated Spark-side so a sketch regression flips the
    value hash.  The boolean never crosses engines (the oracle asserts
    TRUE), so no cross-engine float compare is involved.

    The gate checks the sketch's contract in RANK space (r11 review):
    ``approx_percentile`` returns an order statistic — the smallest element
    whose less-than rank is within accuracy error of p·n — so a
    VALUE-space envelope of exact interpolated percentiles breaks on small
    groups, where one inter-element gap exceeds any fixed percentile
    window (e.g. values [0, 10]: sketch p50 = 0, interpolated envelope
    [4.9, 5.1]).  Rank-space gate: count(value < approx) ≤ (p+tol)·n and
    count(value ≤ approx) ≥ (p−tol)·n with tol = 0.01 — two orders of
    magnitude looser than the sketch's 1/accuracy = 1e-4 guarantee, and
    exact at every group size."""
    ev = load_table(spark, sf_dir, "events")
    probs = (0.25, 0.50, 0.75)
    approx = A.agg_approx_quantiles_by_key(ev, "event_type", "value")
    j = ev.join(F.broadcast(approx), "event_type")
    aggs = [
        F.percentile(F.col("value"), F.lit(p)).alias(f"e{int(p * 100)}")
        for p in probs
    ]
    aggs.append(F.count(F.lit(1)).alias("__n"))
    for p in probs:
        name = f"p{int(p * 100)}"
        aggs.append(
            F.sum((F.col("value") < F.col(name)).cast("long")).alias(
                f"lt{int(p * 100)}"
            )
        )
        aggs.append(
            F.sum((F.col("value") <= F.col(name)).cast("long")).alias(
                f"le{int(p * 100)}"
            )
        )
    g = j.groupBy("event_type").agg(*aggs)
    tol = None
    for p in probs:
        k = int(p * 100)
        c = (F.col(f"lt{k}") <= (p + 0.01) * F.col("__n")) & (
            F.col(f"le{k}") >= (p - 0.01) * F.col("__n")
        )
        tol = c if tol is None else (tol & c)
    return g.select(
        "event_type",
        F.round("e25", 6).alias("p25"),
        F.round("e50", 6).alias("p50"),
        F.round("e75", 6).alias("p75"),
        tol.alias("within_tol"),
    )


@register(
    "window_trailing_mean_time",
    """
    SELECT event_id,
           round(avg(value) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW), 6)
               AS trailing_mean
    FROM events
    """,
)
def q_window_trailing_mean_time(spark, sf_dir):
    """24h time-range trailing mean per user (SURVEY §2.5 generalization —
    row frames are wrong for irregular sampling; range frames aren't)."""
    from ..operators import windows as W

    ev = load_table(spark, sf_dir, "events")
    out = W.window_trailing_mean_time(
        ev, ["user_id"], "ts", "value", trailing_seconds=86400
    )
    return out.select("event_id", F.round("trailing_mean", 6).alias("trailing_mean"))


@register(
    "agg_trend_by_key",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           floor(regr_slope(value, epoch_us(ts) / 86400000000.0 - 19723.0)
                 * 1000000 + 0.5) / 1000000 AS slope_per_day,
           floor(regr_intercept(value, epoch_us(ts) / 86400000000.0 - 19723.0)
                 * 1000000 + 0.5) / 1000000 AS intercept,
           floor(corr(value, epoch_us(ts) / 86400000000.0 - 19723.0)
                 * 1000000 + 0.5) / 1000000 AS r
    FROM events GROUP BY event_type
    """,
)
def q_agg_trend_by_key(spark, sf_dir):
    """Per-key linear trend: OLS slope/intercept/correlation of value over
    event time via the built-in regression aggregates (single map-side-
    combinable shuffle — the distributed form of the reference's
    trend-over-time EDA, codes.py:113-120).

    Event time is rescaled to DAYS SINCE 2024-01-01 (a fixed constant, not
    a data-dependent min) before aggregating: raw epoch-µs x-values put
    n·Σx²−(Σx)² ~12 orders of magnitude above the retained variance, so
    the naive-formula cancellation would eat the float digits the 1e-6
    cross-engine rounding needs; day-scale x keeps slope O(1)."""
    ev = load_table(spark, sf_dir, "events")
    x = F.unix_micros(F.col("ts")) / F.lit(86400000000.0) - F.lit(19723.0)
    flr6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        flr6(F.regr_slope(F.col("value"), x)).alias("slope_per_day"),
        flr6(F.regr_intercept(F.col("value"), x)).alias("intercept"),
        flr6(F.corr(F.col("value"), x)).alias("r"),
    )


@register(
    "agg_retention_cohorts",
    """
    WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
               FROM events GROUP BY user_id),
         a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS activity_week
               FROM events)
    SELECT f.cohort_week,
           CAST(date_diff('day', CAST(f.cohort_week AS DATE),
                          CAST(a.activity_week AS DATE)) / 7 AS INTEGER)
               AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_agg_retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-seen ISO week,
    counted per (cohort, week-offset) of later activity — the standard
    engagement-retention relation.

    ONE fact scan (VERDICT r5 task 4 — the previous two-aggregate + join
    form read ``events`` twice, which at 100 TB is the query's whole cost):
    distinct ``(user_id, activity_week)`` pairs first (one shuffle that also
    crushes the fact table down to |users|·|weeks| rows), then the cohort
    week is a per-user window-min over that TINY relation — the second
    exchange moves thousandths of the input, not the input.  Offsets are
    exact day-multiples of 7 (both engines truncate weeks to Monday), so
    the output is integer-exact."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_week")
    ).distinct()
    w = Window.partitionBy("user_id")
    return (
        a.withColumn("cohort_week", F.min("activity_week").over(w))
        .groupBy(
            "cohort_week",
            (F.datediff("activity_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "corpus_dedup_rate_report",
    """
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
           floor((1 - count(DISTINCT md5(text)) * 1.0 / count(*))
                 * 1000000 + 0.5) / 1000000 AS dup_rate
    FROM documents GROUP BY source
    """,
)
def q_corpus_dedup_rate_report(spark, sf_dir):
    """Per-source duplicate-rate observability: doc count, distinct content
    fingerprints, dup fraction — the one-line health report a corpus
    pipeline records before/after each dedup stage.  Distinct-count keyed
    on the 128-bit digest, never document bodies."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    n_distinct = F.countDistinct(F.md5("text"))
    dup_rate = F.floor(
        (1 - n_distinct * F.lit(1.0) / F.count(F.lit(1))) * 1e6 + F.lit(0.5)
    ) / 1e6
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        n_distinct.alias("n_distinct"),
        dup_rate.alias("dup_rate"),
    )


@register(
    "clean_winsorize_by_key",
    """
    WITH pct AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
           floor(least(greatest(e.value, p.lo), p.hi) * 1000000 + 0.5)
               / 1000000 AS value_winsorized
    FROM events e JOIN pct p USING (event_type)
    """,
)
def q_clean_winsorize_by_key(spark, sf_dir):
    """Per-key winsorization (clip to the key's exact [p05, p95]) — the
    outlier-tame step of a feature pipeline, generalizing the reference's
    global clip (codes.py:89-93) to per-group bounds.  One shuffle for the
    exact per-key percentiles (5 keys), then the bounds broadcast back onto
    the fact scan — the clip itself is map-side, no second fact shuffle."""
    ev = load_table(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.05)).alias("lo"),
        F.percentile(F.col("value"), F.lit(0.95)).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return ev.join(F.broadcast(pct), "event_type").select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        (F.floor(clipped * 1e6 + F.lit(0.5)) / 1e6).alias("value_winsorized"),
    )


@register(
    "agg_funnel_conversion",
    """
    WITH w1 AS (
      SELECT user_id, ts, event_type,
             min(CASE WHEN event_type = 'view' THEN ts END)
                 OVER (PARTITION BY user_id) AS t1
      FROM events),
    w2 AS (
      SELECT user_id, ts, event_type, t1,
             min(CASE WHEN event_type = 'click' AND ts >= t1 THEN ts END)
                 OVER (PARTITION BY user_id) AS t2
      FROM w1),
    w3 AS (
      SELECT user_id, t1, t2,
             min(CASE WHEN event_type = 'purchase' AND ts >= t2 THEN ts END)
                 OVER (PARTITION BY user_id) AS t3
      FROM w2),
    u AS (SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
          FROM w3 GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t1) AS BIGINT) AS n_view,
           CAST(count(t2) AS BIGINT) AS n_view_click,
           CAST(count(t3) AS BIGINT) AS n_full_funnel
    FROM u
    """,
)
def q_agg_funnel_conversion(spark, sf_dir):
    """Event-sequence funnel: users whose first view precedes a click that
    precedes a purchase (ordered steps, not mere presence).  Three stacked
    per-user window minima — each conditioned on the previous step's
    timestamp — then one per-user collapse and a global count.  All windows
    AND the collapse share the user_id partitioning, so the whole funnel is
    ONE hash exchange; integer-exact output (no float parity surface)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    d1 = ev.select("user_id", "ts", "event_type", t1.alias("t1"))
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    d2 = d1.select("user_id", "ts", "event_type", "t1", t2.alias("t2"))
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    d3 = d2.select("user_id", "t1", "t2", t3.alias("t3"))
    u = d3.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_full_funnel"),
    )


@register(
    "agg_session_windows",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      s AS (SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM g)
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, sess_id
    """,
)
def q_agg_session_windows(spark, sf_dir):
    """Sessionization via session_window (30-min inactivity gap); the oracle
    is the classic gaps-and-islands form — same windows, same boundaries."""
    ev = load_table(spark, sf_dir, "events")
    return A.agg_session_windows(ev, "user_id", "ts", "30 minutes")


@register(
    "text_token_count_bpe",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))
                AS INTEGER) AS n_tokens
    FROM documents
    """,
)
def q_text_token_count_bpe(spark, sf_dir):
    """BPE-pre-tokenizer token count (LLM token-budget estimator) — regex
    alternation restricted to constructs with identical Java/RE2 semantics."""
    from ..operators import text as T

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id", T.token_count_bpe("text").cast("int").alias("n_tokens")
    )


@register(
    "text_winnow_fingerprint",
    r"""
    WITH t AS (SELECT doc_id,
                      regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
               FROM documents),
      h AS (SELECT doc_id,
                   list_transform(
                     range(1, greatest(length(norm) - 4, 1) + 1),
                     i -> substr(md5(substr(norm, CAST(i AS INTEGER), 5)), 1, 16))
                   AS hashes
            FROM t),
      m AS (SELECT doc_id,
                   list_distinct(list_transform(
                     range(1, greatest(len(hashes) - 3, 1) + 1),
                     i -> list_min(hashes[CAST(i AS INTEGER):CAST(i + 3 AS INTEGER)])))
                   AS fps
            FROM h)
    SELECT doc_id, unnest(fps) AS fp FROM m
    """,
)
def q_text_winnow_fingerprint(spark, sf_dir):
    """Winnowing fingerprints (k=5 char-grams, window=4): the rolling-hash
    local-similarity digest — shared substrings ≥ 8 chars share a
    fingerprint."""
    from ..operators import text as T

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # explode_outer: suppress the InferFiltersFromGenerate size()>0 filter,
    # which re-computes the whole winnowing expression per row (same
    # mechanism as corpus.contamination_overlap); the fingerprint array is
    # never empty for non-null text, and a null-text row's null fp is the
    # outer variant's only delta.
    return docs.select(
        "doc_id", F.explode_outer(T.winnow_fingerprints("text", 5, 4)).alias("fp")
    )


def _lsh_verified_sql() -> str:
    from .registry_ext import _AUG_CTE, _minhash_sql, _shingles_sql_d

    return (
        _AUG_CTE
        + ", sig AS (SELECT d.doc_id, "
        + ", ".join(_minhash_sql(i) for i in range(8))
        + " FROM docs d), banded AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id, {b} AS band_id, "
            f"concat(minhash_{2 * b}, '|', minhash_{2 * b + 1}) AS band_key FROM sig"
            for b in range(4)
        )
        + f""")
        , cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                   FROM banded a JOIN banded b
                     ON a.band_id = b.band_id AND a.band_key = b.band_key
                    AND a.doc_id < b.doc_id),
          shs AS (SELECT d.doc_id, list_distinct({_shingles_sql_d()}) AS shs
                  FROM docs d),
          scored AS (
            SELECT id_a, id_b,
                   len(list_intersect(sa.shs, sb.shs)) * 1.0
                   / (len(sa.shs) + len(sb.shs)
                      - len(list_intersect(sa.shs, sb.shs))) AS jaccard
            FROM cand
            JOIN shs sa ON sa.doc_id = id_a
            JOIN shs sb ON sb.doc_id = id_b)
        SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.3
        """
    )


@register("dedup_lsh_verified", _lsh_verified_sql())
def q_dedup_lsh_verified(spark, sf_dir):
    """Candidates→verify near-dup pipeline: banded MinHash-LSH candidate
    pairs, then exact Jaccard only on those pairs (≥ 0.3).  The production
    dedup shape — linear-ish in corpus size where standalone pairwise
    Jaccard is quadratic in hot shingles.  r6: uses the FUSED operator so
    the corpus is shingled once (the two-stage composition paid a second
    full text pass; VERDICT r5 task 2)."""
    from .registry_ext import _augmented_docs

    docs = _augmented_docs(spark, sf_dir)
    return D.minhash_lsh_verified(
        docs, "text", "doc_id", num_hashes=8, bands=4, threshold=0.3
    )


@register(
    "json_extract_agg",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k,
           CAST(count(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS n_k
    FROM events GROUP BY event_type
    """,
)
def q_json_extract_agg(spark, sf_dir):
    """Semi-structured extraction: pull props.$.k (JSON string column) and
    aggregate — JVM-side get_json_object, no Python."""
    from ..functions import scalars as S

    ev = load_table(spark, sf_dir, "events")
    k = S.json_get_int("props", "k")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_k")
    )


@register(
    "multimodal_frame_sample",
    """
    WITH m AS (SELECT doc_id AS media_id, 'video' AS modality,
                      1.0 + CAST(doc_id % 7 AS DOUBLE) AS meta_duration_s
               FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 2)
    SELECT media_id, CAST(unnest(range(0, greatest(CAST(meta_duration_s AS INTEGER), 1)))
                          AS INTEGER) AS frame_idx
    FROM m
    """,
)
def q_multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plan (1 fps): pure Catalyst explode over metadata —
    one row per frame timestamp, no decode touched."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    media = docs.filter((F.col("doc_id") % 3).cast("int") == 2).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (1.0 + (F.col("doc_id") % 7).cast("double")).alias("meta_duration_s"),
    )
    frames = M.sample_video_frames(media, every_s=1.0)
    return frames.select("media_id", F.col("frame_idx").cast("int").alias("frame_idx"))


@register(
    "multimodal_resize",
    """
    SELECT doc_id AS media_id,
           CAST(1024 AS INTEGER) AS resized_bytes,
           32 AS width, 32 AS height
    FROM documents
    """,
)
def q_multimodal_resize(spark, sf_dir):
    """Resize plumbing (stub codec): Arrow mapInPandas binary→binary round
    trip.  The stub truncates/pads every payload to exactly 32×32 = 1024
    bytes, so the oracle's constant asserts the UDF emitted a correct-length
    binary for EVERY row (DuckDB cannot slice blobs to recompute content)."""
    media = _media_frame(spark, sf_dir)
    out = M.resize_images(media, target=(32, 32))
    return out.select(
        "media_id",
        F.length("payload_resized").cast("int").alias("resized_bytes"),
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
    )


@register(
    "reshape_pivot",
    """
    SELECT user_id % 10 AS user_bucket,
           round(CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN value END), 0)
                      AS DOUBLE), 2) AS click,
           round(CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0)
                      AS DOUBLE), 2) AS view,
           round(CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0)
                      AS DOUBLE), 2) AS purchase
    FROM events GROUP BY 1
    """,
)
def q_reshape_pivot(spark, sf_dir):
    """Long → wide with pinned pivot values (no distinct-discovery scan);
    rounded sums per (user bucket × event type)."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("user_bucket"), "event_type", "value"
    )
    wide = R.pivot_wide(ev, "user_bucket", "event_type", ["click", "view", "purchase"], "value")
    return wide.select(
        "user_bucket",
        F.round("click", 2).alias("click"),
        F.round("view", 2).alias("view"),
        F.round("purchase", 2).alias("purchase"),
    )


@register(
    "reshape_unpivot",
    """
    WITH wide AS (
      SELECT user_id % 10 AS user_bucket,
             round(CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN value END),
                        0) AS DOUBLE), 2) AS click,
             round(CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN value END),
                        0) AS DOUBLE), 2) AS view
      FROM events GROUP BY 1)
    SELECT user_bucket, 'click' AS variable, click AS value FROM wide
    UNION ALL
    SELECT user_bucket, 'view' AS variable, view AS value FROM wide
    """,
)
def q_reshape_unpivot(spark, sf_dir):
    """Wide → long (melt, Spark-native unpivot): zero-shuffle
    projection+explode over the pivoted relation."""
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 10).alias("user_bucket"), "event_type", "value"
    )
    wide = R.pivot_wide(ev, "user_bucket", "event_type", ["click", "view"], "value")
    wide = wide.select(
        "user_bucket",
        F.round("click", 2).alias("click"),
        F.round("view", 2).alias("view"),
    )
    return R.unpivot_long(wide, ["user_bucket"], ["click", "view"])


@register(
    "topk_approx_freqitems",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS exact_n,
           TRUE AS in_candidates
    FROM events
    GROUP BY event_type
    HAVING count(*) > 0.1 * (SELECT count(*) FROM events)
    """,
)
def q_topk_approx_freqitems(spark, sf_dir):
    """Heavy-hitters sketch, ORACLE-GATED (r11, VERDICT r10 task 5): the
    KPS candidate set may hold false positives BY DESIGN, so the published
    relation is the exact truly-frequent set with its exact counts, plus
    ``in_candidates`` — the sketch's one hard guarantee (no false
    NEGATIVES: every truly frequent item appears in the candidate set),
    evaluated Spark-side via a left join against the sketch output.  The
    oracle computes the exact rows and asserts TRUE, so a sketch that
    drops a real heavy hitter flips the value hash.

    "Truly frequent" is count STRICTLY ABOVE support·n on both engines
    (r11 review): freqItems' no-false-negative guarantee covers only
    frequency > support — an item at exactly the threshold may
    legitimately be absent from the candidate set, so a ``>=`` gate would
    flag the sketch's documented behavior as a failure on any fixture
    with a category sitting exactly on the boundary."""
    ev = load_table(spark, sf_dir, "events")
    cand = A.topk_approx_freqitems(ev, "event_type", support=0.1).withColumn(
        "__cand", F.lit(True)
    )
    n_total = ev.agg(F.count(F.lit(1)).alias("__n"))
    frequent = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("exact_n") > 0.1 * F.col("__n"))
    )
    return (
        frequent.join(F.broadcast(cand), "event_type", "left")
        .select(
            "event_type",
            "exact_n",
            F.coalesce(F.col("__cand"), F.lit(False)).alias("in_candidates"),
        )
    )


@register(
    "dedup_incremental",
    r"""
    WITH norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g')
                         AS n FROM documents),
      store AS (SELECT DISTINCT md5(n) AS fp FROM norm),
      newb AS (
        SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS n
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id + 10000000000 AS doc_id,
               regexp_replace(trim(lower(concat(text, ' fresh tail'))), '\s+', ' ', 'g')
               AS n
        FROM documents WHERE doc_id % 2 = 1)
    SELECT doc_id FROM newb WHERE md5(n) NOT IN (SELECT fp FROM store)
    """,
)
def q_dedup_incremental(spark, sf_dir):
    """Daily-batch dedup: the new batch (half exact re-crawls, half genuinely
    new docs) anti-joins the corpus fingerprint store — only the new halves
    survive."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    recrawl = docs.filter(F.col("doc_id") % 2 == 0)
    fresh = docs.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") + F.lit(_AUG_OFFSET)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" fresh tail")).alias("text"),
    )
    batch = recrawl.unionByName(fresh)
    out = D.dedup_incremental_exact(batch, docs, "text", "doc_id")
    return out.select("doc_id")


@register(
    "sim_cosine_ivf_kmeans",
    """
    SELECT vec_id AS query_id,
           CAST(least(5, (SELECT count(*) - 1 FROM embeddings)) AS BIGINT)
               AS truth_n,
           TRUE AS within_tol
    FROM embeddings WHERE vec_id < 10
    """,
)
def q_sim_cosine_ivf_kmeans(spark, sf_dir):
    """IVF with REAL k-means centroids (seeded MLlib fit) — the production
    quantizer.  Oracle-gated with the r11 sketch pattern (VERDICT r11 task
    3): the cluster centers are not SQL-replicable, so the published
    relation carries the EXACT per-query columns the oracle can derive
    independently (query set; ``truth_n`` = the brute-force top-k size,
    ``least(k, |corpus|−1)`` since self-matches are excluded) plus a
    Spark-evaluated ``within_tol`` boolean asserting the operator's own
    contract — every query returns a full top-k from its probed cells AND
    mean recall@5 vs the exact brute-force truth clears 0.4 (measured on
    the fixture family: 0.48 / 0.54 / 0.62 at sf0.001/0.01/0.1 with
    nlist=8, nprobe=2, seed=42).  The boolean never crosses engines — the
    oracle asserts TRUE — but a quantizer/recall regression flips the
    value hash.  All gate relations are ≤ |Q| rows (bounded aggregation of
    the two top-k operators); no driver-side loops."""
    from ..operators.caching import scoped_persist

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = SIM.fit_ivf_centroids(emb, "embedding", nlist=8, seed=42)
    queries = emb.filter(F.col("vec_id") < 10)
    # Persist the two top-k relations and the per-query join (r12 review):
    # ivf/truth each feed TWO consumers (the per-query counts and the hits
    # semi-join) and `per` feeds the gate aggregate AND the published
    # select — unpersisted, the brute-force |Q|×|corpus| scorer and the
    # IVF probe join would re-execute per consumer.  All three are ≤
    # |Q|·k rows; pins release with the returned plan.
    ivf = SIM.cosine_topk_ivf(
        queries, emb, centroids, "vec_id", "embedding", k=5, nprobe=2
    ).select("query_id", "neighbor_id").persist()
    truth = SIM.cosine_topk_bruteforce(
        queries, emb, "vec_id", "embedding", k=5
    ).select("query_id", "neighbor_id").persist()
    per_truth = truth.groupBy("query_id").agg(F.count(F.lit(1)).alias("truth_n"))
    per_ivf = ivf.groupBy("query_id").agg(F.count(F.lit(1)).alias("ivf_n"))
    hits = (
        ivf.join(truth, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    per = (
        per_truth.join(per_ivf, "query_id", "left")
        .join(hits, "query_id", "left")
        .na.fill({"ivf_n": 0, "hits": 0})
        .persist()
    )
    gate = per.agg(
        F.avg(F.col("hits") / F.col("truth_n")).alias("avg_recall"),
        F.sum(
            F.when(F.col("ivf_n") == F.col("truth_n"), 0).otherwise(1)
        ).alias("short_queries"),
    ).select(
        (
            (F.col("avg_recall") >= 0.4) & (F.col("short_queries") == 0)
        ).alias("within_tol")
    )
    out = per.select("query_id", "truth_n").crossJoin(F.broadcast(gate))
    return scoped_persist(out, ivf, truth, per)


@register(
    "agg_mode_by_key",
    """
    WITH c AS (SELECT event_type, CAST(month(ts) AS INTEGER) AS m, count(*) AS n
               FROM events GROUP BY 1, 2),
      r AS (SELECT event_type, m,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY n DESC, m ASC) AS rn
            FROM c)
    SELECT event_type, m AS mode_month FROM r WHERE rn = 1
    """,
)
def q_agg_mode_by_key(spark, sf_dir):
    """Per-type modal month, deterministic tie-break (SURVEY §2.4 keyed
    generalization of agg_mode_global, codes.py:83)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.month("ts").alias("m")
    )
    return A.agg_mode_by_key(ev, "event_type", "m", out="mode_month")


def _lsh_bucket_stats_sql() -> str:
    from .registry_ext import _AUG_CTE, _minhash_sql

    return (
        _AUG_CTE
        + ", sig AS (SELECT d.doc_id, "
        + ", ".join(_minhash_sql(i) for i in range(8))
        + " FROM docs d), banded AS ("
        + " UNION ALL ".join(
            f"SELECT doc_id, {b} AS band_id, "
            f"concat(minhash_{2 * b}, '|', minhash_{2 * b + 1}) AS band_key FROM sig"
            for b in range(4)
        )
        + """)
        SELECT band_id,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(max(n) AS BIGINT) AS max_bucket,
               CAST(sum(n * (n - 1) / 2) AS BIGINT) AS candidate_pairs
        FROM (SELECT band_id, band_key, count(*) AS n
              FROM banded GROUP BY 1, 2)
        GROUP BY band_id
        """
    )


@register("dedup_lsh_bucket_stats", _lsh_bucket_stats_sql())
def q_dedup_lsh_bucket_stats(spark, sf_dir):
    """Hot-bucket telemetry for the banded MinHash self-join (DEVNOTES 5):
    per band, bucket count / max bucket size / exact candidate-pair volume
    Σ n·(n−1)/2.  The number a production dedup run records BEFORE the join:
    pairs ≫ #docs means boilerplate concentration, not near-dups — cap it
    with max_bucket_size instead of melting the shuffle."""
    from .registry_ext import _augmented_docs

    docs = _augmented_docs(spark, sf_dir)
    banded = D.banded_minhash(docs, "text", "doc_id", num_hashes=8, bands=4)
    return D.lsh_bucket_stats(banded)


def _incremental_near_sql() -> str:
    from .registry_ext import _minhash_sql, _shingles_sql_d

    sig_cols = ", ".join(_minhash_sql(i) for i in range(8))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, "
        f"concat(minhash_{2 * b}, '|', minhash_{2 * b + 1}) AS band_key FROM {{sig}}"
        for b in range(4)
    )
    return f"""
    WITH store AS (SELECT doc_id, text FROM documents),
      newb AS (
        SELECT doc_id + {_AUG_OFFSET} AS doc_id, concat(text, ' near dup tail') AS text
        FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + {_NOVEL_OFFSET} AS doc_id,
               concat('novel ', CAST(doc_id AS VARCHAR),
                      ' content unlike anything stored before now') AS text
        FROM documents WHERE doc_id % 5 = 1),
      sig_s AS (SELECT d.doc_id, {sig_cols} FROM store d),
      sig_n AS (SELECT d.doc_id, {sig_cols} FROM newb d),
      band_s AS ({bands.format(sig="sig_s")}),
      band_n AS ({bands.format(sig="sig_n")}),
      cand AS (SELECT DISTINCT n.doc_id AS id_new, s.doc_id AS id_store
               FROM band_n n JOIN band_s s
                 ON n.band_id = s.band_id AND n.band_key = s.band_key),
      shs_s AS (SELECT d.doc_id, list_distinct({_shingles_sql_d()}) AS shs
                FROM store d),
      shs_n AS (SELECT d.doc_id, list_distinct({_shingles_sql_d()}) AS shs
                FROM newb d),
      matched AS (
        SELECT DISTINCT id_new FROM cand
        JOIN shs_n a ON a.doc_id = id_new
        JOIN shs_s b ON b.doc_id = id_store
        WHERE len(list_intersect(a.shs, b.shs)) * 1.0
              / (len(a.shs) + len(b.shs) - len(list_intersect(a.shs, b.shs)))
              >= 0.3)
    SELECT doc_id FROM newb
    WHERE doc_id NOT IN (SELECT id_new FROM matched)
    """


@register("dedup_incremental_near", _incremental_near_sql())
def q_dedup_incremental_near(spark, sf_dir):
    """Daily-ingest NEAR-dup dedup (operators/dedup.py dedup_incremental_near):
    the new batch — half near-dup re-crawls (3 extra tail tokens), half
    genuinely novel text — is banded-LSH-matched against the corpus and only
    docs with no store match at Jaccard ≥ 0.3 survive.  Candidates→verify,
    both stages delta-driven: O(|delta| + matching buckets), never
    corpus × corpus; the completing near-dup half of ``dedup_incremental``."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(_AUG_OFFSET)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near dup tail")).alias("text"),
    )
    fresh = docs.filter(F.col("doc_id") % 5 == 1).select(
        (F.col("doc_id") + F.lit(_NOVEL_OFFSET)).alias("doc_id"),
        F.concat(
            F.lit("novel "),
            F.col("doc_id").cast("string"),
            F.lit(" content unlike anything stored before now"),
        ).alias("text"),
    )
    batch = near.unionByName(fresh)
    out = D.dedup_incremental_near(batch, docs, "text", "doc_id", threshold=0.3)
    # r8 scale-killer fix: `out` carries the operator's shingle-cache scope;
    # deriving the projection and DROPPING the handle used to fire the
    # weakref finalizer and unpersist the cache BEFORE the driver's action
    # ran — all four verify consumers then recomputed the full shingle
    # pipeline (measured 503 s cold at ov100 vs 121 s with the scope kept;
    # the round-3 dedup_lsh_verified regression pattern re-introduced at
    # the registry layer).  transfer_cache_scope moves the pins onto the
    # DataFrame the caller will actually execute.
    from ..operators.caching import transfer_cache_scope

    return transfer_cache_scope(out, out.select("doc_id"))


@register(
    "scan_json_roundtrip",
    """
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_scan_json_roundtrip(spark, sf_dir):
    """sink_json → scan_json round trip: write orders as line-delimited JSON,
    re-read with an EXPLICIT schema (the 100 TB path — inference re-reads the
    whole text), aggregate.  Oracle aggregates the parquet source, proving
    the JSON round trip lossless (shortest-round-trip doubles)."""
    import hashlib
    import tempfile

    from ..sources import scan_json, sink_json

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{tempfile.gettempdir()}/spark_graft_json_{tag}"
    sink_json(o, path)
    back = scan_json(spark, path, o.schema)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "scan_orc_roundtrip",
    """
    SELECT o_orderstatus, count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_scan_orc_roundtrip(spark, sf_dir):
    """sink_orc → scan_orc round trip: the second columnar substrate —
    binary-exact doubles by construction; the check pins schema + values
    through the ORC writer/reader pair."""
    import hashlib
    import tempfile

    from ..sources import scan_orc, sink_orc

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = f"{tempfile.gettempdir()}/spark_graft_orc_{tag}"
    sink_orc(o, path)
    back = scan_orc(spark, path)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# ---------------------------------------------------------------------------
# TPC-H coverage, r6: Q4 (EXISTS→semi with a cross-side predicate),
# Q14 (conditional-aggregate ratio over a dim join), Q7 (two-sided
# dimension role-playing with an OR pair filter).
# ---------------------------------------------------------------------------


@register(
    "tpch_late_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_late_order_priority(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking; the fixture has no
    commitdate/receiptdate, so "late" = any line shipped >60 days after
    the order): EXISTS with a predicate spanning both relations → LEFT
    SEMI join on the order key carrying the cross-side date condition —
    the semi-with-residual-filter shape the Q21/Q22 anti covers only in
    its negated form.

    Scale notes: the orders date filter pushes into the parquet scan; the
    lineitem side projects only (l_orderkey, l_shipdate) before the semi
    join (column pruning verified in the plan test), and semi joins
    short-circuit on first match so the lineitem side is never
    de-duplicated.  One shuffle per side on the order key; the priority
    agg is map-side combinable over 5 groups."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )


@register(
    "tpch_promo_revenue",
    """
    SELECT floor(100.0
               * sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
               / sum(l_extendedprice * (1 - l_discount))
               * 1000000 + 0.5) / 1000000 AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-12-01 00:00:00'
    """,
)
def q_tpch_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape (promotion effect): conditional-aggregate ratio —
    promo revenue share of a shipping quarter — over a fact⋈dim join.

    Scale notes: the date filter pushes into the lineitem scan; part is a
    dimension (broadcast, plan-tested) so the fact NEVER shuffles — the
    whole query is scan → broadcast hash join → 1-group partial agg, the
    cheapest possible multi-table plan at 100 TB.  House floor-rounding on
    the ratio (sum order differs across engines in the last ulps)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-12-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
    pct = 100.0 * promo / F.sum(rev)
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.floor(pct * 1e6 + F.lit(0.5)) / 1e6).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        )
    )


@register(
    "tpch_trade_volume",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
       OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def q_tpch_trade_volume(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping between two nations): the dimension
    role-playing pattern — nation joins the fact chain TWICE under
    different roles (supplier's vs customer's nation) with a symmetric OR
    pair filter, grouped by ship year.

    Scale notes: both nation roles and supplier broadcast (plan-tested);
    the nation-name filter applies AFTER both roles resolve (the OR spans
    the two join branches so neither can be pushed below its own join
    alone — but each branch's IN ('A','B') half IS pushed into the
    broadcast sides by Catalyst as an InSet on the two names).  The fact
    shuffles once for the orders join; everything after is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@register(
    "tpch_important_parts",
    """
    WITH rev AS (
        SELECT l_partkey,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                   + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY 1),
    tot AS (SELECT sum(rev_cents) AS tot_cents,
                   CAST(count(*) AS BIGINT) AS n_parts FROM rev)
    SELECT l_partkey, rev_cents
    FROM rev CROSS JOIN tot
    WHERE rev_cents * n_parts * 4 > 5 * tot_cents
    """,
)
def q_tpch_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-group sum kept only when it
    exceeds a FRACTION OF THE GLOBAL TOTAL — the scalar-subquery-in-HAVING
    pattern (fixture has no partsupp, so part revenue stands in for supply
    value).  The cut is scale-free — parts above 1.25× the
    mean part revenue (4·rev·n > 5·tot, all int64) — so the query returns
    the upper ~decile at EVERY sf instead of going empty when the part
    count grows (a fixed Q11-style fraction selects nothing on a uniform
    fixture, and the fixture's max/mean ratio is only ~1.9).

    Integer-exact: per-row revenue floors to cents BEFORE summing, so both
    engines sum identical bigints and the > comparison can never flip on a
    float ulp at the threshold boundary — the subtle failure mode of
    fraction-of-total filters.

    Scale notes: one fact shuffle for the per-part aggregate (map-side
    combinable); the global total is a 1-row re-aggregate of the ALREADY
    -reduced per-part relation (never a second fact scan) broadcast back as
    the allowlisted scalar BNLJ."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    rev = (
        li.groupBy("l_partkey")
        .agg(F.sum(cents).cast("bigint").alias("rev_cents"))
        .persist()
    )
    tot = rev.agg(
        F.sum("rev_cents").alias("tot_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
    )
    from ..operators.caching import scoped_persist

    out = (
        rev.crossJoin(F.broadcast(tot))
        .filter(F.col("rev_cents") * F.col("n_parts") * 4 > 5 * F.col("tot_cents"))
        .select("l_partkey", "rev_cents")
    )
    return scoped_persist(out, rev)


@register(
    "tpch_customer_distribution",
    """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer
          LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> 'URGENT'
          GROUP BY c_custkey) per_cust
    GROUP BY c_count
    """,
)
def q_tpch_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer distribution): how many customers placed
    exactly k (non-urgent) orders — LEFT OUTER join so zero-order
    customers land in the k=0 bucket, then a distribution-of-counts
    double aggregation.

    Scale notes: the join-side filter sits in the JOIN CONDITION (not a
    WHERE, which would silently turn the outer join inner — the classic
    Q13 bug); count(o_orderkey) counts matches only, so unmatched rows
    produce 0.  One shuffle family on the customer key, then a tiny
    re-aggregate over ≤ max-orders-per-customer distinct counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


def _profile_events_sql() -> str:
    num = ["event_id", "user_id", "value"]
    stri = ["event_type"]
    stats = ["CAST(count(*) AS BIGINT) AS n"]
    for c in num + stri:
        stats.append(f"CAST(count({c}) AS BIGINT) AS cnt_{c}")
        stats.append(f"CAST(count(DISTINCT {c}) AS BIGINT) AS nd_{c}")
    for c in num:
        stats.append(
            f"floor(CAST(min({c}) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mn_{c}"
        )
        stats.append(
            f"floor(CAST(max({c}) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS mx_{c}"
        )
    for c in stri:
        stats.append(f"min({c}) AS smn_{c}")
        stats.append(f"max({c}) AS smx_{c}")
    rows = []
    for c in num:
        rows.append(
            f"SELECT '{c}' AS \"column\", n AS n_rows, n - cnt_{c} AS n_nulls, "
            f"nd_{c} AS n_distinct, mn_{c} AS min_num, mx_{c} AS max_num, "
            f"CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str "
            f"FROM s"
        )
    for c in stri:
        rows.append(
            f"SELECT '{c}', n, n - cnt_{c}, nd_{c}, CAST(NULL AS DOUBLE), "
            f"CAST(NULL AS DOUBLE), smn_{c}, smx_{c} FROM s"
        )
    return (
        "WITH s AS (SELECT " + ", ".join(stats) + " FROM events) "
        + " UNION ALL ".join(rows)
    )


@register("profile_events", _profile_events_sql())
def q_profile_events(spark, sf_dir):
    """Single-pass column profile of the events fact table (nulls, exact
    distincts, min/max per column) — the data-quality report run before
    and after every major transform.  ONE aggregate reads the table once
    for all columns (plan-tested); the per-column reshape is a literal
    explode of the 1-row result."""
    from ..operators.profile import profile_columns

    ev = load_table(spark, sf_dir, "events")
    return profile_columns(
        ev,
        numeric_cols=["event_id", "user_id", "value"],
        string_cols=["event_type"],
    )


#: ONE definition of the synthetic CDC correction delta — every 10th
#: customer's balance corrected (+100), every 17th re-crawled as a NEW key
#: (+1M).  stream_cdc_upsert's batch-equivalence oracle depends on ITS
#: delta being this exact fixture (stream-unique keys), so both queries and
#: both oracles must share these two definitions.
_CDC_DELTA_CTE = """
    delta AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 100.0 AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 = 3
        UNION ALL
        SELECT c_custkey + 10000000000, c_name, c_nationkey, c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 17 = 5)
"""


def _cdc_delta(cust):
    """The same delta as :data:`_CDC_DELTA_CTE`, as a DataFrame."""
    upd = cust.filter(F.col("c_custkey") % 10 == 3).withColumn(
        "c_acctbal", F.col("c_acctbal") + 100.0
    )
    ins = cust.filter(F.col("c_custkey") % 17 == 5).withColumn(
        "c_custkey", F.col("c_custkey") + F.lit(10_000_000_000)
    )
    return upd.unionByName(ins)


@register(
    "cdc_merge_upsert",
    f"""
    WITH {_CDC_DELTA_CTE}
    SELECT coalesce(d.c_custkey, c.c_custkey) AS c_custkey,
           CASE WHEN d.c_custkey IS NOT NULL THEN d.c_name
                ELSE c.c_name END AS c_name,
           CASE WHEN d.c_custkey IS NOT NULL THEN d.c_nationkey
                ELSE c.c_nationkey END AS c_nationkey,
           CASE WHEN d.c_custkey IS NOT NULL THEN d.c_acctbal
                ELSE c.c_acctbal END AS c_acctbal,
           CASE WHEN d.c_custkey IS NOT NULL THEN d.c_mktsegment
                ELSE c.c_mktsegment END AS c_mktsegment,
           CASE WHEN d.c_custkey IS NOT NULL AND c.c_custkey IS NOT NULL
                THEN 'update'
                WHEN d.c_custkey IS NOT NULL THEN 'insert'
                ELSE 'keep' END AS action
    FROM customer c FULL OUTER JOIN delta d ON c.c_custkey = d.c_custkey
    """,
)
def q_cdc_merge_upsert(spark, sf_dir):
    """Keyed merge of a synthetic correction delta into the customer
    snapshot (the batch MERGE INTO shape): every 10th customer's balance
    corrected (+100), every 17th re-crawled as a NEW key (+1M) — inserts,
    updates and carried-forward rows all exercised and annotated.  One
    shuffle join on the key; at 100 TB the snapshot is bucketed by key so
    the (small) delta co-locates without reshuffling the store."""
    from ..operators.cdc import merge_upsert

    cust = load_table(spark, sf_dir, "customer")
    return merge_upsert(cust, _cdc_delta(cust), ["c_custkey"])


@register(
    "agg_grouping_sets",
    """
    WITH t AS (SELECT event_type, CAST(month(ts) AS INTEGER) AS month, value
               FROM events)
    SELECT event_type, month,
           CAST(grouping_id(event_type, month) AS INTEGER) AS gid,
           count(*) AS n, round(sum(value), 6) AS sum_value
    FROM t GROUP BY GROUPING SETS ((event_type, month), (event_type), (month))
    """,
)
def q_agg_grouping_sets(spark, sf_dir):
    """ARBITRARY grouping sets — the form rollup/cube can't express:
    (type, month) detail plus BOTH one-dimensional margins, without the
    grand total.  Completes the grouping-set family (agg_rollup/agg_cube
    are the hierarchical/powerset specializations).  Same scale shape:
    Spark expands the sets map-side (Expand), so the fact table is read
    and shuffled once; gid disambiguates margin rows from natural nulls."""
    ev = _grouped_events(spark, sf_dir)
    return (
        ev.groupingSets(
            [["event_type", "month"], ["event_type"], ["month"]],
            "event_type",
            "month",
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select("event_type", "month", "gid", "n", "sum_value")
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 / Q16 lite analogues (r7 — the scalar-max-HAVING and
# distinct-count-with-exclusion join shapes the earlier analogues miss)
# ---------------------------------------------------------------------------

_CENTS = "CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)"


@register(
    "tpch_top_supplier",
    f"""
    WITH srev AS (
      SELECT l_suppkey,
             CAST(sum({_CENTS}) AS BIGINT) AS total_rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey),
    mx AS (SELECT max(total_rev_cents) AS m FROM srev)
    SELECT s.s_suppkey, s.s_name, r.total_rev_cents
    FROM supplier s
    JOIN srev r ON s.s_suppkey = r.l_suppkey
    JOIN mx ON r.total_rev_cents = mx.m
    """,
)
def q_tpch_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): per-supplier quarterly revenue, keep
    the supplier(s) equal to the scalar MAX — the aggregate-then-compare-
    to-scalar-aggregate pattern (Q15's view + correlated max).

    Scale notes: the date filter pushes into the fact scan; ONE map-side-
    combinable shuffle on l_suppkey builds srev; the max is a 1-row
    relation Catalyst broadcasts into the equality join (plan: broadcast
    nested loop on a single row — constant cost); supplier is a broadcast
    dim.  Money is summed as row-level INTEGER cents (house rule): the
    max-EQUALITY membership can never flip on a last-ulp sum difference
    between engines, which a double-sum max would risk at every scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("bigint")
    # srev feeds BOTH the scalar max and the equality join; without the pin
    # Catalyst plans TWO full fact scans + shuffles (plan-tested).  The
    # cached relation is (suppkey, cents) — tiny at any scale; scoped
    # release with the result handle.
    from ..operators.caching import scoped_persist

    srev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(cents).cast("bigint").alias("total_rev_cents"))
        .persist()
    )
    mx = srev.agg(F.max("total_rev_cents").alias("m"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    out = (
        srev.join(F.broadcast(mx), F.col("total_rev_cents") == F.col("m"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev_cents")
    )
    return scoped_persist(out, srev)


@register(
    "tpch_parts_supplier_count",
    """
    WITH excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
    pairs AS (
      SELECT DISTINCT p.p_brand, p.p_size, l.l_suppkey
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_size <= 25
        AND l.l_suppkey NOT IN (SELECT s_suppkey FROM excl))
    SELECT p_brand, p_size, CAST(count(*) AS BIGINT) AS supplier_cnt
    FROM pairs GROUP BY p_brand, p_size
    """,
)
def q_tpch_parts_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per part attribute, EXCLUDING a supplier blacklist — the
    distinct-aggregate + anti-join combination (Q16's NOT IN + count
    distinct), blacklist-lite = negative account balance.

    Scale notes: the p_size predicate pushes into the part scan and part
    broadcasts into the fact join; the blacklist is an anti join (never a
    collected NOT-IN list — at 100 TB the blacklist is a relation, not a
    literal); DISTINCT pre-aggregates map-side on (brand, size, suppkey)
    before the count shuffle, the standard two-phase distinct-count."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 25)
        .select("p_partkey", "p_brand", "p_size")
    )
    excl = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    pairs = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(excl), "l_suppkey", "left_anti")
        .select("p_brand", "p_size", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("supplier_cnt")
    )
