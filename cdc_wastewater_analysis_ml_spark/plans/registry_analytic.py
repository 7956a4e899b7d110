"""Registry part 9 (r8): analytic extension queries.

Driver gates for the six ``operators/analytic.py`` operators (r7 judge
task 1 — the module landed in the r7 snapshot with zero consumers; every
operator now has an oracle-backed registry query plus edge-case tests in
``tests/test_analytic_ops.py``):

- ``analytic_locf_fill``       — per-key forward fill (pandas ``ffill``,
  reference idiom codes.py:28-40 fillna chains) as a running window.
- ``analytic_ntile``           — SQL-standard NTILE(k) without a global
  single-task window (two-phase row number + integer bucket arithmetic).
- ``analytic_histogram``       — fixed-width integer-cents histogram
  (codes.py:96-135 value_counts/describe EDA, made distributed + exact).
- ``analytic_date_spine``      — calendar day spine for gap-free resampled
  series (the reindex-by-date idiom).
- ``analytic_top_bigrams``     — corpus bigram top-k, pairing as Catalyst
  array expressions in the scan stage.
- ``analytic_edit_distance``   — Levenshtein verification of LSH candidate
  pairs (threshold variant: the DP abandons above ``max_dist``).

House oracle rules: identical aliases both sides, round(x, 6) on doubles,
integer counts/cents, ordering only on integer or rounded values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import analytic as AN
from ..operators import dedup as D
from ..operators import text as T
from ..sources import fan_out, load_table
from .registry import _V_CTE, _events_with_v, register
from .registry_ext import _AUG_CTE, _augmented_docs, _minhash_sql

# ---------------------------------------------------------------------------
# analytic_locf_fill
# ---------------------------------------------------------------------------


@register(
    "analytic_locf_fill",
    _V_CTE
    + """
    SELECT event_id, user_id, round(v, 6) AS v,
           round(last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS v_filled
    FROM t
    """,
)
def q_analytic_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward per user over event time — the
    distributed ``DataFrame.ffill`` (reference fillna idioms, codes.py:28).
    The window partitions by the entity key, so no task ever holds more
    than one user's history; leading nulls (no prior observation) stay
    null on both engines."""
    ev = _events_with_v(spark, sf_dir)
    return AN.locf_fill(ev, "v", ["ts", "event_id"], ["user_id"]).select(
        "event_id",
        "user_id",
        F.round("v", 6).alias("v"),
        F.round("v_filled", 6).alias("v_filled"),
    )


# ---------------------------------------------------------------------------
# analytic_ntile
# ---------------------------------------------------------------------------

_NTILES = 7


@register(
    "analytic_ntile",
    f"""
    SELECT event_id,
           CAST(ntile({_NTILES}) OVER (ORDER BY event_id) AS INTEGER) AS tile
    FROM events
    """,
)
def q_analytic_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(7) over the event_id total order WITHOUT ``Window.orderBy`` on
    the whole relation: the oracle's single ``ntile`` window funnels every
    row through one task, while the engine computes the identical standard
    allocation (first n%k tiles get ceil(n/k) rows) from the two-phase
    global row number plus pure integer arithmetic — fully parallel at any
    scale, bit-identical by construction."""
    ev = load_table(spark, sf_dir, "events")
    return AN.ntile_scalable(ev.select("event_id"), ["event_id"], _NTILES)


# ---------------------------------------------------------------------------
# analytic_histogram
# ---------------------------------------------------------------------------

_BIN_W = 500_000  # $5,000 bins over integer cents
_N_BINS = 16


@register(
    "analytic_histogram",
    f"""
    WITH c AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
               FROM lineitem)
    SELECT CAST(least(greatest(CAST(floor(cents / {_BIN_W}) AS BIGINT), 0),
                      {_N_BINS - 1}) AS INTEGER) AS bin,
           CAST(least(greatest(CAST(floor(cents / {_BIN_W}) AS BIGINT), 0),
                      {_N_BINS - 1}) * {_BIN_W} AS BIGINT) AS bin_lo_cents,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM c
    GROUP BY 1, 2
    """,
)
def q_analytic_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width revenue histogram over integer cents (16 × $5,000 bins,
    overflow clamped into the last bin): one map-side-combinable aggregate
    whose bin ids and sums stay integer end-to-end — the distributed,
    engine-exact ``describe``/``value_counts`` EDA (codes.py:96-135)."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = li.select(
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
    )
    return AN.histogram_fixed(cents, "cents", _BIN_W, _N_BINS)


# ---------------------------------------------------------------------------
# analytic_date_spine
# ---------------------------------------------------------------------------


@register(
    "analytic_date_spine",
    """
    SELECT CAST(CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                AS VARCHAR) AS day
    FROM (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
          FROM events)
    """,
)
def q_analytic_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-day spine spanning the events table: 1-row min/max agg →
    ``sequence`` → ``explode``.  |days| rows regardless of corpus size, so
    gap-fill joins treat the spine as the broadcast side.  Shipped as
    VARCHAR per house rule (driver hash compares pandas values, where
    engine DATE reprs differ)."""
    ev = load_table(spark, sf_dir, "events")
    return AN.date_spine(ev, "ts").select(
        F.col("day").cast("string").alias("day")
    )


# ---------------------------------------------------------------------------
# analytic_top_bigrams
# ---------------------------------------------------------------------------

_TOP_K = 20

_BIGRAM_SQL = rf"""
    WITH t AS (
      SELECT string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'),
                          ' ') AS toks
      FROM documents),
    b AS (
      SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                 i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)))
               AS bigram
      FROM t)
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM b GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT {_TOP_K}
"""


@register("analytic_top_bigrams", _BIGRAM_SQL)
def q_analytic_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 adjacent token pairs: slice+zip_with pairing runs as
    Catalyst array expressions inside the scan stage; the only shuffle is
    the count aggregate and the top-k is TakeOrderedAndProject (ties broken
    by bigram text, so the k-boundary is deterministic on both engines)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return AN.top_bigrams(docs, T.tokenize("text"), _TOP_K)


# ---------------------------------------------------------------------------
# analytic_edit_distance
# ---------------------------------------------------------------------------

_MAX_DIST = 32

_EDIT_SQL = (
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
    , cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           CAST(levenshtein(da.text, db.text) AS INTEGER) AS lev
    FROM cand
    JOIN docs da ON da.doc_id = id_a
    JOIN docs db ON db.doc_id = id_b
    WHERE levenshtein(da.text, db.text) <= {_MAX_DIST}
    """
)


@register("analytic_edit_distance", _EDIT_SQL)
def q_analytic_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of banded-LSH candidate pairs over the
    augmented corpus (near-dup mutations differ by a 14-char tail, so kept
    pairs are guaranteed): the verify stage runs ONLY on candidate edges —
    near-linear at scale — and Spark's threshold ``levenshtein`` abandons
    each pair's DP once the running distance exceeds ``max_dist``, keeping
    per-pair cost O(max_dist · len) on arbitrarily long documents."""
    docs = _augmented_docs(spark, sf_dir)
    cand = D.minhash_lsh_candidates(docs, "text", "doc_id", num_hashes=8, bands=4)
    return AN.edit_distance_verify(cand, docs, "text", "doc_id", _MAX_DIST)
