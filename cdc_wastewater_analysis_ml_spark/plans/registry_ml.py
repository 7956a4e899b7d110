"""Registry part 3: the EP1 composite pipeline as one oracle-gated query,
plus rows-only ML queries (SURVEY §2.9 — model fits have no SQL oracle; the
driver records the weaker rows-only check for them, golden tests cover the
numerics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalars as S
from ..operators import aggregates as A
from ..operators import relational as R
from ..operators import windows as W
from ..sources import load_table
from . import ml
from .registry import register

# ---------------------------------------------------------------------------
# EP1 composition over events: the reference's feature-engineering chain
# (codes.py:28-109) re-targeted at the events fixture, end-to-end in ONE
# oracle-gated query: date parts → null indicator → median fill → log →
# label → per-key lags → bucketize → target-encode → interaction.
# ---------------------------------------------------------------------------


@register(
    "pipeline_feature_engineering",
    """
    WITH t AS (SELECT *, CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS v
               FROM events),
      m AS (SELECT median(v) AS med FROM t),
      f AS (SELECT event_id, user_id, ts, event_type,
                   CAST(month(ts) AS INTEGER) AS collection_month,
                   CAST(isodow(ts) - 1 AS INTEGER) AS collection_dayofweek,
                   CAST(v IS NULL AS INTEGER) AS v_missing,
                   coalesce(v, (SELECT med FROM m)) AS v_filled,
                   CASE WHEN v > 50 THEN 1 ELSE 0 END AS detected
            FROM t),
      g AS (SELECT f.*,
                   round(ln(1 + v_filled), 6) AS log_v,
                   lag(round(ln(1 + v_filled), 6), 1, 0.0) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS log_v_lag1,
                   lag(round(ln(1 + v_filled), 6), 2, 0.0) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS log_v_lag2,
                   CASE WHEN v_filled >= 0 AND v_filled < 50 THEN 'low'
                        WHEN v_filled >= 50 AND v_filled < 200 THEN 'mid'
                        WHEN v_filled >= 200 THEN 'high'
                        ELSE NULL END AS value_group
            FROM f),
      enc AS (SELECT user_id, avg(detected) AS user_target_mean
              FROM g GROUP BY user_id)
    SELECT g.event_id, g.collection_month, g.collection_dayofweek, g.v_missing,
           g.detected, g.log_v, g.log_v_lag1, g.log_v_lag2, g.value_group,
           coalesce(enc.user_target_mean, 0.5) AS user_target_mean,
           floor(g.log_v * coalesce(enc.user_target_mean, 0.5)
                 * 1000000 + 0.5) / 1000000 AS interact_v_mean
    FROM g LEFT JOIN enc USING (user_id)
    """,
)
def q_pipeline_fe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1 end-to-end composition (codes.py:28-109) on events: every §2 stage
    chained as ONE lazy plan — two shuffles total (lag window + encoding agg),
    scalar median via the reference's own two-query structure."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v",
        F.when(F.col("event_id") % 10 == 0, F.lit(None).cast("double")).otherwise(
            F.col("value")
        ),
    )
    med = A.median_scalar(ev, "v")
    f = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        S.date_month("ts").alias("collection_month"),
        S.date_weekday("ts").cast("int").alias("collection_dayofweek"),
        S.null_indicator("v").alias("v_missing"),
        S.fill_null("v", med).alias("v_filled"),
        S.derive_binary_label("v", 50.0).alias("detected"),
    ).withColumn("log_v", F.round(S.log1p_("v_filled"), 6))
    g = W.window_lag(
        f, ["user_id"], ["ts", "event_id"], "log_v", offsets=(1, 2), default=0.0,
        out_prefix="log_v_lag",
    ).withColumn(
        "value_group",
        S.bucketize("v_filled", [0.0, 50.0, 200.0, float("inf")], ["low", "mid", "high"]),
    )
    enc = A.agg_mean_by_key(g, "user_id", "detected", out="user_target_mean")
    out = R.join_broadcast_map(g, enc, "user_id", "user_target_mean", default=0.5)
    return out.select(
        "event_id",
        "collection_month",
        "collection_dayofweek",
        "v_missing",
        "detected",
        "log_v",
        "log_v_lag1",
        "log_v_lag2",
        "value_group",
        # RAW quotient publication (r12, the quality_linear_score rule):
        # avg(0/1 ints) per user is a single int-quotient division —
        # bit-identical cross-engine — so round(·, 6) only ADDED the
        # .5-at-the-7th-digit boundary class.  The interaction product
        # consumes the same raw value on both engines.
        F.col("user_target_mean").alias("user_target_mean"),
        # Portable rounding: the product of a 6-decimal value and a small
        # rational (k/n mean) lands on .5e-6 decimal boundaries where Spark's
        # BigDecimal HALF_UP and DuckDB's numeric round disagree on the same
        # double; floor(x*1e6 + 0.5)/1e6 over identical raw-quotient inputs
        # is the same IEEE op sequence in both engines.
        (
            F.floor(
                F.col("log_v") * F.col("user_target_mean") * 1e6 + 0.5
            )
            / 1e6
        ).alias("interact_v_mean"),
    )


@register(
    "threshold_binarize",
    """
    SELECT event_id,
           CASE WHEN floor(value / 500.0 * 100 + 0.5) / 100 > 0.5
                THEN 1 ELSE 0 END AS pred
    FROM events
    """,
)
def q_threshold_binarize(spark, sf_dir):
    """(pred > 0.5).astype(int) ≙ codes.py:260."""
    ev = load_table(spark, sf_dir, "events")
    # portable rounding: round(x, 2) can flip across the 0.5 cut on .xx5
    # boundary doubles (engine-dependent); floor(x*100+0.5)/100 cannot
    score = F.floor(F.col("value") / 500.0 * 100 + 0.5) / 100
    return ev.select(
        "event_id", F.when(score > 0.5, 1).otherwise(0).alias("pred")
    )


# ---------------------------------------------------------------------------
# Rows-only ML queries (no SQL oracle — model fits; SURVEY §2.9).  Each trains
# on a deterministic feature/label derivation from events and emits a small
# metrics relation; golden tests assert the numeric behavior.
# ---------------------------------------------------------------------------


def _ml_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic supervised frame: label = seasonal+magnitude signal."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        (F.col("value") / 100.0).alias("f1"),
        (F.col("user_id") % 7).cast("double").alias("f2"),
        F.dayofweek("ts").cast("double").alias("f3"),
        F.when(
            (F.col("value") + 20 * (F.col("user_id") % 7)) > 100, 1
        ).otherwise(0).cast("double").alias("label"),
    )


@register(
    "ml_split_stratified_counts",
    """
    WITH m AS (
      SELECT CAST(CASE WHEN (value + 20 * (user_id % 7)) > 100
                       THEN 1 ELSE 0 END AS DOUBLE) AS label
      FROM events)
    SELECT label,
           count(*) - CAST(floor(count(*) * 0.2) AS BIGINT) AS train_n,
           CAST(floor(count(*) * 0.2) AS BIGINT) AS test_n
    FROM m GROUP BY label
    """,
)
def q_ml_split(spark, sf_dir):
    """Exact stratified 80/20 split ≙ codes.py:203-205 — emits per-class
    train/test counts.  HASH-gated (upgraded from rows-only): the split is
    exact-count by construction, so test_n = ⌊n_c·0.2⌋ and train_n = n_c −
    test_n are pure SQL over the same label derivation — the oracle pins the
    split's defining invariant without needing to replicate the seeded hash
    order (row membership stays engine-specific; SURVEY §5.2.3)."""
    df = _ml_frame(spark, sf_dir)
    train, test = ml.split_train_test_stratified(df, "label", 0.2, seed=42)
    tr = train.groupBy("label").agg(F.count(F.lit(1)).alias("train_n"))
    te = test.groupBy("label").agg(F.count(F.lit(1)).alias("test_n"))
    return tr.join(te, "label").orderBy("label")


# ---------------------------------------------------------------------------
# HASH-gated model-fit queries (r14, VERDICT r13 task 8 — the sketch-query
# pattern from r11): a model fit has no SQL oracle, but its INVARIANTS do.
# Each upgraded query publishes (a) the exact test-split size — the oracle
# re-derives Σ_c ⌊n_c·0.2⌋ from the same label rule, so a splitter
# regression flips a hash-compared integer — and (b) Spark-evaluated
# quality booleans (scored-row conservation, metric ranges, above-chance
# AUC — the same bounds tests/test_ml_pipeline.py asserts) that the oracle
# asserts TRUE, so a broken fit flips the value hash instead of hiding
# behind a rows-only row.  The RAW metric values stay published by
# `ml_reference_scenarios_full` (rows-only by design — the fits
# themselves remain engine-specific).
# ---------------------------------------------------------------------------

#: label rule shared with the `_ml_frame` builder — keep in sync with the
#: `ml_split_stratified_counts` oracle above.
_ML_LABEL_CTE = """
    WITH m AS (
      SELECT CAST(CASE WHEN (value + 20 * (user_id % 7)) > 100
                       THEN 1 ELSE 0 END AS DOUBLE) AS label
      FROM events),
    c AS (SELECT count(*) AS cnt FROM m GROUP BY label)
"""


def _metric_invariant_sql(model: str) -> str:
    return (
        _ML_LABEL_CTE
        + f"""
    SELECT '{model}' AS model,
           CAST(sum(CAST(floor(cnt * 0.2) AS BIGINT)) AS BIGINT) AS n_test,
           TRUE AS n_scored_ok,
           TRUE AS acc_in_range,
           TRUE AS auc_above_chance,
           TRUE AS ap_in_range
    FROM c
    """
    )


def _metric_invariant_df(spark, r, n_scored: int, n_test: int) -> DataFrame:
    """One hash-comparable row of fit invariants (see block comment)."""
    return spark.createDataFrame(
        [(
            r.model,
            int(n_test),
            bool(n_scored == n_test),
            bool(0.5 < r.accuracy <= 1.0),
            bool(0.55 < r.roc_auc <= 1.0),
            bool(0.0 < r.average_precision <= 1.0),
        )],
        "model string, n_test bigint, n_scored_ok boolean, "
        "acc_in_range boolean, auc_above_chance boolean, ap_in_range boolean",
    )


@register("ml_gbt_metrics", _metric_invariant_sql("gbt"))
def q_ml_gbt(spark, sf_dir):
    """GBT train/score/evaluate ≙ codes.py:226,251,264-271.  HASH-gated
    (r14, upgraded from rows-only): exact test-split size + fit-invariant
    booleans; raw metrics live in ml_reference_scenarios_full."""
    df = _ml_frame(spark, sf_dir)
    train, test = ml.split_train_test_stratified(df, "label", 0.2, seed=42)
    feats = ["f1", "f2", "f3"]
    from pyspark.ml.classification import GBTClassifier

    model = GBTClassifier(
        labelCol="label", featuresCol="features_raw", maxIter=10, maxDepth=3,
        stepSize=0.1, seed=42,
    ).fit(ml.assemble(train, feats))
    scored = ml.score_gbt(model, ml.assemble(test, feats), "label")
    r = ml.evaluate_scored(scored, "gbt")
    return _metric_invariant_df(spark, r, scored.count(), test.count())


@register("ml_linear_probability_metrics", _metric_invariant_sql("linreg"))
def q_ml_linreg(spark, sf_dir):
    """OLS-as-classifier ≙ codes.py:227,258-261.  HASH-gated (r14): exact
    test-split size + fit-invariant booleans (see block comment)."""
    df = _ml_frame(spark, sf_dir)
    train, test = ml.split_train_test_stratified(df, "label", 0.2, seed=42)
    feats = ["f1", "f2", "f3"]
    model = ml.train_linear_probability(ml.assemble(train, feats), "label", "features_raw")
    scored = ml.score_linear(model, ml.assemble(test, feats), "label")
    r = ml.evaluate_scored(scored, "linreg")
    return _metric_invariant_df(spark, r, scored.count(), test.count())


#: Closed-form eigenvalues of the 3×3 CORRELATION matrix (trigonometric
#: method for symmetric 3×3): the scaler is withMean+withStd with sample
#: (n−1) statistics, so the PCA input's covariance IS the sample
#: correlation matrix of (f1, f2, f3) — which DuckDB's corr() computes
#: exactly.  λ₁ = 1+2p·cos φ (largest), λ₃ = 1+2p·cos(φ+2π/3) (smallest),
#: λ₂ = 3−λ₁−λ₃, with p = √((a²+b²+c²)/3), φ = acos(abc/p³)/3 for
#: off-diagonals a, b, c.  k = smallest prefix with cumsum/3 ≥ 0.95 —
#: float_guard note: the fixture's features are near-independent
#: (λ ≈ 1, 1, 1; cum₂ ≈ 0.667), so the 0.95 comparison sits far from any
#: cross-engine ulp boundary; Spark dayofweek = DuckDB dayofweek + 1.
_PCA_K_SQL = """
    WITH f AS (SELECT value / 100.0 AS f1,
                      CAST(user_id % 7 AS DOUBLE) AS f2,
                      CAST(dayofweek(ts) + 1 AS DOUBLE) AS f3
               FROM events),
    pc AS (SELECT corr(f1, f2) AS a, corr(f1, f3) AS b, corr(f2, f3) AS c
           FROM f),
    e AS (SELECT a, b, c, sqrt((a*a + b*b + c*c) / 3.0) AS p FROM pc),
    e2 AS (SELECT p,
                  acos(least(greatest((a*b*c) / (p*p*p), -1.0), 1.0)) / 3.0
                      AS phi
           FROM e),
    lam AS (SELECT 1 + 2*p*cos(phi) AS l1,
                   1 + 2*p*cos(phi + 2*pi()/3.0) AS l3
            FROM e2),
    lam2 AS (SELECT l1, 3.0 - l1 - l3 AS l2, l3 FROM lam),
    kk AS (SELECT CASE WHEN l1 / 3.0 >= 0.95 THEN 1
                       WHEN (l1 + l2) / 3.0 >= 0.95 THEN 2
                       ELSE 3 END AS pca_k,
                  l1, l2, l3
           FROM lam2)
    SELECT CAST(pca_k AS INTEGER) AS pca_k,
           floor((CASE pca_k WHEN 1 THEN l1
                             WHEN 2 THEN l1 + l2
                             ELSE l1 + l2 + l3 END) / 3.0 * 1000000 + 0.5)
               / 1000000 AS explained_variance
    FROM kk
"""


@register("ml_scaler_pca_k", _PCA_K_SQL)
def q_ml_pca(spark, sf_dir):
    """StandardScaler + variance-threshold PCA ≙ codes.py:208-218.
    HASH-gated (r14, upgraded from rows-only): the PCA input's covariance
    is the sample correlation matrix of the three features, so the oracle
    re-derives the eigenvalue spectrum in closed form (see _PCA_K_SQL) and
    both the chosen k AND the cumulative explained variance are
    hash-compared, not just row-counted."""
    df = _ml_frame(spark, sf_dir)
    feats = ["f1", "f2", "f3"]
    assembled = ml.assemble(df, feats)
    scaled = ml.fit_scaler(assembled).transform(assembled)
    model, k = ml.fit_variance_pca(scaled, n_features=len(feats), threshold=0.95)
    cum = float(sum(model.explainedVariance))
    import math as _math

    return spark.createDataFrame(
        [(k, _math.floor(cum * 1e6 + 0.5) / 1e6)],
        "pca_k int, explained_variance double",
    )


@register("ml_gbt_pca_metrics", _metric_invariant_sql("gbt_pca"))
def q_ml_gbt_pca(spark, sf_dir):
    """GBT on 95%-variance PCA features ≙ codes.py:214-216,251 (scenario 3 of
    the reference's 4-row results_df).  HASH-gated (r14): exact test-split
    size + fit-invariant booleans (see block comment above)."""
    df = _ml_frame(spark, sf_dir)
    train, test = ml.split_train_test_stratified(df, "label", 0.2, seed=42)
    feats = ["f1", "f2", "f3"]
    from pyspark.ml.classification import GBTClassifier

    scaler = ml.fit_scaler(ml.assemble(train, feats))
    tr = scaler.transform(ml.assemble(train, feats))
    te = scaler.transform(ml.assemble(test, feats))
    pca, _k = ml.fit_variance_pca(tr, n_features=len(feats), threshold=0.95)
    tr_p, te_p = pca.transform(tr), pca.transform(te)
    model = GBTClassifier(
        labelCol="label", featuresCol="features_pca", maxIter=10, maxDepth=3,
        stepSize=0.1, seed=42,
    ).fit(tr_p)
    scored = ml.score_gbt(model, te_p, "label")
    r = ml.evaluate_scored(scored, "gbt_pca")
    return _metric_invariant_df(spark, r, scored.count(), test.count())


@register(
    "ml_linear_probability_pca_metrics", _metric_invariant_sql("linreg_pca")
)
def q_ml_linreg_pca(spark, sf_dir):
    """OLS-as-classifier on PCA features ≙ codes.py:214-216,258-261 (scenario
    4 of the reference's results_df).  HASH-gated (r14): exact test-split
    size + fit-invariant booleans (see block comment above)."""
    df = _ml_frame(spark, sf_dir)
    train, test = ml.split_train_test_stratified(df, "label", 0.2, seed=42)
    feats = ["f1", "f2", "f3"]
    scaler = ml.fit_scaler(ml.assemble(train, feats))
    tr = scaler.transform(ml.assemble(train, feats))
    te = scaler.transform(ml.assemble(test, feats))
    pca, _k = ml.fit_variance_pca(tr, n_features=len(feats), threshold=0.95)
    tr_p, te_p = pca.transform(tr), pca.transform(te)
    model = ml.train_linear_probability(tr_p, "label", "features_pca")
    scored = ml.score_linear(model, te_p, "label")
    r = ml.evaluate_scored(scored, "linreg_pca")
    return _metric_invariant_df(spark, r, scored.count(), test.count())


# ---------------------------------------------------------------------------
# EP1 on the ACTUAL wastewater schema, under the hard oracle gate: the
# committed synthetic fixture (tools/wastewater_fixture.py, FIXTURES.md §B)
# stands in for the reference's missing CSV, and the DuckDB oracle re-derives
# codes.py:28-109 step-for-step — including the constant-0
# ``flowpop_lin_missing`` quirk (fill-before-indicator, codes.py:39-40) and
# the full-table target-encoding leakage (codes.py:67-69).
# ---------------------------------------------------------------------------

import os as _os

_WW_FIXTURE = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))),
    "fixtures",
    "wastewater_samples.parquet",
)

_WW_EP1_SQL = f"""
    WITH raw AS (SELECT * FROM read_parquet('{_WW_FIXTURE}')),
      med AS (SELECT median(flow_rate) AS flow_med,
                     median(pcr_target_flowpop_lin) AS flowpop_med,
                     median(lod_sewage) AS lod_med
              FROM raw),
      mp AS (SELECT pasteurized AS m FROM (
               SELECT pasteurized, count(*) AS c FROM raw
               WHERE pasteurized IS NOT NULL
               GROUP BY 1 ORDER BY c DESC, pasteurized ASC LIMIT 1)),
      mc AS (SELECT counties_served AS m FROM (
               SELECT counties_served, count(*) AS c FROM raw
               WHERE counties_served IS NOT NULL
               GROUP BY 1 ORDER BY c DESC, counties_served ASC LIMIT 1)),
      mg AS (SELECT pcr_gene_target_agg AS m FROM (
               SELECT pcr_gene_target_agg, count(*) AS c FROM raw
               WHERE pcr_gene_target_agg IS NOT NULL
               GROUP BY 1 ORDER BY c DESC, pcr_gene_target_agg ASC LIMIT 1)),
      t2 AS (SELECT *,
               TRY_CAST(sample_collect_date AS TIMESTAMP) AS ts,
               CAST(flow_rate IS NULL AS INTEGER) AS flow_rate_missing,
               coalesce(flow_rate, (SELECT flow_med FROM med)) AS flow_rate_f,
               coalesce(pcr_target_flowpop_lin,
                        (SELECT flowpop_med FROM med)) AS flowpop_f
             FROM raw),
      t3 AS (SELECT *,
               CAST(month(ts) AS INTEGER) AS collection_month,
               CAST(coalesce(weekofyear(ts), -1) AS INTEGER) AS collection_week,
               CAST(isodow(ts) - 1 AS INTEGER) AS collection_dayofweek,
               CAST(flowpop_f IS NULL AS INTEGER) AS flowpop_lin_missing,
               ln(1 + population_served) AS log_population_served,
               ln(1 + flow_rate_f) AS log_flow_rate,
               CASE WHEN pcr_target_avg_conc > 0 THEN 1 ELSE 0 END
                   AS influenza_a_detected,
               ln(1 + pcr_target_avg_conc) AS log_pcr_target_conc
             FROM t2),
      t4 AS (SELECT *,
               lag(log_pcr_target_conc, 1, 0.0) OVER w AS log_conc_lag1,
               lag(log_pcr_target_conc, 2, 0.0) OVER w AS log_conc_lag2,
               CASE WHEN population_served >= 0 AND population_served < 20000
                         THEN 'Small'
                    WHEN population_served >= 20000 AND population_served < 50000
                         THEN 'Medium'
                    WHEN population_served >= 50000 AND population_served < 200000
                         THEN 'Large'
                    WHEN population_served >= 200000 THEN 'Very Large'
                    ELSE NULL END AS population_group
             FROM t3
             WINDOW w AS (PARTITION BY wwtp_jurisdiction
                          ORDER BY ts ASC NULLS LAST, sample_id ASC)),
      enc AS (SELECT wwtp_jurisdiction, avg(influenza_a_detected) AS jtm
              FROM t4 GROUP BY 1),
      t6 AS (SELECT t4.sewershed_id, t4.wwtp_jurisdiction, t4.county_fips,
                    coalesce(t4.counties_served, (SELECT m FROM mc))
                        AS counties_served,
                    t4.population_served, t4.ts, t4.sample_type,
                    t4.sample_matrix, t4.sample_location,
                    t4.flow_rate_f AS flow_rate, t4.pcr_target_avg_conc,
                    t4.flowpop_f AS pcr_target_flowpop_lin,
                    coalesce(t4.pcr_gene_target_agg, (SELECT m FROM mg))
                        AS pcr_gene_target_agg,
                    coalesce(t4.lod_sewage, (SELECT lod_med FROM med))
                        AS lod_sewage,
                    coalesce(t4.pasteurized, (SELECT m FROM mp)) AS pasteurized,
                    CASE WHEN t4.rec_eff_percent IS NOT NULL
                         THEN least(t4.rec_eff_percent, 100.0) END
                        AS rec_eff_percent,
                    t4.collection_month, t4.collection_week,
                    t4.collection_dayofweek, t4.flow_rate_missing,
                    t4.flowpop_lin_missing, t4.log_population_served,
                    t4.log_flow_rate, t4.influenza_a_detected,
                    t4.log_pcr_target_conc, t4.log_conc_lag1, t4.log_conc_lag2,
                    t4.population_group,
                    coalesce(e.jtm, 0.5) AS jurisdiction_target_mean
             FROM t4 LEFT JOIN enc e USING (wwtp_jurisdiction)),
      t7 AS (SELECT DISTINCT * FROM t6)
    SELECT sewershed_id, wwtp_jurisdiction, county_fips, counties_served,
           population_served, sample_type, sample_matrix, sample_location,
           round(flow_rate, 6) AS flow_rate,
           round(pcr_target_flowpop_lin, 6) AS pcr_target_flowpop_lin,
           pcr_gene_target_agg,
           round(lod_sewage, 6) AS lod_sewage,
           pasteurized,
           round(rec_eff_percent, 6) AS rec_eff_percent,
           collection_month, collection_week, collection_dayofweek,
           flow_rate_missing, flowpop_lin_missing,
           round(log_population_served, 6) AS log_population_served,
           round(log_flow_rate, 6) AS log_flow_rate,
           influenza_a_detected,
           round(log_pcr_target_conc, 6) AS log_pcr_target_conc,
           round(log_conc_lag1, 6) AS log_conc_lag1,
           round(log_conc_lag2, 6) AS log_conc_lag2,
           population_group,
           round(jurisdiction_target_mean, 6) AS jurisdiction_target_mean,
           CASE population_group WHEN 'Small' THEN 0 WHEN 'Medium' THEN 1
                WHEN 'Large' THEN 2 WHEN 'Very Large' THEN 3
                ELSE -1 END AS population_group_encoded,
           floor(log_population_served * log_flow_rate * 1000000 + 0.5)
               / 1000000 AS pop_x_flow,
           floor(log_population_served * rec_eff_percent * 1000000 + 0.5)
               / 1000000 AS pop_x_rec_eff
    FROM t7
"""


@register("pipeline_wastewater_ep1", _WW_EP1_SQL)
def q_pipeline_wastewater_ep1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's EP1 feature engineering (codes.py:28-109) on the
    actual wastewater schema, end-to-end under the hash gate: parse →
    indicators → median/mode fills → logs/label → per-jurisdiction lags →
    bucketize → target-encode → drop → clip → dedup → ordinal encode →
    interactions.  Input is the committed fixture (sf_dir-independent: the
    wastewater table has one scale), quirks reproduced per SURVEY §7.7."""
    from .features import engineer_features

    df = engineer_features(spark.read.parquet(_WW_FIXTURE))
    r6 = lambda c: F.round(F.col(c), 6).alias(c)  # noqa: E731
    flr = lambda expr, name: (F.floor(expr * 1e6 + 0.5) / 1e6).alias(name)  # noqa: E731
    return df.select(
        "sewershed_id", "wwtp_jurisdiction", "county_fips", "counties_served",
        "population_served", "sample_type", "sample_matrix", "sample_location",
        r6("flow_rate"), r6("pcr_target_flowpop_lin"), "pcr_gene_target_agg",
        r6("lod_sewage"), "pasteurized", r6("rec_eff_percent"),
        "collection_month", "collection_week", "collection_dayofweek",
        "flow_rate_missing", "flowpop_lin_missing",
        r6("log_population_served"), r6("log_flow_rate"),
        "influenza_a_detected", r6("log_pcr_target_conc"),
        r6("log_conc_lag1"), r6("log_conc_lag2"), "population_group",
        r6("jurisdiction_target_mean"), "population_group_encoded",
        flr(F.col("log_population_served") * F.col("log_flow_rate"), "pop_x_flow"),
        flr(
            F.col("log_population_served") * F.col("rec_eff_percent"),
            "pop_x_rec_eff",
        ),
    )


@register("ml_reference_scenarios_full", None)
def q_ml_reference_scenarios_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REFERENCE-FIDELITY 4-scenario comparison: {GBT, LinearRegression} ×
    {scaled, 95%-variance PCA} at the reference's n_estimators=100
    (codes.py:226) over the wastewater fixture — the results_df golden-table
    shape of BASELINE.md rows 5-12 (codes.py:309).  Rows-only (model fits
    have no SQL oracle); the registry's other ml_* queries trade boosting
    rounds for runtime (maxIter=10), this one records the full-fidelity run
    under the driver gate (~70 s at fixture scale)."""
    from .features import engineer_features, model_ready
    from ..schema import LABEL_COLUMN, MODEL_FEATURES

    df = model_ready(engineer_features(spark.read.parquet(_WW_FIXTURE)))
    df = df.cache()
    try:
        results = ml.run_reference_scenarios(
            df, MODEL_FEATURES, LABEL_COLUMN, seed=42, max_iter=100
        )
    finally:
        df.unpersist()
    return spark.createDataFrame(
        [
            (r.model, round(r.accuracy, 4), round(r.roc_auc, 4),
             round(r.average_precision, 4))
            for r in results
        ],
        "model string, accuracy double, roc_auc double, average_precision double",
    )
