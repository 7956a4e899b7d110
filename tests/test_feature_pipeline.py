"""Golden end-to-end EP1 pipeline test (SURVEY §5.2.2): run the synthetic
wastewater fixture through engineer_features and assert the derived schema
and the invariants the reference guarantees."""

import pytest
from pyspark.sql import functions as F

from cdc_wastewater_analysis_ml_spark.plans.features import engineer_features, model_ready
from cdc_wastewater_analysis_ml_spark.schema import (
    DROP_COLUMNS,
    MODEL_FEATURES,
    WASTEWATER_SCHEMA,
)
from cdc_wastewater_analysis_ml_spark.sources import scan_csv
from tools.wastewater_fixture import write_fixture

DERIVED_COLUMNS = {
    "collection_month": "int",
    "collection_week": "int",
    "collection_dayofweek": "int",
    "flow_rate_missing": "int",
    "flowpop_lin_missing": "int",
    "log_population_served": "double",
    "log_flow_rate": "double",
    "influenza_a_detected": "int",
    "log_pcr_target_conc": "double",
    "log_conc_lag1": "double",
    "log_conc_lag2": "double",
    "population_group": "string",
    "jurisdiction_target_mean": "double",
    "population_group_encoded": "int",
    "pop_x_flow": "double",
    "pop_x_rec_eff": "double",
}


@pytest.fixture(scope="module")
def raw(spark, tmp_path_factory):
    path = write_fixture(str(tmp_path_factory.mktemp("ww")), n_rows=4000)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def engineered(raw):
    out = engineer_features(raw)
    out.cache().count()
    return out


def test_derived_schema(engineered):
    types = dict(engineered.dtypes)
    for col, expected in DERIVED_COLUMNS.items():
        assert col in types, f"missing derived column {col}"
        assert types[col] == expected, f"{col}: {types[col]} != {expected}"
    for col in DROP_COLUMNS:
        assert col not in types, f"{col} should have been dropped"


def test_reference_invariants(engineered):
    agg = engineered.agg(
        F.max(F.abs(F.col("flowpop_lin_missing"))).alias("flowpop_ind"),
        F.min("population_group_encoded").alias("enc_min"),
        F.max("population_group_encoded").alias("enc_max"),
        F.max("rec_eff_percent").alias("rec_eff_max"),
        F.sum(F.col("flow_rate").isNull().cast("int")).alias("flow_nulls"),
        F.sum(F.col("jurisdiction_target_mean").isNull().cast("int")).alias("jtm_nulls"),
        F.max("jurisdiction_target_mean").alias("jtm_max"),
        F.min(F.col("influenza_a_detected")).alias("label_min"),
        F.max(F.col("influenza_a_detected")).alias("label_max"),
    ).first()
    assert agg["flowpop_ind"] == 0  # reference quirk: fill-before-indicator
    assert agg["enc_min"] >= -1 and agg["enc_max"] <= 3
    assert agg["rec_eff_max"] <= 100.0  # clip; null preserved separately
    assert agg["flow_nulls"] == 0  # median-filled
    assert agg["jtm_nulls"] == 0 and agg["jtm_max"] <= 1.0
    assert agg["label_min"] == 0 and agg["label_max"] == 1


def test_corrected_flowpop_indicator(raw):
    out = engineer_features(raw, corrected_flowpop_indicator=True)
    n_flagged = out.filter(F.col("flowpop_lin_missing") == 1).count()
    assert n_flagged > 0  # ~5% of fixture rows are null pre-fill


def test_lag_first_row_per_jurisdiction_is_zero(engineered):
    # The lag tiebreak column (sample_id) is dropped later in the pipeline, so
    # the exact first row is not reconstructable here; the order-robust
    # invariant is that every jurisdiction has ≥1 row with the 0.0 lag fill.
    per_j = engineered.groupBy("wwtp_jurisdiction").agg(
        F.min(F.abs(F.col("log_conc_lag1"))).alias("min_lag1")
    )
    assert per_j.filter(F.col("min_lag1") != 0.0).count() == 0


def test_dedup_removed_injected_duplicates(raw, engineered):
    # fixture appends ~1% verbatim duplicates; pipeline dedups full rows of
    # the *engineered* relation (post-drop), so the count must be well below
    # the raw count and at least the distinct raw count minus date-coerced.
    assert engineered.count() < raw.count()


def test_model_ready_drops_nulls(engineered):
    mr = model_ready(engineered)
    assert mr.count() > 0
    for c in MODEL_FEATURES:
        assert mr.filter(F.col(c).isNull()).count() == 0


def test_csv_roundtrip_schema(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wwcsv"))
    write_fixture(d, n_rows=500)
    df = scan_csv(spark, f"{d}/wastewater_samples.csv", schema=WASTEWATER_SCHEMA)
    assert df.count() >= 500
    out = engineer_features(df)
    assert "log_conc_lag2" in out.columns


def test_batched_mode_matches_pinned_tiebreak(spark):
    """r14: engineer_features batches its fill literals into one aggregate
    using F.mode(col, deterministic=True); that builtin must keep
    agg_mode_global's pinned semantics — nulls skipped, ties broken by the
    LOWEST value among the most frequent — or the fills diverge."""
    from cdc_wastewater_analysis_ml_spark.operators.aggregates import mode_scalar

    t = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), ("c",), (None,)], "v string"
    )
    assert mode_scalar(t, "v") == "a"
    assert t.agg(F.mode(F.col("v"), True)).first()[0] == "a"
    empty = spark.createDataFrame([(None,), (None,)], "v string")
    assert mode_scalar(empty, "v") is None
    assert empty.agg(F.mode(F.col("v"), True)).first()[0] is None


def test_batched_scalars_match_sequential(raw):
    """r14: the one-job scalar batch must equal the six sequential scalar
    actions it replaced (each input column is unmutated at its original
    read point in the pipeline)."""
    from cdc_wastewater_analysis_ml_spark.operators.aggregates import (
        median_scalar,
        mode_scalar,
    )
    from cdc_wastewater_analysis_ml_spark.functions import scalars as S

    df = raw.withColumn(
        "sample_collect_date", S.cast_timestamp("sample_collect_date")
    )
    batched = df.agg(
        F.median("flow_rate"),
        F.median("pcr_target_flowpop_lin"),
        F.median("lod_sewage"),
        F.mode(F.col("pasteurized"), True),
        F.mode(F.col("counties_served"), True),
        F.mode(F.col("pcr_gene_target_agg"), True),
    ).first()
    assert batched[0] == median_scalar(df, "flow_rate")
    assert batched[1] == median_scalar(df, "pcr_target_flowpop_lin")
    assert batched[2] == median_scalar(df, "lod_sewage")
    assert batched[3] == mode_scalar(df, "pasteurized")
    assert batched[4] == mode_scalar(df, "counties_served")
    assert batched[5] == mode_scalar(df, "pcr_gene_target_agg")
