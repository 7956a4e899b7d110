"""EP1: the full feature-engineering pipeline (codes.py:21-111, SURVEY §3).

Reproduces the reference's *observed* semantics step-for-step, as one lazy
Spark plan with two driver-scalar actions (the median/mode fills — the same
two-query structure the reference has).  Reference quirks are reproduced by
default and individually correctable via flags (SURVEY §7 hard-part 7):

- ``flowpop_lin_missing``: the reference fills BEFORE computing the
  indicator (codes.py:39-40), so the indicator is constantly 0.  With
  ``corrected_flowpop_indicator=True`` the indicator is computed first.
- ``jurisdiction_target_mean``: fitted on the FULL table (train leakage,
  codes.py:67-69).  ``target_encode_fit_df`` lets callers pass a train-only
  relation for the leakage-free variant.

Scale notes: the only shuffles are (a) the lag window on
(wwtp_jurisdiction), (b) the target-encoding aggregate (tiny output,
broadcast back), (c) ``dropDuplicates`` on all columns.  Everything else is
narrow and whole-stage-codegen'd.  The global sort of the reference
(codes.py:55) is NOT reproduced — Spark relations are unordered; ordering
lives in the window spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scalars as S
from ..operators import aggregates as A
from ..operators import relational as R
from ..operators import windows as W
from ..schema import (
    DROP_COLUMNS,
    LABEL_COLUMN,
    MODEL_FEATURES,
    POPULATION_BINS,
    POPULATION_LABELS,
)


def engineer_features(
    df: DataFrame,
    corrected_flowpop_indicator: bool = False,
    target_encode_fit_df: DataFrame | None = None,
    lag_tiebreak: str = "sample_id",
) -> DataFrame:
    """Raw ``wastewater_samples`` relation → model-ready relation with the 16
    derived columns of FIXTURES.md §C.  Mirrors codes.py:28-109 in order.
    """
    # --- time features (codes.py:28-31) ---
    df = df.withColumn("sample_collect_date", S.cast_timestamp("sample_collect_date"))
    df = df.withColumn("collection_month", S.date_month("sample_collect_date"))
    df = df.withColumn("collection_week", S.date_isoweek("sample_collect_date"))
    df = df.withColumn("collection_dayofweek", S.date_weekday("sample_collect_date"))

    # --- imputation (codes.py:34-43): aggregate → driver scalar → literal,
    # the reference's own two-pass structure (SURVEY §3 EP1).
    # r14 (opt): ALL six fill literals (2+1 medians, 3 modes) are computed
    # in ONE batched aggregate job here instead of six separate scalar
    # actions strung through the pipeline — the serial scalar chain was 12
    # tiny driver-barrier jobs (~0.4 s of pure job latency at any scale).
    # Value-identical: each scalar aggregates a column that NO earlier
    # pipeline step mutates before its original read point (fills touch
    # other columns; the window/bucketize/target-encode steps only ADD
    # columns; join_broadcast_map is row-preserving; dedup_rows runs after
    # every fill), and F.mode(col, deterministic=True) implements exactly
    # agg_mode_global's pinned tie-break (nulls skipped, lowest value among
    # the most frequent — equivalence tested in test_feature_pipeline).
    scalars = df.agg(
        F.median("flow_rate").alias("flow_med"),
        F.median("pcr_target_flowpop_lin").alias("flowpop_med"),
        F.median("lod_sewage").alias("lod_med"),
        F.mode(F.col("pasteurized"), True).alias("pasteurized_mode"),
        F.mode(F.col("counties_served"), True).alias("counties_mode"),
        F.mode(F.col("pcr_gene_target_agg"), True).alias("gene_mode"),
    ).first()

    df = df.withColumn("flow_rate_missing", S.null_indicator("flow_rate"))
    df = df.withColumn("flow_rate", S.fill_null("flow_rate", scalars["flow_med"]))

    if corrected_flowpop_indicator:
        df = df.withColumn("flowpop_lin_missing", S.null_indicator("pcr_target_flowpop_lin"))
        df = df.withColumn(
            "pcr_target_flowpop_lin",
            S.fill_null("pcr_target_flowpop_lin", scalars["flowpop_med"]),
        )
    else:
        # Observed reference bug (codes.py:39-40): fill first, then indicator
        # → indicator ≡ 0.  Reproduced faithfully.
        df = df.withColumn(
            "pcr_target_flowpop_lin",
            S.fill_null("pcr_target_flowpop_lin", scalars["flowpop_med"]),
        )
        df = df.withColumn(
            "flowpop_lin_missing", S.null_indicator("pcr_target_flowpop_lin")
        )

    # --- logs + label (codes.py:46-51) ---
    df = df.withColumn("log_population_served", S.log1p_("population_served"))
    df = df.withColumn("log_flow_rate", S.log1p_("flow_rate"))
    df = df.withColumn(LABEL_COLUMN, S.derive_binary_label("pcr_target_avg_conc"))
    df = df.withColumn("log_pcr_target_conc", S.log1p_("pcr_target_avg_conc"))

    # --- per-jurisdiction lags (codes.py:55-59); deterministic tiebreak
    # replaces the reference's unstable quicksort tie order (SURVEY §2.5) ---
    df = W.window_lag(
        df,
        ["wwtp_jurisdiction"],
        ["sample_collect_date", lag_tiebreak],
        "log_pcr_target_conc",
        offsets=(1, 2),
        default=0.0,
        out_prefix="log_conc_lag",
    )

    # --- population bucketing (codes.py:61-63) ---
    df = df.withColumn(
        "population_group",
        S.bucketize("population_served", POPULATION_BINS, POPULATION_LABELS),
    )

    # --- target encoding (codes.py:67-69): full-table fit by default
    # (observed leakage semantics); pass a train-only df to correct ---
    fit_df = target_encode_fit_df if target_encode_fit_df is not None else df
    target_map = A.agg_mean_by_key(
        fit_df, "wwtp_jurisdiction", LABEL_COLUMN, out="jurisdiction_target_mean"
    )
    df = R.join_broadcast_map(
        df, target_map, "wwtp_jurisdiction", "jurisdiction_target_mean", default=0.5
    )

    # --- drop unused columns (codes.py:72-79) ---
    df = R.drop_columns(df, DROP_COLUMNS)

    # --- remaining fills + capping (codes.py:82-93); literals from the
    # batched aggregate above (value-identical — see that comment) ---
    df = df.withColumn(
        "pasteurized", S.fill_null("pasteurized", scalars["pasteurized_mode"])
    )
    df = df.withColumn(
        "counties_served",
        S.fill_null("counties_served", scalars["counties_mode"]),
    )
    df = df.withColumn(
        "lod_sewage", S.fill_null("lod_sewage", scalars["lod_med"])
    )
    df = df.withColumn(
        "pcr_gene_target_agg",
        S.fill_null("pcr_gene_target_agg", scalars["gene_mode"]),
    )
    df = df.withColumn("rec_eff_percent", S.clip_upper("rec_eff_percent", 100.0))

    # --- dedup, mid-pipeline exactly like the reference (codes.py:96) ---
    df = R.dedup_rows(df)

    # --- ordinal encoding (codes.py:99-104) + interactions (codes.py:108-109) ---
    df = df.withColumn(
        "population_group_encoded",
        S.ordinal_encode("population_group", POPULATION_LABELS),
    )
    df = df.withColumn(
        "pop_x_flow", S.interaction("log_population_served", "log_flow_rate")
    )
    df = df.withColumn(
        "pop_x_rec_eff", S.interaction("log_population_served", "rec_eff_percent")
    )
    return df


def model_ready(df: DataFrame) -> DataFrame:
    """Feature sub-table with nulls dropped ≙ codes.py:183-197."""
    return R.filter_notnull(
        R.project_columns(df, MODEL_FEATURES + [LABEL_COLUMN]),
        MODEL_FEATURES + [LABEL_COLUMN],
    )
