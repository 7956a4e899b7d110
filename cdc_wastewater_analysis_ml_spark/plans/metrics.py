"""Evaluation-metric operators in relational form (SURVEY §2.10).

The reference computes these with sklearn calls (codes.py:268-296); the engine
expresses each as a pure DataFrame aggregation so they are (a) distributed,
(b) oracle-checkable in SQL, and (c) reusable on any (label, score) relation,
not just MLlib output.

Scale shape: everything first collapses to one row per *distinct score*
(grouped agg, map-side combinable), then runs an ordered window over that
post-aggregation relation.  The window is a single partition, but its
cardinality is #distinct thresholds — bounded and small relative to the input
(for 100 TB of rows with, say, ≤1e6 distinct scores, the window input is ≤1e6
rows).  For truly continuous scores, quantize first (``F.round(score, k)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def metric_accuracy(df: DataFrame, label: str, pred: str, out: str = "accuracy") -> DataFrame:
    """mean(pred == label) ≙ ``accuracy_score`` (codes.py:268)."""
    return df.select(
        F.avg((F.col(pred) == F.col(label)).cast("double")).alias(out)
    )


def metric_confusion_matrix(df: DataFrame, label: str, pred: str) -> DataFrame:
    """(label, pred) cell counts ≙ ``confusion_matrix`` (codes.py:296).

    Long form (one row per cell) rather than pivot: stable schema regardless
    of which classes appear, and directly SQL-comparable.
    """
    return df.groupBy(label, pred).agg(F.count(F.lit(1)).alias("cnt"))


def metric_classification_report(df: DataFrame, label: str, pred: str) -> DataFrame:
    """Per-class precision/recall/F1/support ≙ ``classification_report``
    (codes.py:294), derived from confusion counts in one pass."""
    cells = metric_confusion_matrix(df, label, pred)
    per_class = (
        cells.groupBy(F.col(label).alias("klass"))
        .agg(F.sum("cnt").alias("support"))
        .join(
            cells.groupBy(F.col(pred).alias("klass")).agg(
                F.sum("cnt").alias("predicted")
            ),
            on="klass",
            how="full",
        )
        .join(
            cells.filter(F.col(label) == F.col(pred))
            .groupBy(F.col(label).alias("klass"))
            .agg(F.sum("cnt").alias("tp")),
            on="klass",
            how="left",
        )
        .na.fill({"support": 0, "predicted": 0, "tp": 0})
    )
    precision = F.when(F.col("predicted") > 0, F.col("tp") / F.col("predicted")).otherwise(0.0)
    recall = F.when(F.col("support") > 0, F.col("tp") / F.col("support")).otherwise(0.0)
    f1 = F.when(
        (precision + recall) > 0, 2 * precision * recall / (precision + recall)
    ).otherwise(0.0)
    return per_class.select(
        "klass",
        precision.alias("precision"),
        recall.alias("recall"),
        f1.alias("f1"),
        "support",
    )


def binary_curve(df: DataFrame, label: str, score: str) -> DataFrame:
    """Cumulative confusion stats at every distinct score threshold.

    The shared building block of ROC / PR / AUC / AP (codes.py:270,288):
    group rows by score (ONE shuffle over the raw data, partial-agg
    combinable), then cumulative TP/FP by descending score over the
    per-threshold relation.  Columns: threshold, tp, fp, tpr, fpr,
    precision, recall.
    """
    per_score = df.groupBy(F.col(score).alias("threshold")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(label).cast("long")).alias("pos"),
    )
    w = Window.orderBy(F.desc("threshold")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_score.select(
        "threshold",
        F.sum("pos").over(w).alias("tp"),
        F.sum(F.col("n") - F.col("pos")).over(w).alias("fp"),
    )
    totals = df.select(
        F.sum(F.col(label).cast("long")).alias("P"),
        F.sum(F.lit(1) - F.col(label).cast("long")).alias("N"),
    )
    return cum.crossJoin(F.broadcast(totals)).select(
        "threshold",
        "tp",
        "fp",
        (F.col("tp") / F.col("P")).alias("tpr"),
        (F.col("fp") / F.col("N")).alias("fpr"),
        (F.col("tp") / (F.col("tp") + F.col("fp"))).alias("precision"),
        (F.col("tp") / F.col("P")).alias("recall"),
    )


def metric_roc_auc(df: DataFrame, label: str, score: str, out: str = "roc_auc") -> DataFrame:
    """Trapezoidal AUC over the ROC curve ≙ ``auc(fpr, tpr)`` (codes.py:271).

    Implicit (0,0) start point via lag-default-0 — matches sklearn's
    prepended threshold=inf point.
    """
    curve = binary_curve(df, label, score)
    w = Window.orderBy(F.asc("fpr"), F.asc("tpr"))
    seg = curve.select(
        (
            (F.col("fpr") - F.lag("fpr", 1, 0.0).over(w))
            * (F.col("tpr") + F.lag("tpr", 1, 0.0).over(w))
            / 2.0
        ).alias("area")
    )
    return seg.select(F.sum("area").alias(out))


def metric_average_precision(
    df: DataFrame, label: str, score: str, out: str = "average_precision"
) -> DataFrame:
    """Step-interpolated AP = Σ (Rₙ−Rₙ₋₁)·Pₙ ≙ ``average_precision_score``
    (codes.py:269).  NOT the trapezoidal ``areaUnderPR`` — SURVEY §2.10 pins
    the sklearn step form; MLlib's evaluator is only an approximation of it.
    """
    curve = binary_curve(df, label, score)
    w = Window.orderBy(F.desc("threshold"))
    seg = curve.select(
        (
            (F.col("recall") - F.lag("recall", 1, 0.0).over(w)) * F.col("precision")
        ).alias("contrib")
    )
    return seg.select(F.sum("contrib").alias(out))
