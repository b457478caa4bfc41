"""O16 — confusion matrix and imbalance metrics.

[REF: TestModel-style driver | conf=L] [FSS258 §4.3]:
Accuracy; TPR/TNR; GM = sqrt(TPR*TNR); AUC = (1 + TPR - FPR)/2.
Positive class = 1 (the minority class in the fixtures).
All counts are exact integers; ratios are rounded to 6 decimals for
cross-engine value-hash stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion(pred: DataFrame) -> DataFrame:
    """(label, prediction, cnt) — the multiclass confusion counts."""
    return pred.groupBy("label", "prediction").agg(F.count(F.lit(1)).alias("cnt"))


def metrics_multiclass(pred: DataFrame) -> DataFrame:
    """One-row acc/gm/auc for K classes [FSS258 §4.3 generalized]:
    gm = geometric mean of per-class recalls (the K-class extension of
    sqrt(TPR*TNR); 0 if any class is fully missed), auc = macro-average
    of one-vs-rest (1 + TPR_c - FPR_c)/2. Pure exprs: two tiny
    aggregations + a broadcast join on class id."""
    per = pred.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_c"),
        F.sum(
            F.when(F.col("prediction") == F.col("label"), 1).otherwise(0)
        ).alias("tp_c"),
    )
    byp = pred.groupBy("prediction").agg(F.count(F.lit(1)).alias("p_c"))
    tot = pred.agg(F.count(F.lit(1)).alias("n"))
    j = (
        per.join(F.broadcast(byp), per["label"] == byp["prediction"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n_c",
            "tp_c",
            F.coalesce(F.col("p_c"), F.lit(0)).alias("p_c"),
            "n",
        )
    )
    rec = F.col("tp_c").cast("double") / F.col("n_c").cast("double")
    # one-class guard: when the scored set contains a single class
    # (tiny CV fold), n - n_c = 0; Spark's non-ANSI division gives
    # NULL while DuckDB gives inf — define FPR = 0 (no negatives to
    # false-alarm on), mirrored in the oracle SQL
    fpr = F.when(F.col("n") == F.col("n_c"), F.lit(0.0)).otherwise(
        (F.col("p_c") - F.col("tp_c")).cast("double")
        / (F.col("n") - F.col("n_c")).cast("double")
    )
    j = j.withColumn("rec", rec).withColumn("fpr", fpr)
    return j.agg(
        F.round(
            F.sum("tp_c").cast("double") / F.max("n").cast("double"), 6
        ).alias("acc"),
        F.round(
            # inner guard keeps ln() off zero recalls (DuckDB raises on
            # ln(0)); the outer guard then forces gm to 0 in that case
            F.when(F.min("rec") == 0, F.lit(0.0)).otherwise(
                F.exp(
                    F.sum(
                        F.log(
                            F.when(F.col("rec") > 0, F.col("rec")).otherwise(
                                F.lit(1.0)
                            )
                        )
                    )
                    / F.count(F.lit(1))
                )
            ),
            6,
        ).alias("gm"),
        F.round(
            F.avg((F.lit(1.0) + F.col("rec") - F.col("fpr")) / F.lit(2.0)), 6
        ).alias("auc"),
    )


def metrics_binary(pred: DataFrame) -> DataFrame:
    """One-row acc/tpr/tnr/gm/auc for binary labels {0,1}, pos=1."""
    cm = pred.agg(
        F.sum(F.when((F.col("label") == 1) & (F.col("prediction") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("label") == 0) & (F.col("prediction") == 0), 1).otherwise(0)).alias("tn"),
        F.sum(F.when((F.col("label") == 0) & (F.col("prediction") == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("label") == 1) & (F.col("prediction") == 0), 1).otherwise(0)).alias("fn"),
    )
    tp, tn, fp, fn = (F.col(c).cast("double") for c in ("tp", "tn", "fp", "fn"))
    # degenerate-input guards (single-class scored sets): rates whose
    # denominator is 0 are defined as 0, matching the oracle SQL
    tpr = F.when(tp + fn == 0, F.lit(0.0)).otherwise(tp / (tp + fn))
    tnr = F.when(tn + fp == 0, F.lit(0.0)).otherwise(tn / (tn + fp))
    fpr = F.when(fp + tn == 0, F.lit(0.0)).otherwise(fp / (fp + tn))
    return cm.select(
        F.round((tp + tn) / (tp + tn + fp + fn), 6).alias("acc"),
        F.round(tpr, 6).alias("tpr"),
        F.round(tnr, 6).alias("tnr"),
        F.round(F.sqrt(tpr * tnr), 6).alias("gm"),
        F.round((F.lit(1.0) + tpr - fpr) / F.lit(2.0), 6).alias("auc"),
    )
