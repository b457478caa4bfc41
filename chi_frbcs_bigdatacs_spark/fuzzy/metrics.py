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


def metrics_binary(pred: DataFrame) -> DataFrame:
    """One-row acc/tpr/tnr/gm/auc for binary labels {0,1}, pos=1."""
    cm = pred.agg(
        F.sum(F.when((F.col("label") == 1) & (F.col("prediction") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("label") == 0) & (F.col("prediction") == 0), 1).otherwise(0)).alias("tn"),
        F.sum(F.when((F.col("label") == 0) & (F.col("prediction") == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("label") == 1) & (F.col("prediction") == 0), 1).otherwise(0)).alias("fn"),
    )
    tp, tn, fp, fn = (F.col(c).cast("double") for c in ("tp", "tn", "fp", "fn"))
    tpr = tp / (tp + fn)
    tnr = tn / (tn + fp)
    fpr = fp / (fp + tn)
    return cm.select(
        F.round((tp + tn) / (tp + tn + fp + fn), 6).alias("acc"),
        F.round(tpr, 6).alias("tpr"),
        F.round(tnr, 6).alias("tnr"),
        F.round(F.sqrt(tpr * tnr), 6).alias("gm"),
        F.round((F.lit(1.0) + tpr - fpr) / F.lit(2.0), 6).alias("auc"),
    )
