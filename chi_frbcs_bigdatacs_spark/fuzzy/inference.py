"""O13-O14 — Fuzzy Reasoning Method scoring.

  WR (winning rule): predict class of argmax_j mu_Aj(x) * RW_j
    [REF: RuleBase.java::FRM_WR, mapreduce/Classifier.java | conf=M]
    [FSS258 §2.1, §4.2]
  AC (additive combination): per class sum of mu_Aj(x) * RW_j, argmax
    [REF: RuleBase.java::FRM_AC | conf=L]

Physical strategy: the rule base is tiny (<= data-touched subset of
L^d cells) so it is BROADCAST to the examples — the reference ships
the model via DistributedCache to map tasks, the Spark-native
equivalent is a broadcast nested-loop join with a matching-degree > 0
filter, followed by a grouped argmax. The example side never
shuffles; per-example candidate rows are bounded by 2^d matching
cells (each value has at most 2 nonzero memberships per feature).

Examples matched by NO positive-weight rule get the default class
(most frequent training class; deterministic tie -> lowest id).
Rules with weight <= 0 are pruned before scoring (under WR they can
never beat any positive-weight match; KEEL drops them at build).

Tie-breaking on equal scores: lowest antecedent labels, then lowest
class id — fully deterministic and mirrored in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.functions.ordering import (
    CLS_CAP,
    argmax_decimal_key,
    decode_last_tie,
)
from chi_frbcs_bigdatacs_spark.fuzzy.partitions import FuzzyPartitions
from chi_frbcs_bigdatacs_spark.fuzzy.rules import (
    _match_degree,
    label_col,
    with_antecedent,
    fuzzify,
)


def default_class(counts: DataFrame) -> int:
    """Most frequent training class; ties -> lowest class id."""
    row = counts.orderBy(F.col("n").desc(), F.col("label").asc()).first()
    return int(row["label"])


def _scored(fuzz: DataFrame, rules: DataFrame, parts: FuzzyPartitions) -> DataFrame:
    """Broadcast-join examples x positive-weight rules, mu > 0."""
    ants = [label_col(i) for i in range(len(parts.features))]
    r = rules.filter(F.col("weight") > 0)
    for a in ants:
        r = r.withColumnRenamed(a, f"r_{a}")
    r = r.withColumnRenamed("cls", "r_cls")
    pairs = fuzz.crossJoin(F.broadcast(r))
    return (
        pairs.withColumn("mu", _match_degree("r_", parts))
        .filter(F.col("mu") > 0)
        .withColumn("score", F.col("mu") * F.col("weight"))
    )


def classify_wr(
    df: DataFrame, rules: DataFrame, parts: FuzzyPartitions, default_cls: int
) -> DataFrame:
    """FRM Winning Rule -> (id, label, prediction).

    The per-example argmax is a single-decimal-key hash aggregate,
    not a row_number window (r12, VERDICT r11 #5): a window must
    shuffle EVERY scored candidate row on id and sort within
    partitions, while max(key) partial-aggregates map-side — each
    task reduces its candidates to one row per id before the
    exchange, so the shuffle carries |ids| rows instead of
    |ids| * |candidates| (up to 2^d candidates/example). The pinned
    tie order (score desc, antecedent labels asc, class asc) is
    encoded order-isomorphically into one DECIMAL(38,0)
    (functions/ordering.py — struct orderings would demote the plan
    to SortAggregate), and the winning class decodes back out of the
    key, so the aggregate stays deterministic and join-free."""
    ants = [label_col(i) for i in range(len(parts.features))]
    fuzz = fuzzify(df, parts)
    scored = _scored(fuzz, rules, parts)
    bases = [parts.labels_for(f) + 1 for f in parts.features]
    key = argmax_decimal_key(
        F.col("score"),
        [(F.col(f"r_{a}"), b) for a, b in zip(ants, bases)]
        + [(F.col("r_cls"), CLS_CAP)],
    )
    best = scored.groupBy("id").agg(
        decode_last_tie(F.max(key), CLS_CAP).alias("prediction")
    )
    return (
        df.select("id", "label")
        .join(best, "id", "left")
        .select(
            "id",
            "label",
            F.coalesce(F.col("prediction"), F.lit(default_cls)).alias("prediction"),
        )
    )


def classify_ac(
    df: DataFrame, rules: DataFrame, parts: FuzzyPartitions, default_cls: int
) -> DataFrame:
    """FRM Additive Combination -> (id, label, prediction)."""
    fuzz = fuzzify(df, parts)
    scored = _scored(fuzz, rules, parts)
    per_class = scored.groupBy("id", "r_cls").agg(
        F.round(F.sum("score"), 9).alias("cscore")
    )
    # Same decimal-key hash-aggregate shape as classify_wr (r12):
    # (cscore desc, r_cls asc) as max of one orderable decimal; the
    # class decodes back out of the winning key.
    best = per_class.groupBy("id").agg(
        decode_last_tie(
            F.max(argmax_decimal_key(F.col("cscore"), [(F.col("r_cls"), CLS_CAP)])),
            CLS_CAP,
        ).alias("prediction")
    )
    return (
        df.select("id", "label")
        .join(best, "id", "left")
        .select(
            "id",
            "label",
            F.coalesce(F.col("prediction"), F.lit(default_cls)).alias("prediction"),
        )
    )
