"""Imbalance preprocessing: random over/under-sampling (ROS/RUS).

The reference's research line explicitly positions cost-sensitive
learning against ROS/RUS preprocessing ([FSS258 §1, §5.4] compares
Chi-FRBCS-BigDataCS with its ROS-preprocessed sibling) — costs and
resampling are interchangeable treatments of class imbalance, so a
complete engine offers both. These operators rebalance a labeled
frame to ratio ~1 deterministically:

  ROS: every class is oversampled to ~N_max rows — each row gets
       base = floor(N_max / n_c) copies plus one extra copy iff a
       per-row hash clears a class threshold (Bernoulli with
       p = remainder/n_c, i.e. `sampleBy` semantics made
       reproducible).
  RUS: every class is thinned to ~N_min rows — keep a row iff its
       hash clears floor(M * N_min / n_c).

Determinism & oracle parity: the per-row "random" draw is
h(id) = (id * 2654435761) % 1000003 computed in exact integer
arithmetic (DECIMAL(38,0) in Spark, HUGEINT in DuckDB — the minhash
affine-hash idiom), so both engines select the SAME rows; class
thresholds use only integer-exact floors (counts < 2^53).

Scale shape (100 TB lens): ONE tiny class-count aggregation
(map-side-combined, |classes| rows collected and folded as literals —
the cost_literal idiom), then a map-only explode (ROS) or filter
(RUS) over a single scan. No shuffle of the data, no window, no join;
output volume is the rebalanced corpus itself. Replication multiplies
downstream work, not this operator's.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.plans.registry import register
from chi_frbcs_bigdatacs_spark.sources.testdata import LINEITEM_CLF_SQL, lineitem_clf

RS_HASH_A = 2654435761  # Knuth multiplicative constant
RS_HASH_M = 1000003     # prime modulus; h(id) uniform in [0, M)

FEATURES = ["f1", "f2", "f3", "f4"]


def _rhash() -> Column:
    """Deterministic per-row draw in [0, M); exact integer arithmetic
    (ids reach ~6e17 at sf0.1, so the product needs >64 bits)."""
    return F.expr(
        f"CAST((CAST(id AS DECIMAL(38,0)) * {RS_HASH_A}) % {RS_HASH_M} AS BIGINT)"
    )


_RHASH_SQL = f"(CAST(id AS HUGEINT) * {RS_HASH_A}) % {RS_HASH_M}"


def _class_counts(df: DataFrame) -> list:
    """Tiny driver-side collect: |classes| rows."""
    return df.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()


def resample_ros(df: DataFrame) -> DataFrame:
    """Oversample every class to ~N_max rows. Output adds a `copy`
    index (1-based) so replicated rows stay distinct downstream."""
    counts = _class_counts(df)
    nmax = max(r.n for r in counts)
    copies = F.lit(1)
    for r in sorted(counts, key=lambda r: r.label):
        base = nmax // r.n
        rem = nmax - base * r.n
        eth = (RS_HASH_M * rem) // r.n  # extra-copy hash threshold
        copies = F.when(
            F.col("label") == r.label,
            F.lit(base) + F.when(_rhash() < eth, 1).otherwise(0),
        ).otherwise(copies)
    return df.withColumn(
        "copy", F.explode(F.sequence(F.lit(1), copies.cast("int")))
    ).withColumn("copy", F.col("copy").cast("long"))


def resample_rus(df: DataFrame) -> DataFrame:
    """Undersample every class to ~N_min rows (minority kept whole:
    its threshold is exactly M, and h(id) < M always)."""
    counts = _class_counts(df)
    nmin = min(r.n for r in counts)
    kth = F.lit(0)
    for r in sorted(counts, key=lambda r: r.label):
        kth = F.when(
            F.col("label") == r.label, F.lit((RS_HASH_M * nmin) // r.n)
        ).otherwise(kth)
    return df.filter(_rhash() < kth)


def q_resample_ros(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample_ros(lineitem_clf(spark, sf_dir)).select(
        "id", "copy", *FEATURES, "label"
    )


def q_resample_rus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resample_rus(lineitem_clf(spark, sf_dir)).select(
        "id", *FEATURES, "label"
    )


# Oracle threshold math mirrors the driver-side Python exactly:
# base/eth/kth floors are integer-exact on both sides (counts and
# M * remainder stay far below 2^53, where double floor == int floor).
RESAMPLE_ROS_SQL = f"""
WITH clf AS ({LINEITEM_CLF_SQL}),
cnt AS (SELECT label, count(*) AS n FROM clf GROUP BY label),
mx AS (SELECT max(n) AS mn FROM cnt),
th AS (
  SELECT label, n,
         CAST(floor(CAST(mn AS DOUBLE) / n) AS BIGINT) AS base,
         CAST(floor(({RS_HASH_M} * (mn - CAST(floor(CAST(mn AS DOUBLE) / n) AS BIGINT) * n))
                    / CAST(n AS DOUBLE)) AS BIGINT) AS eth
  FROM cnt, mx
)
SELECT id, CAST(unnest(range(1, copies + 1)) AS BIGINT) AS copy,
       f1, f2, f3, f4, label
FROM (
  SELECT c.*,
         t.base + (CASE WHEN {_RHASH_SQL} < t.eth THEN 1 ELSE 0 END) AS copies
  FROM clf c JOIN th t USING (label)
) e
"""

RESAMPLE_RUS_SQL = f"""
WITH clf AS ({LINEITEM_CLF_SQL}),
cnt AS (SELECT label, count(*) AS n FROM clf GROUP BY label),
mn AS (SELECT min(n) AS nmin FROM cnt),
th AS (
  SELECT label,
         CAST(floor(({RS_HASH_M} * CAST(nmin AS DOUBLE)) / n) AS BIGINT) AS kth
  FROM cnt, mn
)
SELECT c.id, c.f1, c.f2, c.f3, c.f4, c.label
FROM clf c JOIN th t USING (label)
WHERE {_RHASH_SQL} < t.kth
"""


def register_all() -> None:
    register("resample_ros", q_resample_ros, RESAMPLE_ROS_SQL)
    register("resample_rus", q_resample_rus, RESAMPLE_RUS_SQL)
