"""Three independent scoring implementations must agree exactly:
  1. inference.py — reference-shaped broadcast nested-loop join (spec)
  2. estimator expression path — cell-explosion + hash equi-join
  3. estimator pandas path — Arrow/numpy matmul
(2 vs 3 is pinned in test_pandas_scorer.py; here 1 vs 2.)"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_spec_bnlj_scorer_matches_estimator(spark):
    from chi_frbcs_bigdatacs_spark.fuzzy import inference as I
    from chi_frbcs_bigdatacs_spark.fuzzy import rules as R
    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import LINEITEM_CLF_PARTITIONS as P
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    df = lineitem_clf(spark, SF_SMALL)
    rules = R.build_rules(df, P, resolve=True)
    dc = I.default_class(R.class_counts(df))
    spec = (
        I.classify_wr(df, rules, P, dc)
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    eng = (
        ChiFRBCSClassifier(parts=P)
        .fit(df)
        .transform(df)
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    assert (spec["prediction"] == eng["prediction"]).all()
    assert (spec["id"] == eng["id"]).all()


def test_spec_ac_scorer_matches_estimator(spark):
    from chi_frbcs_bigdatacs_spark.fuzzy import inference as I
    from chi_frbcs_bigdatacs_spark.fuzzy import rules as R
    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import LINEITEM_CLF_PARTITIONS as P
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    df = lineitem_clf(spark, SF_SMALL)
    rules = R.build_rules(df, P, resolve=True)
    dc = I.default_class(R.class_counts(df))
    spec = (
        I.classify_ac(df, rules, P, dc)
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    eng = (
        ChiFRBCSClassifier(parts=P, frm="ac")
        .fit(df)
        .transform(df)
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    assert (spec["prediction"] == eng["prediction"]).all()


def test_collect_rules_false_matches_collected_path(spark):
    """collect_rules=False keeps the rule base distributed (no driver
    materialization) and must score identically, including at the
    L=5 / d=8 granularity the driver-side collect was flagged for."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import (
        FeatureSpec,
        FuzzyPartitions,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    p8 = FuzzyPartitions(
        features=tuple(FeatureSpec(f"f{i}", -4.0, 4.0) for i in range(1, 9)),
        num_labels=5,
    )
    emb = load_table(spark, SF_SMALL, "embeddings")
    df = emb.select(
        F.col("vec_id").alias("id"),
        *[
            F.element_at("embedding", i).cast("double").alias(f"f{i}")
            for i in range(1, 9)
        ],
        F.col("label"),
    )

    m_lit = ChiFRBCSClassifier(parts=p8).fit(df)
    est = ChiFRBCSClassifier(parts=p8, collect_rules=False)
    m_dist = est.fit(df)
    assert m_dist.rules_rows is None, "rule base must stay distributed"
    assert m_dist.rules_dataframe is not None

    a = m_lit.transform(df).toPandas().sort_values("id", ignore_index=True)
    b = m_dist.transform(df).toPandas().sort_values("id", ignore_index=True)
    assert a.equals(b)

    # distributed and literal rule bases hold the same rules
    cols = [f"l{i}" for i in range(1, 9)] + ["cls", "weight"]
    dist_rules = sorted(tuple(r) for r in m_dist.rules_dataframe.select(*cols).collect())
    assert dist_rules == sorted(m_lit.rules_rows)
    m_dist.release()
