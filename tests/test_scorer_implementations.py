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
