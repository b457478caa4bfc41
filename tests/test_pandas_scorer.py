"""The Arrow/pandas fast scorer must agree with the expression-path
scorer prediction-for-prediction (SURVEY §4: alternate physical
strategy, same semantics)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_pandas_scorer_matches_expression_path(spark):
    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import LINEITEM_CLF_PARTITIONS
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    df = lineitem_clf(spark, SF_SMALL)
    model = ChiFRBCSClassifier(parts=LINEITEM_CLF_PARTITIONS).fit(df)
    a = model.transform(df).toPandas().sort_values("id", ignore_index=True)
    b = model.transform_pandas(df).toPandas().sort_values("id", ignore_index=True)
    assert a.equals(b)


def test_pandas_scorer_multiclass(spark):
    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import EMBEDDINGS_CLF_PARTITIONS
    from chi_frbcs_bigdatacs_spark.sources.testdata import embeddings_clf

    df = embeddings_clf(spark, SF_SMALL)
    model = ChiFRBCSClassifier(parts=EMBEDDINGS_CLF_PARTITIONS).fit(df)
    a = model.transform(df).toPandas().sort_values("id", ignore_index=True)
    b = model.transform_pandas(df).toPandas().sort_values("id", ignore_index=True)
    assert a.equals(b)


def test_pandas_scorer_nominal(spark):
    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import (
        ORDERS_CLF_NOMINAL_PARTITIONS,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import orders_clf_nominal

    df = orders_clf_nominal(spark, SF_SMALL)
    model = ChiFRBCSClassifier(parts=ORDERS_CLF_NOMINAL_PARTITIONS).fit(df)
    a = model.transform(df).toPandas().sort_values("id", ignore_index=True)
    b = model.transform_pandas(df).toPandas().sort_values("id", ignore_index=True)
    assert a.equals(b)
