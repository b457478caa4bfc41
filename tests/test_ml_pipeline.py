"""MLlib packaging (SURVEY M3): the estimator must behave as a real
pyspark.ml stage — Params, Pipeline fit/transform, persistence."""

from __future__ import annotations

from pyspark.ml import Pipeline

from tests.conftest import SF_SMALL


def test_pipeline_fit_transform(spark):
    from chi_frbcs_bigdatacs_spark.fuzzy.ml import ChiFRBCS
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import LINEITEM_CLF_PARTITIONS
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    df = lineitem_clf(spark, SF_SMALL)
    est = ChiFRBCS(parts=LINEITEM_CLF_PARTITIONS, frm="wr")
    assert est.getOrDefault(est.numLabels) == 3

    pipe = Pipeline(stages=[est])
    model = pipe.fit(df)
    pred = model.transform(df)
    assert pred.columns == ["id", "label", "prediction"]
    assert pred.count() == df.count()

    # params round-trip through copy()
    est2 = est.copy({est.frm: "ac"})
    assert est2.getOrDefault(est2.frm) == "ac"
    assert est.getOrDefault(est.frm) == "wr"


def test_ml_model_matches_engine_model(spark, tmp_path):
    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.fuzzy.ml import ChiFRBCS, ChiFRBCSModel
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import LINEITEM_CLF_PARTITIONS
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    df = lineitem_clf(spark, SF_SMALL)
    ml_model = ChiFRBCS(parts=LINEITEM_CLF_PARTITIONS).fit(df)
    eng_model = ChiFRBCSClassifier(parts=LINEITEM_CLF_PARTITIONS).fit(df)
    assert sorted(ml_model.rules) == sorted(eng_model.rules_rows)

    ml_model.save(str(tmp_path / "m"))
    loaded = ChiFRBCSModel.load(spark, str(tmp_path / "m"))
    a = ml_model.transform(df).toPandas().sort_values("id", ignore_index=True)
    b = loaded.transform(df).toPandas().sort_values("id", ignore_index=True)
    assert a.equals(b)
