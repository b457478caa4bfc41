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


def test_pipeline_model_persistence(spark, tmp_path):
    """Full pyspark.ml PipelineModel.save -> PipelineModel.load round
    trip (requires the model stage to be MLWritable/MLReadable), then
    transform equality against the in-memory model."""
    from pyspark.ml import PipelineModel

    from chi_frbcs_bigdatacs_spark.fuzzy.ml import ChiFRBCS
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import LINEITEM_CLF_PARTITIONS
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    df = lineitem_clf(spark, SF_SMALL)
    pipe = Pipeline(stages=[ChiFRBCS(parts=LINEITEM_CLF_PARTITIONS)])
    model = pipe.fit(df)
    p = str(tmp_path / "pipe_model")
    model.write().overwrite().save(p)
    loaded = PipelineModel.load(p)
    a = model.transform(df).toPandas().sort_values("id", ignore_index=True)
    b = loaded.transform(df).toPandas().sort_values("id", ignore_index=True)
    assert a.equals(b)


def test_crossvalidator_integration(spark):
    """The estimator + evaluator must plug into pyspark.ml.tuning
    CrossValidator: grid over frm, 2 folds, GM evaluator — returns a
    fitted best model whose output scores the full set."""
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    from chi_frbcs_bigdatacs_spark.fuzzy.ml import ChiFRBCS, ChiFRBCSEvaluator
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import LINEITEM_CLF_PARTITIONS
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    df = lineitem_clf(spark, SF_SMALL)
    est = ChiFRBCS(parts=LINEITEM_CLF_PARTITIONS)
    grid = ParamGridBuilder().addGrid(est.frm, ["wr", "ac"]).build()
    ev = ChiFRBCSEvaluator(metricName="gm")
    cv = CrossValidator(
        estimator=est,
        estimatorParamMaps=grid,
        evaluator=ev,
        numFolds=2,
        parallelism=1,
        seed=7,
    )
    cvm = cv.fit(df)
    assert len(cvm.avgMetrics) == 2
    assert all(0.0 <= m <= 1.0 for m in cvm.avgMetrics)
    pred = cvm.bestModel.transform(df)
    gm = ev.evaluate(pred)
    assert 0.0 < gm <= 1.0


def test_scoring_null_features_get_default_class(spark):
    """A null/out-of-vocab feature value gives an all-zero membership
    array; scoring must emit the DEFAULT class for such rows (like the
    oracle's LEFT JOIN), never silently drop them."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import LINEITEM_CLF_PARTITIONS
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    df = lineitem_clf(spark, SF_SMALL)
    model = ChiFRBCSClassifier(parts=LINEITEM_CLF_PARTITIONS).fit(df)
    nulled = spark.createDataFrame(
        [(1, None, 100.0, 0.5, 10.0, 0), (2, 3.0, None, 0.5, 10.0, 1)],
        "id long, f1 double, f2 double, f3 double, f4 double, label int",
    )
    out = {r["id"]: r["prediction"] for r in model.transform(nulled).collect()}
    assert set(out) == {1, 2}, "null-feature rows must not be dropped"
    assert all(p == model.default_cls for p in out.values())


def test_min_rule_support_param(spark):
    """min_rule_support as a first-class estimator param (VERDICT r9
    #7): 0 is the identity (exact same rule rows as the default fit),
    and a fit at the rulebase_prune_minsupport key's threshold must
    reproduce the key's artifact exactly — same kept-rule count and
    the same confusion row from the pruned model's own transform —
    on BOTH the collected and distributed rule-base paths."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import (
        LINEITEM_CLF_PARTITIONS,
    )
    from chi_frbcs_bigdatacs_spark.plans.registry import get_registry
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    df = lineitem_clf(spark, SF_SMALL)
    base = ChiFRBCSClassifier(parts=LINEITEM_CLF_PARTITIONS).fit(df)
    ident = ChiFRBCSClassifier(
        parts=LINEITEM_CLF_PARTITIONS, min_rule_support=0
    ).fit(df)
    assert sorted(ident.rules_rows) == sorted(base.rules_rows)

    key_row = (
        get_registry()["rulebase_prune_minsupport"]
        .fn(spark, SF_SMALL)
        .collect()[0]
    )
    thr = max(2, df.count() // 200)
    pruned = ChiFRBCSClassifier(
        parts=LINEITEM_CLF_PARTITIONS, min_rule_support=thr
    ).fit(df)
    assert pruned.rule_count() < base.rule_count()
    assert pruned.rule_count() == key_row["n_kept"]
    pred = pruned.transform(df)
    got = pred.agg(
        F.sum(((F.col("label") == 1) & (F.col("prediction") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("label") == 0) & (F.col("prediction") == 1)).cast("long")).alias("fp"),
        F.sum(((F.col("label") == 0) & (F.col("prediction") == 0)).cast("long")).alias("tn"),
        F.sum(((F.col("label") == 1) & (F.col("prediction") == 0)).cast("long")).alias("fn"),
    ).collect()[0]
    assert (got["tp"], got["fp"], got["tn"], got["fn"]) == (
        key_row["tp"], key_row["fp"], key_row["tn"], key_row["fn"],
    )
    # distributed path prunes identically
    dist = ChiFRBCSClassifier(
        parts=LINEITEM_CLF_PARTITIONS,
        min_rule_support=thr,
        collect_rules=False,
    ).fit(df)
    got_rows = sorted(
        tuple(r) for r in dist.rules_dataframe.collect()
    )
    assert got_rows == sorted(pruned.rules_rows)
