"""The complete reference workflow, end-to-end: a KEEL dataset file
-> header parse -> declared-range fuzzy partitions -> fit -> score ->
metrics. This is the exact path a Chi-FRBCS-BigDataCS user follows
(E1 build + E2 classify), driven purely from the KEEL artifact."""

from __future__ import annotations

import textwrap

from pyspark.sql import functions as F

# Separable at L=3 granularity over [0,10] (argmax-cell boundaries at
# 2.5 and 7.5): all neg in the first f1 cell, all pos in the last.
KEEL = textwrap.dedent("""\
    @relation tiny
    @attribute f1 real [0.0, 10.0]
    @attribute f2 real [0.0, 1.0]
    @attribute class {neg, pos}
    @inputs f1, f2
    @outputs class
    @data
    0.5, 0.2, neg
    1.0, 0.8, neg
    1.5, 0.5, neg
    2.0, 0.1, neg
    2.2, 0.9, neg
    7.8, 0.3, pos
    8.0, 0.7, pos
    8.5, 0.4, pos
    9.0, 0.6, pos
    9.5, 0.2, pos
    """)


def test_keel_to_model_end_to_end(spark, tmp_path):
    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.sources.keel import encode_nominal, read_keel

    p = tmp_path / "tiny.dat"
    p.write_text(KEEL)

    df, ds = read_keel(spark, str(p))
    parts = ds.fuzzy_partitions(num_labels=3)
    assert [f.name for f in parts.features] == ["f1", "f2"]

    # nominal class -> int label (declared vocab order: neg=0, pos=1),
    # plus the stable pk the engine requires
    enc = encode_nominal(df, ds).withColumnRenamed("class", "label")
    enc = enc.withColumn(
        "id", F.monotonically_increasing_id()
    )  # local test only; real pipelines carry a natural key

    model = ChiFRBCSClassifier(parts=parts).fit(enc)
    assert model.rules_rows, "no rules learned"
    assert all(-1.0 <= r[-1] <= 1.0 for r in model.rules_rows)

    pred = model.transform(enc).toPandas()
    # resubstitution on separable data: perfect split
    assert (pred["prediction"] == pred["label"]).all()

    # persistence round-trip straight from the KEEL-derived model
    model.save(str(tmp_path / "m"))
    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSModel

    loaded = ChiFRBCSModel.load(spark, str(tmp_path / "m"))
    again = loaded.transform(enc).toPandas()
    assert (again["prediction"] == pred["prediction"]).all()


# Mixed numeric + nominal inputs with `?` missing values: group g
# decides the class together with f1 (so the nominal feature is
# load-bearing), and rows with `?` are dropped per the documented
# policy (SURVEY §1: ? -> null -> drop).
KEEL_NOMINAL = textwrap.dedent("""\
    @relation tinynom
    @attribute f1 real [0.0, 10.0]
    @attribute g {a, b}
    @attribute class {neg, pos}
    @inputs f1, g
    @outputs class
    @data
    1.0, a, neg
    1.5, a, neg
    2.0, a, neg
    1.0, b, pos
    1.5, b, pos
    2.2, b, pos
    8.0, a, pos
    8.5, a, pos
    9.0, a, pos
    8.0, b, neg
    8.5, b, neg
    9.2, b, neg
    ?, a, neg
    5.0, ?, pos
    """)


def test_keel_nominal_end_to_end(spark, tmp_path):
    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.sources.keel import encode_nominal, read_keel

    p = tmp_path / "tinynom.dat"
    p.write_text(KEEL_NOMINAL)

    df, ds = read_keel(spark, str(p))
    assert df.count() == 12  # both ?-bearing rows dropped

    parts = ds.fuzzy_partitions(num_labels=3)
    assert [f.kind for f in parts.features] == ["numeric", "nominal"]

    enc = encode_nominal(df, ds).withColumnRenamed("class", "label")
    enc = enc.withColumn("id", F.monotonically_increasing_id())

    model = ChiFRBCSClassifier(parts=parts).fit(enc)
    # the learned antecedents must discriminate on the nominal label:
    # same f1 cell, different g => different class
    pred = model.transform(enc).toPandas()
    assert (pred["prediction"] == pred["label"]).all()

    # model round-trip preserves nominal feature specs
    import tempfile

    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSModel

    path = tempfile.mkdtemp(prefix="chi_nom_model_")
    model.save(path)
    loaded = ChiFRBCSModel.load(spark, path)
    assert loaded.parts == model.parts
    lp = loaded.transform(enc).toPandas().sort_values("id", ignore_index=True)
    op = pred.sort_values("id", ignore_index=True)
    assert (lp["prediction"] == op["prediction"]).all()
