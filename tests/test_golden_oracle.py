"""Engine (exact-global mode) vs the pure-numpy sequential golden
oracle: rule-for-rule, prediction-for-prediction (SURVEY.md §5.2)."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL
from tests.oracle_chi import classify_wr as g_classify, fit as g_fit


@pytest.fixture(scope="module")
def clf_pdf(spark):
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    return lineitem_clf(spark, SF_SMALL).toPandas().sort_values("id", ignore_index=True)


def _specs():
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import LINEITEM_CLF_PARTITIONS as P

    return [(f.fmin, f.fmax) for f in P.features], P


def test_rules_match_golden(spark, clf_pdf):
    specs, P = _specs()
    X = clf_pdf[["f1", "f2", "f3", "f4"]].to_numpy()
    y = clf_pdf["label"].to_numpy()
    golden = g_fit(X, y, specs, L=3)

    from chi_frbcs_bigdatacs_spark.fuzzy import rules as R
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    got = {
        (r["l1"], r["l2"], r["l3"], r["l4"]): (r["cls"], r["weight"])
        for r in R.build_rules(lineitem_clf(spark, SF_SMALL), P).collect()
    }
    assert set(got) == set(golden)
    for a in golden:
        assert got[a][0] == golden[a][0], f"consequent mismatch at {a}"
        assert abs(got[a][1] - golden[a][1]) < 2e-6, f"weight mismatch at {a}"


def test_predictions_match_golden(spark, clf_pdf):
    specs, P = _specs()
    # tiny_golden slice (FIXTURES.md §B3): 200 rows keeps the O(n*R)
    # numpy scorer fast while exercising every tie-break path
    sub = clf_pdf.head(200)
    X = clf_pdf[["f1", "f2", "f3", "f4"]].to_numpy()
    y = clf_pdf["label"].to_numpy()
    golden_rules = g_fit(X, y, specs, L=3)
    classes, counts = np.unique(y, return_counts=True)
    default = int(classes[np.argmax(counts)])
    gp = g_classify(sub[["f1", "f2", "f3", "f4"]].to_numpy(), golden_rules, specs, default)

    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import LINEITEM_CLF_PARTITIONS
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    df = lineitem_clf(spark, SF_SMALL)
    model = ChiFRBCSClassifier(parts=LINEITEM_CLF_PARTITIONS).fit(df)
    assert model.default_cls == default
    pred = (
        model.transform(df.filter(df["id"].isin([int(i) for i in sub["id"]])))
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    sub_sorted = sub.sort_values("id", ignore_index=True)
    order = np.argsort(sub["id"].to_numpy(), kind="stable")
    assert (pred["prediction"].to_numpy() == gp[order]).all()


def test_nominal_rules_and_predictions_match_golden(spark):
    """Mixed numeric+nominal fixture vs the generalized golden oracle
    (crisp nominal membership, SURVEY §1 D3): rule-for-rule and, on a
    slice, prediction-for-prediction."""
    from chi_frbcs_bigdatacs_spark.fuzzy import rules as R
    from chi_frbcs_bigdatacs_spark.fuzzy.estimator import ChiFRBCSClassifier
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import (
        ORDERS_CLF_NOMINAL_PARTITIONS as PN,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import orders_clf_nominal

    df = orders_clf_nominal(spark, SF_SMALL)
    pdf = df.toPandas().sort_values("id", ignore_index=True)
    specs = [
        ("num", f.fmin, f.fmax) if f.kind == "numeric" else ("nom", len(f.values))
        for f in PN.features
    ]
    X = pdf[["f1", "n1", "n2"]].to_numpy(dtype=float)
    y = pdf["label"].to_numpy()
    golden = g_fit(X, y, specs, L=PN.num_labels)

    got = {
        (r["l1"], r["l2"], r["l3"]): (r["cls"], r["weight"])
        for r in R.build_rules(df, PN).collect()
    }
    assert set(got) == set(golden)
    for a in golden:
        assert got[a][0] == golden[a][0], f"consequent mismatch at {a}"
        assert abs(got[a][1] - golden[a][1]) < 2e-6, f"weight mismatch at {a}"

    classes, counts = np.unique(y, return_counts=True)
    default = int(classes[np.argmax(counts)])
    sub = pdf.head(200)
    gp = g_classify(
        sub[["f1", "n1", "n2"]].to_numpy(dtype=float), golden, specs, default,
        L=PN.num_labels,
    )
    model = ChiFRBCSClassifier(parts=PN).fit(df)
    assert model.default_cls == default
    pred = (
        model.transform(df.filter(df["id"].isin([int(i) for i in sub["id"]])))
        .toPandas()
        .sort_values("id", ignore_index=True)
    )
    order = np.argsort(sub["id"].to_numpy(), kind="stable")
    assert (pred["prediction"].to_numpy() == gp[order]).all()
