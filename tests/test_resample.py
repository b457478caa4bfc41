"""ROS/RUS resampling: rebalance quality, determinism, and the
[FSS258 §5.4] equivalence — costs and resampling are interchangeable
imbalance treatments, so the CS cost vector computed on a
ROS/RUS-rebalanced fixture collapses to ~1."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _clf(spark):
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    return lineitem_clf(spark, SF_SMALL)


def _cost_ratio(df):
    """max CS cost (= N_largest / N_c) over classes of a labeled frame."""
    from chi_frbcs_bigdatacs_spark.fuzzy import rules as R

    costs = R.with_costs(R.class_counts(df)).collect()
    return max(r.cost for r in costs)


def test_ros_rebalances_cost_vector_to_one(spark):
    from chi_frbcs_bigdatacs_spark.operators.resample import resample_ros

    df = _clf(spark)
    before = _cost_ratio(df)
    assert before > 1.5  # fixture is genuinely imbalanced (IR ~ 2)
    after = _cost_ratio(resample_ros(df))
    # Bernoulli-hash fractional copies: ratio ~1 within a few percent
    assert after < 1.05, f"ROS cost ratio {after}"


def test_rus_rebalances_cost_vector_to_one(spark):
    from chi_frbcs_bigdatacs_spark.operators.resample import resample_rus

    df = _clf(spark)
    after = _cost_ratio(resample_rus(df))
    assert after < 1.05, f"RUS cost ratio {after}"
    # RUS only thins: per-class counts never exceed the originals
    before = {r.label: r.n for r in df.groupBy("label").count().withColumnRenamed("count", "n").collect()}
    got = {r.label: r.n for r in resample_rus(df).groupBy("label").count().withColumnRenamed("count", "n").collect()}
    assert set(got) == set(before)
    assert all(got[c] <= before[c] for c in got)


def test_resample_deterministic_and_partition_invariant(spark):
    from chi_frbcs_bigdatacs_spark.operators.resample import (
        resample_ros,
        resample_rus,
    )

    df = _clf(spark)
    a = sorted(tuple(r) for r in resample_ros(df).collect())
    b = sorted(tuple(r) for r in resample_ros(df.repartition(13)).collect())
    assert a == b
    c = sorted(tuple(r) for r in resample_rus(df).collect())
    d = sorted(tuple(r) for r in resample_rus(df.repartition(7)).collect())
    assert c == d


def test_ros_replication_is_per_row_bounded(spark):
    """Every input row appears in the ROS output with copy indexes
    1..k, k within 1 of the class's floor/ceil replication factor."""
    from chi_frbcs_bigdatacs_spark.operators.resample import resample_ros

    df = _clf(spark)
    counts = {r.label: r.n for r in df.groupBy("label").count().withColumnRenamed("count", "n").collect()}
    nmax = max(counts.values())
    per_row = (
        resample_ros(df)
        .groupBy("id", "label")
        .agg(F.count(F.lit(1)).alias("k"), F.max("copy").alias("mx"))
        .collect()
    )
    assert len(per_row) == sum(counts.values())  # no input row dropped
    for r in per_row:
        base = nmax // counts[r.label]
        assert r.k in (base, base + 1)
        assert r.mx == r.k  # copy indexes are dense 1..k


def test_smote_probe_rescues_singleton_bucket_rows(spark):
    """The r9 probe-widening criterion (VERDICT r8 #5): minority rows
    ALONE in their grid cell emit no synthetic under grid-local SMOTE
    but MUST emit under the 3x3 adjacent-cell probe whenever any
    minority neighbor exists within one cell. Also pins the superset
    contract: every grid-local id still emits under the probe."""
    from chi_frbcs_bigdatacs_spark.operators.resample import (
        SMOTE_F2_BAND,
        _class_counts,
        q_resample_smote,
        q_resample_smote_probe,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf

    # pin the FINE reference band explicitly: the auto-derived
    # occupancy-constant band is deliberately coarse at sf0.001
    # (~20 rows/cell leaves no singleton buckets), and this property
    # is about the probe's escape mechanics, which need singletons
    df = lineitem_clf(spark, SF_SMALL)
    counts = _class_counts(df)
    min_label = min(counts, key=lambda r: (r.n, r.label)).label
    m = df.filter(F.col("label") == min_label).select(
        "id",
        F.col("f1").cast("int").alias("bq"),
        F.floor(F.col("f2") / SMOTE_F2_BAND).cast("int").alias("bp"),
    )
    base_ids = {
        r.id
        for r in q_resample_smote(spark, SF_SMALL, band=SMOTE_F2_BAND).collect()
    }
    probe_ids = {
        r.id
        for r in q_resample_smote_probe(
            spark, SF_SMALL, band=SMOTE_F2_BAND
        ).collect()
    }
    assert base_ids <= probe_ids, "probe lost grid-local rows"
    # singleton-bucket rows (absent from grid-local output) that have
    # a minority neighbor within one cell in each direction
    rows = m.collect()
    buckets: dict[tuple, list] = {}
    for r in rows:
        buckets.setdefault((r.bq, r.bp), []).append(r.id)
    rescued = []
    for (bq, bp), ids in buckets.items():
        if len(ids) > 1:
            continue
        has_adj = any(
            (bq + db, bp + dp) in buckets
            for db in (-1, 0, 1)
            for dp in (-1, 0, 1)
            if (db, dp) != (0, 0)
        )
        if has_adj:
            rescued.extend(ids)
    assert rescued, "fixture has no rescuable singleton — test is vacuous"
    for rid in rescued:
        assert rid not in base_ids, "singleton unexpectedly emitted by base"
        assert rid in probe_ids, f"singleton {rid} still missing under probe"


def test_smote_enn_cleans_both_synthetic_and_base_rows(spark):
    """resample_smote_enn (r14): the Batista 2004 pipeline must (a)
    edit the UNION — removals with is_synth=True are SMOTE-noise
    cleanup and must carry the minority label under a negated id,
    removals with is_synth=False are base boundary cleanup, and BOTH
    kinds occur on this data; (b) agree with plain ENN semantics on
    id sign (negative ids are exactly the synthetic rows)."""
    from chi_frbcs_bigdatacs_spark.operators.resample import (
        _class_counts,
        q_resample_smote_enn,
    )

    df = _clf(spark)
    counts = _class_counts(df)
    min_label = min(counts, key=lambda r: (r.n, r.label)).label
    rows = q_resample_smote_enn(spark, SF_SMALL).collect()
    synth = [r for r in rows if r["is_synth"]]
    base = [r for r in rows if not r["is_synth"]]
    assert synth and base, "both removal kinds must occur"
    assert all(r["removed_id"] < 0 for r in synth)
    assert all(r["removed_id"] > 0 for r in base)
    assert all(r["label"] == int(min_label) for r in synth), (
        "synthetic rows are minority-labeled by construction"
    )
    assert all(
        1 <= r["n_disagree"] <= r["n_nbrs"] <= 3
        and 2 * r["n_disagree"] > r["n_nbrs"]
        for r in rows
    )
