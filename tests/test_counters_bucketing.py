"""O18 counters (observe) and bucketed co-located joins (the
100 TB lever for repeated fact-fact joins: both sides pre-bucketed on
the join key -> SortMergeJoin with NO Exchange)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_observe_counters(spark):
    from chi_frbcs_bigdatacs_spark.functions import observed
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    instrumented, obs = observed(li, "scan_counters")
    n = instrumented.count()
    assert obs.get["rows_processed"] == n == 6000
    assert obs.get["rows_nonnull_key"] == n


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("t_orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("t_lineitem_b")
    try:
        j = (
            spark.table("t_orders_b")
            .hint("merge")  # tiny test tables would broadcast otherwise
            .join(
                spark.table("t_lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located buckets: the join must not reshuffle either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert j.count() == 6000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_salting_spreads_hot_key(spark):
    """The skew fixture's hot key holds ~90% of rows; after salting,
    the largest (key, salt) group must shrink ~N_SALTS-fold — the
    actual mechanism by which the salted join avoids one straggler
    reducer at scale."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.relational import (
        N_SALTS,
        skewed_probe,
    )
    from tests.conftest import SF_SMALL

    probe = skewed_probe(spark, SF_SMALL).withColumn(
        "salt",
        F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber"), N_SALTS).cast("int"),
    )
    unsalted_max = (
        probe.groupBy("skew_key").count().agg(F.max("count")).first()[0]
    )
    salted_max = (
        probe.groupBy("skew_key", "salt").count().agg(F.max("count")).first()[0]
    )
    total = probe.count()
    assert unsalted_max >= 0.8 * total, "fixture lost its hot key"
    assert salted_max <= unsalted_max / (N_SALTS / 2), (
        f"salting did not spread the hot key: {salted_max} vs {unsalted_max}"
    )
