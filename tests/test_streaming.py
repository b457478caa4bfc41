"""Streaming batch-equivalence (SURVEY.md §5/M5): the Structured
Streaming tumbling/sliding aggregations must equal the same windowed
aggregation run in batch mode on the same input."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_tumbling_stream_equals_batch(spark):
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table
    from chi_frbcs_bigdatacs_spark.streaming.windows import q_stream_tumbling

    got = (
        q_stream_tumbling(spark, SF_SMALL)
        .toPandas()
        .sort_values(["hour", "event_type"], ignore_index=True)
    )
    ev = load_table(spark, SF_SMALL, "events")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour"), "event_type", "n")
        .toPandas()
        .sort_values(["hour", "event_type"], ignore_index=True)
    )
    assert got.equals(want)


def test_sliding_stream_equals_batch(spark):
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table
    from chi_frbcs_bigdatacs_spark.streaming.windows import q_stream_sliding

    got = (
        q_stream_sliding(spark, SF_SMALL)
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    ev = load_table(spark, SF_SMALL, "events")
    want = (
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    assert got.equals(want)
