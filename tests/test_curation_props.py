"""Invariant tests for the round-4 curation operators — properties
the DuckDB hash-parity check cannot express (it proves both engines
agree, not that the shared semantics are right).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_doc_chunking_reconstructs_documents(spark):
    """Dropping each chunk's overlap tail (keep the first STRIDE
    chars; keep the final chunk whole) and concatenating in chunk_idx
    order must reproduce every document exactly — proves chunks cover
    all text with correct stride and no gaps."""
    from chi_frbcs_bigdatacs_spark.operators.curation import (
        CHUNK_STRIDE,
        q_doc_chunking,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

    chunks = q_doc_chunking(spark, SF_SMALL)
    n_chunks = chunks.groupBy("doc_id").agg(F.max("chunk_idx").alias("last_idx"))
    rebuilt = (
        chunks.join(n_chunks, "doc_id")
        .withColumn(
            "piece",
            F.when(
                F.col("chunk_idx") < F.col("last_idx"),
                F.substring("chunk", 1, CHUNK_STRIDE),
            ).otherwise(F.col("chunk")),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "piece"))
                    ),
                    lambda s: s["piece"],
                ),
                "",
            ).alias("rebuilt")
        )
    )
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    mismatches = (
        docs.join(rebuilt, "doc_id")
        .filter(F.col("text") != F.col("rebuilt"))
        .count()
    )
    assert mismatches == 0
    assert rebuilt.count() == docs.count()


def test_embed_quantize_codes_bounded_and_scaled(spark):
    """Every int8 code is in [-127, 127], and each vector's absmax
    element quantizes to exactly +/-127 (symmetric scaling hits the
    full range)."""
    from chi_frbcs_bigdatacs_spark.operators.curation import q_embed_quantize

    qz = q_embed_quantize(spark, SF_SMALL).withColumn(
        "codes_arr",
        F.transform(F.split("codes", ","), lambda s: s.cast("int")),
    )
    bad_range = qz.filter(
        F.exists(F.col("codes_arr"), lambda c: (c > 127) | (c < -127))
    ).count()
    no_full_scale = qz.filter(
        ~F.exists(F.col("codes_arr"), lambda c: F.abs(c) == 127)
    ).count()
    assert bad_range == 0
    assert no_full_scale == 0


def test_dedup_components_edges_agree(spark):
    """Every verified near-dup pair must land in one component, and
    every component label must be the minimum doc_id it contains."""
    from chi_frbcs_bigdatacs_spark.operators.dedup_near import (
        q_dedup_components,
        q_dedup_minhash,
    )

    comp = q_dedup_components(spark, SF_SMALL)
    pairs = q_dedup_minhash(spark, SF_SMALL).select("doc_a", "doc_b")
    ca = comp.select(F.col("doc_id").alias("doc_a"), F.col("component").alias("comp_a"))
    cb = comp.select(F.col("doc_id").alias("doc_b"), F.col("component").alias("comp_b"))
    split_edges = (
        pairs.join(ca, "doc_a").join(cb, "doc_b")
        .filter(F.col("comp_a") != F.col("comp_b"))
        .count()
    )
    assert split_edges == 0
    bad_labels = (
        comp.groupBy("component")
        .agg(F.min("doc_id").alias("min_id"))
        .filter(F.col("component") != F.col("min_id"))
        .count()
    )
    assert bad_labels == 0


def test_stream_latest_event_equals_batch(spark):
    """The stateful streaming compaction must equal the batch
    latest-per-key answer row for row (stream==batch property)."""
    from chi_frbcs_bigdatacs_spark.operators.curation import q_dedup_latest_event
    from chi_frbcs_bigdatacs_spark.streaming.stateful import q_stream_latest_event

    batch = q_dedup_latest_event(spark, SF_SMALL)
    stream = q_stream_latest_event(spark, SF_SMALL)
    assert batch.exceptAll(stream).count() == 0
    assert stream.exceptAll(batch).count() == 0


def test_simsearch_recall_is_nontrivial_and_monotone(spark):
    """The ANN recall metric must be able to distinguish a good IVF
    from a broken one: strictly inside (0,1) at probe=1, monotonically
    non-decreasing in probes, and exactly 1.0 at probe=K (exhaustive
    search of all K_CLUSTERS cells)."""
    from chi_frbcs_bigdatacs_spark.operators.similarity import (
        K_CLUSTERS,
        RECALL_PROBES,
        q_simsearch_recall,
    )

    rows = {r.n_probe: r.recall_at_10 for r in q_simsearch_recall(spark, SF_SMALL).collect()}
    assert set(rows) == set(RECALL_PROBES)
    assert 0.0 < rows[1] < 1.0, f"probe=1 recall {rows[1]} proves nothing"
    seq = [rows[p] for p in sorted(rows)]
    assert seq == sorted(seq), f"recall not monotone in probes: {rows}"
    assert rows[max(RECALL_PROBES)] == 1.0 or max(RECALL_PROBES) < K_CLUSTERS


def test_timeseries_ewma_close_within_observed_band(spark):
    """The EWMA is a convex combination of the last K observations, so
    every emitted close must lie inside the global [min, max] value
    band of its event type (a truncation/renormalization bug that
    over- or under-weights a lag would push it outside)."""
    from chi_frbcs_bigdatacs_spark.operators.curation import q_timeseries_ewma
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    out = q_timeseries_ewma(spark, SF_SMALL)
    band = (
        load_events(spark, SF_SMALL)
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    bad = (
        out.join(band, "event_type")
        .filter((F.col("ewma_close") < F.col("lo") - 1e-6)
                | (F.col("ewma_close") > F.col("hi") + 1e-6))
        .count()
    )
    assert bad == 0
    assert out.count() > 0


def test_sketch_kmv_overlap_estimator_sane(spark):
    """Bottom-k estimator sanity on the fixture: estimates live in
    [0, 1], k_eff is capped at K, and the estimate tracks the exact
    jaccard to within the standard-error band (~3/sqrt(K) at K=128 —
    a hash or membership-join bug shows up as a gross miss)."""
    from chi_frbcs_bigdatacs_spark.operators.text import KMV_K, q_sketch_kmv_overlap

    rows = q_sketch_kmv_overlap(spark, SF_SMALL).collect()
    assert rows, "no language pairs emitted"
    for r in rows:
        assert 0 <= r.k_eff <= KMV_K
        assert 0.0 <= r.est_jaccard <= 1.0
        assert abs(r.est_jaccard - r.exact_jaccard) <= 3.0 / (KMV_K ** 0.5)
