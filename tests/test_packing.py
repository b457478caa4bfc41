"""Invariants for the training-set assembly operators
(operators/packing.py) beyond the oracle hash: packing geometry,
split stability/stratification, and the sqrt-temperature mixing law.
"""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_SMALL


def test_pack_sequences_geometry(spark):
    """Per source: offsets are the exclusive cumsum of token counts in
    doc_id order, seq_id = start_off // budget, and the first doc of
    every shard starts at offset 0."""
    from chi_frbcs_bigdatacs_spark.operators.packing import (
        PACK_BUDGET,
        q_doc_pack_sequences,
    )

    rows = q_doc_pack_sequences(spark, SF_SMALL).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src) == 20
    for src, docs in by_src.items():
        docs.sort(key=lambda r: r.doc_id)
        off = 0
        for r in docs:
            assert r.start_off == off, (src, r.doc_id)
            assert r.seq_id == off // PACK_BUDGET
            assert r.n_tokens >= 1
            off += r.n_tokens
        # contiguity: every sequence index up to the last is populated
        seqs = sorted({r.seq_id for r in docs})
        assert seqs == list(range(seqs[-1] + 1))


def test_pack_sequences_partition_invariant(spark):
    """The packing is a deterministic function of the data, not of
    the physical layout feeding the window."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.packing import (
        pack_documents,
        q_doc_pack_sequences,
    )

    a = sorted(map(tuple, q_doc_pack_sequences(spark, SF_SMALL).collect()))
    scrambled = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .repartition(13, F.col("lang"))
        .sortWithinPartitions(F.col("n_chars").desc())
    )
    b = sorted(map(tuple, pack_documents(scrambled).collect()))
    assert a == b


def test_split_stratified_stable_and_proportional(spark):
    """Membership is a pure function of doc_id (stable under corpus
    growth), and the 8/1/1 buckets land near 80/10/10."""
    from chi_frbcs_bigdatacs_spark.operators.packing import q_split_stratified

    rows = q_split_stratified(spark, SF_SMALL).collect()
    n = len(rows)
    frac = Counter(r.split for r in rows)
    assert 0.7 <= frac["train"] / n <= 0.9
    assert 0.03 <= frac["valid"] / n <= 0.2
    assert 0.03 <= frac["test"] / n <= 0.2
    # subset stability: RECOMPUTE the split over a filtered input
    # corpus — if membership depended on corpus size/contents, the
    # surviving docs would migrate between splits
    from chi_frbcs_bigdatacs_spark.operators.packing import split_documents
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

    full = {r.doc_id: r.split for r in rows}
    sub = split_documents(
        load_table(spark, SF_SMALL, "documents").where("doc_id % 3 = 0")
    ).collect()
    assert sub and all(full[r.doc_id] == r.split for r in sub)


def test_corpus_mix_sqrt_damps_the_head(spark):
    """sqrt-temperature mixing: every lang keeps at most its original
    count, the head lang is downsampled hardest, and the output mix is
    strictly flatter than the input mix (max share decreases)."""
    from chi_frbcs_bigdatacs_spark.operators.packing import q_corpus_mix_sqrt

    before = Counter(
        r.lang
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("lang")
        .collect()
    )
    after = Counter(r.lang for r in q_corpus_mix_sqrt(spark, SF_SMALL).collect())
    assert set(after) <= set(before)
    for lang in after:
        assert after[lang] <= before[lang]
    head = max(before, key=before.get)
    n_b, n_a = sum(before.values()), sum(after.values())
    assert after[head] / n_a < before[head] / n_b
    # keep-ratio ordering: head keeps a SMALLER fraction than the tail
    tail = min(before, key=before.get)
    assert after[head] / before[head] < after[tail] / before[tail]


def test_unigram_surprisal_bounds(spark):
    """Scores are positive, bounded by ln(total tokens), and every
    document with >=1 qualifying token is scored."""
    import math

    from chi_frbcs_bigdatacs_spark.operators.packing import (
        q_text_unigram_surprisal,
    )

    rows = q_text_unigram_surprisal(spark, SF_SMALL).collect()
    assert rows
    total = sum(r.n_toks for r in rows)
    for r in rows:
        assert r.n_toks >= 1
        assert 0.0 < r.surprisal <= math.log(total) + 1e-9, r
