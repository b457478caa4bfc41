"""Invariants for the data-quality / layout operators
(operators/quality.py) and the SemDeDup-style semantic dedup, beyond
the oracle hash check in test_oracle_parity.py.
"""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_SMALL


def test_zorder_key_roundtrips(spark):
    """De-interleaving the Morton key recovers the masked inputs —
    the layout key loses no bits below Z_BITS — and interleaved
    locality holds: sharing a high-bit prefix implies nearby cells."""
    from chi_frbcs_bigdatacs_spark.operators.quality import (
        Z_BITS,
        q_scalar_zorder_key,
    )

    rows = q_scalar_zorder_key(spark, SF_SMALL).limit(500).collect()
    assert rows
    mask = (1 << Z_BITS) - 1
    for r in rows:
        p = sum(((r.zkey >> (2 * i)) & 1) << i for i in range(Z_BITS))
        s = sum(((r.zkey >> (2 * i + 1)) & 1) << i for i in range(Z_BITS))
        assert p == r.l_partkey & mask
        assert s == r.l_suppkey & mask


def test_zorder_write_scan_pushes_down(spark, tmp_path):
    """The layout key is usable end-to-end: write lineitem clustered
    by zkey (sortWithinPartitions — no extra shuffle), read back with
    a zkey range predicate, and the filter reaches the parquet scan
    (PushedFilters), where the clustered layout makes row-group
    min/max stats selective."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.quality import q_scalar_zorder_key

    d = str(tmp_path / "zsorted")
    q_scalar_zorder_key(spark, SF_SMALL).sortWithinPartitions(
        "zkey"
    ).write.mode("overwrite").parquet(d)
    back = spark.read.parquet(d).filter(
        (F.col("zkey") >= 1024) & (F.col("zkey") < 2048)
    )
    p = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in p and "GreaterThanOrEqual(zkey,1024)" in p, (
        p.split("FileScan")[-1][:400]
    )
    # and the predicate is actually correct on read-back
    assert all(1024 <= r.zkey < 2048 for r in back.select("zkey").collect())


def test_audit_duplicate_pk_catches_known_dup(spark):
    """Single-column PKs are unique in the fixture; the composite
    lineitem key is KNOWN non-unique (NOTES rule 6) and the audit
    must say so."""
    from chi_frbcs_bigdatacs_spark.operators.quality import q_audit_duplicate_pk

    rows = {r.pk: r for r in q_audit_duplicate_pk(spark, SF_SMALL).collect()}
    assert len(rows) == 7
    li = rows["lineitem(l_orderkey,l_linenumber)"]
    assert li.n_dup_keys > 0 and li.max_multiplicity > 1
    for pk, r in rows.items():
        if pk != "lineitem(l_orderkey,l_linenumber)":
            assert r.n_dup_keys == 0 and r.n_rows == r.n_keys, r


def test_profile_columns_counts(spark):
    """Profile rows agree with directly computed pandas stats."""
    from chi_frbcs_bigdatacs_spark.operators.quality import (
        _PROFILE_COLS,
        q_profile_columns,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

    pdf = load_table(spark, SF_SMALL, "lineitem").toPandas()
    prof = {r["column"]: r for r in q_profile_columns(spark, SF_SMALL).collect()}
    assert set(prof) == set(_PROFILE_COLS)
    for c in _PROFILE_COLS:
        assert prof[c].n_rows == len(pdf)
        assert prof[c].n_null == int(pdf[c].isna().sum())
        assert prof[c].n_distinct == pdf[c].nunique()
        assert prof[c].min_v == pdf[c].min()
        assert prof[c].max_v == pdf[c].max()


def test_audit_fk_orphans_consistent_star(spark):
    """The synthetic star schema is referentially intact on every
    audited edge, and the audit reports full child cardinalities."""
    from chi_frbcs_bigdatacs_spark.operators.quality import q_audit_fk_orphans

    rows = {r.relation: r for r in q_audit_fk_orphans(spark, SF_SMALL).collect()}
    assert len(rows) == 5
    assert rows["lineitem.l_orderkey->orders"].n_rows == 6000
    for r in rows.values():
        assert r.n_orphans == 0, r


def test_sample_group_topn_is_bounded_and_stable(spark):
    """At most K rows per group, ranks contiguous from 1, and the draw
    is a pure function of doc_id (stable when the corpus shrinks)."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.quality import (
        GROUP_SAMPLE_K,
        q_sample_group_topn,
    )

    rows = q_sample_group_topn(spark, SF_SMALL).collect()
    per = Counter(r.lang for r in rows)
    assert per and all(v <= GROUP_SAMPLE_K for v in per.values())
    for lang in per:
        rks = sorted(r.rk for r in rows if r.lang == lang)
        assert rks == list(range(1, len(rks) + 1))


def test_discretize_quantile_bins_are_equal_population(spark):
    """ntile contract: bin sizes differ by at most 1, bins are value-
    ordered (max of bin b <= min of bin b+1), and populations sum to
    the table size."""
    from chi_frbcs_bigdatacs_spark.operators.quality import (
        N_QBINS,
        q_discretize_quantile,
    )

    rows = sorted(q_discretize_quantile(spark, SF_SMALL).collect(), key=lambda r: r.bin)
    assert [r.bin for r in rows] == list(range(1, N_QBINS + 1))
    sizes = [r.n for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert sum(sizes) == 6000
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_price <= hi.min_price


def test_dedup_semantic_keep_partitions_the_corpus(spark):
    """Dups and survivors are disjoint and together cover every
    vector exactly once."""
    from chi_frbcs_bigdatacs_spark.operators.similarity import (
        q_dedup_semantic,
        q_dedup_semantic_keep,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

    dups = {r.vec_id for r in q_dedup_semantic(spark, SF_SMALL).collect()}
    kept = {r.vec_id for r in q_dedup_semantic_keep(spark, SF_SMALL).collect()}
    allv = {
        r.vec_id
        for r in load_table(spark, SF_SMALL, "embeddings").select("vec_id").collect()
    }
    assert dups and kept
    assert dups & kept == set()
    assert dups | kept == allv


def test_drift_ks_matches_numpy_ecdf(spark):
    """KS per event_type equals a direct numpy ECDF computation over
    floor-binned values, and lands in [0, 1]."""
    import numpy as np

    from chi_frbcs_bigdatacs_spark.operators.curation import (
        DRIFT_SPLIT_TS,
        q_drift_ks,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

    pdf = load_table(spark, SF_SMALL, "events").toPandas()
    split = np.datetime64(DRIFT_SPLIT_TS.replace(" ", "T"))
    got = {r.event_type: r for r in q_drift_ks(spark, SF_SMALL).collect()}
    for et, g in pdf.groupby("event_type"):
        a = np.floor(g[g.ts.values < split].value.values)
        b = np.floor(g[g.ts.values >= split].value.values)
        bins = np.unique(np.concatenate([a, b]))
        ca = np.searchsorted(np.sort(a), bins, side="right") / len(a)
        cb = np.searchsorted(np.sort(b), bins, side="right") / len(b)
        ks = float(np.max(np.abs(ca - cb)))
        r = got[et]
        assert r.n_a == len(a) and r.n_b == len(b)
        assert 0.0 <= r.ks <= 1.0
        assert abs(r.ks - ks) < 1e-6, (et, r.ks, ks)


def test_graph_pagerank_matches_pure_python(spark):
    """The fixed-point integer PageRank equals an independent Python
    re-implementation over the same edge list — exact, no tolerance —
    and respects the structural invariants (floor, mass bound, full
    node coverage)."""
    from chi_frbcs_bigdatacs_spark.operators.graph import (
        N_PR_ITERS,
        PR_BASE,
        PR_R0,
        _edges,
        q_graph_pagerank,
    )

    edges = [(r.src, r.dst) for r in _edges(spark, SF_SMALL).collect()]
    nodes = sorted({s for s, _ in edges})
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: PR_R0 for v in nodes}
    for _ in range(N_PR_ITERS):
        s: dict[str, int] = {}
        for u, v in edges:
            s[v] = s.get(v, 0) + rank[u] // outdeg[u]
        rank = {v: PR_BASE + (17 * s.get(v, 0)) // 20 for v in nodes}
    got = {r.node: r.rank for r in q_graph_pagerank(spark, SF_SMALL).collect()}
    assert got == rank
    assert all(r >= PR_BASE for r in got.values())
    assert sum(got.values()) <= len(nodes) * PR_R0


def test_anonymize_kgroups_suppresses_small_groups(spark):
    """Every released group has >= K members, and suppression really
    removed groups (released group count < raw group count at this
    sf)."""
    from chi_frbcs_bigdatacs_spark.operators.quality import (
        K_ANON,
        q_anonymize_kgroups,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

    rows = q_anonymize_kgroups(spark, SF_SMALL).collect()
    assert rows and all(r.n >= K_ANON for r in rows)
    raw = (
        load_table(spark, SF_SMALL, "orders")
        .selectExpr(
            "o_orderstatus", "o_orderpriority", "date_format(o_orderdate, 'yyyy-MM')"
        )
        .distinct()
        .count()
    )
    assert len(rows) < raw
    # suppressed members are absent: released coverage < 1500 orders
    assert sum(r.n for r in rows) < 1500


def test_phrase_from_index_never_scans_documents(spark):
    """Serving from the positional index must not touch the corpus:
    no documents.parquet scan, and the two-term IN cut reaches the
    postings parquet as a pushed filter."""
    from chi_frbcs_bigdatacs_spark.operators.text import (
        q_text_phrase_from_index,
        q_text_phrase_search,
    )

    df = q_text_phrase_from_index(spark, SF_SMALL)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in p
    assert "PushedFilters: [" in p and "In(term, [" in p, (
        p.split("FileScan")[-1][:400]
    )
    served = sorted(map(tuple, df.collect()))
    direct = sorted(map(tuple, q_text_phrase_search(spark, SF_SMALL).collect()))
    assert served == direct and served


def test_anomaly_criterion_is_the_three_sigma_rule(spark):
    """The division-free integer criterion is semantically the
    z-score rule, not merely self-consistent: recompute prior
    mean/std in float per event and compare flags — they must agree
    everywhere except within float epsilon of the boundary."""
    import numpy as np

    from chi_frbcs_bigdatacs_spark.operators.curation import (
        ANOM_WARMUP,
        q_anomaly_zscore,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

    flagged = {
        r.event_id for r in q_anomaly_zscore(spark, SF_SMALL).collect()
    }
    assert flagged
    pdf = (
        load_table(spark, SF_SMALL, "events")
        .toPandas()
        .sort_values(["ts", "event_id"])
    )
    for _, g in pdf.groupby("event_type"):
        v = np.round(g["value"].to_numpy() * 100)
        ids = g["event_id"].to_numpy()
        for i in range(ANOM_WARMUP, len(v)):
            prior = v[:i]
            z = (v[i] - prior.mean()) / max(prior.std(), 1e-12)
            margin = abs(abs(z) - 3.0)
            if margin > 1e-6:  # away from the boundary, flags agree
                assert (abs(z) > 3.0) == (ids[i] in flagged), (
                    ids[i],
                    z,
                )


def test_scd2_intervals_are_contiguous(spark):
    """Per user: versions run 1..n, each version's valid_to equals the
    next version's valid_from, and exactly the last version is
    current (valid_to NULL)."""
    from chi_frbcs_bigdatacs_spark.operators.curation import q_scd2_build

    rows = q_scd2_build(spark, SF_SMALL).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, vs in by_user.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1))
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from, user
        assert all(not r.is_current for r in vs[:-1])
        assert vs[-1].is_current and vs[-1].valid_to is None


def test_dedup_semantic_marks_only_in_cell_lower_ids(spark):
    """Every reported dup has dup_of < vec_id, the pair lives in the
    same k-means cell, and its cosine clears the threshold against a
    numpy recomputation."""
    import numpy as np

    from chi_frbcs_bigdatacs_spark.operators.similarity import (
        SEMANTIC_DUP_THRESHOLD,
        _kmeans_index,
        q_dedup_semantic,
    )

    dups = q_dedup_semantic(spark, SF_SMALL).collect()
    assert dups, "fixture should contain semantic dups at tau=0.6"
    a2, _, _ = _kmeans_index(spark, SF_SMALL)
    arows = a2.collect()
    cell = {r.vec_id: r.k for r in arows}
    vec = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in arows}
    for r in dups:
        assert r.dup_of < r.vec_id
        assert cell[r.dup_of] == cell[r.vec_id]
        a, b = vec[r.dup_of], vec[r.vec_id]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        # max_cosine is over ALL lower-id in-cell neighbors; the one
        # with the lowest id just needs to clear the threshold
        assert round(cos, 6) >= SEMANTIC_DUP_THRESHOLD or r.n_similar > 1
        assert r.max_cosine >= SEMANTIC_DUP_THRESHOLD


def test_feature_scale_full_transform_is_centered(spark):
    """Applying the scaler's formula to the WHOLE table (not just the
    emitted sample) must give per-type mean ~0 and population variance
    ~1 — proves the group stats and the z formula compose correctly."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    ev = load_table(spark, SF_SMALL, "events")
    v = F.round(F.col("value") * 100).cast("long")
    stats = ev.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c"), F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    z = (F.col("c") * F.col("v") - F.col("s")).cast("double") / F.sqrt(
        (F.col("c") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
    )
    full = (
        ev.select("event_type", v.alias("v"))
        .join(F.broadcast(stats), "event_type")
        .select("event_type", z.alias("zs"))
    )
    chk = full.groupBy("event_type").agg(
        F.avg("zs").alias("m"), F.avg(F.col("zs") * F.col("zs")).alias("v2")
    )
    for r in chk.collect():
        assert abs(r["m"]) < 1e-9, r
        assert abs(r["v2"] - 1.0) < 1e-6, r


def test_impute_missing_mask_and_fill_accounting(spark):
    """The deterministic mask must null exactly the event_id % 7 == 0
    slice, and the reported post-impute mean must equal the hand
    accounting (observed sum + n_missing * fill) / n."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.quality import (
        IMPUTE_MOD,
        q_impute_missing,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    out = {r["event_type"]: r for r in q_impute_missing(spark, SF_SMALL).collect()}
    ev = load_table(spark, SF_SMALL, "events")
    exp = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_id") % IMPUTE_MOD == 0).cast("int")).alias("nm"),
    )
    for r in exp.collect():
        o = out[r["event_type"]]
        assert o["n"] == r["n"] and o["n_missing"] == r["nm"]
        assert o["n_missing"] > 0


def test_ldiversity_distinct_counts_are_exact(spark):
    """n_distinct_sensitive must equal the exact distinct count of the
    sensitive bucket inside each group, and l_diverse must be its
    threshold comparison (recomputed independently with
    countDistinct)."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.quality import (
        L_DIVERSITY,
        q_anonymize_ldiversity,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    got = {
        (r["o_orderstatus"], r["o_orderpriority"], r["month"]): r
        for r in q_anonymize_ldiversity(spark, SF_SMALL).collect()
    }
    o = load_table(spark, SF_SMALL, "orders")
    ref = (
        o.groupBy(
            "o_orderstatus",
            "o_orderpriority",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.col("o_custkey") % 50).alias("d"),
        )
        .collect()
    )
    assert len(ref) == len(got)
    for r in ref:
        g = got[(r["o_orderstatus"], r["o_orderpriority"], r["month"])]
        assert g["n"] == r["n"]
        assert g["n_distinct_sensitive"] == r["d"]
        assert g["l_diverse"] == (r["d"] >= L_DIVERSITY)


def test_zipf_fit_recovers_power_law_on_synthetic_corpus(spark, tmp_path):
    """text_zipf_fit on a corpus built with freq(rank) ∝ rank^-1 must
    fit slope ~ -1 with high r2 — the testdata corpus is templated
    (31 distinct terms, slope -0.18, r2 0.06 at sf0.01), which is the
    degenerate signal the op exists to flag, so the power-law
    recovery claim is pinned here on a planted Zipfian corpus."""
    from chi_frbcs_bigdatacs_spark.operators.text import q_text_zipf_fit

    # alphabetic-only ids: the tokenizer splits on [^a-z]+, so digits
    # in a word would dissolve it
    words = [
        "w" + chr(97 + i // 26) + chr(97 + i % 26) for i in range(120)
    ]
    toks = []
    for r, w in enumerate(words, start=1):
        toks.extend([w] * max(1, 6000 // r))
    # deterministic interleave so tokens spread across docs
    docs = [
        (i, " ".join(toks[i::40]), "en", "src")
        for i in range(40)
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    row = q_text_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert row["n_terms"] == 120
    assert -1.15 < row["slope"] < -0.85, row["slope"]
    assert row["r2"] > 0.95, row["r2"]


def test_bloom_prune_never_false_negative_and_fp_matches_theory(spark):
    """join_bloom_prune (r15): a Bloom filter must NEVER drop a true
    match — every dim key that actually appears on the fact side has
    to pass the probe (n_pass - n_false_pos == n_true by the stats'
    construction iff no false negative), and the measured fp_rate
    must sit near the saturation**k theory (within 2x either way when
    there are enough negative probes to measure it)."""
    from chi_frbcs_bigdatacs_spark.operators.quality import (
        BLOOM_K,
        q_join_bloom_prune,
    )
    from tests.conftest import SF_SMALL

    row = q_join_bloom_prune(spark, SF_SMALL).collect()[0]
    assert row["n_pass"] - row["n_false_pos"] == row["n_true"], (
        "false negative: a true key failed the Bloom probe"
    )
    assert row["n_true"] > 0, "fixture has no true matches; proves nothing"
    n_neg = row["n_keys_probed"] - row["n_true"]
    theory = row["saturation"] ** BLOOM_K
    if n_neg * theory >= 20:  # enough expected FPs to measure a rate
        assert theory / 2 <= row["fp_rate"] <= theory * 2, (
            row["fp_rate"],
            theory,
        )
    else:
        assert row["fp_rate"] <= max(0.01, theory * 5), row["fp_rate"]


def test_bloom_filtered_join_transparent_and_predicate_in_scan(spark):
    """join_bloom_filtered: (a) the runtime filter must be
    SEMANTICALLY TRANSPARENT — result identical to the plain join
    (also the oracle contract); (b) the Bloom predicate must really
    ride the fact scan as a codegen'd literal-array filter (no
    explode, no extra join: exactly ONE join in the plan); (c) the
    prefilter must actually cut rows — selectivity strictly between
    the true match rate and 1."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.quality import (
        q_join_bloom_filtered,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    got = q_join_bloom_filtered(spark, SF_SMALL)
    li = load_table(spark, SF_SMALL, "lineitem")
    dim = (
        load_table(spark, SF_SMALL, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").cast("long").alias("k"), "o_orderpriority")
    )
    plain = (
        li.select(
            F.col("l_orderkey").cast("long").alias("k"),
            "l_extendedprice",
            "l_discount",
        )
        .join(dim, "k")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("k").alias("n_orders"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")
                )
            )
            .cast("double")
            .alias("revenue"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, plain.collect())
    )

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "shiftright" in plan, "bloom predicate not in the plan"
    assert plan.count("Generate") == 0, "explode leaked into the apply path"

    # (c) the predicate earns its keep: strictly fewer rows than the
    # raw fact side, at least as many as the true matches.
    from chi_frbcs_bigdatacs_spark.operators.quality import (
        bloom_dim_keys,
        bloom_row_filter,
        bloom_words,
    )

    words = {
        int(r["word"]): int(r["bits"])
        for r in bloom_words(bloom_dim_keys(spark, SF_SMALL)).collect()
    }
    keys = li.select(F.col("l_orderkey").cast("long").alias("k"))
    n_all = keys.count()
    n_kept = bloom_row_filter(keys, "k", words).count()
    n_true = keys.join(dim.select("k"), "k").count()
    assert n_true <= n_kept < n_all, (n_true, n_kept, n_all)
