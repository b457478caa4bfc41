"""M4 — near-duplicate detection: MinHash-LSH and SimHash.

Unlike MLlib's MinHashLSH (seeded random affine hashes, not
reproducible outside Spark), the hash family here is md5-derived —
`md5(seed ':' shingle)` — which BOTH Spark and DuckDB compute
identically, so the whole pipeline (shingle -> minhash signature ->
band -> bucket-join -> Jaccard verify) is hash-checkable end-to-end.

Scale shape (100 TB):
  - signatures: one explode(shingles) + one groupBy(doc) with K min()
    aggregates — map-side combinable, no all-pairs work;
  - candidates: self-join on (band_idx, band_hash) — the LSH trick
    turns near-dup search into an equi-join that shuffles only docs
    sharing a bucket; AQE splits skewed buckets (boilerplate docs);
  - verification: Jaccard on the distinct-shingle sets of candidate
    pairs only.

SimHash: 60-bit fingerprint from per-token md5 (hex -> int via conv),
bit-majority aggregated by (doc, bit) — two hash aggregations, no
joins; Hamming-close fingerprints mean near-dup text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.plans.registry import register
from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

SHINGLE = 3          # tokens per shingle
NUM_HASHES = 16      # minhash signature length
BANDS = 4            # 4 bands x 4 rows
ROWS_PER_BAND = NUM_HASHES // BANDS
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 60    # 15 hex chars -> fits signed int64


def _word_ngrams_col(n: int) -> Column:
    """Distinct n-token word shingles of `text` (empty if < n tokens)."""
    toks = F.split(F.col("text"), " ")
    mk = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, mk).otherwise(F.array().cast("array<string>"))
    )


def _shingles_col() -> Column:
    return _word_ngrams_col(SHINGLE)


SHINGLES_SQL = f"""
list_distinct(list_transform(
    range(1, len(string_split(text, ' ')) - {SHINGLE - 2}),
    i -> array_to_string(list_slice(string_split(text, ' '), i, i + {SHINGLE - 1}), ' ')))
""".strip()


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # testdata parquet is single-row-group (unsplittable): spread the
    # docs before the CPU-heavy shingle/hash work
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return d.select("doc_id", _shingles_col().alias("shingles"))


# Affine minhash family over the 2^61-1 prime field: ONE md5 per
# shingle (hex -> 60-bit int), then h_k = (a_k*v + b_k) mod P derived
# arithmetically — 16x fewer md5 calls than hashing per-seed, and the
# exact integer arithmetic (DECIMAL(38,0) in Spark, HUGEINT in DuckDB)
# is bit-identical across engines.
MERSENNE_P = (1 << 61) - 1
AFFINE = [(2 * k + 3, 7919 * (k + 1) + 1) for k in range(NUM_HASHES)]


_MINHASH_CACHE: list[DataFrame] = []


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs with verified Jaccard >= threshold."""
    # docs feeds three branches (signatures + both sides of the
    # Jaccard verify join): persist so shingling happens once. The
    # cache must outlive this call (the result is lazy), so the
    # previous call's cache is released here instead — at most one
    # lingers, and repeated sweep/bench runs no longer accumulate.
    while _MINHASH_CACHE:
        _MINHASH_CACHE.pop().unpersist()
    docs = _docs(spark, sf_dir).persist()
    _MINHASH_CACHE.append(docs)
    sh = docs.select("doc_id", F.explode("shingles").alias("s")).withColumn(
        "v", F.conv(F.substring(F.md5(F.col("s")), 1, 15), 16, 10).cast("long")
    )
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.expr(
                    f"CAST((CAST(v AS DECIMAL(38,0)) * {a} + {b}) % {MERSENNE_P} AS BIGINT)"
                )
            ).alias(f"h{k}")
            for k, (a, b) in enumerate(AFFINE)
        ]
    )
    # One band row per (doc, band) via a SINGLE explode over the sig
    # row — the previous 16-way unionByName re-executed the whole
    # shingle-explode + 16-min aggregation once per band branch (18
    # HashAggregates, zero exchange reuse in the r4 plan audit).
    # sig is tiny (one row per doc, 16 longs) and feeds both sides of
    # the banding self-join, so it persists into the same
    # one-generation cache as docs.
    band_structs = []
    for b in range(BANDS):
        cols = [f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws("|", *[F.col(c).cast("string") for c in cols]).cast(
                        "binary"
                    )
                ).alias("bv"),
            )
        )
    sig = sig.persist()
    _MINHASH_CACHE.append(sig)
    bands = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bv") == F.col("b.bv")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sha"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("shb"))
    jac = (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sha", "shb")).cast("double")
                / F.size(F.array_union("sha", "shb")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= JACCARD_THRESHOLD)


def _minhash_sql() -> str:
    hexv = (
        "list_sum(list_transform(range(0, 15), "
        "i -> (CAST(strpos('0123456789abcdef', substr(md5(s), i + 1, 1)) AS BIGINT) - 1)"
        " << (4 * (14 - i))))"
    )
    sig_cols = ",\n         ".join(
        f"min(CAST((CAST(v AS HUGEINT) * {a} + {b}) % {MERSENNE_P} AS BIGINT)) AS h{k}"
        for k, (a, b) in enumerate(AFFINE)
    )
    band_selects = []
    for b in range(BANDS):
        cols = " || '|' || ".join(
            f"CAST(h{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({cols}) AS bv FROM sig"
        )
    bands_union = "\n  UNION ALL\n  ".join(band_selects)
    return f"""
WITH docs AS (
  SELECT doc_id, {SHINGLES_SQL} AS shingles
  FROM documents
),
sh AS (
  SELECT doc_id, {hexv} AS v
  FROM (SELECT doc_id, unnest(shingles) AS s FROM docs) t
),
sig AS (
  SELECT doc_id,
         {sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
  {bands_union}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bv = b.bv
  WHERE a.doc_id < b.doc_id
),
jac AS (
  SELECT c.doc_a, c.doc_b,
         round(CAST(len(list_intersect(da.shingles, db.shingles)) AS DOUBLE)
               / CAST(len(list_distinct(da.shingles || db.shingles)) AS DOUBLE), 6) AS jaccard
  FROM cand c
  JOIN docs da ON da.doc_id = c.doc_a
  JOIN docs db ON db.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
"""


# --- corpus-level near-dup REMOVAL (what a pipeline consumes) --------------
# The pair list is diagnostics; a training-data pipeline needs the
# SURVIVING corpus. Greedy keep-lowest policy: a document is dropped
# iff some verified near-duplicate with a smaller doc_id exists (it
# appears as doc_b of a pair). Deterministic, one anti-join over the
# (tiny) pair list — at 100 TB this is a broadcast anti-join against
# the full corpus scan. (This is the standard greedy sweep, NOT
# transitive-closure clustering — connected components would need an
# iterative algorithm; for near-dup removal greedy-by-id is the
# common policy and keeps exactly one doc per pairwise-verified
# clique prefix.)
def q_dedup_minhash_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = q_dedup_minhash(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source"
    )
    drop = pairs.select(F.col("doc_b").alias("doc_id"))
    return docs.join(F.broadcast(drop), "doc_id", "left_anti")


def _minhash_keep_sql() -> str:
    return f"""
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_b FROM ({_minhash_sql()}) p)
"""


# --- transitive near-dup clusters: connected components --------------------
# The piece greedy keep-lowest cannot express: A~B and B~C put A,C in
# one cluster even when A,C never paired. Connected components over
# the verified MinHash pair graph via ITERATIVE min-label propagation
# (each node repeatedly takes the min component id over itself and
# its neighbors until fixpoint). Convergence needs diameter hops —
# near-dup clusters are small dense cliques, so 2-3 in practice; the
# loop guard is a hard error, not a silent cap. Each iteration is one
# hash-partitioned join + agg; labels are localCheckpoint'ed so the
# plan doesn't grow with iterations. At 100 TB scale-up the same loop
# holds (GraphX/GraphFrames CC is this algorithm; the large-star/
# small-star variant trades more passes for O(log^2 n) rounds and
# drops in here if diameters ever grow).
#
# Oracle: WITH RECURSIVE transitive closure over the same pair list —
# exactly the semantics, tractable because the driver's check runs at
# fixture scale where the pair graph is tiny.
MAX_CC_ITERS = 20


def connected_components(edges: DataFrame) -> DataFrame:
    """Min-label propagation over an undirected edge list
    (columns `doc_a`, `doc_b`) -> one row per vertex with its
    component id (= min vertex id in the component). Reusable over
    any pair source (minhash, ngram, embedding near-dup)."""
    # both orientations from ONE pass over the edge lineage (a union
    # of two projections would execute the pair-generation twice)
    und = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .persist()
    )
    try:
        labels = (
            und.select(F.col("src").alias("doc_id"))
            .distinct()
            .withColumn("component", F.col("doc_id"))
            .localCheckpoint()
        )
        for _ in range(MAX_CC_ITERS):
            nbmin = (
                und.join(
                    labels.select(
                        F.col("doc_id").alias("dst"), F.col("component").alias("dc")
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("dc").alias("nb_comp"))
                .withColumnRenamed("src", "doc_id")
            )
            new = (
                labels.join(nbmin, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("component"), F.coalesce("nb_comp", "component")
                    ).alias("component"),
                )
                .localCheckpoint()
            )
            changed = (
                new.select("doc_id", F.col("component").alias("nc"))
                .join(labels, "doc_id")
                .filter(F.col("nc") != F.col("component"))
                .count()
            )
            labels = new
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"connected components did not converge in {MAX_CC_ITERS} iterations"
            )
    finally:
        # (labels is checkpointed, so unpersisting the edges here does
        # not invalidate the returned lineage even on the error path)
        und.unpersist()
    return labels


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    return connected_components(
        q_dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    )


def _components_sql() -> str:
    return f"""
WITH RECURSIVE pairs AS (
  {_minhash_sql()}
),
und AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM und
  UNION
  SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src
)
SELECT src AS doc_id, least(src, min(dst)) AS component
FROM reach GROUP BY src
"""


# --- n-gram Jaccard dedup (blocking join, no sketch) ------------------------
# Exact word-bigram Jaccard verified over BLOCKED candidate pairs:
# docs only pair within equal (lang, source, length-bucket) blocks,
# with each doc fanned out to its bucket and the next (the banding
# idiom from embed_neardup_lsh applied to length blocking) so
# boundary-straddling near-dups still collide. Never all-pairs: the
# join is an equi-join on the block key, pair candidates are bounded
# by block size, and the distinct() dedupes the two-bucket fan-out
# BEFORE the n-gram set comparison. Recall bound (documented): pairs
# whose distinct-bigram counts differ by >= 2 buckets are missed —
# such pairs are far below the Jaccard threshold anyway.
NGRAM = 2
NGRAM_JACCARD_THRESHOLD = 0.4
LEN_BUCKET = 16


def _ngrams_col() -> Column:
    toks = F.split(F.col("text"), " ")
    mk = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (NGRAM - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, NGRAM)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= NGRAM, mk).otherwise(F.array().cast("array<string>"))
    )


NGRAMS_SQL = f"""
list_distinct(list_transform(
    range(1, len(string_split(text, ' ')) - {NGRAM - 2}),
    i -> array_to_string(list_slice(string_split(text, ' '), i, i + {NGRAM - 1}), ' ')))
""".strip()


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs = d.select("doc_id", "lang", "source", _ngrams_col().alias("grams"))
    blk = F.floor(F.size("grams") / LEN_BUCKET).cast("long")
    expanded = docs.select(
        "doc_id", "lang", "source", F.explode(F.array(blk, blk + 1)).alias("blk")
    )
    a = expanded.select("lang", "source", "blk", F.col("doc_id").alias("doc_a"))
    b = expanded.select("lang", "source", "blk", F.col("doc_id").alias("doc_b"))
    cand = (
        a.join(b, ["lang", "source", "blk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ga = docs.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    gb = docs.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))
    jac = (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("ga", "gb")).cast("double")
                / F.size(F.array_union("ga", "gb")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= NGRAM_JACCARD_THRESHOLD)


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH docs AS (
  SELECT doc_id, lang, source, {NGRAMS_SQL} AS grams FROM documents
),
expanded AS (
  SELECT doc_id, lang, source,
         unnest([CAST(floor(len(grams) / {LEN_BUCKET}.0) AS BIGINT),
                 CAST(floor(len(grams) / {LEN_BUCKET}.0) AS BIGINT) + 1]) AS blk
  FROM docs
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM expanded a JOIN expanded b
    ON a.lang = b.lang AND a.source = b.source AND a.blk = b.blk
  WHERE a.doc_id < b.doc_id
),
jac AS (
  SELECT c.doc_a, c.doc_b,
         round(CAST(len(list_intersect(da.grams, db.grams)) AS DOUBLE)
               / CAST(len(list_distinct(da.grams || db.grams)) AS DOUBLE), 6) AS jaccard
  FROM cand c
  JOIN docs da ON da.doc_id = c.doc_a
  JOIN docs db ON db.doc_id = c.doc_b
)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= {NGRAM_JACCARD_THRESHOLD}
"""


# --- train/test decontamination: cross-corpus n-gram overlap ----------------
# The pre-training hygiene step every LLM pipeline runs: flag documents
# in the TEST split that share any DECON_N-gram with the TRAIN split
# (membership of eval data in the training corpus inflates benchmarks).
# Splits here are deterministic halves (doc_id parity) standing in for
# two corpora; the operator shape is corpus-agnostic.
#
# Scale shape (100 TB): per-side explode to (doc, gram-hash) rows —
# grams are md5'd to fixed 32-char keys so the join never carries long
# text — then ONE distinct on the train side and ONE equi-join on the
# gram hash (blocked by construction: only equal grams meet; hot
# boilerplate grams are AQE-splittable skew). Never all-pairs; the
# final agg is a map-side-combinable count per test doc.
DECON_N = 8


def q_dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    gh = d.select(
        "doc_id", F.explode(_word_ngrams_col(DECON_N)).alias("gram")
    ).select("doc_id", F.md5(F.col("gram")).alias("g"))
    train_g = gh.filter(F.col("doc_id") % 2 == 0).select("g").distinct()
    test_g = gh.filter(F.col("doc_id") % 2 == 1)
    # grams are distinct per doc (array_distinct), so this counts the
    # DISTINCT contaminated grams per test doc
    shared = (
        test_g.join(train_g, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    test_docs = d.filter(F.col("doc_id") % 2 == 1).select("doc_id")
    return test_docs.join(shared, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
        (F.coalesce("n_shared", F.lit(0)) > 0).alias("contaminated"),
    )


def _word_ngrams_sql(n: int) -> str:
    return f"""
list_distinct(list_transform(
    range(1, len(string_split(text, ' ')) - {n - 2}),
    i -> array_to_string(list_slice(string_split(text, ' '), i, i + {n - 1}), ' ')))
""".strip()


DEDUP_DECONTAMINATE_SQL = f"""
WITH ex AS (
  SELECT doc_id, unnest({_word_ngrams_sql(DECON_N)}) AS gram
  FROM documents
),
g AS (SELECT doc_id, md5(gram) AS g FROM ex),
tr AS (SELECT DISTINCT g FROM g WHERE doc_id % 2 = 0),
shared AS (
  SELECT doc_id, count(*) AS n_shared
  FROM g JOIN tr USING (g)
  WHERE doc_id % 2 = 1
  GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(s.n_shared, 0) AS n_shared,
       coalesce(s.n_shared, 0) > 0 AS contaminated
FROM documents d
LEFT JOIN shared s ON d.doc_id = s.doc_id
WHERE d.doc_id % 2 = 1
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprint per document."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("t")
    )
    th = toks.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("t")), 1, SIMHASH_BITS // 4), 16, 10)
        .cast("long")
        .alias("v"),
    )
    bits = (
        th.select("doc_id", "v", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"))
        .groupBy("doc_id", "b")
        .agg(
            F.sum(
                F.when(F.expr("shiftright(v, b) & 1") == 1, 1).otherwise(-1)
            ).alias("sb")
        )
    )
    return (
        bits.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("sb") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")
                ).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )


DEDUP_SIMHASH_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t FROM documents
),
th AS (
  SELECT doc_id,
         list_sum(list_transform(range(0, {SIMHASH_BITS // 4}),
             i -> (CAST(strpos('0123456789abcdef', substr(md5(t), i + 1, 1)) AS BIGINT) - 1)
                  << (4 * ({SIMHASH_BITS // 4 - 1} - i)))) AS v
  FROM tok
),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (v >> b) & 1 = 1 THEN 1 ELSE -1 END) AS sb
  FROM th CROSS JOIN (SELECT unnest(range(0, {SIMHASH_BITS})) AS b) bs
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN sb > 0 THEN CAST(1 AS BIGINT) << b ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
"""


# --- containment dedup: doc-inclusion detection -----------------------------
# Containment C(A,B) = |A n B| / min(|A|, |B|) flags a document
# EMBEDDED inside another (quotes, boilerplate wrapping, excerpt
# pages) that symmetric Jaccard misses when sizes differ widely.
# Same blocked candidate generation as the n-gram key (equi-join on
# (lang, source, length-bucket) with two-bucket fan-out) — but note
# the documented recall bound bites harder here: a contained doc much
# shorter than its container lands in a distant length bucket, so
# this key certifies same-scale containment (the common boilerplate
# case); cross-scale containment needs the MinHash candidates.
CONTAINMENT_THRESHOLD = 0.6


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs = d.select("doc_id", "lang", "source", _ngrams_col().alias("grams")).filter(
        F.size("grams") >= 1
    )
    blk = F.floor(F.size("grams") / LEN_BUCKET).cast("long")
    expanded = docs.select(
        "doc_id", "lang", "source", F.explode(F.array(blk, blk + 1)).alias("blk")
    )
    a = expanded.select("lang", "source", "blk", F.col("doc_id").alias("doc_a"))
    b = expanded.select("lang", "source", "blk", F.col("doc_id").alias("doc_b"))
    cand = (
        a.join(b, ["lang", "source", "blk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ga = docs.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    gb = docs.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))
    cont = (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("ga", "gb")).cast("double")
                / F.least(F.size("ga"), F.size("gb")).cast("double"),
                6,
            ).alias("containment"),
        )
    )
    return cont.filter(F.col("containment") >= CONTAINMENT_THRESHOLD)


DEDUP_CONTAINMENT_SQL = f"""
WITH docs AS (
  SELECT doc_id, lang, source, {NGRAMS_SQL} AS grams FROM documents
),
docs_nz AS (
  SELECT * FROM docs WHERE len(grams) >= 1
),
expanded AS (
  SELECT doc_id, lang, source,
         unnest([CAST(floor(len(grams) / {LEN_BUCKET}) AS BIGINT),
                 CAST(floor(len(grams) / {LEN_BUCKET}) AS BIGINT) + 1]) AS blk
  FROM docs_nz
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM expanded a
  JOIN expanded b ON a.lang = b.lang AND a.source = b.source AND a.blk = b.blk
  WHERE a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       round(CAST(len(list_intersect(da.grams, db.grams)) AS DOUBLE)
             / CAST(least(len(da.grams), len(db.grams)) AS DOUBLE), 6) AS containment
FROM cand c
JOIN docs_nz da ON da.doc_id = c.doc_a
JOIN docs_nz db ON db.doc_id = c.doc_b
WHERE round(CAST(len(list_intersect(da.grams, db.grams)) AS DOUBLE)
            / CAST(least(len(da.grams), len(db.grams)) AS DOUBLE), 6)
      >= {CONTAINMENT_THRESHOLD}
"""


# --- exact substring-span dedup (r12) ----------------------------------------
# The remaining first-class dedup mode from the LLM-pipeline
# literature: EXACT duplicated substrings ("Deduplicating Training
# Data Makes Language Models Better", Lee et al. 2022 — their
# ExactSubstr). Instead of doc-level verdicts, it finds every
# character span of length >= K that occurs more than once ANYWHERE
# in the corpus (across docs or repeated within one doc) and accounts
# for it per document: how many maximal duplicated regions, how many
# duplicated characters, what fraction of the doc is duplicated —
# the numbers a curation pipeline thresholds on before trimming.
#
# Spark shape: enumerate all K-grams (explode(sequence) + substring,
# whole-stage codegen, no Python), mark grams with a global
# occurrence count > 1 via ONE count window partitioned by the gram
# (same shuffle a groupBy would pay, but no second join back), then
# merge overlapping-or-touching spans per doc with a gaps-and-islands
# running-max window and aggregate. Two shuffles total: by gram, then
# by doc.
#
# 100 TB: Lee et al. use a suffix array; the k-gram shuffle is the
# distributed equivalent and its volume is len(text) rows per doc —
# at corpus scale you (a) hash each gram to 128 bits before the
# exchange so shuffle rows are fixed-width, (b) stride the enumeration
# and re-expand matches locally, and (c) let AQE split the skewed
# buckets that boilerplate grams create. Spans stay per-doc local
# either way.

SUBSTR_K = 30  # minimum duplicated-run length in characters


def _dup_spans(docs: DataFrame) -> DataFrame:
    """Maximal duplicated spans per doc: (doc_id, island, s, e) with
    1-based inclusive char bounds — the shared core of the accounting
    and trimming keys. Spans merge when they OVERLAP or TOUCH
    (next.s <= prev.e + 1): two duplicated grams at positions p and
    p+K cover chars p..p+2K-1 contiguously and are ONE maximal region
    (review r12 — counting them as two over-reported n_dup_spans for
    fragmented-looking docs; dup_chars was always correct)."""
    from pyspark.sql.window import Window

    grams = (
        docs.where(F.col("n_chars") >= SUBSTR_K)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(1), (F.col("n_chars") - SUBSTR_K + 1).cast("int")
                )
            ).alias("pos"),
        )
        .select(
            "doc_id",
            "pos",
            F.expr(f"substring(text, pos, {SUBSTR_K})").alias("g"),
        )
    )
    hits = (
        grams.withColumn(
            "n_occ", F.count("*").over(Window.partitionBy("g"))
        )
        .where(F.col("n_occ") > 1)
        .select("doc_id", "pos", (F.col("pos") + SUBSTR_K - 1).alias("e"))
    )
    return _spans_from_hits(hits)


def _spans_from_hits(hits: DataFrame) -> DataFrame:
    """Gaps-and-islands merge: hits (doc_id, pos, e) -> maximal spans
    (doc_id, island, s, e). Shared by the batch gram-window path and
    the streaming twins (whose hits come out of the stateful op) —
    per-doc local, rides the doc exchange."""
    from pyspark.sql.window import Window

    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        hits.withColumn(
            "ni",
            (
                F.col("pos")
                > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1
            ).cast("int"),
        )
        .withColumn("island", F.sum("ni").over(w_run))
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), F.max("e").alias("e"))
    )


def _accounting_from_spans(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """Per-doc duplication accounting tail shared by dedup_substring
    and its streaming twin: span count, duplicated chars, fraction."""
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_chars"),
    )
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
        F.round(
            F.coalesce("dup_chars", F.lit(0)) / F.col("n_chars"), 6
        ).alias("dup_frac"),
    )


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").cast("long").alias("n_chars")
    )
    return _accounting_from_spans(docs, _dup_spans(docs))


_SUBSTR_SPANS_CTES = f"""docs AS (
  SELECT doc_id, text, length(text) AS n_chars FROM documents
),
grams AS (
  SELECT doc_id, pos, substring(text, CAST(pos AS INT), {SUBSTR_K}) AS g
  FROM (
    SELECT doc_id, text,
           unnest(range(1, n_chars - {SUBSTR_K} + 2)) AS pos
    FROM docs WHERE n_chars >= {SUBSTR_K}
  )
),
hits AS (
  SELECT doc_id, pos, pos + {SUBSTR_K} - 1 AS e
  FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS n_occ
    FROM grams
  )
  WHERE n_occ > 1
),
isl AS (
  SELECT doc_id, pos, e,
         CASE WHEN pos > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS ni
  FROM hits
),
spans AS (
  SELECT doc_id, island, min(pos) AS s, max(e) AS e
  FROM (
    SELECT doc_id, pos, e,
           sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM isl
  )
  GROUP BY doc_id, island
)"""

DEDUP_SUBSTRING_SQL = f"""
WITH {_SUBSTR_SPANS_CTES},
per_doc AS (
  SELECT doc_id, count(*) AS n_dup_spans,
         CAST(sum(e - s + 1) AS BIGINT) AS dup_chars
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(d.n_chars AS BIGINT) AS n_chars,
       coalesce(p.n_dup_spans, 0) AS n_dup_spans,
       coalesce(p.dup_chars, 0) AS dup_chars,
       round(coalesce(p.dup_chars, 0) / d.n_chars, 6) AS dup_frac
FROM docs d LEFT JOIN per_doc p USING (doc_id)
"""


def q_dedup_substring_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CONSUMING side of exact substring dedup: emit each doc with
    every duplicated span REMOVED (the aggressive-trim policy — a
    curation pipeline that instead keeps one canonical occurrence
    runs the accounting key first and whitelists one doc per gram).
    The complement segments are rebuilt with a lag window over the
    span list plus a per-doc tail, concatenated in position order —
    string surgery stays per-doc local, so the only shuffles are the
    span computation's own two."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").cast("long").alias("n_chars")
    )
    return _trim_from_spans(docs, _dup_spans(docs))


def _trim_from_spans(docs: DataFrame, spans: DataFrame) -> DataFrame:
    """Complement-segment rebuild shared by dedup_substring_trim and
    its streaming twin: docs (doc_id, text, n_chars) + maximal spans
    -> (doc_id, clean_chars, clean_text) with every span removed."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("s")
    segs = spans.select(
        "doc_id",
        (F.coalesce(F.lag("e").over(w), F.lit(0)) + 1).alias("b"),
        (F.col("s") - 1).alias("f"),
    )
    tails = (
        spans.groupBy("doc_id")
        .agg((F.max("e") + 1).alias("b"))
        .join(docs.select("doc_id", F.col("n_chars").alias("f")), "doc_id")
    )
    pieces = (
        segs.unionByName(tails)
        .where(F.col("f") >= F.col("b"))
        .join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "b",
            F.expr("substring(text, CAST(b AS INT), CAST(f - b + 1 AS INT))")
            .alias("seg"),
        )
    )
    clean = pieces.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("b", "seg"))),
                lambda x: x["seg"],
            ),
            "",
        ).alias("ct")
    )
    span_docs = spans.select("doc_id").distinct().withColumn(
        "has_spans", F.lit(1)
    )
    return (
        docs.join(span_docs, "doc_id", "left")
        .join(clean, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("has_spans").isNull(), F.col("text"))
            .otherwise(F.coalesce(F.col("ct"), F.lit("")))
            .alias("clean_text"),
        )
        .withColumn(
            "clean_chars", F.length("clean_text").cast("long")
        )
        .select("doc_id", "clean_chars", "clean_text")
    )


DEDUP_SUBSTRING_TRIM_SQL = f"""
WITH {_SUBSTR_SPANS_CTES},
segs AS (
  SELECT doc_id,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS b,
         s - 1 AS f
  FROM spans
),
tails AS (
  SELECT sp.doc_id, max(sp.e) + 1 AS b, max(d.n_chars) AS f
  FROM spans sp JOIN docs d USING (doc_id)
  GROUP BY sp.doc_id
),
pieces AS (
  SELECT a.doc_id, a.b,
         substring(d.text, CAST(a.b AS INT), CAST(a.f - a.b + 1 AS INT)) AS seg
  FROM (
    SELECT * FROM segs WHERE f >= b
    UNION ALL
    SELECT * FROM tails WHERE f >= b
  ) a
  JOIN docs d USING (doc_id)
),
clean AS (
  SELECT doc_id, string_agg(seg, '' ORDER BY b) AS ct
  FROM pieces GROUP BY doc_id
),
span_docs AS (SELECT DISTINCT doc_id FROM spans)
SELECT d.doc_id,
       CAST(length(CASE WHEN sd.doc_id IS NULL THEN d.text
                        ELSE coalesce(c.ct, '') END) AS BIGINT)
         AS clean_chars,
       CASE WHEN sd.doc_id IS NULL THEN d.text
            ELSE coalesce(c.ct, '') END AS clean_text
FROM docs d
LEFT JOIN span_docs sd USING (doc_id)
LEFT JOIN clean c ON c.doc_id = d.doc_id
"""


def register_all() -> None:
    register("dedup_minhash", q_dedup_minhash, _minhash_sql())
    register("dedup_minhash_keep", q_dedup_minhash_keep, _minhash_keep_sql())
    register("dedup_components", q_dedup_components, _components_sql())
    register("dedup_containment", q_dedup_containment, DEDUP_CONTAINMENT_SQL)
    register("dedup_decontaminate", q_dedup_decontaminate, DEDUP_DECONTAMINATE_SQL)
    register("dedup_simhash", q_dedup_simhash, DEDUP_SIMHASH_SQL)
    register("dedup_ngram_jaccard", q_dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL)
    register("dedup_substring", q_dedup_substring, DEDUP_SUBSTRING_SQL)
    register(
        "dedup_substring_trim",
        q_dedup_substring_trim,
        DEDUP_SUBSTRING_TRIM_SQL,
    )
