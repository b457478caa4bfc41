"""Training-set assembly operators (round 5): sequence packing,
deterministic stratified splits, temperature-based corpus mixing, and
a self-corpus unigram surprisal score. These are the last-mile ops an
LLM data pipeline runs after curation/dedup: pack documents into
fixed-token-budget training sequences, carve train/valid/test,
rebalance the language mixture, and score documents against the
corpus's own unigram language model.

Determinism & oracle parity: every "random" draw is the repo's exact
integer hash idiom h(id) = (id * 2654435761) % 1000003 (DECIMAL(38,0)
in Spark / HUGEINT in DuckDB — resample.py), every threshold is
integer arithmetic, and the one irrational step (sqrt in the
temperature mix) is a correctly-rounded IEEE sqrt of an integer
computed identically driver-side (math.sqrt) and oracle-side (C
sqrt), then floored into the integer domain.

Scale notes (100 TB lens):
- pack_sequences: packing is PER-SHARD (source) — a window cumsum
  partitioned by the shard key, never a global total order (a global
  ORDER BY cumsum is inherently one partition; real pipelines pack
  within shards/files precisely so the op stays embarrassingly
  parallel). One hash-partitioned sort per shard, no joins.
- split_stratified: pure map (hash + case), zero shuffles.
- corpus_mix_sqrt: ONE tiny per-lang count agg collected and folded
  as literal thresholds (the resample.py/cost-literal idiom), then a
  map-only filter. No data shuffle.
- text_unigram_surprisal: explode -> vocabulary hash agg -> equi-join
  tokens⨝vocab on the token key (the classic IDF join; stopword skew
  is AQE-splittable and bounded by the len>=3 filter) -> per-doc agg.
  Two shuffles, both on natural keys.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.operators.resample import (
    RS_HASH_A,
    RS_HASH_M,
    _RHASH_SQL,
)
from chi_frbcs_bigdatacs_spark.plans.registry import register
from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

PACK_BUDGET = 256        # tokens per packed training sequence
SPLIT_BUCKETS = (8, 1, 1)  # train/valid/test out of 10 hash buckets


def _doc_hash(col: str = "doc_id") -> Column:
    """h(doc_id) in [0, M): exact integer arithmetic, identical to
    the resample draw so one idiom serves every sampling decision."""
    return F.expr(
        f"CAST((CAST({col} AS DECIMAL(38,0)) * {RS_HASH_A}) % {RS_HASH_M} AS BIGINT)"
    )


_DOC_HASH_SQL = _RHASH_SQL.replace("id", "doc_id")


# --- GPT-style sequence packing (concat-then-chunk, per shard) -------------
# Documents are concatenated in doc_id order WITHIN their source
# shard; a training sequence is a PACK_BUDGET-token window of that
# stream. start_off is the document's first token's offset in the
# shard stream; seq_id is the sequence its first token lands in.
# Whitespace token counts keep the arithmetic integer-exact.


def pack_documents(d: DataFrame) -> DataFrame:
    """Pack any (doc_id, source, text) frame; see q_doc_pack_sequences."""
    from pyspark.sql.window import Window

    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.select("doc_id", "source", n_tok.cast("long").alias("n_tokens"))
        .withColumn("start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn(
            "seq_id", F.floor(F.col("start_off") / F.lit(PACK_BUDGET)).cast("long")
        )
    )


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_documents(load_table(spark, sf_dir, "documents"))


DOC_PACK_SEQUENCES_SQL = f"""
SELECT doc_id, source, n_tokens,
       CAST(coalesce(sum(n_tokens) OVER (
         PARTITION BY source ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off,
       CAST(floor(coalesce(sum(n_tokens) OVER (
         PARTITION BY source ORDER BY doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {PACK_BUDGET}) AS BIGINT) AS seq_id
FROM (
  SELECT doc_id, source, CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
) t
"""


# --- deterministic stratified train/valid/test split -----------------------
# Split membership is a pure function of doc_id (stable under
# re-runs, re-partitioning, and corpus growth), so the same document
# never migrates between splits — the property that makes the split
# safe to recompute at 100 TB instead of materializing an assignment
# table.


def split_documents(d: DataFrame) -> DataFrame:
    b = (_doc_hash() % 10).alias("b")
    tr, va, _te = SPLIT_BUCKETS
    split = (
        F.when(F.col("b") < tr, "train")
        .when(F.col("b") < tr + va, "valid")
        .otherwise("test")
    )
    return d.select("doc_id", "lang", "source", b).select(
        "doc_id", "lang", "source", split.alias("split")
    )


def q_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_documents(load_table(spark, sf_dir, "documents"))


SPLIT_STRATIFIED_SQL = f"""
SELECT doc_id, lang, source,
       CASE WHEN b < {SPLIT_BUCKETS[0]} THEN 'train'
            WHEN b < {SPLIT_BUCKETS[0] + SPLIT_BUCKETS[1]} THEN 'valid'
            ELSE 'test' END AS split
FROM (SELECT doc_id, lang, source,
             CAST(({_DOC_HASH_SQL}) % 10 AS BIGINT) AS b
      FROM documents) t
"""


# --- sqrt-temperature corpus mixing ----------------------------------------
# Multilingual rebalancing (the p^alpha sampling of multilingual LM
# training, alpha=0.5): lang l with n_l docs gets target share
# proportional to sqrt(n_l), damping the head lang without flattening
# to uniform. All arithmetic after the one correctly-rounded sqrt is
# integer-exact on both engines:
#   s_l  = floor(sqrt(n_l * 1e6))          (scaled integer sqrt)
#   t_l  = (N * s_l) // S                  (target count, S = sum s_l)
#   th_l = min(M, (M * t_l) // n_l)        (keep-hash threshold)
# keep doc iff h(doc_id) < th_l.


def q_corpus_mix_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    counts = sorted(
        ((r.lang, r.n) for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect())
    )
    n_total = sum(n for _, n in counts)
    s = {lang: math.floor(math.sqrt(n * 1_000_000)) for lang, n in counts}
    s_sum = sum(s.values())
    th = F.lit(0)
    for lang, n in counts:
        t = (n_total * s[lang]) // s_sum
        th = F.when(
            F.col("lang") == lang, F.lit(min(RS_HASH_M, (RS_HASH_M * t) // n))
        ).otherwise(th)
    return d.select("doc_id", "lang", "source").filter(_doc_hash() < th)


CORPUS_MIX_SQRT_SQL = f"""
WITH cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
tot AS (SELECT sum(n) AS nt FROM cnt),
sq AS (
  SELECT lang, n,
         CAST(floor(sqrt(CAST(n * 1000000 AS DOUBLE))) AS HUGEINT) AS s
  FROM cnt
),
ssum AS (SELECT sum(s) AS ss FROM sq),
th AS (
  SELECT lang,
         least(CAST({RS_HASH_M} AS HUGEINT),
               ({RS_HASH_M} * ((CAST(nt AS HUGEINT) * s) // ss)) // n) AS kth
  FROM sq, tot, ssum
)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN th USING (lang)
WHERE {_DOC_HASH_SQL} < kth
"""


# --- self-corpus unigram surprisal -----------------------------------------
# The model-free stand-in for a perplexity filter: score each doc by
# the mean surprisal -ln(cnt_tok / T) of its tokens under the
# corpus's OWN unigram distribution (low = stereotyped text, high =
# rare-token-heavy). Each token's surprisal is rounded to 6dp BEFORE
# the per-doc mean, making cross-engine ln drift negligible; the
# avg() itself still sums doubles in engine order, so a mean landing
# within ~1 ulp of a 0.00005 boundary could in principle round
# differently at 4dp — same residual-risk class as the repo's other
# round(sum(double)) oracles, accepted as a noise gate (not a proof).


def q_text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token"),
    ).filter(F.length("token") >= 3)
    total = toks.count()  # driver scalar folded as a literal
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    surp = F.round(F.log(F.lit(float(total)) / F.col("cnt").cast("double")), 6)
    return (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(F.avg(surp), 4).alias("surprisal"),
        )
    )


TEXT_UNIGRAM_SURPRISAL_SQL = """
WITH toks AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
    FROM documents) t
  WHERE length(token) >= 3
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM toks),
vocab AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token)
SELECT doc_id, count(*) AS n_toks,
       round(avg(round(ln(total / CAST(cnt AS DOUBLE)), 6)), 4) AS surprisal
FROM toks JOIN vocab USING (token) CROSS JOIN tot
GROUP BY doc_id
"""


# --- end-to-end training-data pipeline --------------------------------------
# The whole assembly line in ONE composed DAG: quality filter (length
# + distinct-token ratio, the pipeline_clean_corpus gate) -> exact
# dedup (min-id survivor per text) -> deterministic 8/1/1 hash split
# (the split_stratified rule, inlined so token counts survive) ->
# per-(split, lang) doc/token accounting. This is the composition a
# real corpus job runs end-to-end; one oracle hash checks the entire
# chain, not just its pieces. Scale shape: one text-keyed dedup
# shuffle + one small-key agg — the split adds NO shuffle (pure hash
# of doc_id).


def q_pipeline_training_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    quality = d.filter(
        (F.length("text") >= 100)
        & (F.size(F.array_distinct(toks)).cast("double") / F.size(toks) >= 0.3)
    )
    survivors = quality.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"), F.min("lang").alias("lang")
    )
    tr, va, _te = SPLIT_BUCKETS
    b = _doc_hash() % 10
    split = (
        F.when(b < tr, "train").when(b < tr + va, "valid").otherwise("test")
    )
    tok = survivors.select(
        split.alias("split"),
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return tok.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )


PIPELINE_TRAINING_DATA_SQL = f"""
WITH quality AS (
  SELECT * FROM documents
  WHERE length(text) >= 100
    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / CAST(len(string_split(text, ' '))  AS DOUBLE) >= 0.3
),
survivors AS (
  SELECT min(doc_id) AS doc_id, min(lang) AS lang, text
  FROM quality GROUP BY text
),
tok AS (
  SELECT CASE WHEN ({_DOC_HASH_SQL}) % 10 < {SPLIT_BUCKETS[0]} THEN 'train'
              WHEN ({_DOC_HASH_SQL}) % 10 < {SPLIT_BUCKETS[0] + SPLIT_BUCKETS[1]} THEN 'valid'
              ELSE 'test' END AS split,
         lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM survivors
)
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
FROM tok GROUP BY 1, 2
"""


def register_all() -> None:
    register("doc_pack_sequences", q_doc_pack_sequences, DOC_PACK_SEQUENCES_SQL)
    register(
        "pipeline_training_data",
        q_pipeline_training_data,
        PIPELINE_TRAINING_DATA_SQL,
    )
    register("split_stratified", q_split_stratified, SPLIT_STRATIFIED_SQL)
    register("corpus_mix_sqrt", q_corpus_mix_sqrt, CORPUS_MIX_SQRT_SQL)
    register(
        "text_unigram_surprisal",
        q_text_unigram_surprisal,
        TEXT_UNIGRAM_SURPRISAL_SQL,
    )
