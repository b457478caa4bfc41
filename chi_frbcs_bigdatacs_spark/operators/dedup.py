"""M4 — deduplication operators over `documents`.

Exact dedup is a hash groupBy on the dedup key with a deterministic
survivor (min doc_id) — at 100 TB this is one shuffle on
hash(text); near-dup variants (MinHash-LSH, SimHash) band the
shuffle key so candidate pairs collide in buckets instead of
requiring an all-pairs join (see dedup_minhash.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.plans.registry import register
from chi_frbcs_bigdatacs_spark.sources.testdata import load_table


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One survivor row per distinct text: (kept doc_id, copies)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("copies"),
    ).select("doc_id", "copies")


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, count(*) AS copies
FROM documents GROUP BY text
"""


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Only the duplicate groups (copies > 1), with member ids."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("copies"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        .filter(F.col("copies") > 1)
        .select("keep_id", "copies", F.col("members").cast("string").alias("members"))
    )


DEDUP_GROUPS_SQL = """
SELECT min(doc_id) AS keep_id, count(*) AS copies,
       '[' || array_to_string(list_sort(list(doc_id)), ', ') || ']' AS members
FROM documents GROUP BY text HAVING count(*) > 1
"""


def q_dedup_hashkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keyed on md5(text) instead of the raw text — the
    scale variant: the shuffle key is 32 bytes regardless of document
    size, so 100 TB of documents dedup with a fixed-width exchange."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("text_md5"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("copies"))
        .select("text_md5", "doc_id", "copies")
    )


DEDUP_HASHKEY_SQL = """
SELECT md5(text) AS text_md5, min(doc_id) AS doc_id, count(*) AS copies
FROM documents GROUP BY md5(text)
"""


CHUNK = 8  # tokens per chunk for sub-document dedup


def q_dedup_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (line/paragraph-level) exact dedup: split every
    document into fixed CHUNK-token chunks, dedup chunks corpus-wide
    (first occurrence by (doc_id, chunk_idx) survives), and report the
    per-document survivor ratio — the RefinedWeb/CCNet line-dedup
    shape. Scale: the explode emits one NARROW row per chunk keyed by
    md5(chunk) (32 bytes, never the chunk text), so the single window
    shuffle is fixed-width no matter how large documents are."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(CHUNK)).cast("int")
    chunk_at = lambda i: F.array_join(F.slice(toks, i * CHUNK + 1, CHUNK), " ")  # noqa: E731
    chunks = F.transform(F.sequence(F.lit(0), n_chunks - 1), chunk_at)
    ex = d.select(
        "doc_id", F.posexplode(F.transform(chunks, lambda c: F.md5(c.cast("binary"))))
    ).toDF("doc_id", "chunk_idx", "h")
    from pyspark.sql.window import Window

    w = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    kept = ex.withColumn("is_kept", (F.row_number().over(w) == 1).cast("int"))
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("is_kept").cast("long").alias("n_kept"),
        F.round(F.sum("is_kept") / F.count(F.lit(1)), 6).alias("kept_ratio"),
    )


DEDUP_CHUNK_SQL = f"""
WITH ex AS (
  SELECT doc_id, i AS chunk_idx,
         md5(array_to_string(
             list_slice(string_split(text, ' '),
                        i * {CHUNK} + 1, i * {CHUNK} + {CHUNK}), ' ')) AS h
  FROM documents,
       UNNEST(generate_series(
           0, CAST(ceil(len(string_split(text, ' ')) / {CHUNK}.0) AS INT) - 1))
           AS t(i)
),
ranked AS (
  SELECT doc_id, chunk_idx,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn
  FROM ex
)
SELECT doc_id, count(*) AS n_chunks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) / count(*), 6) AS kept_ratio
FROM ranked GROUP BY doc_id
"""


# --- URL canonicalization dedup ---------------------------------------------
# Training-data crawls dedup on CANONICAL URL before content dedup:
# case-fold the host, strip trailing slashes, drop utm_* tracking
# params, sort surviving params. The URL column is synthesized
# deterministically from doc_id (the corpus has none) with case/
# slash/tracking-param variants so canonicalization genuinely merges
# groups; both engines build it from the same expressions. All string
# ops are codegen'd exprs; the dedup is one fixed-width shuffle on
# the canonical key.
_URL_HOST = "CASE doc_id % 3 WHEN 0 THEN 'Example.COM' WHEN 1 THEN 'example.com' ELSE 'EXAMPLE.com' END"


def q_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(
        F.lit("https://"),
        F.expr(_URL_HOST),
        F.lit("/page/"),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit("?utm_source=feed&ref="), (F.col("doc_id") % 5).cast("string")
            ),
        ).otherwise(F.lit("")),
    )
    d = d.withColumn("url", url)
    host = F.lower(F.regexp_extract("url", r"^https?://([^/]+)", 1))
    path = F.regexp_replace(
        F.regexp_extract("url", r"^https?://[^/]+([^?]*)", 1), r"/+$", ""
    )
    raw_q = F.regexp_extract("url", r"\?(.*)$", 1)
    params = F.filter(
        F.split(raw_q, "&"),
        lambda x: (x != "") & ~x.startswith("utm_"),
    )
    qs = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        host, path, F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))
    )
    return (
        d.withColumn("canon_url", canon)
        .groupBy("canon_url")
        .agg(F.count(F.lit(1)).alias("n_variants"), F.min("doc_id").alias("first_doc"))
    )


DEDUP_URL_SQL = f"""
WITH urls AS (
  SELECT doc_id,
         concat('https://', {_URL_HOST}, '/page/', CAST(doc_id % 50 AS VARCHAR),
                CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END,
                CASE WHEN doc_id % 2 = 0
                     THEN concat('?utm_source=feed&ref=', CAST(doc_id % 5 AS VARCHAR))
                     ELSE '' END) AS url
  FROM documents
),
canon AS (
  SELECT doc_id,
         concat(
           lower(regexp_extract(url, '^https?://([^/]+)', 1)),
           regexp_replace(regexp_extract(url, '^https?://[^/]+([^?]*)', 1),
                          '/+$', '', 'g'),
           -- coalesce: DuckDB's array_to_string(<empty list>, '&') is
           -- NULL where Spark's array_join is '' — without it the CASE
           -- falls to ELSE and emits a stray trailing '?'
           CASE WHEN coalesce(array_to_string(list_sort(list_filter(
                    string_split(regexp_extract(url, '\\?(.*)$', 1), '&'),
                    x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&'), '') = ''
                THEN ''
                ELSE concat('?', coalesce(array_to_string(list_sort(list_filter(
                    string_split(regexp_extract(url, '\\?(.*)$', 1), '&'),
                    x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&'), ''))
           END) AS canon_url
  FROM urls
)
SELECT canon_url, count(*) AS n_variants, min(doc_id) AS first_doc
FROM canon GROUP BY canon_url
"""


def register_all() -> None:
    register("dedup_exact", q_dedup_exact, DEDUP_EXACT_SQL)
    register("dedup_groups", q_dedup_groups, DEDUP_GROUPS_SQL)
    register("dedup_hashkey", q_dedup_hashkey, DEDUP_HASHKEY_SQL)
    register("dedup_chunk", q_dedup_chunk, DEDUP_CHUNK_SQL)
    register("dedup_url", q_dedup_url, DEDUP_URL_SQL)
