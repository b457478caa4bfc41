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


def register_all() -> None:
    register("dedup_exact", q_dedup_exact, DEDUP_EXACT_SQL)
    register("dedup_groups", q_dedup_groups, DEDUP_GROUPS_SQL)
    register("dedup_hashkey", q_dedup_hashkey, DEDUP_HASHKEY_SQL)
