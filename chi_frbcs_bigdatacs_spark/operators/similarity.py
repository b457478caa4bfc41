"""M4 — similarity search over the `embeddings` table (64-dim float).

Brute-force cosine top-k is the exact baseline: a broadcast of the
query vector against a single scan — at 100 TB this is one pass,
no shuffle except the final TakeOrdered(k). The LSH-bucketed scale
path lives in similarity_ann.py.

Parity design: the dot product / norms are generated as an explicit
64-term left-associated sum in BOTH the Spark plan and the DuckDB
oracle, so the float accumulation order is identical bit-for-bit
(floats are cast to double element-wise first).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.plans.registry import register
from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

DIM = 64


def _dot_col(a: str, b: str) -> Column:
    terms = [
        F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        for i in range(1, DIM + 1)
    ]
    return reduce(lambda x, y: x + y, terms)


def _norm2_col(a: str) -> Column:
    terms = [
        F.element_at(a, i).cast("double") * F.element_at(a, i).cast("double")
        for i in range(1, DIM + 1)
    ]
    return reduce(lambda x, y: x + y, terms)


def _dot_sql(a: str, b: str) -> str:
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, DIM + 1)
    )


def _cosine_pair(e: DataFrame, q: DataFrame) -> DataFrame:
    joined = e.crossJoin(F.broadcast(q))
    dot = _dot_col("embedding", "qvec")
    cos = dot / (F.sqrt(_norm2_col("embedding")) * F.sqrt(_norm2_col("qvec")))
    return joined.select("vec_id", "label", F.round(cos, 6).alias("cosine"))


def _query_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.orderBy(F.col("vec_id").asc())
        .limit(1)
        .select(F.col("embedding").alias("qvec"))
    )


def q_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return _cosine_pair(emb, _query_vec(spark, sf_dir))


def _cosine_sql(limit: str = "") -> str:
    dot = _dot_sql("embedding", "qvec")
    na = _dot_sql("embedding", "embedding")
    nb = _dot_sql("qvec", "qvec")
    return f"""
WITH q AS (
  SELECT embedding AS qvec FROM embeddings ORDER BY vec_id ASC LIMIT 1
)
SELECT vec_id, label,
       round(({dot}) / (sqrt({na}) * sqrt({nb})), 6) AS cosine
FROM embeddings CROSS JOIN q
{limit}
"""


EMBED_COSINE_SQL = _cosine_sql()


def q_simsearch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return q_embed_cosine(spark, sf_dir).orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    ).limit(10)


SIMSEARCH_TOPK_SQL = _cosine_sql("ORDER BY cosine DESC, vec_id ASC\nLIMIT 10")


def register_all() -> None:
    register("embed_cosine", q_embed_cosine, EMBED_COSINE_SQL)
    register("simsearch_topk", q_simsearch_topk, SIMSEARCH_TOPK_SQL)
