"""SQL-surface depth: correlated subqueries, recursive CTE, ordered
string aggregation, bitwise/conditional scalar batteries, and
deterministic sampling (round 4, batch 2).

Shared-text keys (`sql_exists`, `sql_recursive_cte`) run the SAME SQL
string through Spark SQL and DuckDB — no dual maintenance. Scalar
batteries follow the relational.py convention: one row-preserving
projection per battery so the oracle hash checks every function's
output on every row.

Scale notes: EXISTS/NOT EXISTS plan as left-semi/anti hash joins on
the correlation key; the recursive CTE here generates a 12-row spine
(driver-side recursion depth, not data-sized) then one hash agg;
string_concat groups are bounded by the (nation, segment) domain;
everything else is a pure map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.plans.registry import register
from chi_frbcs_bigdatacs_spark.sources.testdata import load_table, register_views

# --- correlated EXISTS / NOT EXISTS ----------------------------------------
# Customers with at least one 300k+ order and no 'P'-status order.
# Catalyst decorrelates to semi + anti joins on o_custkey.
SQL_EXISTS = """
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o2
        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P'
      )
"""


def q_sql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_EXISTS)


# --- recursive CTE: calendar spine + event counts ---------------------------
# The classic gap-free reporting spine: recursion depth is a constant
# 12 (not data-sized), then one hash agg over events.
SQL_RECURSIVE_CTE = """
WITH RECURSIVE months(m) AS (
  SELECT 1
  UNION ALL
  SELECT m + 1 FROM months WHERE m < 12
)
SELECT CAST(m AS BIGINT) AS month, count(e.event_id) AS n_events
FROM months LEFT JOIN events e ON month(e.ts) = m
GROUP BY m
"""


def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_RECURSIVE_CTE)


# --- ordered string aggregation --------------------------------------------
# Deterministic cross-engine listagg: sorted distinct set, joined —
# avoids both engines' nondeterministic input-order string_agg.


def q_agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            ),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


AGG_STRING_CONCAT_SQL = """
SELECT n_name,
       array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments,
       count(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- bitwise scalar battery -------------------------------------------------


def q_scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        (k.bitwiseAND(F.lit(255))).alias("and255"),
        (k.bitwiseOR(F.lit(4096))).alias("or4096"),
        (k.bitwiseXOR(F.lit(0x5A5A))).alias("xor5a"),
        F.shiftleft(k, 2).cast("long").alias("shl2"),
        F.shiftright(k, 3).cast("long").alias("shr3"),
        F.bit_count(k).cast("long").alias("popcnt"),
        F.bitwise_not(k).alias("flipped"),
    )


SCALAR_BITWISE_SQL = """
SELECT o_orderkey,
       o_orderkey & 255 AS and255,
       o_orderkey | 4096 AS or4096,
       xor(o_orderkey, 23130) AS xor5a,
       CAST(o_orderkey << 2 AS BIGINT) AS shl2,
       CAST(o_orderkey >> 3 AS BIGINT) AS shr3,
       CAST(bit_count(o_orderkey) AS BIGINT) AS popcnt,
       ~o_orderkey AS flipped
FROM orders
"""


# --- conditional scalar battery ---------------------------------------------


def q_scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.nullif(F.round(bal, 0), F.lit(0.0)).alias("bal_nz"),
        F.coalesce(F.nullif(F.round(bal, 0), F.lit(0.0)), F.lit(-1.0)).alias(
            "bal_or_neg1"
        ),
        F.greatest(bal, F.lit(0.0)).alias("bal_pos"),
        F.least(bal, F.lit(0.0)).alias("bal_neg"),
        F.when(bal > 5000, "high").when(bal > 0, "low").otherwise("none").alias(
            "bal_band"
        ),
        F.ifnull(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
    )


SCALAR_CONDITIONAL_SQL = """
SELECT c_custkey,
       nullif(round(c_acctbal, 0), 0.0) AS bal_nz,
       coalesce(nullif(round(c_acctbal, 0), 0.0), -1.0) AS bal_or_neg1,
       greatest(c_acctbal, 0.0) AS bal_pos,
       least(c_acctbal, 0.0) AS bal_neg,
       CASE WHEN c_acctbal > 5000 THEN 'high'
            WHEN c_acctbal > 0 THEN 'low'
            ELSE 'none' END AS bal_band,
       ifnull(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other
FROM customer
"""


# --- deterministic systematic sample ----------------------------------------
# Reproducible cross-engine sampling via key modulus (engine-native
# RNG sampling is never cross-engine stable). At scale this is a pure
# scan-side filter — no shuffle, prunes before any downstream work.
SAMPLE_MOD = 10


def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % SAMPLE_MOD == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


SAMPLE_SYSTEMATIC_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders WHERE o_orderkey % {SAMPLE_MOD} = 0
"""


# --- regexp battery (round 5) ----------------------------------------------
# Row-preserving projection over documents so the oracle hash checks
# every function on every row. Both engines use RE2-compatible
# patterns (character classes + literals only — no engine-specific
# syntax).


def q_scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("[Tt]he")).cast("long").alias("n_the"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).cast("long").alias(
            "novowel_len"
        ),
        F.array_join(
            F.slice(F.regexp_extract_all("text", F.lit("([a-z]{6,})"), 1), 1, 3),
            ",",
        ).alias("first3_long"),
        F.col("text").rlike("[0-9]").cast("int").alias("has_digit"),
    )


SCALAR_REGEXP_SQL = """
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '[Tt]he')) AS BIGINT) AS n_the,
       CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS novowel_len,
       COALESCE(array_to_string(regexp_extract_all(text, '([a-z]{6,})', 1)[1:3], ','), '') AS first3_long,
       CAST(regexp_matches(text, '[0-9]') AS INT) AS has_digit
FROM documents
"""


# --- try_* battery: ANSI-mode-safe arithmetic/casts ------------------------
# The engine runs ANSI mode (overflow/bad-cast THROW — the round-5
# scale experiment's id overflow proved why that matters); the try_*
# family is the sanctioned NULL-on-error escape hatch. DuckDB twins:
# TRY_CAST is 1:1; try_divide/try_element_at are CASE-guarded.


def q_scalar_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        F.round(
            F.expr("try_divide(l_extendedprice, l_discount)"), 6
        ).alias("price_per_disc"),
        F.expr("TRY_CAST(l_returnflag AS INT)").alias("flag_as_int"),
        F.expr(
            "TRY_CAST(CAST(CAST(l_quantity AS INT) AS STRING) AS INT)"
        ).alias("qty_int"),
        F.expr(
            "try_element_at(split(l_returnflag || '-' || l_linestatus, '-'), 3)"
        ).alias("third_piece"),
    )


SCALAR_TRY_SQL = """
SELECT l_orderkey * 10 + l_linenumber AS rid,
       round(CASE WHEN l_discount = 0 THEN NULL
                  ELSE l_extendedprice / l_discount END, 6) AS price_per_disc,
       TRY_CAST(l_returnflag AS INT) AS flag_as_int,
       TRY_CAST(CAST(CAST(l_quantity AS INT) AS VARCHAR) AS INT) AS qty_int,
       string_split(l_returnflag || '-' || l_linestatus, '-')[3] AS third_piece
FROM lineitem
"""


def register_all() -> None:
    register("scalar_regexp_funcs", q_scalar_regexp, SCALAR_REGEXP_SQL)
    register("scalar_try_funcs", q_scalar_try, SCALAR_TRY_SQL)
    register("sql_exists", q_sql_exists, SQL_EXISTS)
    register("sql_recursive_cte", q_sql_recursive_cte, SQL_RECURSIVE_CTE)
    register("agg_string_concat", q_agg_string_concat, AGG_STRING_CONCAT_SQL)
    register("scalar_bitwise_funcs", q_scalar_bitwise, SCALAR_BITWISE_SQL)
    register("scalar_conditional_funcs", q_scalar_conditional, SCALAR_CONDITIONAL_SQL)
    register("sample_systematic", q_sample_systematic, SAMPLE_SYSTEMATIC_SQL)
