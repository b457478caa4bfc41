"""TPC-H-shape query battery, batch 2 (round 5): Q10, Q14, Q18, Q19,
Q22 adapted to the driver's TPC-H-ish schema (no phone/address/
comment/partsupp/shipmode columns — predicates are re-targeted at the
columns the generator ships; the JOIN/GROUP/subquery SHAPES are the
point, they exercise the same plan machinery as the originals).

Shared-text keys: the SAME ANSI string runs through Spark SQL and
DuckDB (the sql_q3/q5/q6 convention in sources/formats.py) — no dual
maintenance, and the oracle check covers the whole plan.

Cross-engine float discipline (house rules):
  - money sums go through DECIMAL(18,2) then CAST AS DOUBLE — exact,
    order-free;
  - Q14's promo ratio and Q22's average-balance threshold divide two
    DECIMAL-exact doubles, so the quotient is bit-identical on both
    engines (no float-sum order dependence can flip a comparison);
  - quantities are integer-valued doubles, their sums are exact.

Scale notes (100 TB lens):
  - Q10: lineitem⨝orders shuffle on orderkey, customer joined on
    custkey, nation broadcast; one hash agg, TakeOrdered(20).
  - Q14: part is the small side — Catalyst broadcasts it under AQE;
    single scalar agg, map-side combined.
  - Q18: the HAVING subquery is one hash agg over lineitem reused as
    a semi-join filter on orderkey — two shuffles on the same key
    (co-partitioned), no data explosion.
  - Q19: broadcast part join + disjunctive predicate evaluated in
    whole-stage codegen; one scalar agg.
  - Q22: the average is a one-row broadcast; NOT EXISTS plans as a
    left-anti hash join on custkey; nation broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chi_frbcs_bigdatacs_spark.plans.registry import register

_REVENUE = (
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)

# Q10 shape: returned-item reporting — which customers returned the
# most revenue in a quarter. (TPC-H 2.13 §2.4.10; c_phone/c_address/
# c_comment dropped — not generated.)
SQL_Q10 = f"""
SELECT c_custkey, c_name, {_REVENUE} AS revenue, c_acctbal, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
  AND o_orderdate <  CAST('1996-04-01' AS TIMESTAMP)
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

# Q14 shape: promotion-revenue ratio for one shipping month. Both
# operands of the division are DECIMAL-exact doubles, so the quotient
# is bit-identical cross-engine; rounded to 6dp for the hash.
SQL_Q14 = """
SELECT round(
         100.0
         * CAST(sum(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18,2))
                              * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) AS promo_revenue,
       count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= CAST('1996-09-01' AS TIMESTAMP)
  AND l_shipdate <  CAST('1996-10-01' AS TIMESTAMP)
"""

# Q18 shape: large-volume customers — orders whose total quantity
# clears a threshold, joined back for the order/customer detail.
# l_quantity is integer-valued (1..50), so its double sum is exact.
SQL_Q18 = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(l_quantity) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 150
      )
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""

# Q19 shape: disjunctive brand/size/quantity predicate bands (the
# container/shipmode legs are re-targeted at p_size, which IS
# generated). One broadcast join + codegen'd OR-of-ANDs + scalar agg.
SQL_Q19 = f"""
SELECT {_REVENUE} AS revenue, count(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 30)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 40)
"""

# Q22 shape: dormant high-balance customers by nation (phone-prefix
# grouping re-targeted at nation). The threshold subquery divides a
# DECIMAL-exact sum by a count — deterministic cross-engine, so no
# boundary row can flip membership between engines.
SQL_Q22 = """
SELECT n_name,
       count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        FROM customer WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
ORDER BY n_name ASC
"""


# Q7 shape: nation-pair shipping volume by year — the two-alias
# nation join with the symmetric OR pair predicate, then a (pair,
# year) rollup. year() exists in both engines.
SQL_Q7 = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

# Q11 shape: account-balance concentration (partsupp is not
# generated; the important-stock HAVING-vs-global-scalar shape is
# re-targeted at supplier balances by nation). Both sides of the
# comparison are DECIMAL-exact sums cast to double, scaled by the
# same literal — deterministic cross-engine.
SQL_Q11 = """
SELECT n_name,
       CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS value
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) > (
         SELECT CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) * 0.05
         FROM supplier
       )
ORDER BY value DESC, n_name ASC
"""

# Q15 shape: top supplier — an aggregated revenue view consumed twice
# (once for the max scalar, once for the equality filter). The
# DECIMAL-exact revenue makes the max-equality join safe.
SQL_Q15 = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
    AND l_shipdate <  CAST('1996-04-01' AS TIMESTAMP)
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey ASC
"""

# Q17 shape: small-quantity-order revenue — the correlated scalar
# AVG subquery per part (Catalyst decorrelates to an agg + join).
# Quantities are integer-valued doubles: their sum is exact, so
# avg = sum/count and the 0.2 scaling are bit-identical cross-engine.
SQL_Q17 = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6)
         AS avg_yearly,
       count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
"""


# Q4 shape: order-priority checking — EXISTS over lineitem per order
# in a date quarter (the commitdate/receiptdate leg re-targeted at
# l_quantity, which IS generated).
SQL_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= CAST('1996-01-01' AS TIMESTAMP)
  AND o_orderdate <  CAST('1996-04-01' AS TIMESTAMP)
  AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity > 45
      )
GROUP BY o_orderpriority
ORDER BY o_orderpriority ASC
"""

# Q8 shape: national market share — one nation's slice of a region's
# yearly import revenue for one part type. Numerator and denominator
# are DECIMAL-exact sums cast to double; ratio rounded to 6dp.
SQL_Q8 = """
SELECT o_year,
       round(CAST(sum(CASE WHEN nation = 'NATION_2' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
       count(*) AS n_lines
FROM (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year ASC
"""

# Q21 shape: suppliers who were the ONLY late shipper on a
# multi-supplier order — the double-correlated EXISTS + NOT EXISTS
# self-join pattern ("late" re-targeted at shipdate lagging orderdate
# by 90+ days; commitdate/receiptdate are not generated).
SQL_Q21 = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders    ON o_orderkey = l1.l_orderkey
JOIN nation    ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


# --- batch 3 (round 6): Q2, Q9, Q12, Q16, Q20 — completes the full
# 22-query TPC-H shape battery. The generator ships no partsupp
# table, so Q2/Q16/Q20's part-supplier relationships are bridged
# through lineitem's (l_partkey, l_suppkey) pairs, and Q9's profit
# (which needs ps_supplycost) degrades to revenue — the correlated
# scalar subquery, NOT IN anti-join, double-nested IN semi-join,
# count-distinct, and 5-way join SHAPES are what the battery pins.

# Q2 shape: minimum-cost supplier per part in a region — correlated
# scalar MIN subquery re-entered per outer row ("cost" re-targeted
# at s_acctbal; doubles compared by exact equality, no arithmetic).
SQL_Q2 = """
SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size = 30 AND r_name = 'EUROPE'
  AND s_acctbal = (
        SELECT min(s2.s_acctbal)
        FROM lineitem l2
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE'
      )
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC, p_brand ASC
LIMIT 100
"""

# Q9 shape: product-line profit by nation and year (profit ->
# revenue; no ps_supplycost). Positional GROUP BY keeps the
# EXTRACT expression and its output column textually identical.
SQL_Q9 = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       {_REVENUE} AS sum_profit
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
ORDER BY nation ASC, o_year DESC
"""

# Q12 shape: shipping-priority counts by category (l_shipmode is not
# generated; l_linestatus takes its place, "late receipt" re-targeted
# at shipdate lagging orderdate by 60+ days).
SQL_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND l_shipdate >= CAST('1997-01-01' AS TIMESTAMP)
  AND l_shipdate <  CAST('1998-01-01' AS TIMESTAMP)
GROUP BY l_linestatus
ORDER BY l_linestatus ASC
"""

# Q16 shape: supplier count by part attributes, excluding a
# NOT IN-subquery supplier set ("complaints" re-targeted at negative
# account balance).
SQL_Q16 = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#9'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""

# Q20 shape: suppliers holding excess stock of a part family — the
# double-nested IN semi-join chain with a DECIMAL-exact HAVING
# threshold ("availqty vs half the year's demand" re-targeted at
# shipped quantity of 'small%' parts in 1997).
SQL_Q20 = """
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (
                SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
              )
          AND l_shipdate >= CAST('1997-01-01' AS TIMESTAMP)
          AND l_shipdate <  CAST('1998-01-01' AS TIMESTAMP)
        GROUP BY l_suppkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > CAST(50 AS DECIMAL(18,2))
      )
  AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
ORDER BY s_name ASC
"""


def _sql_query(sql: str):
    from chi_frbcs_bigdatacs_spark.sources.testdata import register_views

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


def register_all() -> None:
    register("sql_q10", _sql_query(SQL_Q10), SQL_Q10)
    register("sql_q14", _sql_query(SQL_Q14), SQL_Q14)
    register("sql_q18", _sql_query(SQL_Q18), SQL_Q18)
    register("sql_q19", _sql_query(SQL_Q19), SQL_Q19)
    register("sql_q22", _sql_query(SQL_Q22), SQL_Q22)
    register("sql_q7", _sql_query(SQL_Q7), SQL_Q7)
    register("sql_q11", _sql_query(SQL_Q11), SQL_Q11)
    register("sql_q15", _sql_query(SQL_Q15), SQL_Q15)
    register("sql_q17", _sql_query(SQL_Q17), SQL_Q17)
    register("sql_q4", _sql_query(SQL_Q4), SQL_Q4)
    register("sql_q8", _sql_query(SQL_Q8), SQL_Q8)
    register("sql_q21", _sql_query(SQL_Q21), SQL_Q21)
    register("sql_q2", _sql_query(SQL_Q2), SQL_Q2)
    register("sql_q9", _sql_query(SQL_Q9), SQL_Q9)
    register("sql_q12", _sql_query(SQL_Q12), SQL_Q12)
    register("sql_q16", _sql_query(SQL_Q16), SQL_Q16)
    register("sql_q20", _sql_query(SQL_Q20), SQL_Q20)
