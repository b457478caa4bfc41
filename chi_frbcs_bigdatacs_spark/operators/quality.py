"""Data-quality / data-layout operators (round 6, batch 3).

The ops a production lakehouse runs BEFORE modeling or training-data
assembly: per-column profiling, referential-integrity audits,
space-filling-curve layout keys, deterministic per-group sampling,
and equal-frequency feature discretization (the equal-frequency
counterpart of the engine's equal-width fuzzification grid,
[FSS258 §3.1] uses equal-width; discretization literature offers
both).

Parity design follows the house rules (NOTES.md): oracle SQL is
generated from the same Python constants/loops as the Spark plan
wherever an expression is unrolled (the z-order interleave), money
sums go through DECIMAL(18,2), DuckDB integer sums are CAST to
BIGINT, and every ordering has a deterministic tie-break or is
tie-insensitive by construction (see discretize_quantile).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.plans.registry import register
from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

# --- per-column profile ------------------------------------------------------
# The `describe`/profiling pass every ingestion pipeline runs: one row
# per column with null count, exact distinct count, min and max.
# Shape: ONE unpivot projection (4x row multiply, map-only) then ONE
# hash agg keyed by the 4-value column name — a single shuffle of
# (column, value) pairs with map-side combine. This deliberately
# avoids `count(distinct a), count(distinct b), ...` in one agg, which
# plans an Expand over every distinct column pair; unpivot-then-group
# keeps one distinct per group at any column count.
_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    unpivoted = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"), F.col(c).alias("value")
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("cv")
    ).select("cv.column", "cv.value")
    return unpivoted.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("value")).alias("n_null"),
        F.count_distinct("value").alias("n_distinct"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )


_PROFILE_UNION = " UNION ALL ".join(
    f"SELECT '{c}' AS \"column\", {c} AS value FROM lineitem"
    for c in _PROFILE_COLS
)

PROFILE_COLUMNS_SQL = f"""
WITH unpivoted AS (
  {_PROFILE_UNION}
)
SELECT "column",
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count(value) AS BIGINT) AS n_null,
       CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
       min(value) AS min_v,
       max(value) AS max_v
FROM unpivoted
GROUP BY "column"
"""


# --- referential-integrity audit --------------------------------------------
# Orphan counts for every FK edge of the star schema in one result
# table. Each edge is a LEFT join child->parent on the key followed by
# a conditional count — Catalyst picks broadcast for the small parents
# (nation/customer/part) and a shuffled hash join for orders at scale;
# AQE re-plans per-edge at runtime. No collect, no loop over rows:
# the audit is a UNION of five 1-row aggregates.
_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
)


def q_audit_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for rel, child, fk, parent, pk in _FK_EDGES:
        c = load_table(spark, sf_dir, child).select(F.col(fk).alias("fk"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("pk")).distinct()
        j = c.join(p, c["fk"] == p["pk"], "left_outer")
        parts.append(
            j.agg(
                F.lit(rel).alias("relation"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0)).alias(
                    "n_orphans"
                ),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


AUDIT_FK_ORPHANS_SQL = " UNION ALL ".join(
    f"""SELECT '{rel}' AS relation,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
  ON c.{fk} = p.{pk}"""
    for rel, child, fk, parent, pk in _FK_EDGES
)


# --- duplicate-key audit -----------------------------------------------------
# The PK-uniqueness half of the integrity audit: per declared key,
# row count, distinct key count, number of key values that repeat,
# and the worst multiplicity. Shape per table: one groupBy(pk) count
# (map-side combined) + one 4-value agg over the counts; the result
# is a bounded UNION of one-row aggregates. The lineitem entry audits
# the COMPOSITE (l_orderkey, l_linenumber) — known NOT unique in this
# synthetic data (NOTES parity rule 6), so the audit demonstrably
# catches a real defect rather than printing a page of zeros.
_PK_AUDITS = (
    ("orders(o_orderkey)", "orders", ("o_orderkey",)),
    ("customer(c_custkey)", "customer", ("c_custkey",)),
    ("part(p_partkey)", "part", ("p_partkey",)),
    ("supplier(s_suppkey)", "supplier", ("s_suppkey",)),
    ("documents(doc_id)", "documents", ("doc_id",)),
    ("embeddings(vec_id)", "embeddings", ("vec_id",)),
    ("lineitem(l_orderkey,l_linenumber)", "lineitem", ("l_orderkey", "l_linenumber")),
)


def q_audit_duplicate_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for label, table, keys in _PK_AUDITS:
        t = load_table(spark, sf_dir, table)
        per_key = t.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
        parts.append(
            per_key.agg(
                F.lit(label).alias("pk"),
                F.sum("cnt").alias("n_rows"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias(
                    "n_dup_keys"
                ),
                F.max("cnt").alias("max_multiplicity"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


AUDIT_DUPLICATE_PK_SQL = " UNION ALL ".join(
    f"""SELECT '{label}' AS pk,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
       CAST(max(cnt) AS BIGINT) AS max_multiplicity
FROM (SELECT {", ".join(keys)}, count(*) AS cnt
      FROM {table} GROUP BY {", ".join(keys)}) t"""
    for label, table, keys in _PK_AUDITS
)


# --- z-order (Morton) layout key --------------------------------------------
# The space-filling-curve key behind multi-dimensional data layout
# (Delta/Iceberg Z-ORDER): interleave the low Z_BITS bits of two join/
# filter dimensions so rows close in (partkey, suppkey) space land in
# the same file after a write-time `sortWithinPartitions(zkey)` —
# min/max row-group stats then prune BOTH dimensions from one layout.
# The key itself is a pure bitwise map (no shuffle); both engine
# expressions are generated from the same Python loop so the 32-term
# unrolling cannot drift.
Z_BITS = 16


def _zorder_col(a: str, b: str) -> F.Column:
    # bit i of `a` -> bit 2i, bit i of `b` -> bit 2i+1
    terms = []
    for i in range(Z_BITS):
        terms.append(
            F.shiftright(F.col(a), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
        terms.append(
            F.shiftright(F.col(b), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return reduce(lambda x, y: x + y, terms).cast("long")


def _zorder_sql(a: str, b: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({a} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({b} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def q_scalar_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_partkey",
        "l_suppkey",
        _zorder_col("l_partkey", "l_suppkey").alias("zkey"),
    )


SCALAR_ZORDER_KEY_SQL = f"""
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_partkey, l_suppkey,
       {_zorder_sql('l_partkey', 'l_suppkey')} AS zkey
FROM lineitem
"""


# --- deterministic per-group sample ------------------------------------------
# Fixed-k-per-group sampling that is reproducible on any engine: rank
# rows inside each group by a content hash (md5 of the key) and keep
# the first GROUP_SAMPLE_K — a pseudo-random but deterministic draw,
# unlike engine-native RNG sampling (cross-engine unstable) or
# LIMIT-per-group (arrival-order dependent). Shape: one window over
# the group key — a single hash-partitioned sort where each partition
# holds only its groups' rows; no global order anywhere.
GROUP_SAMPLE_K = 5


def q_sample_group_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GROUP_SAMPLE_K)
        .select("lang", "doc_id", F.col("rk").cast("long").alias("rk"))
    )


SAMPLE_GROUP_TOPN_SQL = f"""
SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
  FROM documents) t
WHERE rk <= {GROUP_SAMPLE_K}
"""


# --- equal-frequency discretization -------------------------------------
# Decile binning of a continuous feature by rank (equal-POPULATION
# bins), the usual alternative to the equal-WIDTH grid the Chi
# fuzzifier uses ([FSS258 §3.1] fixes equal-width; equal-frequency is
# the standard robust-to-skew variant). Output is the per-bin summary
# (n, min/max, DECIMAL-exact sum).
#
# Determinism under ties: rows are ntile'd ordered by value alone, so
# equal values straddling a bin boundary may swap bins between engines
# — but every aggregate here is tie-insensitive: bin populations are
# fixed by ntile arithmetic, and swapped rows carry EQUAL values, so
# min/max/sum per bin are unchanged under any tie order.
#
# Scale note: ntile over an unpartitioned window is a single global
# sort — fine for model-sized dims, wrong for 100 TB fact tables. At
# scale, compute approximate decile EDGES first (one pass,
# agg_approx_percentile is the existing key) and bin with a static
# CASE expression (map-only) — the exact-rank variant here is the
# correctness reference for that path.
N_QBINS = 10


def q_discretize_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.orderBy(F.col("l_extendedprice").asc())
    binned = li.select(
        F.col("l_extendedprice").alias("price"),
        F.ntile(N_QBINS).over(w).cast("long").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
        F.sum(F.col("price").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


DISCRETIZE_QUANTILE_SQL = f"""
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       min(price) AS min_price, max(price) AS max_price,
       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM (
  SELECT l_extendedprice AS price,
         CAST(ntile({N_QBINS}) OVER (ORDER BY l_extendedprice ASC) AS BIGINT) AS bin
  FROM lineitem) t
GROUP BY bin
"""


# --- sketch-edge discretization (the bounded-memory 100 TB path) -------------
# Closes the one r7 perf-weak flag: discretize_quantile_approx's
# exact percentile() edge pass holds every distinct value in per-task
# memory (measured GC-thrash at 8x on the default heap — NOTES r7).
# This variant computes the decile edges with approx_percentile (a
# KLL/GK-style mergeable sketch: per-task memory is the sketch size,
# O(accuracy), INDEPENDENT of distinct-value count), broadcasts the
# one-row edge array, and bins map-only — the same two-scan,
# zero-sort plan, now with bounded memory at any scale.
#
# Oracle (the agg_approx_percentile pattern): sketch edges are
# engine-specific, so the checked output is the deterministic part —
# the bin ids, the EXACT total row count, and a boolean asserting the
# sketch delivered equal-frequency bins: every bin population within
# 2% of n/10 (accuracy=10000 gives ~1e-4 rank error; the sketch is
# deterministic per input, so the boolean is stable). DuckDB emits
# the same 10 rows with within_tol=true.
QSKETCH_ACCURACY = 10000
QSKETCH_TOL = 0.02


def q_discretize_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    probs = ", ".join(f"{p}" for p in _QBIN_PROBS)
    edges = li.agg(
        F.expr(
            f"approx_percentile(l_extendedprice, array({probs}),"
            f" {QSKETCH_ACCURACY})"
        ).alias("edges")
    )
    bin_expr = reduce(
        lambda x, y: x + y,
        [
            F.when(
                F.col("l_extendedprice") > F.element_at("edges", i + 1), 1
            ).otherwise(0)
            for i in range(len(_QBIN_PROBS))
        ],
    ) + F.lit(1)
    binned = li.crossJoin(F.broadcast(edges)).select(
        bin_expr.cast("long").alias("bin")
    )
    per_bin = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n_bin"))
    tot = per_bin.agg(F.sum("n_bin").alias("n_total"))
    return per_bin.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_total",
        (
            F.abs(
                F.col("n_bin").cast("double")
                - F.col("n_total").cast("double") / N_QBINS
            )
            <= F.lit(QSKETCH_TOL) * F.col("n_total").cast("double") / N_QBINS
        ).alias("within_tol"),
    )


DISCRETIZE_QUANTILE_SKETCH_SQL = f"""
SELECT CAST(range + 1 AS BIGINT) AS bin,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_total,
       true AS within_tol
FROM range({N_QBINS})
"""


# --- z-order clustered scan with multi-dimensional data skipping -------------
# The read-side payoff of scalar_zorder_key: write lineitem CLUSTERED
# by the Morton key (range-repartition on zkey + sortWithinPartitions
# — the Delta/Iceberg Z-ORDER write path), then answer a rectangular
# (l_partkey, l_suppkey) box query against the clustered copy. Because
# z-ordering makes both dimensions locally monotone within files,
# parquet footer min/max stats skip every row group outside the box —
# a scan whose I/O tracks the BOX size, not the table size, in BOTH
# dimensions at once (single-column sorting can only prune one). The
# box predicate reaches the scan as PushedFilters (pinned in
# tests/test_plans.py); the oracle runs the same box over the raw
# table, proving the rewrite is layout-only.
# the box is sf-relative (low corner: partkey <= max/8, suppkey <=
# max/4, ~1/32 of the key plane at every sf) so the skipping claim is
# testable at any fixture size; the bounds are integer floor-division
# of the table max — read driver-side on the Spark path (two scalars,
# the timeseries_gapfill pattern) and scalar subqueries in the oracle
ZORDER_P_FRAC, ZORDER_S_FRAC = 8, 4
ZORDER_FILES = 16


def _zorder_layout(spark: SparkSession, sf_dir: str) -> str:
    from chi_frbcs_bigdatacs_spark.streaming.staging import staged_dir

    def build(d: str) -> None:
        li = load_table(spark, sf_dir, "lineitem")
        (
            li.withColumn("zkey", _zorder_col("l_partkey", "l_suppkey"))
            .repartitionByRange(ZORDER_FILES, "zkey")
            .sortWithinPartitions("zkey")
            .write.mode("overwrite")
            .parquet(d)
        )

    return staged_dir("zorder_layout", sf_dir, build)


def zorder_box(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    li = load_table(spark, sf_dir, "lineitem")
    pmax, smax = li.agg(F.max("l_partkey"), F.max("l_suppkey")).first()
    return int(pmax) // ZORDER_P_FRAC, int(smax) // ZORDER_S_FRAC


def q_scan_zorder_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    phi, shi = zorder_box(spark, sf_dir)
    return (
        spark.read.parquet(_zorder_layout(spark, sf_dir))
        .filter(
            F.col("l_partkey").between(0, phi)
            & F.col("l_suppkey").between(0, shi)
        )
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("l_linenumber"),
            "l_partkey",
            "l_suppkey",
            "l_quantity",
        )
    )


SCAN_ZORDER_PRUNED_SQL = f"""
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_partkey, l_suppkey, l_quantity
FROM lineitem
WHERE l_partkey BETWEEN 0 AND (SELECT max(l_partkey) // {ZORDER_P_FRAC} FROM lineitem)
  AND l_suppkey BETWEEN 0 AND (SELECT max(l_suppkey) // {ZORDER_S_FRAC} FROM lineitem)
"""


# --- edge-broadcast discretization (the 100 TB path) -------------------------
# The scale-out counterpart of discretize_quantile promised in its
# docstring: instead of one global ntile sort (O(n log n) single
# ordering), compute the 9 decile EDGES in one aggregation pass
# (percentile() here; on a real cluster approx_percentile — the
# exact edges keep the oracle bit-checkable, same R-7 interpolation
# parity as agg_percentile), broadcast the one-row edge array, and
# bin every row with a map-only 9-term comparison sum. Two passes
# over the data, zero global sorts — the plan that survives a
# 100 TB fact table. Bin populations differ from exact ntile only at
# edge-tie boundaries (documented equal-frequency approximation);
# this key carries its own oracle built the same way.
_QBIN_PROBS = tuple((i + 1) / N_QBINS for i in range(N_QBINS - 1))


def q_discretize_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    probs = ", ".join(f"{p}" for p in _QBIN_PROBS)
    edges = li.agg(
        F.expr(f"percentile(l_extendedprice, array({probs}))").alias("edges")
    )
    # bin = 1 + #edges strictly below the value: identical arithmetic
    # on both engines, no rank involved
    bin_expr = reduce(
        lambda x, y: x + y,
        [
            F.when(F.col("l_extendedprice") > F.element_at("edges", i + 1), 1).otherwise(0)
            for i in range(len(_QBIN_PROBS))
        ],
    ) + F.lit(1)
    binned = li.crossJoin(F.broadcast(edges)).select(
        F.col("l_extendedprice").alias("price"),
        bin_expr.cast("long").alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
        F.sum(F.col("price").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


_QBIN_TERMS_SQL = " + ".join(
    f"CASE WHEN l_extendedprice > edges[{i + 1}] THEN 1 ELSE 0 END"
    for i in range(len(_QBIN_PROBS))
)

DISCRETIZE_QUANTILE_APPROX_SQL = f"""
WITH e AS (
  SELECT quantile_cont(l_extendedprice,
                       [{", ".join(str(p) for p in _QBIN_PROBS)}]) AS edges
  FROM lineitem
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       min(price) AS min_price, max(price) AS max_price,
       CAST(sum(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM (
  SELECT l_extendedprice AS price,
         CAST({_QBIN_TERMS_SQL} + 1 AS BIGINT) AS bin
  FROM lineitem, e) t
GROUP BY bin
"""


# --- k-anonymity generalize + suppress --------------------------------------
# The privacy gate before releasing user-adjacent aggregates:
# generalize the quasi-identifiers (exact order date -> calendar
# month; customer key dropped entirely) and SUPPRESS any group
# smaller than K_ANON, so no released row describes fewer than
# K_ANON orders. Pure groupBy + HAVING — one shuffle; the
# generalization is a map-side expression. At the driver's sf0.01
# both behaviors are exercised: ~1180 groups released, 7 suppressed.
K_ANON = 5


def q_anonymize_kgroups(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderstatus",
            "o_orderpriority",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .groupBy("o_orderstatus", "o_orderpriority", "month")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= K_ANON)
    )


ANONYMIZE_KGROUPS_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       strftime(o_orderdate, '%Y-%m') AS month,
       CAST(count(*) AS BIGINT) AS n
FROM orders
GROUP BY 1, 2, 3
HAVING count(*) >= {K_ANON}
"""


# --- l-diversity audit --------------------------------------------------------
# The companion check to anonymize_kgroups: k-anonymity alone leaks
# when every row of a quasi-identifier group shares one sensitive
# value (the homogeneity attack, Machanavajjhala et al. 2007).
# For each released (status, priority, month) group, count DISTINCT
# sensitive values (the customer key bucket stands in for the
# sensitive attribute) and flag groups below L_DIVERSITY. One
# two-level hash agg — distinct-inside-group is the classic
# two-phase (group+value count, then group count) plan, never a
# count(distinct) over a shuffle of raw rows at scale.
L_DIVERSITY = 3


def q_anonymize_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    g = o.select(
        "o_orderstatus",
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        (F.col("o_custkey") % 50).alias("sensitive"),
    )
    per_value = g.groupBy(
        "o_orderstatus", "o_orderpriority", "month", "sensitive"
    ).agg(F.count(F.lit(1)).alias("nv"))
    return (
        per_value.groupBy("o_orderstatus", "o_orderpriority", "month")
        .agg(
            F.sum("nv").alias("n"),
            F.count(F.lit(1)).alias("n_distinct_sensitive"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "month",
            "n",
            "n_distinct_sensitive",
            (F.col("n_distinct_sensitive") >= L_DIVERSITY).alias(
                "l_diverse"
            ),
        )
    )


ANONYMIZE_LDIVERSITY_SQL = f"""
WITH per_value AS (
  SELECT o_orderstatus, o_orderpriority,
         strftime(o_orderdate, '%Y-%m') AS month,
         o_custkey % 50 AS sensitive,
         count(*) AS nv
  FROM orders GROUP BY 1, 2, 3, 4
)
SELECT o_orderstatus, o_orderpriority, month,
       CAST(sum(nv) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_distinct_sensitive,
       count(*) >= {L_DIVERSITY} AS l_diverse
FROM per_value
GROUP BY 1, 2, 3
"""


# --- column masking (static data-protection policy) -------------------------
# The deterministic masking pass applied before data leaves the
# trusted zone, complementing anonymize_kgroups (aggregate release)
# and delete_cascade (erasure): direct identifiers are pseudonymized
# with a keyed hash (same input -> same token, so joins on the
# pseudonym still work downstream), quasi-identifiers are coarsened
# (account balance to the nearest 100), and low-risk attributes pass
# through. Pure map-only projection — no shuffle, trivially 100 TB.
MASK_SALT = "mask-v1"


def q_mask_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.substring(
            F.md5(F.concat(F.lit(MASK_SALT), F.lit("|"), F.col("c_name"))), 1, 16
        ).alias("name_token"),
        (F.floor(F.col("c_acctbal") / 100) * 100).cast("double").alias(
            "acctbal_band"
        ),
        "c_mktsegment",
    )


MASK_COLUMNS_SQL = f"""
SELECT c_custkey,
       substr(md5('{MASK_SALT}' || '|' || c_name), 1, 16) AS name_token,
       CAST(floor(c_acctbal / 100) * 100 AS DOUBLE) AS acctbal_band,
       c_mktsegment
FROM customer
"""


# --- freshness / staleness audit ---------------------------------------------
# The SLA check every ingestion DAG runs: per event type, latest
# arrival and its lag behind the newest event anywhere — one grouped
# agg plus a one-row global max folded back in (broadcast-sized).
def q_audit_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    per_type = ev.groupBy("event_type").agg(F.max("ts").alias("latest_ts"))
    glob = per_type.agg(F.max("latest_ts").alias("global_ts"))
    return (
        per_type.crossJoin(F.broadcast(glob))
        .select(
            "event_type",
            F.date_format("latest_ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
            (
                (F.unix_micros("global_ts") - F.unix_micros("latest_ts"))
                / F.lit(1_000_000)
            ).cast("long").alias("lag_seconds"),
        )
    )


AUDIT_FRESHNESS_SQL = """
WITH per_type AS (SELECT event_type, max(ts) AS latest_ts FROM events GROUP BY 1),
g AS (SELECT max(latest_ts) AS global_ts FROM per_type)
SELECT event_type,
       strftime(latest_ts, '%Y-%m-%d %H:%M:%S') AS latest_ts,
       CAST(epoch_us(global_ts - latest_ts) // 1000000 AS BIGINT) AS lag_seconds
FROM per_type CROSS JOIN g
"""


# --- declarative expectation suite -------------------------------------------
# The great-expectations-style contract check every ingestion gate
# runs: a declarative suite of column expectations (non-null, range,
# domain, format, cross-column order) evaluated in ONE conditional-
# aggregation pass per table — the violation predicates are SHARED
# SQL text compiled by Spark (F.expr) and DuckDB alike, so the suite
# definition cannot drift between engines — plus one anti-join count
# for the referential rule. Per rule: row count, violation count,
# and the pass verdict. At 100 TB each table contributes exactly one
# scan (all its rules fold into one agg; no per-rule passes), and
# the referential check is the audit_fk_orphans broadcast-semi
# shape.
EXPECT_RULES = {
    "orders": [
        ("o_totalprice_positive", "NOT (o_totalprice > 0)"),
        ("o_orderdate_not_null", "o_orderdate IS NULL"),
        ("o_orderstatus_domain", "o_orderstatus NOT IN ('O', 'F', 'P')"),
        # deliberately failing expectation: the violation-counting
        # path must be exercised, not just the all-zero happy path
        ("o_totalprice_under_400k", "o_totalprice > 400000"),
    ],
    "lineitem": [
        ("l_quantity_range", "l_quantity < 1 OR l_quantity > 50"),
        ("l_discount_range", "l_discount < 0 OR l_discount > 0.1"),
        ("l_quantity_le_45", "l_quantity > 45"),  # fails on ~10% of rows
    ],
}


def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for table, rules in EXPECT_RULES.items():
        t = load_table(spark, sf_dir, table)
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(rid)
            for rid, pred in rules
        ]
        one = t.agg(*aggs)
        stacked = one.select(
            F.lit(table).alias("table_name"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(rid).alias("rule_id"),
                            F.col(rid).cast("long").alias("n_violations"),
                        )
                        for rid, _ in rules
                    ]
                )
            ).alias("r"),
        ).select(
            "table_name", F.col("r.rule_id").alias("rule_id"), "n_rows",
            F.col("r.n_violations").alias("n_violations"),
        )
        out = stacked if out is None else out.unionByName(stacked)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem")
    n_li = li.count()
    orphans = li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
    ref = orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
        F.lit("lineitem").alias("table_name"),
        F.lit("l_orderkey_references_orders").alias("rule_id"),
        F.lit(n_li).cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
    )
    return out.unionByName(ref).withColumn(
        "passed", F.col("n_violations") == 0
    )


def _quality_expectations_sql() -> str:
    parts = []
    for table, rules in EXPECT_RULES.items():
        sel = ", ".join(
            f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS {rid}"
            for rid, pred in rules
        )
        rows = ", ".join(f"('{rid}', {rid})" for rid, _ in rules)
        parts.append(f"""
SELECT '{table}' AS table_name, r.rule_id, CAST(a.n_rows AS BIGINT) AS n_rows,
       CAST(r.n_violations AS BIGINT) AS n_violations,
       r.n_violations = 0 AS passed
FROM (SELECT count(*) AS n_rows, {sel} FROM {table}) a
CROSS JOIN LATERAL (VALUES {rows}) AS r(rule_id, n_violations)""")
    parts.append("""
SELECT 'lineitem', 'l_orderkey_references_orders',
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST(count(*) AS BIGINT), count(*) = 0
FROM lineitem li
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = li.l_orderkey)""")
    return "\nUNION ALL\n".join(parts)


# --- standard-score feature scaling ------------------------------------------
# The ML-prep twin of anomaly_zscore: standardize events.value per
# event_type against the GROUP's own mean/stddev (population), the
# transform every feature pipeline runs before distance-based models
# (the engine's own fuzzification grid assumes comparable ranges).
# Parity: with v in exact integer cents, z = (c*v - s) / sqrt(c*ss -
# s^2) — numerator and the sqrt argument are exact integers (DECIMAL
# path, no float accumulation), so both engines evaluate ONE sqrt and
# ONE division over identical values; 6dp-rounded. The emitted subset
# is the deterministic event_id % SCALE_SAMPLE_MOD == 0 slice —
# output row count is bounded and stable, the full-table transform is
# the same map-only expression. Scale: one map-side-combined agg to
# |types| rows, broadcast back over the scan — no shuffle of the fact
# table at all.
SCALE_SAMPLE_MOD = 97


def q_feature_scale_standard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v100 = F.round(F.col("value") * 100).cast("long")
    stats = ev.select("event_type", v100.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    d = ev.select("event_id", "event_type", "value", v100.alias("v")).join(
        F.broadcast(stats), "event_type"
    )
    num = (F.col("c") * F.col("v") - F.col("s")).cast("double")
    den_arg = F.col("c") * F.col("ss") - F.col("s") * F.col("s")
    den = F.sqrt(den_arg.cast("double"))
    # zero-variance group (constant-valued event_type) => NULL z, not
    # 0/0 NaN: the den>0 predicate on EXACT integers keeps both
    # engines on the same branch (the agg_daily_corr zero-variance
    # CASE; ADVICE r8 — NaN handling at the hash boundary is a latent
    # cross-engine divergence).
    z = F.when(den_arg > 0, F.round(num / den, 6))
    return (
        d.filter(F.col("event_id") % SCALE_SAMPLE_MOD == 0)
        .select(
            "event_id",
            "event_type",
            "value",
            z.alias("z"),
        )
    )


FEATURE_SCALE_STANDARD_SQL = f"""
WITH v AS (
  SELECT event_id, event_type, value,
         CAST(round(100 * value) AS BIGINT) AS v
  FROM events
),
stats AS (
  SELECT event_type, count(*) AS c, sum(v) AS s, sum(v * v) AS ss
  FROM v GROUP BY event_type
)
SELECT event_id, v.event_type, value,
       CASE WHEN c * ss - s * s > 0 THEN
         round(CAST(c * v - s AS DOUBLE)
               / sqrt(CAST(c * ss - s * s AS DOUBLE)), 6)
       END AS z
FROM v JOIN stats ON v.event_type = stats.event_type
WHERE event_id % {SCALE_SAMPLE_MOD} = 0
"""


# --- missing-value imputation -------------------------------------------------
# Median imputation over a DETERMINISTIC missingness mask (event_id %
# IMPUTE_MOD == 0 plays the null role — the fixture has no real
# nulls, and a seeded mask keeps both engines and every rerun on the
# same rows). Per event_type: observed median as the fill value, and
# the post-imputation mean recomputed as ONE division of exact
# integers ((sum_obs + n_miss * fill) in half-cent units to keep the
# possibly-.5-cent median exact). Scale: one grouped exact-percentile
# pass over the observed slice (per-type key space keeps the sort
# partition-local; the approx_percentile swap is the
# discretize_quantile_sketch recipe) and one map-side-combined agg.
IMPUTE_MOD = 7


def q_impute_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    masked = ev.select(
        "event_type",
        F.when(
            F.col("event_id") % IMPUTE_MOD == 0, F.lit(None)
        ).otherwise(F.round(F.col("value") * 100).cast("long")).alias("v"),
    )
    per_type = masked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_missing"),
        F.expr("percentile(v, 0.5)").alias("fill_cents"),
        F.sum("v").alias("s_obs"),
    )
    # half-cent units make (n_miss * fill) exact even when the even-
    # count median lands on .5 of a cent
    post_mean = (
        (2 * F.col("s_obs") + F.col("n_missing") * F.round(2 * F.col("fill_cents")))
        .cast("double")
        / (F.lit(200.0) * F.col("n"))
    )
    return per_type.select(
        "event_type",
        "n",
        "n_missing",
        F.round(F.col("fill_cents") / 100.0, 6).alias("fill_value"),
        F.round(post_mean, 6).alias("post_impute_mean"),
    )


IMPUTE_MISSING_SQL = f"""
WITH masked AS (
  SELECT event_type,
         CASE WHEN event_id % {IMPUTE_MOD} = 0 THEN NULL
              ELSE CAST(round(100 * value) AS BIGINT) END AS v
  FROM events
),
per_type AS (
  SELECT event_type,
         count(*) AS n,
         sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS n_missing,
         quantile_cont(v, 0.5) AS fill_cents,
         sum(v) AS s_obs
  FROM masked GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(n_missing AS BIGINT) AS n_missing,
       round(fill_cents / 100.0, 6) AS fill_value,
       round(CAST(2 * s_obs + n_missing * round(2 * fill_cents) AS DOUBLE)
             / (200.0 * n), 6) AS post_impute_mean
FROM per_type
"""



# --- join-key skew diagnostics (r13) -------------------------------------------
# The pre-flight every 100 TB join should run: per candidate join key,
# the cardinality/skew profile that decides broadcast vs sort-merge vs
# salting — row count, distinct keys, the hottest key and its count,
# and skew_ratio = hottest / mean-per-key (AQE's skew-join trigger is
# this same statistic at partition granularity). One unpivot + two
# hash aggs (the profile_columns shape); everything is exact integers
# except the two pinned divisions.
_SKEW_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")


def q_diag_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    unpivoted = li.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("join_key"),
                        F.col(c).cast("long").alias("k"),
                    )
                    for c in _SKEW_KEYS
                ]
            )
        ).alias("ck")
    ).select("ck.join_key", "ck.k")
    per_key = unpivoted.groupBy("join_key", "k").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_key.groupBy("join_key").agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max(F.struct(F.col("cnt"), (-F.col("k")).alias("nk"))).alias("s"),
    ).select(
        "join_key",
        "n_rows",
        "n_keys",
        (-F.col("s.nk")).alias("hottest_key"),
        F.col("s.cnt").alias("hottest_cnt"),
        F.round(
            F.col("n_rows").cast("double") / F.col("n_keys"), 6
        ).alias("mean_per_key"),
        F.round(
            F.col("s.cnt").cast("double")
            * F.col("n_keys").cast("double")
            / F.col("n_rows").cast("double"),
            6,
        ).alias("skew_ratio"),
    )


_SKEW_UNION = " UNION ALL ".join(
    f"SELECT '{c}' AS join_key, CAST({c} AS BIGINT) AS k FROM lineitem"
    for c in _SKEW_KEYS
)

DIAG_JOIN_SKEW_SQL = f"""
WITH unpivoted AS (
  {_SKEW_UNION}
),
per_key AS (
  SELECT join_key, k, count(*) AS cnt FROM unpivoted GROUP BY join_key, k
),
agg AS (
  SELECT join_key,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         max({{'v1': cnt, 'v2': -k}}) AS s
  FROM per_key GROUP BY join_key
)
SELECT join_key, n_rows, n_keys,
       CAST(-(s.v2) AS BIGINT) AS hottest_key,
       CAST(s.v1 AS BIGINT) AS hottest_cnt,
       round(CAST(n_rows AS DOUBLE) / n_keys, 6) AS mean_per_key,
       round(CAST(s.v1 AS DOUBLE) * CAST(n_keys AS DOUBLE)
             / CAST(n_rows AS DOUBLE), 6) AS skew_ratio
FROM agg
"""


# --- Bloom-filter join pruning (r15) ------------------------------------------
# The runtime-filter trick every 100 TB join wants beside
# diag_join_skew's pre-flight: build a Bloom filter over the DIM
# side's join keys (here: orders filtered to '1-URGENT'), broadcast
# it, and probe the FACT side's keys against it so the expensive join
# only sees keys that might match. Spark's own runtime row-group
# pruning / DPP and every warehouse's sideways information passing
# are this operator; the key surfaces the ACCOUNTING a pipeline
# author needs to size m/k — bits set, saturation, probe pass rate,
# and the measured false-positive rate vs the exact semi-join (Bloom
# filters never false-negative: pinned by test and by n_true ==
# n_pass∩truth here).
#
# Exactness recipe: BLOOM_K independent hashes from the established
# md5 15-hex-digit fold (curation.py's HLL recipe — bit-equal on both
# engines), positions mod BLOOM_BITS, state = bit_or over 64-bit
# words (BLOOM_BITS/64 rows — broadcast-tiny, and commutative/
# mergeable, so build is ONE map-side-combined agg at any scale).
# Probe joins the ≤2048-word state per (key, hash) and requires all
# BLOOM_K bits -> candidate; stats join the exact dim-key set.
# Scale shape: build = filter + explode(K) + word agg (map-side);
# probe = distinct fact keys (the one real shuffle) + broadcast
# equi-join on word + per-key count agg. fp_rate denominator
# coalesced for the no-negative-probe degenerate case (ADVICE r14's
# NULL-contract lesson).
BLOOM_BITS = 131072  # 2^17 -> 2048 words; ~0.9 load at sf0.1's dim side
BLOOM_K = 4
_BLOOM_PRED = "o_orderpriority = '1-URGENT'"


def _bloom_hash_col(key: Column, i: int) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bf{i}:"), key.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % BLOOM_BITS
    )


def q_join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    bloom = bloom_words(bloom_dim_keys(spark, sf_dir))
    return bloom_finish(spark, sf_dir, bloom)


def bloom_dim_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").cast("long").alias("k"))
        .distinct()
    )


def bloom_words(keys: DataFrame) -> DataFrame:
    """The filter STATE: (word, bits) — <= BLOOM_BITS/32 rows.
    bit_or is commutative, associative AND idempotent, so the state
    is mergeable across partitions, micro-batches, and duplicate key
    arrivals alike — the property the streaming twin's
    split-invariance rides (stream side skips the dim-key distinct
    entirely; duplicate hashes OR to the same bits)."""
    pos = keys.select(
        F.explode(
            F.array(*[_bloom_hash_col(F.col("k"), i) for i in range(BLOOM_K)])
        ).alias("pos")
    )
    return (
        pos.select(
            F.expr("pos div 32").alias("word"), (F.col("pos") % 32).alias("bit")
        )
        .groupBy("word")
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))").alias(
                "bits"
            )
        )
    )


def bloom_finish(spark: SparkSession, sf_dir: str, bloom: DataFrame) -> DataFrame:
    """Probe + accounting over a built (word, bits) state — shared by
    the batch key and the streaming twin."""
    dim_keys = bloom_dim_keys(spark, sf_dir)
    bstats = bloom.agg(
        F.sum(F.expr("bit_count(bits)")).alias("n_bits_set")
    )
    fact_keys = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").cast("long").alias("k"))
        .distinct()
    )
    probe = fact_keys.select(
        "k",
        F.posexplode(
            F.array(*[_bloom_hash_col(F.col("k"), i) for i in range(BLOOM_K)])
        ).alias("i", "pos"),
    ).select(
        "k", F.expr("pos div 32").alias("word"), (F.col("pos") % 32).alias("bit")
    )
    passed = (
        probe.join(F.broadcast(bloom), "word")
        .withColumn(
            # bitwise AND, not (>> then % 2): when bit 63 is set the
            # word is negative and the arithmetic shift keeps the
            # sign, so % 2 would read -1/0 instead of 1/0.
            "hit",
            F.expr("shiftright(bits, CAST(bit AS INT)) & CAST(1 AS BIGINT)"),
        )
        .groupBy("k")
        .agg(F.sum("hit").alias("n_hit"))
        .where(F.col("n_hit") == BLOOM_K)
        .select("k")
    )
    truth = dim_keys.withColumn("is_true", F.lit(1))
    stats = (
        fact_keys.join(passed.withColumn("is_pass", F.lit(1)), "k", "left")
        .join(truth, "k", "left")
        .agg(
            F.count(F.lit(1)).alias("n_keys_probed"),
            F.sum(F.coalesce(F.col("is_pass"), F.lit(0))).alias("n_pass"),
            F.sum(F.coalesce(F.col("is_true"), F.lit(0))).alias("n_true"),
            F.sum(
                F.coalesce(F.col("is_pass"), F.lit(0))
                * (F.lit(1) - F.coalesce(F.col("is_true"), F.lit(0)))
            ).alias("n_false_pos"),
        )
    )
    return stats.crossJoin(F.broadcast(bstats)).select(
        F.lit("o_orderkey").alias("join_key"),
        F.lit(BLOOM_BITS).cast("long").alias("m_bits"),
        F.lit(BLOOM_K).cast("long").alias("k_hashes"),
        F.col("n_bits_set").cast("long").alias("n_bits_set"),
        F.round(F.col("n_bits_set") / F.lit(float(BLOOM_BITS)), 6).alias(
            "saturation"
        ),
        F.col("n_keys_probed").cast("long").alias("n_keys_probed"),
        F.col("n_pass").cast("long").alias("n_pass"),
        F.col("n_true").cast("long").alias("n_true"),
        F.col("n_false_pos").cast("long").alias("n_false_pos"),
        F.when(
            F.col("n_keys_probed") - F.col("n_true") > 0,
            F.round(
                F.col("n_false_pos")
                / (F.col("n_keys_probed") - F.col("n_true")).cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("fp_rate"),
    )


# --- the Bloom filter APPLIED: runtime-filtered join -------------------------
# join_bloom_prune reports the filter's accounting; this key actually
# DEPLOYS it the way an engine's sideways information passing does:
# the built (word, bits) state is collected as a scalar header
# (BLOOM_BITS/32 longs — 8 KB, the centroid convention) and folded
# into a LITERAL-array predicate evaluated per fact row inside
# whole-stage codegen — no explode, no probe join, the filter rides
# the scan. False positives then die in the real equi-join, so the
# result is EXACTLY the plain join: the DuckDB oracle is the plain
# join+agg SQL, which is the semantic-transparency contract a runtime
# filter must satisfy (and what the driver hash-checks). The plan-pin
# test asserts the predicate really is in the scan stage and measures
# its selectivity separately.
# Scale shape: build = one map-side agg; apply = map-only predicate;
# join = the join you were doing anyway, now over ~|match| rows
# instead of |fact|.


def bloom_row_filter(
    df: DataFrame, key_col: str, words: dict[int, int]
) -> DataFrame:
    """Filter df to rows whose key_col passes the collected Bloom
    words — a literal-array predicate in whole-stage codegen (no
    explode, no join). SQL-form shiftright because the Python builtin
    only takes a literal bit count; barr/p{i} helper columns are
    dropped so nothing leaves the scan stage."""
    n_words = BLOOM_BITS // 32
    bits_arr = F.array(
        *[F.lit(words.get(w, 0)).cast("long") for w in range(n_words)]
    )
    withpos = df.withColumn("barr", bits_arr)
    for i in range(BLOOM_K):
        withpos = withpos.withColumn(
            f"p{i}", _bloom_hash_col(F.col(key_col), i)
        )
    pred = F.expr(
        " AND ".join(
            f"((shiftright(element_at(barr, CAST(p{i} div 32 AS INT) + 1), "
            f"CAST(p{i} % 32 AS INT)) & CAST(1 AS BIGINT)) = 1)"
            for i in range(BLOOM_K)
        )
    )
    helper = ["barr"] + [f"p{i}" for i in range(BLOOM_K)]
    return withpos.where(pred).drop(*helper)


def q_join_bloom_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    bloom = bloom_words(bloom_dim_keys(spark, sf_dir))
    words = {int(r["word"]): int(r["bits"]) for r in bloom.collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("long").alias("k"),
        "l_extendedprice",
        "l_discount",
    )
    filtered = bloom_row_filter(li, "k", words)
    dim = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select(
        F.col("o_orderkey").cast("long").alias("k"), "o_orderpriority"
    )
    disc = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)")
        - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        filtered.join(dim, "k")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("k").alias("n_orders"),
            # house money policy (Q1 pattern): per-factor DECIMAL
            # casts, decimal-exact sum, double only at the boundary
            F.sum(disc).cast("double").alias("revenue"),
        )
    )


JOIN_BLOOM_FILTERED_SQL = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2))
                   - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
FROM lineitem l
JOIN orders o ON CAST(l.l_orderkey AS BIGINT) = CAST(o.o_orderkey AS BIGINT)
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY o.o_orderpriority
"""


def _bloom_hash_sql(key: str, i: int) -> str:
    return (
        f"(list_sum(list_transform(range(0, 15), "
        f"hx -> (CAST(strpos('0123456789abcdef', "
        f"substr(md5('bf{i}:' || CAST({key} AS VARCHAR)), hx + 1, 1)) AS BIGINT)"
        f" - 1) << (4 * (14 - hx)))) % {BLOOM_BITS})"
    )


def _join_bloom_prune_sql() -> str:
    dim_hashes = " UNION ALL ".join(
        f"SELECT {_bloom_hash_sql('k', i)} AS pos FROM dim_keys"
        for i in range(BLOOM_K)
    )
    probe_hashes = " UNION ALL ".join(
        f"SELECT k, {_bloom_hash_sql('k', i)} AS pos FROM fact_keys"
        for i in range(BLOOM_K)
    )
    return f"""
WITH dim_keys AS MATERIALIZED (
  SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS k FROM orders
  WHERE {_BLOOM_PRED}
),
dim_pos AS (
  {dim_hashes}
),
bloom AS MATERIALIZED (
  SELECT pos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
  FROM dim_pos GROUP BY 1
),
bstats AS (
  SELECT CAST(sum(bit_count(bits)) AS BIGINT) AS n_bits_set FROM bloom
),
fact_keys AS MATERIALIZED (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS k FROM lineitem
),
probe AS (
  SELECT k, pos // 32 AS word, CAST(pos % 32 AS INT) AS bit
  FROM ({probe_hashes}) p
),
passed AS (
  SELECT k FROM (
    SELECT p.k, sum((b.bits >> p.bit) & CAST(1 AS BIGINT)) AS n_hit
    FROM probe p JOIN bloom b ON p.word = b.word
    GROUP BY p.k) t
  WHERE n_hit = {BLOOM_K}
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys_probed,
         CAST(sum(CASE WHEN p.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pass,
         CAST(sum(CASE WHEN d.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true,
         CAST(sum(CASE WHEN p.k IS NOT NULL AND d.k IS NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
  FROM fact_keys f
  LEFT JOIN passed p ON f.k = p.k
  LEFT JOIN dim_keys d ON f.k = d.k
)
SELECT 'o_orderkey' AS join_key,
       CAST({BLOOM_BITS} AS BIGINT) AS m_bits,
       CAST({BLOOM_K} AS BIGINT) AS k_hashes,
       b.n_bits_set,
       round(b.n_bits_set / {float(BLOOM_BITS)!r}, 6) AS saturation,
       s.n_keys_probed, s.n_pass, s.n_true, s.n_false_pos,
       CASE WHEN s.n_keys_probed - s.n_true > 0
            THEN round(s.n_false_pos
                       / CAST(s.n_keys_probed - s.n_true AS DOUBLE), 6)
            ELSE 0.0 END AS fp_rate
FROM stats s CROSS JOIN bstats b
"""


def register_all() -> None:
    register("profile_columns", q_profile_columns, PROFILE_COLUMNS_SQL)
    register("join_bloom_prune", q_join_bloom_prune, _join_bloom_prune_sql())
    register(
        "join_bloom_filtered", q_join_bloom_filtered, JOIN_BLOOM_FILTERED_SQL
    )
    register(
        "quality_expectations", q_quality_expectations, _quality_expectations_sql()
    )
    register("audit_fk_orphans", q_audit_fk_orphans, AUDIT_FK_ORPHANS_SQL)
    register("audit_duplicate_pk", q_audit_duplicate_pk, AUDIT_DUPLICATE_PK_SQL)
    register("scalar_zorder_key", q_scalar_zorder_key, SCALAR_ZORDER_KEY_SQL)
    register("scan_zorder_pruned", q_scan_zorder_pruned, SCAN_ZORDER_PRUNED_SQL)
    register("sample_group_topn", q_sample_group_topn, SAMPLE_GROUP_TOPN_SQL)
    register("discretize_quantile", q_discretize_quantile, DISCRETIZE_QUANTILE_SQL)
    register(
        "discretize_quantile_approx",
        q_discretize_quantile_approx,
        DISCRETIZE_QUANTILE_APPROX_SQL,
    )
    register(
        "discretize_quantile_sketch",
        q_discretize_quantile_sketch,
        DISCRETIZE_QUANTILE_SKETCH_SQL,
    )
    register("anonymize_kgroups", q_anonymize_kgroups, ANONYMIZE_KGROUPS_SQL)
    register(
        "anonymize_ldiversity",
        q_anonymize_ldiversity,
        ANONYMIZE_LDIVERSITY_SQL,
    )
    register("mask_columns", q_mask_columns, MASK_COLUMNS_SQL)
    register("audit_freshness", q_audit_freshness, AUDIT_FRESHNESS_SQL)
    register(
        "feature_scale_standard",
        q_feature_scale_standard,
        FEATURE_SCALE_STANDARD_SQL,
    )
    register("impute_missing", q_impute_missing, IMPUTE_MISSING_SQL)
    register("diag_join_skew", q_diag_join_skew, DIAG_JOIN_SKEW_SQL)
