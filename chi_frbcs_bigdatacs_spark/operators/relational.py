"""M1 — relational substrate operators (SURVEY.md §2b).

The reference has only scan/project/filter plus one implicit
broadcast (model via DistributedCache); a usable engine needs the
full relational surface, and the harness's TPC-H-ish tables exercise
it. Every query here is a (Spark callable, DuckDB oracle) pair
registered under its SURVEY §2b key.

Cross-engine float policy: money aggregates are summed as
DECIMAL(18,2) (exact, order-insensitive) and cast to DOUBLE at the
end, so Spark's partial/final agg ordering and DuckDB's agree
bit-for-bit. Ratios/averages divide exact sums. Window/running sums
accumulate in identical frame order, so plain doubles are safe.

Scale notes (100 TB):
  - dims (region/nation/customer at dim-scale) join via explicit
    broadcast(); fact-fact joins force sort-merge via .hint("merge")
    with AQE skew-join splitting enabled in the session.
  - every scan projects only referenced columns and filters early, so
    Catalyst pushes predicates into the parquet scan (verified by
    tests/test_plans.py on PushedFilters).
  - per-group top-k uses window rank (single shuffle on the partition
    key), global top-k uses orderBy+limit (TakeOrdered, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chi_frbcs_bigdatacs_spark.plans.registry import register
from chi_frbcs_bigdatacs_spark.sources.testdata import load_table


def _dec(c, scale: int = 2):
    return F.col(c).cast(f"decimal(18,{scale})")


# --- O1 scan + pushdown ----------------------------------------------------
def q_scan_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") >= 45).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


SCAN_SOURCE_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem WHERE l_quantity >= 45
"""


# --- O3 projection + nominal dictionary encode -----------------------------
# Frozen vocab (declared, KEEL-header style): returnflag {A,N,R},
# linestatus {F,O} -> 0-based codes. [REF: data/DataConverter.java | conf=M]
def q_project_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rf = (
        F.when(F.col("l_returnflag") == "A", 0)
        .when(F.col("l_returnflag") == "N", 1)
        .when(F.col("l_returnflag") == "R", 2)
        .otherwise(-1)
    )
    ls = (
        F.when(F.col("l_linestatus") == "F", 0)
        .when(F.col("l_linestatus") == "O", 1)
        .otherwise(-1)
    )
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("id"),
        rf.alias("returnflag_code"),
        ls.alias("linestatus_code"),
        F.col("l_quantity").alias("f1"),
    )


PROJECT_ENCODE_SQL = """
SELECT l_orderkey * 10 + l_linenumber AS id,
       CASE WHEN l_returnflag = 'A' THEN 0
            WHEN l_returnflag = 'N' THEN 1
            WHEN l_returnflag = 'R' THEN 2 ELSE -1 END AS returnflag_code,
       CASE WHEN l_linestatus = 'F' THEN 0
            WHEN l_linestatus = 'O' THEN 1 ELSE -1 END AS linestatus_code,
       l_quantity AS f1
FROM lineitem
"""


# --- O4 validity filter ----------------------------------------------------
def q_filter_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    feats = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    return (
        li.na.drop(subset=feats)
        .agg(F.count(F.lit(1)).alias("valid_rows"))
    )


FILTER_VALID_SQL = """
SELECT count(*) AS valid_rows FROM lineitem
WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
  AND l_discount IS NOT NULL AND l_tax IS NOT NULL
"""


# --- predicate language (TPC-H q6 shape) -----------------------------------
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
            & F.col("l_returnflag").isin("A", "R")
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


FILTER_PRED_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
  AND l_returnflag IN ('A', 'R')
"""


# --- TPC-H q1 pricing summary (headline agg; bench q1) ---------------------
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# --- rollup ----------------------------------------------------------------
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


AGG_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- distinct aggregation --------------------------------------------------
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n"),
    )


AGG_DISTINCT_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


# --- set ops ---------------------------------------------------------------
def q_setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


SETOP_UNION_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
"""


def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o.distinct()).distinct()


SETOP_EXCEPT_SQL = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
"""


# --- joins -----------------------------------------------------------------
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("sum_bal"),
        )
    )


JOIN_BROADCAST_SQL = """
SELECT r_name, count(*) AS n_cust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.hint("merge")
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
        )
    )


JOIN_SORTMERGE_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


# --- runtime bloom-filter join (row-level runtime filtering) -----------------
# The shuffle-join counterpart of join_dpp's partition pruning:
# Catalyst's InjectRuntimeFilter plants a bloom_filter_agg subquery
# on the SELECTIVE build side (urgent orders) and a might_contain()
# filter on the 100 TB probe side's scan, so most lineitem rows die
# BEFORE the shuffle instead of after the join — at scale this is
# the difference between shuffling the full fact table and shuffling
# the ~selectivity fraction of it. InjectRuntimeFilter only fires
# for probably-shuffle joins over large probe scans, so at FIXTURE
# scale the size thresholds are lowered WHILE THE PLAN IS FROZEN
# (accessing executedPlan caches the optimized logical plan on the
# Dataset) and restored before returning — nothing leaks into other
# keys' planning, and a real cluster needs no conf change at all.
# The injection is pinned in tests/test_plans.py; a bloom filter is
# results-neutral by construction (might_contain has no false
# negatives), which the DuckDB oracle hash-checks. The lowered
# thresholds live in a CLONED session (newSession: same SparkContext
# + cached data, independent SQLConf), so a query planned
# concurrently in the caller's session can never inherit them
# (ADVICE r8 — the set/restore window was a silent race).
def q_join_runtime_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.newSession()
    s.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "1KB",
    )
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    o = load_table(s, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(s, sf_dir, "lineitem")
    return (
        o.hint("merge")
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
        )
    )


JOIN_RUNTIME_BLOOM_SQL = """
SELECT o_orderstatus, count(*) AS n_items,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
"""


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


JOIN_SEMI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


JOIN_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- range (theta) join: events within 1 minute per user -------------------
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe range join: co-locate on (user, 1-minute time bucket)
    instead of user alone. Any ts2 in (ts1, ts1+1min] falls in e1's
    bucket or the next one, so e1 fans out to those two buckets and
    the join is a plain equi-join on (user_id, bucket) — candidate
    pairs are bounded per (user, minute), so a hot user no longer
    produces a quadratic per-user blow-up; the exact interval filter
    then keeps precisely the in-range pairs. Each qualifying pair
    matches in exactly one e2 bucket, so no dedup is needed."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.col("ts").cast("double") / 60).cast("long")
    e1 = ev.select(
        F.col("user_id"), F.col("ts").alias("ts1"), bucket.alias("b1")
    ).withColumn("jb", F.explode(F.array(F.col("b1"), F.col("b1") + 1)))
    e2 = ev.select(F.col("user_id"), F.col("ts").alias("ts2"), bucket.alias("jb"))
    pairs = e1.join(e2, ["user_id", "jb"]).filter(
        (F.col("ts2") > F.col("ts1"))
        & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 1 MINUTE"))
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


JOIN_RANGE_SQL = """
SELECT e1.user_id AS user_id, count(*) AS n_pairs
FROM events e1 JOIN events e2
  ON e1.user_id = e2.user_id
 AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 MINUTE
GROUP BY e1.user_id
"""


# --- salted join: explicit skew mitigation ---------------------------------
N_SALTS = 8


def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manual skew-mitigation pattern for when AQE's skew-join
    split isn't available (e.g. a skewed build side feeding a
    non-AQE-splittable stage): the probe side salts its key with a
    deterministic `pk % N`, the build side replicates each row N
    times, and the join runs on (key, salt) — a hot key's rows spread
    over N reducers instead of one. Result provably equals the
    unsalted join (the oracle computes it plainly)."""
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", (F.col("o_orderkey") % N_SALTS).cast("int")
    )
    c = load_table(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)).cast("array<int>"))
    )
    j = o.join(c, (o["o_custkey"] == c["c_custkey"]) & (o["salt"] == c["salt"]))
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
    )


JOIN_SALTED_SQL = """
SELECT c_mktsegment, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def skewed_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-stress fixture: ~90% of lineitem rows map to ONE hot key
    (skew_key=0), the rest spread over 1..99 — the natural testdata
    has no hot key, so join_salted's salt never earned its keep until
    this fixture."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return li.withColumn(
        "skew_key",
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
        .otherwise(F.col("l_orderkey") % 100)
        .cast("int"),
    )


def skew_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100-row dimension (key, factor); factor in 0.5 steps so the
    decimal arithmetic is exact on both engines."""
    return spark.range(100).select(
        F.col("id").cast("int").alias("k"),
        (F.lit(1.0) + (F.col("id") % 7).cast("double") * F.lit(0.5)).alias("factor"),
    )


def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join under REAL skew: the probe side salts with a
    deterministic pmod of its fine-grained key, the dim side
    replicates N_SALTS times, and the join runs on (skew_key, salt) —
    the hot key's ~0.9|lineitem| rows spread over N_SALTS reducers
    instead of hammering one. The oracle computes the plain unsalted
    join, so the hash check asserts salt-invariance of the result;
    tests/test_counters_bucketing.py asserts the skew reduction
    itself (max group size drops ~N_SALTS-fold)."""
    probe = skewed_probe(spark, sf_dir).withColumn(
        "salt",
        F.pmod(F.col("l_orderkey") * 7 + F.col("l_linenumber"), N_SALTS).cast("int"),
    )
    dim = skew_dim(spark, sf_dir).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)).cast("array<int>"))
    )
    j = probe.join(dim, (probe["skew_key"] == dim["k"]) & (probe["salt"] == dim["salt"]))
    return j.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("l_quantity") * F.col("factor").cast("decimal(18,2)"))
        .cast("double")
        .alias("weighted_qty"),
    )


JOIN_SALTED_SKEW_SQL = """
WITH probe AS (
  SELECT CASE WHEN l_orderkey % 10 < 9 THEN 0
              ELSE CAST(l_orderkey % 100 AS INT) END AS skew_key,
         l_quantity
  FROM lineitem
),
dim AS (
  SELECT CAST(range AS INT) AS k,
         1.0 + CAST(range % 7 AS DOUBLE) * 0.5 AS factor
  FROM range(100)
)
SELECT k, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                * CAST(factor AS DECIMAL(18,2))) AS DOUBLE) AS weighted_qty
FROM probe JOIN dim ON skew_key = k
GROUP BY k
"""


def q_agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch) for quantiles at scale.
    Same checked-output pattern as agg_approx_distinct: the sketch
    estimate is engine-specific, so the output is the exact p50 plus
    a deterministic assertion the sketch landed within 2% of it
    (accuracy=10000; the sketch is deterministic per input)."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50_exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("p50_approx"),
    )
    return g.select(
        "l_returnflag",
        "p50_exact",
        (
            F.abs(F.col("p50_approx") - F.col("p50_exact")) / F.col("p50_exact")
            <= 0.02
        ).alias("approx_ok"),
    )


AGG_APPROX_PERCENTILE_SQL = """
SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_exact,
       true AS approx_ok
FROM lineitem GROUP BY l_returnflag
"""


# --- windows ---------------------------------------------------------------
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", F.col("rn").cast("long").alias("rn"), "o_orderkey", "o_totalprice")
    )


WINDOW_RANK_SQL = """
SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders) t
WHERE rn <= 3
"""


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
        F.lag("event_id").over(
            Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
        ).alias("prev_event"),
    )


WINDOW_RUNNING_SQL = """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value,
       lag(event_id) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_event
FROM events
"""


# --- top-k -----------------------------------------------------------------
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(10)
    )


TOPK_GLOBAL_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 10
"""


# --- date/time -------------------------------------------------------------
def q_date_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
    )


DATE_BUCKET_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP_NS) AS month, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY 1
"""


# --- json ------------------------------------------------------------------
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_id", "event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


JSON_EXTRACT_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
       min(CAST(props->>'k' AS INT)) AS min_k,
       max(CAST(props->>'k' AS INT)) AS max_k
FROM events GROUP BY event_type
"""


# --- remaining join types / set ops / cube ---------------------------------
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "full_outer")
        .select(
            F.coalesce(F.col("c_custkey"), F.col("o_custkey")).alias("custkey"),
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            "c_mktsegment",
        )
    )


JOIN_OUTER_SQL = """
SELECT COALESCE(c_custkey, o_custkey) AS custkey,
       COALESCE(n_orders, 0) AS n_orders,
       c_mktsegment
FROM customer
FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
  ON c_custkey = o_custkey
"""


def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n).groupBy("r_name").agg(F.count(F.lit(1)).alias("n_pairs"))


JOIN_CROSS_SQL = """
SELECT r_name, count(*) AS n_pairs FROM region CROSS JOIN nation GROUP BY r_name
"""


def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    p = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))
    return li.intersect(p)


SETOP_INTERSECT_SQL = """
SELECT l_partkey AS k FROM lineitem INTERSECT SELECT p_partkey AS k FROM part
"""


def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
    )


AGG_CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Spark pivot (wide confusion-style counts); the oracle
    mirrors with conditional aggregation — same result, same names."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .count()
        .select(
            "l_returnflag",
            F.coalesce(F.col("F"), F.lit(0)).alias("n_F"),
            F.coalesce(F.col("O"), F.lit(0)).alias("n_O"),
        )
    )


AGG_PIVOT_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
       CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O
FROM lineitem GROUP BY l_returnflag
"""


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) for dedup-cardinality stats at
    scale. Sketch estimates are engine-specific, so the CHECKED output
    is the exact distinct count plus a deterministic assertion that
    the sketch landed within 5% of it (HLL is deterministic per input,
    rsd=0.01 here, so this is stable, not flaky) — the oracle asserts
    the same tolerance trivially against its exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_exact"),
        F.approx_count_distinct("l_partkey", 0.01).alias("n_approx"),
    )
    return g.select(
        "l_returnflag",
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact")).cast("double")
            / F.col("n_exact").cast("double")
            <= 0.05
        ).alias("approx_ok"),
    )


AGG_APPROX_DISTINCT_SQL = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact, true AS approx_ok
FROM lineitem GROUP BY l_returnflag
"""


def q_agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Datasketches hll_sketch_agg): the
    100 TB distinct-count architecture — build one sketch PER SHARD
    (here per o_orderpriority), answer the global rollup by UNIONING
    the partial sketches (hll_union_agg) instead of rescanning the
    fact table. The checked output is the agg_approx_distinct
    pattern: exact counts plus a 5%-tolerance bool on each sketch
    estimate, including the merged 'ALL' row whose estimate came
    only from the 5 partial sketches (sketches are deterministic per
    input, so the bools are stable). One scan builds the partials;
    the union is a 5-row agg."""
    o = load_table(spark, sf_dir, "orders")
    parts = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk"),
    )
    per_group = parts.select(
        F.col("o_orderpriority").alias("grp"),
        "n_exact",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact")).cast("double")
            / F.col("n_exact").cast("double")
            <= 0.05
        ).alias("approx_ok"),
    )
    exact_all = o.select(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    merged = parts.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_merged")
    )
    all_row = exact_all.crossJoin(merged).select(
        F.lit("ALL").alias("grp"),
        "n_exact",
        (
            F.abs(F.col("n_merged") - F.col("n_exact")).cast("double")
            / F.col("n_exact").cast("double")
            <= 0.05
        ).alias("approx_ok"),
    )
    return per_group.unionByName(all_row)


AGG_HLL_UNION_SQL = """
SELECT o_orderpriority AS grp,
       count(DISTINCT o_custkey) AS n_exact, true AS approx_ok
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'ALL', count(DISTINCT o_custkey), true FROM orders
"""


def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (R-7 linear interpolation in both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95"),
    )


AGG_PERCENTILE_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS p95
FROM lineitem GROUP BY l_returnflag
"""


# --- as-of join ------------------------------------------------------------
# For each purchase event, the most recent prior-or-same-time view by
# the same user. Implemented with the scalable union-marker technique:
# one union, one sort per user (window), NO range self-join — the plan
# a 100 TB as-of join needs (single shuffle on user_id).
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    marked = e.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("view_id"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marked.withColumn("asof_view", F.last("view_id", ignorenulls=True).over(w))
        .filter(F.col("is_purchase"))
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("asof_view").alias("asof_view_id"),
        )
    )


JOIN_ASOF_SQL = """
SELECT event_id AS purchase_id, user_id, asof_view_id
FROM (
  SELECT user_id, ts, event_id, event_type,
         last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_view_id
  FROM events
  WHERE event_type IN ('view', 'purchase')
) t
WHERE event_type = 'purchase'
"""


# --- unpivot / melt --------------------------------------------------------
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_discount").alias("discount"),
        F.col("l_tax").alias("tax"),
    )
    return li.unpivot(
        ids=["rid"],
        values=["quantity", "discount", "tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )


UNPIVOT_SQL = """
SELECT l_orderkey * 10 + l_linenumber AS rid, 'quantity' AS measure, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey * 10 + l_linenumber, 'discount', l_discount FROM lineitem
UNION ALL
SELECT l_orderkey * 10 + l_linenumber, 'tax', l_tax FROM lineitem
"""


def q_agg_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats over an arbitrary-precision double column:
    min/max are exact; sum/avg round away the (tiny) accumulation-order
    difference between engines."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        F.round(F.sum("value"), 3).alias("sum_v"),
        F.round(F.sum("value") / F.count(F.lit(1)), 6).alias("avg_v"),
    )


AGG_VALUE_STATS_SQL = """
SELECT event_type, count(*) AS n, min(value) AS min_v, max(value) AS max_v,
       round(sum(value), 3) AS sum_v,
       round(sum(value) / count(*), 6) AS avg_v
FROM events GROUP BY event_type
"""


# --- scalar function batteries (SURVEY §2b scalar fns) ---------------------
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.lower("c_mktsegment").alias("lower_seg"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("renamed"),
        F.concat_ws("-", "c_mktsegment", F.col("c_custkey").cast("string")).alias("seg_key"),
    )


SCALAR_STRING_SQL = """
SELECT c_custkey,
       upper(c_name) AS upper_name,
       lower(c_mktsegment) AS lower_seg,
       substr(c_name, 1, 8) AS prefix8,
       length(c_name) AS name_len,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
       COALESCE(regexp_extract(c_name, '([0-9]+)', 1), '') AS name_digits,
       replace(c_name, 'Customer', 'Cust') AS renamed,
       c_mktsegment || '-' || CAST(c_custkey AS VARCHAR) AS seg_key
FROM customer
"""


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("rid"),
        F.abs(x - 50000.0).alias("abs_diff"),
        F.ceil("l_quantity").cast("long").alias("ceil_qty"),
        F.floor(F.col("l_discount") * 100).cast("long").alias("floor_disc_pct"),
        F.round(F.sqrt(x), 6).alias("sqrt_price"),
        F.round(F.log(x), 6).alias("ln_price"),
        F.round(F.log10(x), 6).alias("log10_price"),
        F.round(F.pow(F.col("l_quantity"), 2.0), 6).alias("qty_sq"),
        F.pmod(F.col("l_orderkey"), 7).alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


SCALAR_MATH_SQL = """
SELECT l_orderkey * 10 + l_linenumber AS rid,
       abs(l_extendedprice - 50000.0) AS abs_diff,
       CAST(ceil(l_quantity) AS BIGINT) AS ceil_qty,
       CAST(floor(l_discount * 100) AS BIGINT) AS floor_disc_pct,
       round(sqrt(l_extendedprice), 6) AS sqrt_price,
       round(ln(l_extendedprice), 6) AS ln_price,
       round(log10(l_extendedprice), 6) AS log10_price,
       round(pow(l_quantity, 2.0), 6) AS qty_sq,
       l_orderkey % 7 AS key_mod7,
       CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1
                 WHEN l_discount - 0.05 < 0 THEN -1 ELSE 0 END AS INT) AS disc_sign
FROM lineitem
"""


def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        # ISO day-of-week (Mon=1..Sun=7): same convention both engines
        F.dayofweek(F.col("o_orderdate")).alias("dow_sun1"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_98"
        ),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


SCALAR_DATE_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(day(o_orderdate) AS INT) AS d,
       CAST(quarter(o_orderdate) AS INT) AS q,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98,
       strftime(o_orderdate, '%Y-%m') AS ym
FROM orders
"""


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    )


WINDOW_DISTRIBUTION_SQL = """
SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS quartile,
       round(cume_dist() OVER w, 6) AS cdist,
       round(percent_rank() OVER w, 6) AS prank
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC, o_orderkey ASC)
"""


# --- §2b aggregations: explicit GROUPING SETS ------------------------------
# Shared-text ANSI SQL: the SAME string runs through Spark SQL and
# DuckDB (both implement GROUPING SETS + grouping()); partial totals
# per (returnflag, linestatus), per returnflag, and grand total, with
# grouping flags distinguishing the NULL-label levels. Physically one
# Expand + single hash aggregation in Spark — the same partial+final
# shape as a plain groupBy, scaled by the number of sets.
AGG_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) AS INT) AS g_rf,
       CAST(grouping(l_linestatus) AS INT) AS g_ls,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def _grouping_sets_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.sources.testdata import register_views

    register_views(spark, sf_dir)
    return spark.sql(AGG_GROUPING_SETS_SQL)


# --- §2b windows: batch sessionization (gaps-and-islands) ------------------
# The batch counterpart of stream_session: a new session starts when
# the gap to the previous event of the same user is >= 30 minutes;
# sessions = running sum of session starts. One shuffle on user_id
# serves both window passes (same partitioning), then the per-session
# rollup re-aggregates the islands — the classic sessionization shape
# for event logs at scale. Gap comparison is integer micros on both
# engines (exact).
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_us = F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(
        lag_us.isNull()
        | (F.unix_micros(F.col("ts")) - lag_us >= 30 * 60 * 1_000_000),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = ev.withColumn("ns", new_session).withColumn("sid", F.sum("ns").over(run))
    return sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
    ).select("user_id", "session_start", "n_events")


WINDOW_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL '30 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id, CAST(min(ts) AS TIMESTAMP_NS) AS session_start, count(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


# --- §2b joins: bucketed co-located fact-fact join -------------------------
# The 100 TB lever for REPEATED fact-fact joins: both sides are
# written once as bucketed tables (8 buckets, hash(l_orderkey)), so
# every subsequent join on the bucket key plans with NO shuffle
# exchange — each task reads matching bucket files from both sides
# (sortBy makes the merge sort nearly free too). The staged tables
# are external (temp dir, removed at exit) and memoized per sf.
_BUCKETED_STAGED: set[str] = set()


def _bucketed_name(sf_dir: str, table: str) -> str:
    tag = "".join(ch if ch.isalnum() else "_" for ch in sf_dir)
    return f"chi_bucketed_{table}_{tag}"


def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.streaming.staging import staged_dir

    if sf_dir not in _BUCKETED_STAGED:
        for table, key, cols in (
            ("lineitem", "l_orderkey", ["l_orderkey", "l_quantity", "l_extendedprice"]),
            ("orders", "o_orderkey", ["o_orderkey", "o_orderpriority"]),
        ):
            name = _bucketed_name(sf_dir, table)
            path = staged_dir(f"bucketed_{table}", sf_dir, lambda d: None)
            (
                load_table(spark, sf_dir, table)
                .select(*cols)
                .write.mode("overwrite")
                .option("path", f"{path}/{table}")
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(name)
            )
        _BUCKETED_STAGED.add(sf_dir)
    li = spark.table(_bucketed_name(sf_dir, "lineitem"))
    o = spark.table(_bucketed_name(sf_dir, "orders"))
    j = li.hint("merge").join(o, li["l_orderkey"] == o["o_orderkey"])
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
    )


JOIN_BUCKETED_SQL = """
SELECT o_orderpriority, count(*) AS n,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# --- §2b windows: lag/lead + first/last navigation -------------------------
# Navigation functions over the per-user event timeline. Same single
# shuffle on user_id as window_running; all four functions share one
# window ordering so Spark evaluates them in one Window physical node.
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "user_id",
        "event_id",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.first("event_type").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("first_type"),
        F.last("event_type").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("last_type"),
    )


WINDOW_LAG_LEAD_SQL = """
SELECT user_id, event_id,
       lag(value, 1)  OVER w AS prev_value,
       lead(value, 1) OVER w AS next_value,
       first_value(event_type) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_type,
       last_value(event_type) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


# --- §2b windows: RANGE frame (value-bounded, not row-bounded) --------------
# RANGE BETWEEN N PRECEDING over the integer event_id axis: the frame
# is bounded by key DISTANCE, so per-user gaps in the global event_id
# sequence make it genuinely different from a ROWS frame. Range frames
# include peers deterministically, so no tie-break hazard exists.
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("event_id").asc())
        .rangeBetween(-5000, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_in_range"),
        F.round(F.sum("value").over(w), 6).alias("sum_in_range"),
        F.max("value").over(w).alias("max_in_range"),
    )


WINDOW_RANGE_FRAME_SQL = """
SELECT user_id, event_id,
       count(*)             OVER w AS n_in_range,
       round(sum(value) OVER w, 6) AS sum_in_range,
       max(value)           OVER w AS max_in_range
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC
             RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW)
"""


# --- §2b joins: null-safe equality (<=>) ------------------------------------
# Nullable bucket key (NULL = low-value events); eqNullSafe matches
# NULL keys to NULL dim rows, which a plain equi-join silently drops.
# Physically still a hash equi-join on the (null-safe) key — Spark
# plans <=> as an equi-join condition, not a BNLJ.
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.when(F.col("value") >= 50, F.floor(F.col("value") / 50).cast("long"))
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", k.alias("k")
    )
    dim = (
        e.filter(F.col("event_type") == "purchase")
        .select(k.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_purch"))
    )
    j = clicks.join(F.broadcast(dim), clicks["k"].eqNullSafe(dim["k"]), "left")
    return j.select(clicks["event_id"], clicks["k"].alias("k"), dim["n_purch"])


JOIN_NULLSAFE_SQL = """
WITH clicks AS (
  SELECT event_id,
         CASE WHEN value >= 50 THEN CAST(floor(value / 50) AS BIGINT) END AS k
  FROM events WHERE event_type = 'click'
),
dim AS (
  SELECT CASE WHEN value >= 50 THEN CAST(floor(value / 50) AS BIGINT) END AS k,
         count(*) AS n_purch
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT clicks.event_id, clicks.k AS k, dim.n_purch
FROM clicks LEFT JOIN dim ON clicks.k IS NOT DISTINCT FROM dim.k
"""


# --- §2b scalar fns: array battery ------------------------------------------
# Higher-order array functions (slice/sort/position/join/transform+
# aggregate) — all JVM-side codegen'd expressions, no UDFs. DuckDB's
# list_* family mirrors each (list_position returns NULL when absent,
# hence the coalesce to match Spark's 0).
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.slice(F.split(F.col("text"), " "), 1, 6)
    srt = F.array_sort(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_toks"),
        F.element_at(srt, 1).alias("first_sorted"),
        F.array_join(srt, "-").alias("joined_sorted"),
        F.array_position(toks, "spark").alias("pos_spark"),
        F.array_contains(toks, "spark").alias("has_spark"),
        sum_len.alias("sum_tok_len"),
    )


SCALAR_ARRAY_SQL = """
SELECT doc_id,
       CAST(len(list_slice(string_split(text, ' '), 1, 6)) AS BIGINT) AS n_toks,
       list_sort(list_slice(string_split(text, ' '), 1, 6))[1] AS first_sorted,
       array_to_string(list_sort(list_slice(string_split(text, ' '), 1, 6)), '-')
           AS joined_sorted,
       CAST(coalesce(list_position(list_slice(string_split(text, ' '), 1, 6),
                                   'spark'), 0) AS BIGINT) AS pos_spark,
       list_contains(list_slice(string_split(text, ' '), 1, 6), 'spark') AS has_spark,
       CAST(list_sum(list_transform(list_slice(string_split(text, ' '), 1, 6),
                                    x -> length(x))) AS BIGINT) AS sum_tok_len
FROM documents
"""


# --- §2b aggregations: exact median + deterministic mode --------------------
# Median = exact interpolated percentile (sort-based; at 100 TB the
# approx_percentile sketch is the scale path, checked separately).
# Mode is computed deterministically (count desc, value asc) via a
# two-level aggregation + window rank rather than the engine-native
# mode() whose tie policy differs between engines.
def q_agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("median_price"),
    )
    cnts = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("cnt").desc(), F.col("l_linestatus").asc()
    )
    mode = (
        cnts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_linestatus").alias("mode_linestatus"))
    )
    return med.join(F.broadcast(mode), "l_returnflag")


AGG_MEDIAN_MODE_SQL = """
WITH med AS (
  SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
         round(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
  FROM lineitem GROUP BY l_returnflag
),
cnts AS (
  SELECT l_returnflag, l_linestatus, count(*) AS cnt
  FROM lineitem GROUP BY l_returnflag, l_linestatus
),
mode AS (
  SELECT l_returnflag, l_linestatus AS mode_linestatus
  FROM (SELECT l_returnflag, l_linestatus,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY cnt DESC, l_linestatus ASC) AS rn
        FROM cnts) t
  WHERE rn = 1
)
SELECT med.l_returnflag, median_qty, median_price, mode_linestatus
FROM med JOIN mode ON med.l_returnflag = mode.l_returnflag
"""


# --- nearest as-of join (both directions, tie -> earlier) -------------------
# The OTHER as-of semantics time-series stores ship (QuestDB/kdb
# `asof` is backward; pandas merge_asof(direction='nearest') is
# this): each purchase matches its NEAREST click in time (either
# direction) for the same user, ties on |dt| -> the EARLIER click,
# and a miss if no click is within ASOF_NEAREST_TOL_US. Same
# union-marker window plan as join_scd2_pit — the prev pick is a
# growing ignore-nulls window, the next pick the reversed-order
# growing window (NEVER a shrinking (1, unboundedFollowing) frame:
# that is recomputed per row, the timeseries_interpolate lesson) —
# so there is NO data-sized join at all: one shuffle on user_id.
# Parity: dt comparison and the tie rule are exact integer micros.
ASOF_NEAREST_TOL_US = 48 * 3600 * 1_000_000


def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    marked = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        F.when(F.col("event_type") == "click", F.col("event_id")).alias(
            "click_id"
        ),
        F.when(F.col("event_type") == "click", F.unix_micros("ts")).alias(
            "click_us"
        ),
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t_us").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = (
        marked.select(
            "*",
            F.last("click_id", ignorenulls=True).over(w_prev).alias("p_id"),
            F.last("click_us", ignorenulls=True).over(w_prev).alias("p_us"),
            F.last("click_id", ignorenulls=True).over(w_next).alias("n_id"),
            F.last("click_us", ignorenulls=True).over(w_next).alias("n_us"),
        )
        .filter(F.col("is_purchase"))
    )
    dp = F.col("t_us") - F.col("p_us")  # >= 0 when present
    dn = F.col("n_us") - F.col("t_us")  # >= 0 when present
    pick_prev = F.col("p_us").isNotNull() & (
        F.col("n_us").isNull() | (dp <= dn)  # tie -> earlier (prev)
    )
    nearest_id = F.when(pick_prev, F.col("p_id")).otherwise(F.col("n_id"))
    nearest_dt = F.when(pick_prev, dp).otherwise(dn)
    return d.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(
            nearest_dt <= ASOF_NEAREST_TOL_US, nearest_id
        ).alias("nearest_click_id"),
        F.when(nearest_dt <= ASOF_NEAREST_TOL_US, nearest_dt).alias("dt_us"),
    )


JOIN_ASOF_NEAREST_SQL = f"""
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS t_us, event_id,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
         CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us,
         event_type = 'purchase' AS is_purchase
  FROM events WHERE event_type IN ('click', 'purchase')
),
picked AS (
  SELECT *,
         last_value(click_id IGNORE NULLS) OVER wp AS p_id,
         last_value(click_us IGNORE NULLS) OVER wp AS p_us,
         last_value(click_id IGNORE NULLS) OVER wn AS n_id,
         last_value(click_us IGNORE NULLS) OVER wn AS n_us
  FROM marked
  WINDOW wp AS (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wn AS (PARTITION BY user_id ORDER BY t_us DESC, event_id DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
chosen AS (
  SELECT event_id AS purchase_id, user_id,
         CASE WHEN p_us IS NOT NULL
                   AND (n_us IS NULL OR t_us - p_us <= n_us - t_us)
              THEN p_id ELSE n_id END AS nearest_id,
         CASE WHEN p_us IS NOT NULL
                   AND (n_us IS NULL OR t_us - p_us <= n_us - t_us)
              THEN t_us - p_us ELSE n_us - t_us END AS nearest_dt
  FROM picked WHERE is_purchase
)
SELECT purchase_id, user_id,
       CASE WHEN nearest_dt <= {ASOF_NEAREST_TOL_US}
            THEN nearest_id END AS nearest_click_id,
       CASE WHEN nearest_dt <= {ASOF_NEAREST_TOL_US}
            THEN nearest_dt END AS dt_us
FROM chosen
"""



# --- multiset set operations (ALL variants) ----------------------------------
# EXCEPT ALL / INTERSECT ALL keep MULTIPLICITY (bag semantics:
# max(m_a - m_b, 0) and min(m_a, m_b) copies respectively) — a
# genuinely different operator from the DISTINCT set-ops above, and
# the one dedup accounting actually needs ("how many EXTRA copies
# does corpus A have"). Spark's exceptAll/intersectAll plan as a
# count-aggregate + generator (no row-pair join); the aggregated
# projection below keeps the oracle order-free. Scale: one hash agg
# per side on the value key.


def q_setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select(F.col("l_partkey").alias("k"))
    b = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("k")
    )
    return (
        a.exceptAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_extra"))
    )


SETOP_EXCEPT_ALL_SQL = """
WITH diff AS (
  SELECT l_partkey AS k FROM lineitem
  EXCEPT ALL
  SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'
)
SELECT k, CAST(count(*) AS BIGINT) AS n_extra FROM diff GROUP BY k
"""


def q_setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linestatus") == "F").select(
        F.col("l_partkey").alias("k")
    )
    b = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_partkey").alias("k")
    )
    return (
        a.intersectAll(b)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


SETOP_INTERSECT_ALL_SQL = """
WITH common AS (
  SELECT l_partkey AS k FROM lineitem WHERE l_linestatus = 'F'
  INTERSECT ALL
  SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R'
)
SELECT k, CAST(count(*) AS BIGINT) AS n_common FROM common GROUP BY k
"""



def register_all() -> None:
    register("window_lag_lead", q_window_lag_lead, WINDOW_LAG_LEAD_SQL)
    register("window_range_frame", q_window_range_frame, WINDOW_RANGE_FRAME_SQL)
    register("join_nullsafe", q_join_nullsafe, JOIN_NULLSAFE_SQL)
    register("scalar_array_funcs", q_scalar_array, SCALAR_ARRAY_SQL)
    register("agg_median_mode", q_agg_median_mode, AGG_MEDIAN_MODE_SQL)
    register("scalar_string_funcs", q_scalar_string, SCALAR_STRING_SQL)
    register("scalar_math_funcs", q_scalar_math, SCALAR_MATH_SQL)
    register("scalar_date_funcs", q_scalar_date, SCALAR_DATE_SQL)
    register("window_distribution", q_window_distribution, WINDOW_DISTRIBUTION_SQL)
    register("agg_value_stats", q_agg_value_stats, AGG_VALUE_STATS_SQL)
    register("join_asof", q_join_asof, JOIN_ASOF_SQL)
    register("setop_except_all", q_setop_except_all, SETOP_EXCEPT_ALL_SQL)
    register(
        "setop_intersect_all", q_setop_intersect_all, SETOP_INTERSECT_ALL_SQL
    )
    register("join_asof_nearest", q_join_asof_nearest, JOIN_ASOF_NEAREST_SQL)
    register("agg_grouping_sets", _grouping_sets_query, AGG_GROUPING_SETS_SQL)
    register("window_session", q_window_session, WINDOW_SESSION_SQL)
    register("join_bucketed", q_join_bucketed, JOIN_BUCKETED_SQL)
    register("unpivot_measures", q_unpivot, UNPIVOT_SQL)
    register("agg_pivot", q_agg_pivot, AGG_PIVOT_SQL)
    register("agg_percentile", q_agg_percentile, AGG_PERCENTILE_SQL)
    register("agg_approx_distinct", q_agg_approx_distinct, AGG_APPROX_DISTINCT_SQL)
    register("agg_hll_union", q_agg_hll_union, AGG_HLL_UNION_SQL)
    register("agg_approx_percentile", q_agg_approx_percentile, AGG_APPROX_PERCENTILE_SQL)
    register("join_salted", q_join_salted, JOIN_SALTED_SQL)
    register("join_salted_skew", q_join_salted_skew, JOIN_SALTED_SKEW_SQL)
    register("join_outer", q_join_outer, JOIN_OUTER_SQL)
    register("join_cross", q_join_cross, JOIN_CROSS_SQL)
    register("setop_intersect", q_setop_intersect, SETOP_INTERSECT_SQL)
    register("agg_cube", q_agg_cube, AGG_CUBE_SQL)
    register("scan_source", q_scan_source, SCAN_SOURCE_SQL)
    register("project_encode", q_project_encode, PROJECT_ENCODE_SQL)
    register("filter_valid", q_filter_valid, FILTER_VALID_SQL)
    register("filter_pred", q_filter_pred, FILTER_PRED_SQL)
    register("agg_pricing_summary", q_pricing_summary, PRICING_SUMMARY_SQL)
    register("agg_rollup", q_agg_rollup, AGG_ROLLUP_SQL)
    register("agg_distinct", q_agg_distinct, AGG_DISTINCT_SQL)
    register("setop_union", q_setop_union, SETOP_UNION_SQL)
    register("setop_except", q_setop_except, SETOP_EXCEPT_SQL)
    register("join_broadcast", q_join_broadcast, JOIN_BROADCAST_SQL)
    register("join_sortmerge", q_join_sortmerge, JOIN_SORTMERGE_SQL)
    register("join_runtime_bloom", q_join_runtime_bloom, JOIN_RUNTIME_BLOOM_SQL)
    register("join_semi", q_join_semi, JOIN_SEMI_SQL)
    register("join_anti", q_join_anti, JOIN_ANTI_SQL)
    register("join_range", q_join_range, JOIN_RANGE_SQL)
    register("window_rank", q_window_rank, WINDOW_RANK_SQL)
    register("window_running", q_window_running, WINDOW_RUNNING_SQL)
    register("topk_global", q_topk_global, TOPK_GLOBAL_SQL)
    register("date_bucket", q_date_bucket, DATE_BUCKET_SQL)
    register("json_extract", q_json_extract, JSON_EXTRACT_SQL)
