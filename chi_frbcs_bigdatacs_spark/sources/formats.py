"""Source/sink format coverage beyond parquet (SURVEY §2b scans/sinks).

The reference reads HDFS text (KEEL); a general engine needs CSV and
JSON-lines sources with DECLARED schemas (never inferSchema — schema
binding is compile-time, SURVEY §1 D2) and partitioned columnar
sinks. Queries here stage a deterministic derivation of the testdata
into a temp dir in the requested format, read it back through the
distributed reader, and aggregate — the oracle computes the same
aggregate straight from the base table, so the round-trip through the
format is what is actually checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.plans.registry import register
from chi_frbcs_bigdatacs_spark.sources.testdata import load_table
from chi_frbcs_bigdatacs_spark.streaming.staging import staged_dir

NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"


def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation -> csv -> declared-schema distributed read -> agg."""
    n = load_table(spark, sf_dir, "nation")
    path = staged_dir(
        "csv_nation",
        sf_dir,
        lambda d: n.write.mode("overwrite").option("header", True).csv(d),
    )
    back = spark.read.schema(NATION_SCHEMA).option("header", True).csv(path)
    return back.groupBy("n_regionkey").agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
    )


SCAN_CSV_SQL = """
SELECT n_regionkey, count(*) AS n_nations, min(n_name) AS first_name
FROM nation GROUP BY n_regionkey
"""


def q_scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier -> json-lines -> declared-schema read -> agg."""
    s = load_table(spark, sf_dir, "supplier")
    path = staged_dir(
        "jsonl_supplier", sf_dir, lambda d: s.write.mode("overwrite").json(d)
    )
    back = spark.read.schema(
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    ).json(path)
    return back.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_bal"),
    )


SCAN_JSONL_SQL = """
SELECT s_nationkey, count(*) AS n_supp,
       CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM supplier GROUP BY s_nationkey
"""


def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part -> ORC -> distributed read -> agg. ORC round-trip keeps
    the declared schema (vectorized ORC reader, predicate pushdown at
    scale); the oracle computes the aggregate from the base table."""
    p = load_table(spark, sf_dir, "part")
    path = staged_dir(
        "orc_part", sf_dir, lambda d: p.write.mode("overwrite").orc(d)
    )
    back = spark.read.orc(path)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("p_retailprice").cast("decimal(18,2)")).cast("double").alias(
            "sum_price"
        ),
    )


SCAN_ORC_SQL = """
SELECT p_brand, count(*) AS n_parts,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM part GROUP BY p_brand
"""


def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> parquet partitioned by returnflag -> partition-pruned
    read-back. The read of ONE partition directory proves partition
    layout; the oracle filters the base table the same way."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = staged_dir(
        "part_lineitem",
        sf_dir,
        lambda d: li.write.mode("overwrite").partitionBy("l_returnflag").parquet(d),
    )
    back = spark.read.parquet(path).filter(F.col("l_returnflag") == "R")
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


SINK_PARTITIONED_SQL = """
SELECT count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem WHERE l_returnflag = 'R'
"""


KEEL_VOCAB = ("F", "O", "P")  # declared nominal vocab, header order


def _build_keel_orders(sf_dir: str):
    """Builder for the staged orders .dat (header + @data CSV + two
    poison rows exercising the O4 drop policy)."""

    def build(d: str) -> None:
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_totalprice", "o_orderstatus"],
        )
        with open(f"{d}/orders.dat", "w") as fh:
            fh.write("@relation orders\n")
            fh.write("@attribute o_orderkey real [0.0, 1.0e9]\n")
            fh.write("@attribute o_totalprice real [0.0, 1000000.0]\n")
            fh.write("@attribute o_orderstatus {F, O, P}\n")
            fh.write("@inputs o_orderkey, o_totalprice\n")
            fh.write("@outputs o_orderstatus\n")
            fh.write("@data\n")
            fh.write("999999999,?,O\n")  # missing value -> dropped (O4)
            fh.write("1,2\n")  # wrong arity -> DROPMALFORMED (O4)
            for k, p, s in zip(
                t["o_orderkey"].to_pylist(),
                t["o_totalprice"].to_pylist(),
                t["o_orderstatus"].to_pylist(),
            ):
                # repr() round-trips doubles exactly through the CSV read
                fh.write(f"{k},{p!r},{s}\n")

    return build


def q_scan_keel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEEL text source end-to-end (O1/O2/O3/O4): stage orders as a
    .dat file (header + @data CSV), parse the header driver-side,
    read @data with the DECLARED schema through the distributed CSV
    reader, dictionary-encode the nominal column from the declared
    vocab, and drop `?`-missing / malformed rows. Two poison rows are
    injected into the staged file (a `?` missing value and a
    wrong-arity line) — the oracle reads the clean base table, so the
    hash check proves both the round-trip AND the drop policy
    [REF: data/DataLoader.java, data/DataConverter.java | conf=M]."""
    from chi_frbcs_bigdatacs_spark.sources.keel import encode_nominal, read_keel

    path = staged_dir("keel_orders", sf_dir, _build_keel_orders(sf_dir))
    df, ds = read_keel(spark, f"{path}/orders.dat")
    return encode_nominal(df, ds).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )


SCAN_KEEL_SQL = """
SELECT CAST(o_orderkey AS DOUBLE) AS o_orderkey,
       o_totalprice,
       CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 WHEN 'P' THEN 2 END
           AS o_orderstatus
FROM orders
"""


def q_sink_keel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEEL text SINK round-trip (the write half of O1/O12): read the
    staged orders .dat, serialize it back out through the distributed
    KEEL writer (header regenerated from the parsed descriptor, rows
    via shortest-round-trip double repr), read the COPY, encode, and
    aggregate. The oracle aggregates the clean base table, so the
    hash check proves write->read reproduces the exact doubles and
    vocab codes."""
    from chi_frbcs_bigdatacs_spark.sources.keel import (
        encode_nominal,
        read_keel,
        write_keel,
    )

    src = staged_dir("keel_orders", sf_dir, _build_keel_orders(sf_dir))
    df, ds = read_keel(spark, f"{src}/orders.dat")

    def build_copy(d: str) -> None:
        write_keel(df, ds, f"{d}/orders_copy.dat")

    copy = staged_dir("keel_orders_copy", sf_dir, build_copy)
    back, ds2 = read_keel(spark, f"{copy}/orders_copy.dat")
    enc = encode_nominal(back, ds2)
    return enc.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.round(F.sum("o_orderkey"), 6).alias("sum_key"),
    )


SINK_KEEL_SQL = """
SELECT CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1 WHEN 'P' THEN 2 END
           AS o_orderstatus,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       round(sum(CAST(o_orderkey AS DOUBLE)), 6) AS sum_key
FROM orders
GROUP BY 1
"""


def _build_keel_lineitem_variant(sf_dir: str):
    """Builder for a staged lineitem .dat whose header exercises EVERY
    grammar variant the parser accepts (VERDICT r10 #5): half-open
    `[a, b)` and `(a, b]` bounds, the ARFF `numeric` synonym, a
    rangeless `real` passthrough column, and an INTEGER-CODED nominal
    vocab (`integer {1..7}` binds as nominal over the integer
    literals, not as a rangeless integer)."""

    def build(d: str) -> None:
        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_orderkey",
                "l_quantity",
                "l_extendedprice",
                "l_linenumber",
            ],
        )
        with open(f"{d}/lineitem_v.dat", "w") as fh:
            fh.write("@relation lineitem_variant\n")
            fh.write("@attribute l_orderkey numeric [0.0, 1.0e9)\n")
            fh.write("@attribute l_quantity real (0.0, 51.0]\n")
            fh.write("@attribute l_extendedprice real\n")
            fh.write(
                "@attribute l_linenumber integer {1, 2, 3, 4, 5, 6, 7}\n"
            )
            fh.write("@inputs l_orderkey, l_quantity\n")
            fh.write("@outputs l_linenumber\n")
            fh.write("@data\n")
            fh.write("7,?,1.0,1\n")  # missing value -> dropped (O4)
            fh.write("8,9\n")  # wrong arity -> DROPMALFORMED (O4)
            for k, q, p, ln in zip(
                t["l_orderkey"].to_pylist(),
                t["l_quantity"].to_pylist(),
                t["l_extendedprice"].to_pylist(),
                t["l_linenumber"].to_pylist(),
            ):
                fh.write(f"{k},{q!r},{p!r},{ln}\n")

    return build


def q_scan_keel_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scan_keel twin over the VARIANT header grammar: the staged
    header declares `numeric [a, b)`, `real (a, b]`, a rangeless
    `real`, and an integer-coded nominal vocab — every form the
    parser's grammar-robustness note promises. The integer vocab
    column dictionary-encodes over DECLARED order (value 1 -> code 0,
    ... 7 -> 6), which the oracle states as l_linenumber - 1; the
    hash check therefore certifies the variant grammar END TO END
    (parse -> declared-schema CSV read -> vocab encode -> drop
    policy), not just at the parse_header unit level."""
    from chi_frbcs_bigdatacs_spark.sources.keel import encode_nominal, read_keel

    path = staged_dir(
        "keel_lineitem_variant", sf_dir, _build_keel_lineitem_variant(sf_dir)
    )
    df, ds = read_keel(spark, f"{path}/lineitem_v.dat")
    enc = encode_nominal(df, ds)
    return enc.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.round(F.sum("l_orderkey"), 6).alias("sum_key"),
    )


SCAN_KEEL_VARIANT_SQL = """
SELECT CAST(l_linenumber - 1 AS INT) AS l_linenumber,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       round(sum(CAST(l_orderkey AS DOUBLE)), 6) AS sum_key
FROM lineitem
GROUP BY 1
"""


# --- shared-text ANSI SQL: the SAME string runs in Spark SQL and DuckDB ----
SQL_Q3 = """
SELECT o_orderkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

SQL_Q5 = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


SQL_Q6 = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= CAST('1996-01-01' AS TIMESTAMP)
  AND l_shipdate <  CAST('1997-01-01' AS TIMESTAMP)
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- schema fingerprint: self-documenting testdata observation -------------
# One row per (table, column) with the type NORMALIZED to DuckDB
# spelling, observed from the actual parquet files (schema inference
# only — no data scan). Registered as a checked key so every
# CORRECTNESS_r{N} artifact records which testdata GENERATION it ran
# against: when the driver regenerates data with different physical
# types (r3 post-mortem: events.ts NANOS -> us), this key's hash
# changes in the artifact itself. Complements the local pin in
# tests/test_testdata_contract.py.

_SPARK_TO_DUCK_TYPE = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "string": "VARCHAR",
    "double": "DOUBLE",
    "float": "FLOAT",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "date": "DATE",
    "boolean": "BOOLEAN",
    "array<float>": "FLOAT[]",
    "array<double>": "DOUBLE[]",
    "array<string>": "VARCHAR[]",
}


def q_schema_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.sources.testdata import TABLES

    rows = []
    for t in sorted(TABLES):
        schema = spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
        for f in schema.fields:
            s = f.dataType.simpleString()
            rows.append((t, f.name, _SPARK_TO_DUCK_TYPE.get(s, s.upper())))
    return spark.createDataFrame(rows, "tbl string, col string, dtype string")


def _schema_fingerprint_sql() -> str:
    from chi_frbcs_bigdatacs_spark.sources.testdata import TABLES

    return "\nUNION ALL\n".join(
        f"SELECT '{t}' AS tbl, column_name AS col, column_type AS dtype\n"
        f"FROM (DESCRIBE SELECT * FROM {t})"
        for t in sorted(TABLES)
    )


def _sql_query(sql: str):
    from chi_frbcs_bigdatacs_spark.sources.testdata import register_views

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


# --- partition-pruned scan (hive-layout directory source) ------------------
# The 100 TB access-path primitive: lineitem written once as a
# hive-partitioned directory tree (partitionBy l_returnflag), read
# back with a partition-key predicate. The filter resolves at PLANNING
# time against directory names — the scan lists and reads ONLY the
# matching partition (tests/test_plans pin `PartitionFilters` in the
# physical plan), so the same query on a date-partitioned 100 TB
# table touches one day, not the table.


def q_scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.streaming.staging import staged_dir

    src = staged_dir(
        "lineitem_byflag",
        sf_dir,
        lambda d: spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .write.partitionBy("l_returnflag")
        .mode("overwrite")
        .parquet(d),
    )
    return (
        spark.read.parquet(src)
        .filter(F.col("l_returnflag") == "R")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr(
                "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
            ).alias("sum_price"),
        )
    )


SCAN_PARTITION_PRUNED_SQL = """
SELECT count(*) AS n_rows,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem WHERE l_returnflag = 'R'
"""


# --- DYNAMIC partition pruning (runtime-filter star join) -------------------
# scan_partition_pruned proves planning-time pruning (the predicate
# names the partition key literally). The complement every warehouse
# query needs: the partition predicate arrives through a JOIN — fact
# hive-partitioned by the join key, dim filtered on an attribute —
# and Catalyst injects a DynamicPruningExpression into the fact
# scan's PartitionFilters, reusing the broadcast dim to enumerate the
# surviving partitions at RUNTIME. On a date-partitioned 100 TB fact
# this is what turns "join against this month's dim rows" into a
# 30-directory read instead of a full scan
# (tests/test_plans.py pins dynamicpruning in the scan).


def q_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    src = staged_dir(
        "customer_bynation",
        sf_dir,
        lambda d: cust.write.partitionBy("c_nationkey").mode("overwrite").parquet(d),
    )
    fact = spark.read.parquet(src)
    dim = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    return (
        fact.join(F.broadcast(dim), fact["c_nationkey"] == dim["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_bal"),
        )
    )


JOIN_DPP_SQL = """
SELECT n_name, count(*) AS n_cust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE n_regionkey = 1
GROUP BY n_name
"""


def register_all() -> None:
    register("scan_csv", q_scan_csv, SCAN_CSV_SQL)
    register("scan_jsonl", q_scan_jsonl, SCAN_JSONL_SQL)
    register("scan_orc", q_scan_orc, SCAN_ORC_SQL)
    register("scan_keel", q_scan_keel, SCAN_KEEL_SQL)
    register("scan_keel_variant", q_scan_keel_variant, SCAN_KEEL_VARIANT_SQL)
    register("sink_keel", q_sink_keel, SINK_KEEL_SQL)
    register("sink_partitioned", q_sink_partitioned, SINK_PARTITIONED_SQL)
    register(
        "scan_partition_pruned", q_scan_partition_pruned, SCAN_PARTITION_PRUNED_SQL
    )
    register("join_dpp", q_join_dpp, JOIN_DPP_SQL)
    register("sql_q3", _sql_query(SQL_Q3), SQL_Q3)
    register("sql_q5", _sql_query(SQL_Q5), SQL_Q5)
    register("sql_q6", _sql_query(SQL_Q6), SQL_Q6)
    register("schema_fingerprint", q_schema_fingerprint, _schema_fingerprint_sql())
