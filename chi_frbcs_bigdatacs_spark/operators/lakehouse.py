"""Lakehouse table-maintenance operators (round 7).

The mutation half of a production table format (Delta/Iceberg/Hudi
expose these as MERGE INTO, snapshot diff, and privacy deletes):
apply a CDC changeset to a snapshot, diff two snapshots, and cascade
a GDPR erasure request through the FK graph. All three are pure
DataFrame plans — one key-partitioned join per table touched, no
driver-side row handling — so they hold at 100 TB where the
changeset is a few million rows against a multi-billion-row target
(the merge join shuffles on the table key; Catalyst/AQE broadcasts
the changeset side automatically when it is small enough).

Fixture design: the changeset is DERIVED deterministically from the
orders table itself (modulus predicates on o_orderkey), so both
engines construct bit-identical inputs with no side files and the
merge exercises every MERGE branch at every sf: inserts (keys held
out of the target snapshot), updates, deletes, and untouched rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.plans.registry import register
from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

# --- MERGE INTO (CDC upsert apply) -------------------------------------------
# Target snapshot = orders with o_orderkey % 10 < 8 (the other 20% of
# keys are "future" rows arriving via the changeset). Changeset ops,
# first match wins (each key appears at most once):
#   o_orderkey % 10 >= 8          -> 'I' insert (key absent from target)
#   o_orderkey % 13 == 0          -> 'D' delete
#   o_orderkey %  7 == 0          -> 'U' update (status -> 'R', price += 1.00)
# Merge semantics are ANSI MERGE: matched+U updates, matched+D
# deletes, unmatched+I inserts; I against an existing key or U/D
# against a missing key cannot occur by construction. Shape: ONE full
# outer join on the table key (sort-merge at scale; AQE broadcasts
# small changesets) followed by a map-side CASE projection.
_MERGE_UPDATE_STATUS = "R"


def _target(o: DataFrame) -> DataFrame:
    return o.filter(F.col("o_orderkey") % 10 < 8)


def _cdc_op():
    """The ONE definition of the key-derived changeset op (%10>=8 I,
    %13 D, %7 U) — every CDC fixture (sum-MV, minmax-MV, MERGE,
    streaming twins) must derive from this and _CDC_OP_CASE_SQL so
    the documented 'same changeset' property cannot drift."""
    k = F.col("o_orderkey")
    return (
        F.when(k % 10 >= 8, F.lit("I"))
        .when(k % 13 == 0, F.lit("D"))
        .when(k % 7 == 0, F.lit("U"))
    )


_CDC_OP_CASE_SQL = """CASE WHEN o_orderkey % 10 >= 8 THEN 'I'
              WHEN o_orderkey % 13 = 0 THEN 'D'
              WHEN o_orderkey % 7 = 0 THEN 'U' END"""


def _changeset(o: DataFrame) -> DataFrame:
    op = _cdc_op()
    return (
        o.select(
            "o_orderkey",
            op.alias("op"),
            F.when(op == "U", F.lit(_MERGE_UPDATE_STATUS))
            .otherwise(F.col("o_orderstatus"))
            .alias("c_status"),
            F.when(op == "U", F.col("o_totalprice") + F.lit(1.0))
            .otherwise(F.col("o_totalprice"))
            .alias("c_price"),
        )
        .filter(F.col("op").isNotNull())
    )


def merged_snapshot(o: DataFrame) -> DataFrame:
    """Apply the derived changeset to the derived target snapshot."""
    t = _target(o).select(
        F.col("o_orderkey").alias("t_key"),
        F.col("o_orderstatus").alias("t_status"),
        F.col("o_totalprice").alias("t_price"),
    )
    c = _changeset(o).select(
        F.col("o_orderkey").alias("c_key"), "op", "c_status", "c_price"
    )
    j = t.join(c, t["t_key"] == c["c_key"], "full_outer")
    return (
        j.filter(~(F.col("op").eqNullSafe(F.lit("D"))))
        .select(
            F.coalesce("t_key", "c_key").alias("o_orderkey"),
            F.when(F.col("op") == "U", F.col("c_status"))
            .when(F.col("op") == "I", F.col("c_status"))
            .otherwise(F.col("t_status"))
            .alias("o_orderstatus"),
            F.when(F.col("op") == "U", F.col("c_price"))
            .when(F.col("op") == "I", F.col("c_price"))
            .otherwise(F.col("t_price"))
            .alias("o_totalprice"),
            F.when(F.col("op") == "I", F.lit("insert"))
            .when(F.col("op") == "U", F.lit("update"))
            .otherwise(F.lit("keep"))
            .alias("merge_action"),
        )
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return merged_snapshot(load_table(spark, sf_dir, "orders"))


_CHANGESET_SQL = f"""
SELECT o_orderkey AS c_key, op,
       CASE WHEN op = 'U' THEN '{_MERGE_UPDATE_STATUS}' ELSE o_orderstatus END AS c_status,
       CASE WHEN op = 'U' THEN o_totalprice + 1.0 ELSE o_totalprice END AS c_price
FROM (
  SELECT *,
         {_CDC_OP_CASE_SQL} AS op
  FROM orders) s
WHERE op IS NOT NULL
"""

_MERGED_SQL = f"""
SELECT coalesce(t_key, c_key) AS o_orderkey,
       CASE WHEN op IN ('U', 'I') THEN c_status ELSE t_status END AS o_orderstatus,
       CASE WHEN op IN ('U', 'I') THEN c_price ELSE t_price END AS o_totalprice,
       CASE WHEN op = 'I' THEN 'insert'
            WHEN op = 'U' THEN 'update'
            ELSE 'keep' END AS merge_action
FROM (SELECT o_orderkey AS t_key, o_orderstatus AS t_status,
             o_totalprice AS t_price
      FROM orders WHERE o_orderkey % 10 < 8) t
FULL OUTER JOIN ({_CHANGESET_SQL}) c ON t.t_key = c.c_key
WHERE op IS DISTINCT FROM 'D'
"""

MERGE_UPSERT_SQL = _MERGED_SQL


# --- snapshot diff -----------------------------------------------------------
# Generic table-format diff between two snapshot versions (what
# Delta's DESCRIBE HISTORY + CDF exposes): full outer join on the
# primary key, rows classified added / removed / changed by NULL-safe
# column comparison — NEVER by stringified row hash, because float ->
# string formatting is engine-specific. Unchanged rows are dropped so
# the output stays changeset-sized at any table size; the only
# shuffle is the PK join.
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = _target(o).select(
        F.col("o_orderkey").alias("a_key"),
        F.col("o_orderstatus").alias("a_status"),
        F.col("o_totalprice").alias("a_price"),
    )
    b = merged_snapshot(o).select(
        F.col("o_orderkey").alias("b_key"),
        F.col("o_orderstatus").alias("b_status"),
        F.col("o_totalprice").alias("b_price"),
    )
    j = a.join(b, a["a_key"] == b["b_key"], "full_outer")
    status = (
        F.when(F.col("a_key").isNull(), F.lit("added"))
        .when(F.col("b_key").isNull(), F.lit("removed"))
        .when(
            ~F.col("a_status").eqNullSafe(F.col("b_status"))
            | ~F.col("a_price").eqNullSafe(F.col("b_price")),
            F.lit("changed"),
        )
        .otherwise(F.lit("same"))
    )
    return (
        j.select(F.coalesce("a_key", "b_key").alias("o_orderkey"), status.alias("diff"))
        .filter(F.col("diff") != "same")
    )


TABLE_DIFF_SQL = f"""
SELECT coalesce(a_key, b_key) AS o_orderkey,
       CASE WHEN a_key IS NULL THEN 'added'
            WHEN b_key IS NULL THEN 'removed'
            WHEN a_status IS DISTINCT FROM b_status
                 OR a_price IS DISTINCT FROM b_price THEN 'changed'
            ELSE 'same' END AS diff
FROM (SELECT o_orderkey AS a_key, o_orderstatus AS a_status,
             o_totalprice AS a_price
      FROM orders WHERE o_orderkey % 10 < 8) a
FULL OUTER JOIN (
  SELECT o_orderkey AS b_key, o_orderstatus AS b_status,
         o_totalprice AS b_price
  FROM ({_MERGED_SQL}) m) b ON a.a_key = b.b_key
WHERE (CASE WHEN a_key IS NULL THEN 'added'
            WHEN b_key IS NULL THEN 'removed'
            WHEN a_status IS DISTINCT FROM b_status
                 OR a_price IS DISTINCT FROM b_price THEN 'changed'
            ELSE 'same' END) <> 'same'
"""


# --- GDPR cascade delete audit -----------------------------------------------
# Right-to-erasure propagation through the FK graph: erasing a set of
# customers must also erase their orders and those orders' lineitems.
# The audit reports, per table, total rows, rows deleted by the
# cascade, and rows remaining — computed with ONE left-semi-shaped
# membership join per FK hop (the erased-key sets are tiny relative
# to the facts, so Catalyst broadcasts them; at 100 TB this is the
# standard broadcast anti-join delete). No row is ever collected.
def q_delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    erased_c = cust.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    erased_o = orders.join(
        erased_c, orders["o_custkey"] == erased_c["c_custkey"], "left_semi"
    ).select("o_orderkey")
    parts = []
    for label, table, key_col, erased, ekey in (
        ("customer", cust, "c_custkey", erased_c, "c_custkey"),
        ("orders", orders, "o_custkey", erased_c, "c_custkey"),
        ("lineitem", li, "l_orderkey", erased_o, "o_orderkey"),
    ):
        hit = table.join(
            erased.withColumnRenamed(ekey, "__ek"),
            table[key_col] == F.col("__ek"),
            "left_outer",
        )
        parts.append(
            hit.agg(
                F.lit(label).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col("__ek").isNotNull(), 1).otherwise(0)).alias(
                    "n_deleted"
                ),
                F.sum(F.when(F.col("__ek").isNull(), 1).otherwise(0)).alias(
                    "n_remaining"
                ),
            )
        )
    return reduce(lambda x, y: x.unionByName(y), parts)


DELETE_CASCADE_SQL = """
WITH erased_c AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
     erased_o AS (SELECT o_orderkey FROM orders
                  WHERE o_custkey IN (SELECT c_custkey FROM erased_c))
SELECT 'customer' AS table_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN e.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
       CAST(sum(CASE WHEN e.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_remaining
FROM customer c LEFT JOIN erased_c e ON c.c_custkey = e.c_custkey
UNION ALL
SELECT 'orders',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN e.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN e.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders o LEFT JOIN erased_c e ON o.o_custkey = e.c_custkey
UNION ALL
SELECT 'lineitem',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN e.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN e.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem l LEFT JOIN erased_o e ON l.l_orderkey = e.o_orderkey
"""


# --- small-files compaction --------------------------------------------------
# The OPTIMIZE/rewrite-data-files maintenance job every table format
# schedules: a directory fragmented into many small parquet files
# (here: a staged 64-file layout of lineitem — the shape a streaming
# sink or over-parallel write leaves behind) is rewritten into a few
# right-sized files. Compaction is one read + round-robin
# repartition + write — no shuffle key, so the exchange is pure
# coalescing; at 100 TB this runs per-partition-directory with file
# counts chosen from target_bytes / avg_row_size. The audit row
# proves the contract: before/after file counts (repartition(n)
# writes exactly n non-empty parts when rows >> n) and exact row
# conservation — the oracle pins the same three numbers from the
# raw table.
COMPACT_SRC_FILES = 64
COMPACT_TARGET_FILES = 4


def q_maintenance_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob

    from chi_frbcs_bigdatacs_spark.streaming.staging import staged_dir

    def build_small(d: str) -> None:
        load_table(spark, sf_dir, "lineitem").repartition(
            COMPACT_SRC_FILES
        ).write.mode("overwrite").parquet(d)

    small = staged_dir("smallfiles", sf_dir, build_small)

    def build_compact(d: str) -> None:
        spark.read.parquet(small).repartition(COMPACT_TARGET_FILES).write.mode(
            "overwrite"
        ).parquet(d)

    compacted = staged_dir("compacted", sf_dir, build_compact)
    n_before = len(glob.glob(f"{small}/part-*.parquet"))
    n_after = len(glob.glob(f"{compacted}/part-*.parquet"))
    n_rows = spark.read.parquet(compacted).count()
    return spark.createDataFrame(
        [(n_before, n_after, n_rows)],
        "n_files_before long, n_files_after long, n_rows long",
    )


MAINTENANCE_COMPACT_SQL = f"""
SELECT CAST({COMPACT_SRC_FILES} AS BIGINT) AS n_files_before,
       CAST({COMPACT_TARGET_FILES} AS BIGINT) AS n_files_after,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
"""


# --- schema-evolution scan ----------------------------------------------------
# The other table-format staple: a table whose newer files carry an
# ADDED column must still read as ONE relation, with the old files
# null-filling the new column (Delta/Iceberg "add column" semantics;
# in plain Spark, parquet mergeSchema=true). The fixture stages two
# parquet files DERIVED deterministically from documents — even
# doc_ids in the v1 file (doc_id, lang, n_chars), odd doc_ids in the
# v2 file with an added BIGINT quality_score = doc_id % 100 — so the
# oracle recomputes the merged-read aggregate from the documents view
# alone, proving the mergeSchema read neither drops rows, misaligns
# columns, nor fabricates values. Scale: schema merge is a
# footer-only planning step; the scan itself stays pushdown-pruned.


def q_scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.streaming.staging import staged_dir

    def build(d: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        v1 = docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "lang", "n_chars"
        )
        v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id",
            "lang",
            "n_chars",
            (F.col("doc_id") % 100).alias("quality_score"),
        )
        v1.coalesce(1).write.parquet(f"{d}/v1")
        v2.coalesce(1).write.parquet(f"{d}/v2")

    src = staged_dir("schema_evo", sf_dir, build)
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("quality_score").isNull().cast("long")).alias(
            "n_null_quality"
        ),
        F.sum(F.coalesce(F.col("quality_score"), F.lit(0))).alias(
            "sum_quality"
        ),
        F.sum("n_chars").alias("sum_chars"),
    )


SCAN_SCHEMA_EVOLUTION_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_quality,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN doc_id % 100 ELSE 0 END)
            AS BIGINT) AS sum_quality,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY lang
"""



# --- incremental materialized-view maintenance (r13) --------------------------
# The aggregate-MV refresh every lakehouse runs nightly (Delta/
# Iceberg incremental MV, DBSP/differential-dataflow delta rule):
# given a stored aggregate MV over the target snapshot and a CDC
# changeset, produce the refreshed MV WITHOUT rescanning the base —
# cost ∝ |delta| + |MV|, never |base|. The MV here groups by
# o_orderstatus with count + DECIMAL(18,2) price sum, which makes 'U'
# the textbook hard case: an update flips status to 'R', so one CDC
# row RETRACTS (-1, -old_price) from its old group and ADDS
# (+1, +new_price) to a new one — a group that did not exist in the
# base MV. Deletes retract; inserts add; groups whose count reaches
# zero drop out.
#
# Before-images for U/D come from ONE key-join of the changeset
# against the target (by construction U/D keys are always matched,
# I keys never). In production the CDC feed carries before-images
# (Delta CDF's update_preimage), which deletes even that probe; here
# the join stands in for it and is the plan's only base-table touch.
# The delta aggregation is map-side combinable and MV-sized; the
# final refresh is a full-outer join of two MV-sized relations.
# Oracle: FULL RECOMPUTE over the merged snapshot — the strongest
# possible check that incremental == batch.


def _dec(c: str):
    return F.col(c).cast("decimal(18,2)")


def mv_base(t: DataFrame) -> DataFrame:
    """The stored base MV (derived here so both engines agree exactly;
    in production this is the previous refresh's output table)."""
    return t.groupBy(F.col("o_orderstatus").alias("grp")).agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(_dec("o_totalprice")).alias("p0"),
    )


def mv_delta_rows(before: DataFrame) -> DataFrame:
    """Changeset rows (with before-images t_status/t_price joined in)
    -> retract/add delta rows (grp, dn, dp). Shared by the batch key
    and the streaming twin — the delta expansion must be identical
    for the twin to be bit-equal."""
    retract = before.where(F.col("op").isin("U", "D")).select(
        F.col("t_status").alias("grp"),
        F.lit(-1).cast("long").alias("dn"),
        (-_dec("t_price")).alias("dp"),
    )
    add = before.where(F.col("op").isin("U", "I")).select(
        F.col("c_status").alias("grp"),
        F.lit(1).cast("long").alias("dn"),
        _dec("c_price").alias("dp"),
    )
    return retract.unionByName(add)


def mv_apply_delta(mv: DataFrame, delta: DataFrame) -> DataFrame:
    """base MV (grp, n0, p0) ⊕ aggregated delta (grp, dn, dp) ->
    refreshed MV, zero-count groups retired."""
    return (
        mv.join(delta, "grp", "full_outer")
        .select(
            "grp",
            (
                F.coalesce("n0", F.lit(0)) + F.coalesce("dn", F.lit(0))
            ).alias("n_orders"),
            # exact decimal add, DOUBLE at the boundary (repo money rule)
            (
                F.coalesce(F.col("p0"), F.lit(0).cast("decimal(18,2)"))
                + F.coalesce(F.col("dp"), F.lit(0).cast("decimal(18,2)"))
            ).cast("double").alias("total_price"),
        )
        .where(F.col("n_orders") > 0)
        .withColumnRenamed("grp", "o_orderstatus")
    )


def mv_before_images(t: DataFrame, c: DataFrame) -> DataFrame:
    """Join the changeset (keyed c_key) to the target snapshot for
    U/D before-images — the stand-in for CDF update_preimage."""
    return c.join(
        t.select(
            F.col("o_orderkey").alias("c_key"),
            F.col("o_orderstatus").alias("t_status"),
            F.col("o_totalprice").alias("t_price"),
        ),
        "c_key",
        "left",
    )


def q_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    t = _target(o)
    c = _changeset(o).withColumnRenamed("o_orderkey", "c_key")
    delta = (
        mv_delta_rows(mv_before_images(t, c))
        .groupBy("grp")
        .agg(F.sum("dn").alias("dn"), F.sum("dp").alias("dp"))
    )
    return mv_apply_delta(mv_base(t), delta)


MV_INCREMENTAL_REFRESH_SQL = f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price
FROM ({_MERGED_SQL}) m
GROUP BY o_orderstatus
"""


# --- incremental MV maintenance: MIN/MAX retraction (r14) ---------------------
# The documented NON-self-maintainable case (VERDICT r13 #4; Gupta &
# Mumick, "Maintenance of Materialized Views: Problems, Techniques,
# and Applications", IEEE DE Bull. 1995: MAX under deletions is not
# self-maintainable): a MAX aggregate absorbs inserts incrementally
# (new_max = greatest(old_max, added)), but when a retraction removes
# the row HOLDING the current extremum the new max of that group is
# unknowable from the MV alone — a duplicate of the max may or may
# not remain. Every incremental-view engine (Materialize, DBSP,
# Delta/Snowflake MV refresh) handles this with a group-local
# re-scan: recompute ONLY the groups whose retracted max equals the
# stored max, from base-minus-retracted-plus-added.
#
# Fixture: MV = orders grouped by o_custkey (MV-sized = |customers|,
# ~10 rows/group in this data) with count + MAX(DECIMAL(18,2) price),
# under the same CDC changeset as the other MERGE/MV keys. 'D' of a
# group's max row and 'U' (price+1.00, same group) of the max row
# both trip the affected rule; groups whose retractions were all
# non-extremal stay on the pure-incremental path.
#
# Cost shape: delta aggregation is map-side-combinable and MV-sized;
# the affected-group set is |groups with a retracted extremum| and is
# BROADCAST into two semi-join-shaped cuts of (a) the target snapshot
# and (b) the changeset adds, so the re-scan reads only the affected
# groups' rows — cost ∝ |affected groups' base+add rows|, never
# |base|. At 100 TB the broadcast is safe because the affected set is
# bounded by the changeset's group count, and the base-side cut
# pushes the group filter into the scan.
#
# Oracle: full recompute over the merged snapshot (strongest check
# that incremental + re-scan == batch).


def _changeset_cust(o: DataFrame) -> DataFrame:
    """The shared CDC changeset, carrying the MV group column
    (o_custkey) so inserts land in their group and U/D rows can be
    cut group-locally. U rewrites status/price only — the group key
    never moves, matching the other MV keys' fixture."""
    op = _cdc_op()
    return (
        o.select(
            F.col("o_orderkey").alias("c_key"),
            op.alias("op"),
            F.col("o_custkey").alias("c_cust"),
            F.when(op == "U", F.col("o_totalprice") + F.lit(1.0))
            .otherwise(F.col("o_totalprice"))
            .alias("c_price"),
        )
        .filter(F.col("op").isNotNull())
    )


def mv_base_minmax(t: DataFrame) -> DataFrame:
    """Stored base MV: per-customer count + max price."""
    return t.groupBy(F.col("o_custkey").alias("grp")).agg(
        F.count(F.lit(1)).alias("n0"),
        F.max(_dec("o_totalprice")).alias("mx0"),
    )


def mv_minmax_before_images(t: DataFrame, c: DataFrame) -> DataFrame:
    """Changeset + U/D before-images (group key and price) from one
    key-join against the target — same stand-in for CDF
    update_preimage as the sum-MV key."""
    return c.join(
        t.select(
            F.col("o_orderkey").alias("c_key"),
            F.col("o_custkey").alias("t_cust"),
            F.col("o_totalprice").alias("t_price"),
        ),
        "c_key",
        "left",
    )


def mv_minmax_delta_rows(before: DataFrame) -> DataFrame:
    """Before-imaged changeset -> per-row delta stream
    (grp, is_retract, val). Shared by the batch key and the streaming
    twin; the downstream aggregation is all sums and maxes, so the
    accumulated delta is invariant under any micro-batch split."""
    retract = before.where(F.col("op").isin("U", "D")).select(
        F.col("t_cust").alias("grp"),
        F.lit(True).alias("is_retract"),
        _dec("t_price").alias("val"),
    )
    add = before.where(F.col("op").isin("U", "I")).select(
        F.col("c_cust").alias("grp"),
        F.lit(False).alias("is_retract"),
        _dec("c_price").alias("val"),
    )
    return retract.unionByName(add)


def mv_minmax_delta_agg(rows: DataFrame) -> DataFrame:
    """Per-group delta sufficient stats: retract count + retracted
    max, add count + added max. Conditional max-over-when(null) skips
    the other side's rows; every aggregate is commutative and
    streaming-native."""
    r = F.col("is_retract")
    return rows.groupBy("grp").agg(
        F.sum(F.when(r, 1).otherwise(0)).alias("rd_n"),
        F.max(F.when(r, F.col("val"))).alias("rd_mx"),
        F.sum(F.when(~r, 1).otherwise(0)).alias("ad_n"),
        F.max(F.when(~r, F.col("val"))).alias("ad_mx"),
    )


# Row-count gate for broadcasting the affected-group set in
# mv_apply_delta_minmax. In the common case `aff` is bounded by the
# changeset's group count — tiny, broadcast is right. But in the
# adversarial all-retraction case (every group's stored max is
# retracted) `aff` is MV-SIZED, and an unconditional broadcast is the
# SSSP settled-set problem over again (VERDICT r14 #5). Past the gate
# the cut switches to a shuffle-hash semi-join whose grp exchange the
# downstream re-scan groupBy("grp") reuses. Same knob shape as
# graph.py's SSSP_BROADCAST_MAX_SETTLED: a row count, not bytes,
# because `comb` is checkpointed so the exact cardinality costs one
# cheap scan of the pinned MV per refresh.
MV_AFF_BROADCAST_MAX = 1_600_000


def mv_apply_delta_minmax(
    mv: DataFrame,
    delta: DataFrame,
    t: DataFrame,
    c: DataFrame,
    *,
    aff_broadcast_max: int | None = None,
) -> DataFrame:
    """base MV ⊕ delta stats, with the group-local re-scan for
    affected groups (retracted max == stored max). `t`/`c` are the
    target snapshot and changeset the re-scan cuts into.

    comb is localCheckpoint'ed: it is referenced by the affected-group
    cut AND the final select, and without pinning it the before-image
    join + delta aggregation over the changeset would re-execute per
    reference (the r3 double-reference lesson). It is MV-sized, so the
    checkpoint is cheap at any scale."""
    if aff_broadcast_max is None:
        aff_broadcast_max = MV_AFF_BROADCAST_MAX
    comb = mv.join(delta, "grp", "full_outer").localCheckpoint(eager=True)
    affected = (
        F.col("rd_mx").isNotNull()
        & F.col("mx0").isNotNull()
        & (F.col("rd_mx") == F.col("mx0"))
    )
    aff = comb.where(affected).select("grp")
    # size-gated broadcast (see MV_AFF_BROADCAST_MAX); both modes are
    # bit-equal and plan-pinned by test_mv_minmax_aff_gate_*
    aff_j = (
        F.broadcast(aff)
        if aff.count() <= aff_broadcast_max
        else aff.hint("shuffle_hash")
    )
    retr_keys = c.where(F.col("op").isin("U", "D")).select("c_key")
    survivors = (
        t.join(aff_j, t["o_custkey"] == aff_j["grp"])
        .join(retr_keys, t["o_orderkey"] == retr_keys["c_key"], "left_anti")
        .select("grp", _dec("o_totalprice").alias("val"))
    )
    adds = (
        c.where(F.col("op").isin("U", "I"))
        .join(aff_j, c["c_cust"] == aff_j["grp"])
        .select("grp", _dec("c_price").alias("val"))
    )
    rescan = (
        survivors.unionByName(adds)
        .groupBy("grp")
        .agg(F.max("val").alias("mx_re"))
    )
    n_new = (
        F.coalesce("n0", F.lit(0))
        - F.coalesce("rd_n", F.lit(0))
        + F.coalesce("ad_n", F.lit(0))
    )
    return (
        comb.join(rescan, "grp", "left")
        .select(
            F.col("grp").alias("o_custkey"),
            n_new.alias("n_orders"),
            # F.greatest skips nulls: new groups take ad_mx, untouched
            # groups keep mx0; exact decimal compare, DOUBLE at the
            # boundary (repo money rule)
            F.when(affected, F.col("mx_re"))
            .otherwise(F.greatest("mx0", "ad_mx"))
            .cast("double")
            .alias("max_price"),
        )
        .where(F.col("n_orders") > 0)
    )


def q_mv_incremental_refresh_minmax(
    spark: SparkSession,
    sf_dir: str,
    *,
    aff_broadcast_max: int | None = None,
) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    t = _target(o)
    c = _changeset_cust(o)
    delta = mv_minmax_delta_agg(
        mv_minmax_delta_rows(mv_minmax_before_images(t, c))
    )
    return mv_apply_delta_minmax(
        mv_base_minmax(t), delta, t, c, aff_broadcast_max=aff_broadcast_max
    )


_MERGED_CUST_SQL = f"""
SELECT coalesce(t_cust, c_cust) AS o_custkey,
       CASE WHEN op IN ('U', 'I') THEN c_price ELSE t_price END AS o_totalprice
FROM (SELECT o_orderkey AS t_key, o_custkey AS t_cust,
             o_totalprice AS t_price
      FROM orders WHERE o_orderkey % 10 < 8) t
FULL OUTER JOIN (
  SELECT o_orderkey AS c_key, op, o_custkey AS c_cust,
         CASE WHEN op = 'U' THEN o_totalprice + 1.0
              ELSE o_totalprice END AS c_price
  FROM (
    SELECT *,
           {_CDC_OP_CASE_SQL} AS op
    FROM orders) s
  WHERE op IS NOT NULL) c ON t.t_key = c.c_key
WHERE op IS DISTINCT FROM 'D'
"""

MV_INCREMENTAL_REFRESH_MINMAX_SQL = f"""
SELECT o_custkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS max_price
FROM ({_MERGED_CUST_SQL}) m
GROUP BY o_custkey
"""


def register_all() -> None:
    register("merge_upsert", q_merge_upsert, MERGE_UPSERT_SQL)
    register(
        "mv_incremental_refresh",
        q_mv_incremental_refresh,
        MV_INCREMENTAL_REFRESH_SQL,
    )
    register(
        "mv_incremental_refresh_minmax",
        q_mv_incremental_refresh_minmax,
        MV_INCREMENTAL_REFRESH_MINMAX_SQL,
    )
    register(
        "scan_schema_evolution",
        q_scan_schema_evolution,
        SCAN_SCHEMA_EVOLUTION_SQL,
    )
    register("maintenance_compact", q_maintenance_compact, MAINTENANCE_COMPACT_SQL)
    register("table_diff", q_table_diff, TABLE_DIFF_SQL)
    register("delete_cascade", q_delete_cascade, DELETE_CASCADE_SQL)
