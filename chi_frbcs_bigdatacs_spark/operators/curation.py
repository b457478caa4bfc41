"""Data-profiling and training-corpus curation operators (round 4).

Widens SURVEY §2b with the ops a large-scale data pipeline runs
between ingest and training: statistical profiling (moments,
histograms, distribution windows), corpus curation (soft dedup,
chunking, vocabulary), embedding hygiene (per-class centroids, range
similarity), and an interval self-join over the event stream.

Scale notes (100 TB lens): every op here is a single scan plus at
most one hash-partitioned shuffle on its natural key — no windows
without partition keys, no cartesian products, no driver loops.
- moments/histogram/centroid: map-side-combined hash aggs.
- soft dedup / vocabulary: hash agg on a derived key (the normalize /
  tokenize step is pure codegen expressions, no UDF).
- chunking: explode over a computed index range — output-proportional,
  partition-local.
- interval join: equi-join on user_id + range predicate, the AQE
  skew-join-splittable shape (a hot user salts like any skewed key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.plans.registry import register
from chi_frbcs_bigdatacs_spark.sources.testdata import load_table, register_views

# --- statistical moments per group -----------------------------------------
# stddev/corr/covar are order-sensitive accumulations; rounding is
# sized per column magnitude so cross-engine accumulation-order drift
# (~1e-12 relative) disappears: quantity stddev ~14 -> 6dp, price
# stddev ~3e4 -> 4dp, covar ~1e5 -> 3dp, corr is normalized ~O(1) -> 6dp.


def q_agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("sd_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 3).alias("cov_qp"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
    )


AGG_STATS_MOMENTS_SQL = """
SELECT l_returnflag, count(*) AS n,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(stddev_samp(l_extendedprice), 4) AS sd_price,
       round(covar_samp(l_quantity, l_extendedprice), 3) AS cov_qp,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp
FROM lineitem GROUP BY l_returnflag
"""


# --- fixed-width histogram --------------------------------------------------
HIST_WIDTH = 50_000
HIST_BUCKETS = 10


def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / HIST_WIDTH), F.lit(HIST_BUCKETS - 1)
    ).cast("long")
    return (
        o.select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


AGG_HISTOGRAM_SQL = f"""
SELECT CAST(least(floor(o_totalprice / {HIST_WIDTH}), {HIST_BUCKETS - 1}) AS BIGINT) AS bucket,
       count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
FROM orders GROUP BY 1
"""


# --- ntile / first / last / nth_value windows ------------------------------
# Total order inside each partition via the full natural key (NOTES
# rule 6: (orderkey, linenumber) alone is NOT unique) so both engines
# rank identically.
_NTILE_ORDER = (
    "l_extendedprice, l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity"
)


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    order = [
        F.col(c.strip())
        for c in _NTILE_ORDER.split(",")
    ]
    w = Window.partitionBy("l_returnflag").orderBy(*order)
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_returnflag",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.first("l_extendedprice").over(w).alias("part_min_price"),
        F.last("l_extendedprice").over(wfull).alias("part_max_price"),
        F.nth_value("l_extendedprice", 3).over(wfull).alias("part_third_price"),
    )


WINDOW_NTILE_SQL = f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_returnflag,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       first_value(l_extendedprice) OVER w AS part_min_price,
       last_value(l_extendedprice) OVER wf AS part_max_price,
       nth_value(l_extendedprice, 3) OVER wf AS part_third_price
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag ORDER BY {_NTILE_ORDER}),
       wf AS (PARTITION BY l_returnflag ORDER BY {_NTILE_ORDER}
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- TPC-H Q13 shape: customer order-count distribution --------------------
SQL_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_sql_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_Q13)


# --- interval self-join over the event stream ------------------------------
# For every 'click', how many events the same user produced in the
# following 5 minutes — the sessionized-funnel primitive. Equi-join on
# user_id carries the parallelism; the range predicate prunes inside
# each user partition.
FOLLOW_WINDOW_MIN = 5


def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    b = e.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    joined = a.join(
        b,
        (F.col("b_user") == F.col("a_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (
            F.col("b_ts")
            <= F.col("a_ts") + F.expr(f"INTERVAL {FOLLOW_WINDOW_MIN} MINUTES")
        ),
        "left",
    )
    return joined.groupBy(F.col("a_id").alias("event_id")).agg(
        F.count("b_id").alias("n_follow")
    )


JOIN_INTERVAL_SQL = f"""
SELECT a.event_id AS event_id, count(b.event_id) AS n_follow
FROM events a
LEFT JOIN events b
  ON b.user_id = a.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL {FOLLOW_WINDOW_MIN} MINUTE
WHERE a.event_type = 'click'
GROUP BY a.event_id
"""


# --- soft (normalized-text) dedup ------------------------------------------
# Exact dedup after aggressive normalization (casefold, strip
# non-alphanumerics, collapse whitespace) — catches reformatted
# copies that byte-exact dedup misses, at exact-dedup cost.


def _norm_text_col():
    return F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))


def q_text_dedup_soft(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(_norm_text_col().cast("binary")).alias("soft_hash"))
        .groupBy("soft_hash")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper"))
    )


TEXT_DEDUP_SOFT_SQL = """
SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS soft_hash,
       count(*) AS n_dups, min(doc_id) AS keeper
FROM documents GROUP BY 1
"""


# --- document chunking ------------------------------------------------------
# Fixed-size overlapping character chunks (window CHUNK_CHARS, stride
# CHUNK_STRIDE) — the standard pre-tokenization step for long-context
# training corpora. Explode over a computed index range: output is
# proportional to total text volume, work stays partition-local.
CHUNK_CHARS = 500
CHUNK_STRIDE = 400


def chunk_documents(d: DataFrame) -> DataFrame:
    """Chunk any (doc_id, text) frame; see q_doc_chunking."""
    # clamp: empty text would give floor(-1/stride) = -1 and Spark's
    # sequence(0,-1) DESCENDS (two spurious rows) while DuckDB's
    # range(0,0) is empty — both engines clamp to one empty chunk
    n_chunks_m1 = F.greatest(
        F.lit(0), F.floor((F.length("text") - 1) / CHUNK_STRIDE)
    ).cast("int")
    return (
        d.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0), n_chunks_m1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.expr(
                f"substring(text, chunk_idx * {CHUNK_STRIDE} + 1, {CHUNK_CHARS})"
            ).alias("chunk"),
        )
        .withColumn("chunk_len", F.length("chunk").cast("long"))
    )


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(load_table(spark, sf_dir, "documents"))


DOC_CHUNKING_SQL = f"""
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       substr(text, CAST(i AS INT) * {CHUNK_STRIDE} + 1, {CHUNK_CHARS}) AS chunk,
       CAST(length(substr(text, CAST(i AS INT) * {CHUNK_STRIDE} + 1, {CHUNK_CHARS})) AS BIGINT) AS chunk_len
FROM (
  -- list-valued range() supports per-row bounds where the lateral
  -- generate_series table function does not (DuckDB 1.0)
  SELECT doc_id, text,
         unnest(range(0, greatest(0, CAST(floor((length(text) - 1) / {CHUNK_STRIDE}) AS BIGINT)) + 1)) AS i
  FROM documents
) t
"""


# --- corpus vocabulary: global top-N tokens --------------------------------
TOKEN_TOP_N = 50


def q_token_freq_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token")
    return (
        d.select(tok)
        .filter(F.length("token") >= 3)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(TOKEN_TOP_N)
    )


TOKEN_FREQ_TOPN_SQL = f"""
SELECT token, count(*) AS n
FROM (
  SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
  FROM documents
) t
WHERE length(token) >= 3
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT {TOKEN_TOP_N}
"""


# --- per-class embedding centroid ------------------------------------------
# The class-prototype op used in curation (outlier scoring, label
# noise detection). One map-side-combined hash agg over 64 dims x
# n_labels groups; means rounded 6dp on both engines (NOTES rule 2/3).
_EMB_DIM = 64


def q_embed_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.round(F.avg(F.element_at("embedding", i).cast("double")), 6).alias(
                f"c{i}"
            )
            for i in range(1, _EMB_DIM + 1)
        ],
    )


def _embed_centroid_sql() -> str:
    means = ",\n       ".join(
        f"round(avg(CAST(embedding[{i}] AS DOUBLE)), 6) AS c{i}"
        for i in range(1, _EMB_DIM + 1)
    )
    return f"""
SELECT label, count(*) AS n,
       {means}
FROM embeddings GROUP BY label
"""


# --- range similarity query ------------------------------------------------
# All vectors within a cosine radius of the query (dedup-by-radius /
# recall-set construction), vs the top-k cut of simsearch_topk. Same
# broadcast + single-scan shape; the filter replaces TakeOrdered.
RANGE_COS_THRESHOLD = 0.15


def q_simsearch_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.operators.similarity import (
        q_embed_cosine,
    )

    return q_embed_cosine(spark, sf_dir).filter(
        F.col("cosine") >= RANGE_COS_THRESHOLD
    )


def _simsearch_range_sql() -> str:
    from chi_frbcs_bigdatacs_spark.operators.similarity import _cosine_sql

    return f"""
SELECT * FROM ({_cosine_sql()}) c WHERE cosine >= {RANGE_COS_THRESHOLD}
"""


# --- document-frequency / IDF stats ----------------------------------------
# Per-token document frequency and smoothed IDF over the corpus —
# the weighting step of any tf-idf retrieval/quality pipeline. One
# explode + distinct-per-doc + hash agg; ln() rounded 6dp both sides.
IDF_TOP_N = 50


def q_token_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # driver scalar, folded as a literal (tiny scan)
    tok = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.lower(F.col("text")), "[^a-z]+"))).alias(
                "token"
            ),
        )
        .filter(F.length("token") >= 3)
    )
    return (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "token",
            "df",
            F.round(F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("idf"),
        )
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(IDF_TOP_N)
    )


def _token_doc_freq_sql() -> str:
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, token
  FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS token
    FROM documents
  ) t
  WHERE length(token) >= 3
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
SELECT token, count(*) AS df,
       round(ln(n.n_docs / count(*)), 6) AS idf
FROM tok, n
GROUP BY token, n.n_docs
ORDER BY df DESC, token ASC
LIMIT {IDF_TOP_N}
"""


# --- latest-record-per-key dedup (CDC compaction) ---------------------------
# The change-data-capture primitive: collapse an event log to each
# key's most recent record. One window shuffle on the key; ties on ts
# break on event_id so both engines pick the same row.


def q_dedup_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


DEDUP_LATEST_EVENT_SQL = """
SELECT user_id, event_id, CAST(ts AS TIMESTAMP_NS) AS ts, event_type, value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn = 1
"""


# --- int8 embedding quantization -------------------------------------------
# Symmetric per-vector int8 quantization (x -> round(127*x/absmax)) —
# the storage/serving compression step. Pure element-wise transform;
# scale emitted so the check pins both the codes and the scale. Codes
# serialize to a joined string (repo convention: checked outputs are
# scalar — the driver hash and the comparator can't sort array cells).


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    absmax = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    codes = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 127.0 / absmax, 0).cast("int"),
    )
    return emb.select(
        "vec_id",
        F.round(absmax, 6).alias("scale"),
        F.array_join(
            F.transform(codes, lambda c: c.cast("string")), ","
        ).alias("codes"),
    )


EMBED_QUANTIZE_SQL = """
SELECT vec_id,
       round(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 6) AS scale,
       array_to_string(list_transform(embedding,
         x -> CAST(round(CAST(x AS DOUBLE) * 127.0
                         / list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))), 0) AS INT)), ',') AS codes
FROM embeddings
"""


# --- ordered event funnel ----------------------------------------------------
# Per user: earliest 'view', then earliest 'click' AFTER it, then
# earliest 'purchase' after that — the classic ordered-funnel metric.
# Three staged (filter -> per-user min -> equi-join) rounds, each a
# map-side-combined agg + user_id hash join; no windows over the full
# event stream and no per-user sorts.
_FUNNEL_STAGES = ("view", "click", "purchase")


def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    users = e.select("user_id").distinct()
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        users.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            stage.cast("long").alias("funnel_stage"),
            "t_view",
            "t_click",
            "t_purchase",
        )
    )


WINDOW_FUNNEL_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
s1 AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t_view
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
  GROUP BY e.user_id
)
SELECT u.user_id,
       CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
                 WHEN t_click IS NOT NULL THEN 2
                 WHEN t_view IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_stage,
       CAST(t_view AS TIMESTAMP_NS) AS t_view,
       CAST(t_click AS TIMESTAMP_NS) AS t_click,
       CAST(t_purchase AS TIMESTAMP_NS) AS t_purchase
FROM u
LEFT JOIN s1 ON u.user_id = s1.user_id
LEFT JOIN s2 ON u.user_id = s2.user_id
LEFT JOIN s3 ON u.user_id = s3.user_id
"""


# --- entity resolution: blocked fuzzy (edit-distance) self-match -----------
# The record-linkage primitive: candidate pairs come ONLY from equal
# blocking keys (mktsegment, nationkey) — in-block pair counts are
# bounded by block size (n / |segments x nations| expected), never an
# all-pairs cartesian — then the expensive Levenshtein verifies each
# candidate once. The same shape links 100 TB of entities when the
# blocking key is a phonetic code / sorted-token prefix; both engines
# compute the identical unit-cost edit distance.
FUZZY_MAX_DIST = 2


def q_join_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        "c_mktsegment",
        "c_nationkey",
    )
    b = c.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        "c_mktsegment",
        "c_nationkey",
    )
    return (
        a.join(b, ["c_mktsegment", "c_nationkey"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
        .select("key_a", "key_b", "c_mktsegment", "dist")
    )


JOIN_FUZZY_MATCH_SQL = f"""
SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
       a.c_mktsegment, CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a
JOIN customer b
  ON a.c_mktsegment = b.c_mktsegment
 AND a.c_nationkey = b.c_nationkey
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {FUZZY_MAX_DIST}
"""


# --- time-series gap fill + LOCF -------------------------------------------
# The reporting primitive SQL engines are always asked for: a gap-free
# (day x event_type) grid over the observed range, zero-filled counts,
# and last-observation-carried-forward daily sums. The spine is a
# generated date sequence (range-bounded, constant-sized — never a
# data-sized recursion); the grid is spine x |event types| (tiny) and
# the one data-sized input is the daily pre-aggregation. Scale: one
# map-side-combined agg over events, then broadcast-sized joins.


def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 3).alias("sum_v"),
    )
    d0, d1 = daily.agg(F.min("day"), F.max("day")).first()
    spine = spark.range(1).select(
        F.explode(
            F.expr(f"sequence(DATE'{d0}', DATE'{d1}', interval 1 day)")
        ).alias("day")
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce(
                F.last("sum_v", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("locf_sum"),
        )
    )


TIMESERIES_GAPFILL_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         count(*) AS n, round(sum(value), 3) AS sum_v
  FROM events GROUP BY 1, 2
),
b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
spine AS (
  SELECT CAST(unnest(range(d0, d1 + INTERVAL 1 DAY, INTERVAL 1 DAY)) AS DATE) AS day
  FROM b
),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (SELECT day, event_type FROM spine CROSS JOIN types)
SELECT strftime(g.day, '%Y-%m-%d') AS day, g.event_type,
       coalesce(d.n, 0) AS n,
       coalesce(last_value(d.sum_v IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS locf_sum
FROM grid g LEFT JOIN daily d ON g.day = d.day AND g.event_type = d.event_type
"""


# --- distribution drift: per-category PSI ----------------------------------
# The monitoring op every production scoring pipeline runs: how far
# has the event-type mix moved between two windows (population
# stability index; PSI > 0.25 per industry rule of thumb = retrain).
# Per-category contributions (p-q)*ln(p/q) are emitted as ROWS, not
# summed — no cross-row float accumulation, so the only float op is
# one ln over exact integer ratios (6dp-rounded both engines).
DRIFT_SPLIT_TS = "2024-01-16 00:00:00"


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    period = F.when(
        F.col("ts") < F.lit(DRIFT_SPLIT_TS).cast("timestamp"), "a"
    ).otherwise("b")
    counts = ev.groupBy("event_type").agg(
        F.sum(F.when(period == "a", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(period == "b", 1).otherwise(0)).alias("n_b"),
    )
    tot = counts.agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    p = F.col("n_a").cast("double") / F.col("t_a").cast("double")
    q = F.col("n_b").cast("double") / F.col("t_b").cast("double")
    return counts.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round((p - q) * F.log(p / q), 6).alias("psi"),
    )


DRIFT_PSI_SQL = f"""
WITH counts AS (
  SELECT event_type,
         sum(CASE WHEN ts < CAST('{DRIFT_SPLIT_TS}' AS TIMESTAMP)
                  THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN ts < CAST('{DRIFT_SPLIT_TS}' AS TIMESTAMP)
                  THEN 0 ELSE 1 END) AS n_b
  FROM events GROUP BY event_type
),
tot AS (SELECT sum(n_a) AS t_a, sum(n_b) AS t_b FROM counts)
SELECT event_type,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       round((CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE)
              - CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE))
             * ln((CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE))
                  / (CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE))), 6) AS psi
FROM counts CROSS JOIN tot
"""


# --- numeric drift: per-type Kolmogorov–Smirnov statistic -------------------
# The continuous-column companion to drift_psi: max |ECDF_a - ECDF_b|
# of `value` between the same two event windows, per event_type.
# Values are binned with floor() FIRST (integer bins — floor has no
# rounding-mode ambiguity across engines, unlike round-half cases),
# so the domain is bounded (~500 bins here; at 100 TB binning is what
# makes the ECDF window a per-type sort of bin counts, not of raw
# rows). Every per-row ECDF diff is one subtraction of two exact
# integer ratios — bit-identical across engines — so max() picks the
# same row; the result is rounded only for display.


def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    in_a = F.col("ts") < F.lit(DRIFT_SPLIT_TS).cast("timestamp")
    binned = ev.groupBy(
        "event_type", F.floor("value").cast("long").alias("bin")
    ).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(in_a, 0).otherwise(1)).alias("n_b"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    diff = F.abs(
        F.sum("n_a").over(w).cast("double") / F.sum("n_a").over(wt).cast("double")
        - F.sum("n_b").over(w).cast("double") / F.sum("n_b").over(wt).cast("double")
    )
    return (
        binned.select("event_type", "n_a", "n_b", diff.alias("diff"))
        .groupBy("event_type")
        .agg(
            F.sum("n_a").cast("long").alias("n_a"),
            F.sum("n_b").cast("long").alias("n_b"),
            F.round(F.max("diff"), 6).alias("ks"),
        )
    )


DRIFT_KS_SQL = f"""
WITH binned AS (
  SELECT event_type, CAST(floor(value) AS BIGINT) AS bin,
         sum(CASE WHEN ts < CAST('{DRIFT_SPLIT_TS}' AS TIMESTAMP)
                  THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN ts < CAST('{DRIFT_SPLIT_TS}' AS TIMESTAMP)
                  THEN 0 ELSE 1 END) AS n_b
  FROM events GROUP BY 1, 2
),
cdf AS (
  SELECT event_type, n_a, n_b,
         abs(CAST(sum(n_a) OVER (PARTITION BY event_type ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(sum(n_a) OVER (PARTITION BY event_type) AS DOUBLE)
             - CAST(sum(n_b) OVER (PARTITION BY event_type ORDER BY bin
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST(sum(n_b) OVER (PARTITION BY event_type) AS DOUBLE)) AS diff
  FROM binned
)
SELECT event_type,
       CAST(sum(n_a) AS BIGINT) AS n_a,
       CAST(sum(n_b) AS BIGINT) AS n_b,
       round(max(diff), 6) AS ks
FROM cdf
GROUP BY event_type
"""


# --- time-weighted average (TWAP) -------------------------------------------
# The irregular-sampling average a plain avg() gets wrong: each
# observation holds until the next one, so its weight is its holding
# interval (the step-function integral / elapsed time — the TWAP of
# finance and sensor pipelines). Exactness follows the anomaly_zscore
# recipe: v = round(100*value) and dt in integer MICROS, so the
# numerator sum(v * dt) is an exact DECIMAL(38,0)/HUGEINT; both
# engines convert the same exact integers to double (same
# nearest-even result) before ONE division, rounded to 6dp. Shape:
# one lead() window per event_type + one agg — no global sort.
def q_timeseries_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t_us = F.unix_micros("ts")
    d = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
        (F.lead(t_us).over(w) - t_us).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    dec = "decimal(38,0)"
    num = F.sum(F.col("v").cast(dec) * F.col("dt_us").cast(dec))
    den = F.sum(F.col("dt_us").cast(dec))
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(
            num.cast("double") / (F.lit(100.0) * den.cast("double")), 6
        ).alias("twap"),
    )


TIMESERIES_TWAP_SQL = """
WITH d AS (
  SELECT event_type,
         CAST(round(100 * value) AS BIGINT) AS v,
         lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dt_us
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_intervals,
       round(CAST(sum(CAST(v AS HUGEINT) * dt_us) AS DOUBLE)
             / (100.0 * CAST(sum(CAST(dt_us AS HUGEINT)) AS DOUBLE)), 6) AS twap
FROM d
WHERE dt_us IS NOT NULL
GROUP BY event_type
"""


# --- OHLC bar aggregation (time-series downsampling) -------------------------
# The bar/candle downsample every market-data and sensor pipeline
# ships: per (series, time bucket) the first (open), max (high), min
# (low), and last (close) observation. ONE map-side-combined
# aggregation — open/close via min_by/max_by on the event time (ts is
# globally unique per the testdata contract, so no tie-break channel
# is needed and the picks are order-insensitive), high/low plain
# min/max, all value-PICKS of already-2dp-rounded doubles (no
# accumulation — no float-order parity risk). The bucket is one
# date_trunc, a map-side expression; at 100 TB this is a single
# shuffle on (series, bucket) with partial aggregation doing almost
# all the work map-side.
def q_timeseries_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir).select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "ts",
        F.round("value", 2).alias("v"),
    )
    return ev.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min_by("v", "ts").alias("open"),
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        F.max_by("v", "ts").alias("close"),
    )


TIMESERIES_OHLC_SQL = """
SELECT event_type,
       CAST(date_trunc('hour', ts) AS TIMESTAMP_NS) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       arg_min(round(value, 2), ts) AS open,
       max(round(value, 2)) AS high,
       min(round(value, 2)) AS low,
       arg_max(round(value, 2), ts) AS close
FROM events
GROUP BY 1, 2
"""


# --- running z-score anomaly detection --------------------------------------
# Online monitoring: flag each event whose value deviates more than
# Z sigma from the running mean/variance of all PRIOR events of its
# type (prior-only stats avoid self-inclusion and give the streaming
# twin identical semantics). The criterion is evaluated in EXACT
# integer arithmetic so both engines (and the streaming twin) agree
# bit-for-bit with no epsilon:
#   v = round(100 * value)            (values are 2dp, so exact)
#   flag  <=>  (c*v - s)^2 > Z^2 * (c*ss - s^2)   [all integers]
# which is |v - s/c| > Z * sqrt(ss/c - (s/c)^2) cleared of divisions.
# Intermediates reach ~6e19 at 8x sf0.1, so the comparison runs in
# DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — both exact 128-bit.
# Shape: one window per event_type ordered by (ts, event_id) — a
# hash-partitioned sort, no global order; everything else is a map.
ANOM_WARMUP = 100  # prior-count below which nothing is flagged
ANOM_Z2 = 9  # Z = 3 sigma


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    v100 = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = ev.select(
        "event_id",
        "event_type",
        "value",
        v100.alias("v"),
        F.count(F.lit(1)).over(w).alias("c"),
        F.coalesce(F.sum(v100).over(w), F.lit(0)).alias("s"),
        F.coalesce(F.sum(v100 * v100).over(w), F.lit(0)).alias("ss"),
    )
    dec = "decimal(38,0)"
    c, v, s, ss = (F.col(x).cast(dec) for x in ("c", "v", "s", "ss"))
    lhs = (c * v - s) * (c * v - s)
    rhs = F.lit(ANOM_Z2).cast(dec) * (c * ss - s * s)
    return d.filter((F.col("c") >= ANOM_WARMUP) & (lhs > rhs)).select(
        "event_id", "event_type", "value", F.col("c").alias("n_prior")
    )


ANOMALY_ZSCORE_SQL = f"""
WITH pre AS (
  SELECT event_id, event_type, value,
         CAST(round(100 * value) AS BIGINT) AS v,
         count(*) OVER w AS c,
         coalesce(sum(CAST(round(100 * value) AS BIGINT)) OVER w, 0) AS s,
         coalesce(sum(CAST(round(100 * value) AS BIGINT)
                      * CAST(round(100 * value) AS BIGINT)) OVER w, 0) AS ss
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, event_type, value, CAST(c AS BIGINT) AS n_prior
FROM pre
WHERE c >= {ANOM_WARMUP}
  AND (CAST(c AS HUGEINT) * v - s) * (CAST(c AS HUGEINT) * v - s)
      > {ANOM_Z2} * (CAST(c AS HUGEINT) * ss - CAST(s AS HUGEINT) * s)
"""


# --- SCD2 dimension build ---------------------------------------------------
# Slowly-changing-dimension type 2 from an event log: each 'signup'
# event opens a new version of the user's dimension row, valid from
# its ts until the user's next signup (NULL = current). The standard
# warehouse interval construction: one window per user_id ordered by
# (ts, event_id) — lead() for valid_to, row_number() for the version
# ordinal. Hash-partitioned by the dimension key, no global sort;
# downstream point-in-time lookups are then the existing as-of join.
SCD2_EVENT = "signup"


def _scd2_versions(ev: DataFrame) -> DataFrame:
    """SCD2 version rows from attribute-change events: one window per
    user derives version numbers, validity intervals, and the
    current-row flag."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.round("value", 2).alias("attr_value"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == SCD2_EVENT
    )
    return _scd2_versions(ev)


SCD2_BUILD_SQL = f"""
SELECT user_id,
       CAST(row_number() OVER w AS BIGINT) AS version,
       CAST(ts AS TIMESTAMP_NS) AS valid_from,
       CAST(lead(ts) OVER w AS TIMESTAMP_NS) AS valid_to,
       round(value, 2) AS attr_value,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WHERE event_type = '{SCD2_EVENT}'
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- point-in-time join against the SCD2 dimension ---------------------------
# The reason SCD2 exists: enrich facts with the dimension attributes
# AS OF each fact's timestamp (the feature-store / audit-correct
# join, never the current row). Scalable shape: the union-marker
# as-of plan (same family as join_asof) — union dimension version
# STARTS with the facts, ONE window per user carrying the last seen
# (version, attr) forward, keep fact rows that have a carried
# version. One shuffle on user_id, no range join; the oracle IS the
# naive interval join (valid_from <= ts < valid_to), which is the
# O(n * versions) plan this rewrite avoids at 100 TB. events.ts is
# globally unique (testdata contract), so signup-vs-fact ordering
# needs no tiebreak.
PIT_FACT_EVENT = "purchase"


def q_join_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    dim_marks = q_scd2_build(spark, sf_dir).select(
        "user_id",
        F.col("valid_from").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        "version",
        "attr_value",
        F.lit(False).alias("is_fact"),
    )
    facts = ev.filter(F.col("event_type") == PIT_FACT_EVENT).select(
        "user_id",
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("long").alias("version"),
        F.lit(None).cast("double").alias("attr_value"),
        F.lit(True).alias("is_fact"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = dim_marks.unionByName(facts).select(
        "user_id",
        "event_id",
        "is_fact",
        F.last("version", ignorenulls=True).over(w).alias("version"),
        F.last("attr_value", ignorenulls=True).over(w).alias("attr_value"),
    )
    return carried.filter(
        F.col("is_fact") & F.col("version").isNotNull()
    ).select("event_id", "user_id", "version", "attr_value")


def _join_scd2_pit_sql() -> str:
    return f"""
WITH dim AS ({SCD2_BUILD_SQL}),
f AS (SELECT event_id, user_id, ts FROM events
      WHERE event_type = '{PIT_FACT_EVENT}')
SELECT f.event_id, f.user_id, d.version, d.attr_value
FROM f JOIN dim d
  ON f.user_id = d.user_id
 AND f.ts >= d.valid_from
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)
"""


# --- SCD2 type-2 MERGE (incremental version maintenance) ---------------------
# Closes the batch half of the SCD2 maintenance loop (scd2_build /
# stream_scd2_maintain / join_scd2_pit): apply a changeset of NEW
# attribute observations to an already-MATERIALIZED SCD2 dimension —
# closing each touched user's current row and appending the new
# versions with continued numbering — in one plan.
#
# Scalable shape: zero joins. The stored dimension contributes one
# mark per version (valid_from, attr_value; version/valid_to/
# is_current are DERIVED state, cheaper to re-derive than to
# reconcile), the changeset contributes one mark per new observation,
# and a single per-user window over the union rebuilds the version
# chain — lead(t) simultaneously CLOSES the formerly-current row
# (its lead is the first changeset ts) and chains the new rows. One
# shuffle on user_id of (dim + changeset), no interval join, no
# per-user max-version lookup join. At 100 TB the union is
# partition-pruned to users present in the changeset (untouched
# partitions are not rewritten — the Delta/Iceberg MERGE file-skip);
# the fixture applies it to the full key space.
#
# Fixture split is sf-relative (the scan_zorder_pruned 2-scalar
# pattern): T0 = min_ts + (max_ts - min_ts) * 4 / 5 in integer
# micros (positive ints — DuckDB // parity rule, NOTES r6); events
# before T0 are the stored dim, the rest arrive as the changeset.
# Since events.ts is globally unique (testdata contract), the merged
# chain equals scd2_build over the FULL event log — which is the
# oracle (SCD2_BUILD_SQL), making every closed valid_to, continued
# version number, and moved is_current flag hash-checked.
MERGE_SCD2_SPLIT_NUM, MERGE_SCD2_SPLIT_DEN = 4, 5


def q_merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == SCD2_EVENT
    )
    b = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]
    if b["lo"] is None:
        # empty SCD2 slice (a fixture without 'signup' events): both
        # halves of the split are empty at t0=0 and the union-window
        # below legitimately yields an empty chain with the full
        # output schema, instead of a TypeError on None arithmetic
        # (ADVICE r8).
        t0 = 0
    else:
        t0 = (
            b["lo"]
            + (b["hi"] - b["lo"]) * MERGE_SCD2_SPLIT_NUM // MERGE_SCD2_SPLIT_DEN
        )
    # the materialized dimension (stand-in for the stored table):
    # full SCD2 build over the pre-T0 log, then only the MERGE-
    # relevant columns survive as marks
    dim_marks = _scd2_versions(ev.filter(F.unix_micros("ts") < t0)).select(
        "user_id", F.col("valid_from").alias("t"), "attr_value"
    )
    chg_marks = ev.filter(F.unix_micros("ts") >= t0).select(
        "user_id",
        F.col("ts").alias("t"),
        F.round("value", 2).alias("attr_value"),
    )
    w = Window.partitionBy("user_id").orderBy("t")
    return dim_marks.unionByName(chg_marks).select(
        "user_id",
        F.row_number().over(w).cast("long").alias("version"),
        F.col("t").alias("valid_from"),
        F.lead("t").over(w).alias("valid_to"),
        "attr_value",
        F.lead("t").over(w).isNull().alias("is_current"),
    )


# --- trailing 7-day active users (WAU) --------------------------------------
# The sliding-window DISTINCT aggregate ("weekly active users as of
# each day") that no window frame can express directly — COUNT
# (DISTINCT) over a RANGE frame is unsupported in both engines, and
# a per-day self-join over a date range re-scans the fact table 7x.
# Scalable shape: distinct (day, user) once, explode each activity
# row to the 7 window-end days it covers (a CONSTANT 7x multiply of
# the already-deduplicated activity table, not of raw events),
# distinct again, count per window day. Two shuffles total,
# window-length-bounded blowup, no range join — at 100 TB this is
# the standard coverage-explode WAU plan. Output is restricted to
# window days that actually occur in the data (partial leading
# windows included, trailing phantom days dropped via a semi join
# on the tiny distinct-day set).
WAU_DAYS = 7


def q_agg_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    ud = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    days = ud.select("day").distinct()
    cov = (
        ud.select(
            F.explode(F.expr(f"sequence(0, {WAU_DAYS - 1})")).alias("off"),
            "day",
            "user_id",
        )
        .select(F.date_add("day", F.col("off")).alias("wday"), "user_id")
        .distinct()
    )
    return (
        cov.join(days, cov["wday"] == days["day"], "left_semi")
        .groupBy("wday")
        .agg(F.count(F.lit(1)).alias("wau"))
        .select(F.date_format("wday", "yyyy-MM-dd").alias("day"), "wau")
    )


AGG_ACTIVE_USERS_7D_SQL = f"""
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM ud),
cov AS (
  SELECT DISTINCT CAST(day + off * INTERVAL 1 DAY AS DATE) AS wday, user_id
  FROM ud CROSS JOIN (SELECT unnest(range(0, {WAU_DAYS})) AS off) o
)
SELECT strftime(wday, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS wau
FROM cov
WHERE wday IN (SELECT day FROM days)
GROUP BY wday
"""


# --- gaps-and-islands: longest consecutive-day activity streak ---------------
# The canonical gaps-and-islands rewrite: within a user's distinct
# activity days, consecutive runs share a constant (day - row_number)
# anchor, so streaks fall out of one window + one groupBy — no
# self-join, no recursion. Output: each user's longest streak, top-20
# by (streak desc, user asc) for a bounded result. Shape: one
# user-keyed window sort + two small aggs; scales as a single shuffle
# on user_id.
STREAK_TOP = 20


def q_window_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy(F.col("day").asc())
    anchored = ud.withColumn(
        "anchor", F.date_add("day", -F.row_number().over(w))
    )
    streaks = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak")
    )
    return (
        streaks.groupBy("user_id")
        .agg(F.max("streak").alias("longest_streak"))
        .orderBy(F.col("longest_streak").desc(), F.col("user_id").asc())
        .limit(STREAK_TOP)
    )


WINDOW_STREAKS_SQL = f"""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
anchored AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day ASC) AS INTEGER) AS anchor
  FROM ud
),
streaks AS (
  SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS streak
  FROM anchored GROUP BY 1, 2
)
SELECT user_id, max(streak) AS longest_streak
FROM streaks GROUP BY user_id
ORDER BY longest_streak DESC, user_id ASC
LIMIT {STREAK_TOP}
"""


# --- event path transitions (first-order Markov counts) ----------------------
# The journey-analysis primitive behind sankey/path dashboards: for
# each user's time-ordered event sequence, count every consecutive
# (prev -> next) event-type transition. One window per user (single
# hash-partitioned sort keyed by user_id, no global order) + one
# bounded |types|^2 agg. Ordering is deterministic: events.ts is
# unique per the testdata contract, and event_id breaks ties anyway.
def q_events_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


EVENTS_PATH_TRANSITIONS_SQL = """
SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
FROM (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) AS prev_type
  FROM events) t
WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


# --- weekly cohort retention matrix ------------------------------------------
# The product-analytics staple: bucket users by first-activity week
# (their cohort) and count how many are still active k weeks later.
# Shape: distinct (user, day) once; per-user min via one groupBy (NOT
# a window — no sort needed for a single min); one equi-join back on
# user_id (broadcast-able: one row per user, always << activity); one
# distinct + count per (cohort_week, week_offset). All integer date
# arithmetic against a fixed epoch — no float, no rank, fully
# order-free. At 100 TB: two shuffles on user_id + one on the tiny
# (cohort, offset) grid.
COHORT_EPOCH = "2024-01-01"


def q_window_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = ud.join(first, "user_id")
    epoch = F.lit(COHORT_EPOCH).cast("date")
    return (
        j.select(
            "user_id",
            F.floor(F.datediff(F.col("first_day"), epoch) / 7)
            .cast("long")
            .alias("cohort_week"),
            F.floor(F.datediff(F.col("day"), F.col("first_day")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


WINDOW_RETENTION_COHORTS_SQL = f"""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id),
cells AS (
  SELECT DISTINCT ud.user_id,
         CAST(floor(date_diff('day', DATE '{COHORT_EPOCH}', first_day) / 7) AS BIGINT) AS cohort_week,
         CAST(floor(date_diff('day', first_day, day) / 7) AS BIGINT) AS week_offset
  FROM ud JOIN first ON ud.user_id = first.user_id
)
SELECT cohort_week, week_offset, CAST(count(*) AS BIGINT) AS n_users
FROM cells GROUP BY 1, 2
"""


# --- truncated-window EWMA (exponential smoothing) ---------------------------
# Exponential smoothing over the irregular event stream, the
# denoising pass sensor/metric pipelines run before thresholding.
# The textbook recursion ewma_t = a*x_t + (1-a)*ewma_{t-1} is a
# sequential scan; the SCALABLE equivalent used here truncates the
# exponential tail at K=24 lags (tail mass (1-a)^24 ~ 1e-3 at
# a=0.25), which turns the recursion into a FIXED linear combination
# of the last K observations — 24 lag() columns over one
# (event_type)-partitioned window, a single shuffle, no sequential
# dependency. (The untruncated recurrence is still mergeable as an
# affine map v -> a*v + b per block, but block composition changes
# float rounding order; the truncated form is what both engines can
# compute BIT-IDENTICALLY.)
#
# Parity design: v = round(100*value) is an exactly-representable
# integer-valued double; the weights a*(1-a)^j are Python-computed
# doubles interpolated as full-precision literals into BOTH engines;
# the weighted sum is generated LEFT-ASSOCIATIVE in both (identical
# IEEE operation sequence -> identical bits), one division by the
# literal 100*W, round(6). Rows with fewer than K predecessors are
# excluded so the weight vector (and denominator) is constant.
EWMA_ALPHA = 0.25
EWMA_K = 24
EWMA_WEIGHTS = [EWMA_ALPHA * (1.0 - EWMA_ALPHA) ** j for j in range(EWMA_K)]
EWMA_DEN = 100.0 * sum(EWMA_WEIGHTS)  # left-assoc Python sum, literal below


def q_timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    v = F.round(F.col("value") * 100)  # integer-valued double, exact
    lags = [F.lag(v, j).over(w).alias(f"v{j}") for j in range(EWMA_K)]
    d = ev.select(
        "event_type",
        "ts",
        F.row_number().over(w).alias("rn"),
        *lags,
    ).filter(F.col("rn") >= EWMA_K)
    wsum = F.col("v0") * F.lit(EWMA_WEIGHTS[0])
    for j in range(1, EWMA_K):  # left-associative chain, mirrors the SQL
        wsum = wsum + F.col(f"v{j}") * F.lit(EWMA_WEIGHTS[j])
    d = d.select(
        "event_type",
        "ts",
        F.round(wsum / F.lit(EWMA_DEN), 6).alias("ewma"),
    )
    return (
        d.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max_by("ewma", "ts").alias("ewma_close"),
        )
    )


def _timeseries_ewma_sql() -> str:
    lag_cols = ",\n         ".join(
        f"lag(round(100 * value), {j}) OVER w AS v{j}" for j in range(EWMA_K)
    )
    wsum = " + ".join(f"v{j} * {EWMA_WEIGHTS[j]!r}" for j in range(EWMA_K))
    return f"""
WITH lagged AS (
  SELECT event_type, ts,
         row_number() OVER w AS rn,
         {lag_cols}
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
pts AS (
  SELECT event_type, ts, round(({wsum}) / {EWMA_DEN!r}, 6) AS ewma
  FROM lagged WHERE rn >= {EWMA_K}
)
SELECT event_type, date_trunc('hour', ts) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       max_by(ewma, ts) AS ewma_close
FROM pts GROUP BY 1, 2
"""


# --- MAD-based robust outlier detection --------------------------------------
# The robust twin of anomaly_zscore: median / median-absolute-
# deviation replaces mean / stddev, so a few extreme values cannot
# drag the threshold toward themselves (the classic failure of
# z-scores on heavy-tailed telemetry). Two grouped percentile passes
# (median of v, then median of |v - m|) + one conditional count.
# Values are 2dp-rounded doubles; both engines interpolate the even-
# count median as (a+b)/2 over IDENTICAL doubles, and the outlier
# comparison |v-m| > MAD_K*mad runs on identical doubles — exact
# cross-engine agreement without a rounding gate. At 100 TB the
# exact grouped percentile becomes approx_percentile exactly as the
# discretize_quantile_sketch key documents (mergeable KLL sketch,
# bounded task memory); the per-type key space keeps each sort
# partition-local here.
MAD_K = 6.0


def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir).select(
        "event_type", F.round("value", 2).alias("v")
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(v, 0.5)").alias("m")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "v", "m", F.abs(F.col("v") - F.col("m")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.first("m"), 6).alias("median"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                F.when(F.col("ad") > F.lit(MAD_K) * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )


ANOMALY_MAD_SQL = f"""
WITH ev AS (SELECT event_type, round(value, 2) AS v FROM events),
med AS (SELECT event_type, median(v) AS m FROM ev GROUP BY event_type),
dev AS (
  SELECT ev.event_type, ev.v, med.m, abs(ev.v - med.m) AS ad
  FROM ev JOIN med ON med.event_type = ev.event_type
),
mad AS (SELECT event_type, median(ad) AS mad FROM dev GROUP BY event_type)
SELECT dev.event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(any_value(dev.m), 6) AS median,
       round(any_value(mad.mad), 6) AS mad,
       CAST(sum(CASE WHEN dev.ad > {MAD_K} * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad ON mad.event_type = dev.event_type
GROUP BY dev.event_type
"""


# --- revenue concentration (top-decile share) --------------------------------
# The Pareto question every growth dashboard asks: what share of
# total revenue comes from the top 10% of users? Per-user revenue is
# an exact integer cent sum; the decile assignment is ntile(10) over
# (revenue DESC, user_id) — the id tie-break makes the boundary
# deterministic on both engines; the shares divide exact integers
# ONCE, rounded to 6dp. One shuffle on user_id + one ntile window
# over the (much smaller) per-user aggregate.


def q_agg_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    w = Window.orderBy(F.desc("cents"), "user_id")
    deciles = per_user.select(
        "cents", F.ntile(10).over(w).alias("decile")
    )
    return deciles.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("cents").alias("cents"),
    ).select(
        "decile",
        "n_users",
        "cents",
        F.round(
            F.col("cents").cast("double")
            / F.sum("cents").over(Window.partitionBy()).cast("double"),
            6,
        ).alias("revenue_share"),
    )


AGG_REVENUE_CONCENTRATION_SQL = """
WITH per_user AS (
  SELECT user_id, sum(CAST(round(100 * value) AS BIGINT)) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
deciles AS (
  SELECT cents, ntile(10) OVER (ORDER BY cents DESC, user_id) AS decile
  FROM per_user
),
agg AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM deciles GROUP BY decile
)
SELECT decile, n_users, cents,
       round(CAST(cents AS DOUBLE) / CAST(sum(cents) OVER () AS DOUBLE), 6)
         AS revenue_share
FROM agg
"""


# --- last-touch conversion attribution ---------------------------------------
# The marketing-analytics staple: credit each conversion (purchase)
# to the user's most recent touch event (click/view) inside a 24h
# lookback, else 'none'. ONE window pass per user carries the last
# touch forward — last(CASE..., ignorenulls) over ROWS UNBOUNDED
# PRECEDING..1 PRECEDING; the ts and type columns are two IGNORE
# NULLS picks whose CASEs null out on exactly the same rows, so they
# always come from the same touch row. No self-join, no as-of join:
# at 100 TB this is a single shuffle on user_id (the same shape as
# sessionization), and the output is channel-cardinality tiny.
# Parity: latency is summed in exact integer MICROS and divided once
# (the TWAP recipe); revenue is an exact integer cent sum.
ATTR_LOOKBACK_US = 24 * 3600 * 1_000_000


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    is_touch = F.col("event_type").isin("click", "view")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        "value",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("t_type"),
        F.last(F.when(is_touch, F.unix_micros("ts")), ignorenulls=True)
        .over(w)
        .alias("t_us"),
    ).filter(F.col("event_type") == "purchase")
    dt = F.unix_micros("ts") - F.col("t_us")
    attributed = (F.col("t_us").isNotNull()) & (dt <= ATTR_LOOKBACK_US)
    d = d.select(
        F.when(attributed, F.col("t_type")).otherwise(F.lit("none")).alias("channel"),
        F.when(attributed, dt).alias("dt_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return d.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_conv"),
        F.sum("cents").alias("revenue_cents"),
        F.round(
            F.sum("dt_us").cast("double") / (F.lit(1e6) * F.count("dt_us")), 6
        ).alias("avg_latency_s"),
    )


EVENTS_ATTRIBUTION_SQL = f"""
WITH marked AS (
  SELECT user_id, event_type, ts, value,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER w AS t_type,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS t_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
conv AS (
  SELECT CASE WHEN t_us IS NOT NULL
                   AND epoch_us(ts) - t_us <= {ATTR_LOOKBACK_US}
              THEN t_type ELSE 'none' END AS channel,
         CASE WHEN t_us IS NOT NULL
                   AND epoch_us(ts) - t_us <= {ATTR_LOOKBACK_US}
              THEN epoch_us(ts) - t_us END AS dt_us,
         CAST(round(100 * value) AS BIGINT) AS cents
  FROM marked WHERE event_type = 'purchase'
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_conv,
       CAST(sum(cents) AS BIGINT) AS revenue_cents,
       round(CAST(sum(dt_us) AS DOUBLE) / (1e6 * count(dt_us)), 6)
         AS avg_latency_s
FROM conv GROUP BY channel
"""


# --- cross-metric daily correlation ------------------------------------------
# "Which event volumes move together?": Pearson correlation of daily
# event counts for every event-type pair. The data-sized work is ONE
# map-side-combined (day, type) count agg; the pair join is the tiny
# daily table against itself on the day key (volume = days x
# C(|types|, 2)). Parity: corr is computed from EXACT integer sums
# (n, Sx, Sy, Sxy, Sxx, Syy) with two sqrts and one division over
# identical integers — no float accumulation crosses engines;
# 6dp-rounded. Degenerate pairs (zero variance on either side) emit
# NULL on both engines.


def daily_corr_from_counts(daily: DataFrame) -> DataFrame:
    """Pairwise Pearson over a (day, event_type, n) daily-count table
    — the shared back half of the batch key and its streaming twin."""
    a = daily.select("day", F.col("event_type").alias("type_a"), F.col("n").alias("x"))
    b = daily.select("day", F.col("event_type").alias("type_b"), F.col("n").alias("y"))
    pairs = a.join(b, "day").filter(F.col("type_a") < F.col("type_b"))
    s = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx"))
    vy = (F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy"))
    corr = F.when(
        (vx > 0) & (vy > 0),
        F.round(num / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))), 6),
    )
    return s.select("type_a", "type_b", "n_days", corr.alias("corr_daily"))


def q_agg_daily_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return daily_corr_from_counts(daily)


AGG_DAILY_CORR_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.n AS x, b.n AS y
  FROM daily a JOIN daily b ON a.day = b.day AND a.event_type < b.event_type
),
s AS (
  SELECT type_a, type_b, count(*) AS n_days,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT type_a, type_b, CAST(n_days AS BIGINT) AS n_days,
       CASE WHEN n_days * sxx - sx * sx > 0 AND n_days * syy - sy * sy > 0
            THEN round(CAST(n_days * sxy - sx * sy AS DOUBLE)
                       / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
                          * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))), 6)
       END AS corr_daily
FROM s
"""


# --- HyperLogLog distinct-count sketch (r11) ----------------------------------
# The mergeable-sketch family had KMV (stream_sketch_kmv) and
# approx-percentile (discretize_quantile_sketch); HLL is the canonical
# third member and the one every 100 TB distinct-count runs on. The
# engines' built-ins (Spark HLL++ vs DuckDB's approx_count_distinct)
# are NOT hash-compatible, so this key builds the sketch itself from
# the repo's md5 idiom — both engines compute the IDENTICAL registers:
#   h     = 60-bit int from md5('hll:' || user_id)   [dedup_near idiom]
#   reg   = h % 256, w = h div 256 (52 bits)
#   rho   = leading-zero rank = 53 - bitlength(w)  (53 if w = 0)
# and the estimator's denominator is kept in EXACT INTEGER space —
# sum over registers of 2^(53 - max_rho) plus 2^53 per empty register
# (max 2^61, fits BIGINT) — so no float-sum ordering can ever drift;
# the only float ops are one division, the alpha_256*m^2 scale, the
# small-range ln() correction, and the r13 empirical bias
# interpolation (precomputed-literal slopes), all in pinned textual
# order and rounded to 4dp. Output per event type: exact distinct,
# estimate,
# relative error (the artifact shows the sketch's real accuracy), and
# a 3-sigma acceptance flag (sigma ~= 1.04/sqrt(256) = 6.5%).
# Scale shape: ONE hash-agg by (type, register) with map-side combine
# (<= types x 256 rows), then a tiny per-type fold — the map-only
# mergeable shape HLL exists for. The exact count lives beside it for
# the error column (at 100 TB you would drop that branch).
HLL_M = 256
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)  # alpha_256, same literal in SQL

# Empirical bias table (r13, VERDICT r12 #5; re-simulated r14 per
# ADVICE r13) — HLL++'s methodology (Heule et al., "HyperLogLog in
# Practice", EDBT 2013) applied to THIS sketch's geometry:
# scripts/gen_hll_bias.py simulates 30000 sketches of n iid uniform
# 60-bit hashes per grid cardinality (seed 20260816, stderr ~0.1-0.4
# counts) and records (mean raw estimate, mean raw estimate - n).
# The raw estimator overshoots by up to +6.7% just past the
# linear-counting handoff (n ~ 2x m) and the bias fades into the
# simulation stderr by n ~ 4.4x m; knots are kept by a 2-sigma
# prefix rule (|bias| >= 2x stderr), which ends the zone at raw
# ~ 1121 and makes the interpolant MONOTONE — the r13 table's last
# three knots (3000 trials) were inside ~1.1 stderr, i.e. the tail
# was fitting noise. The correction is ZERO above the last knot. At
# query time the bias is piecewise-linear in the RAW estimate, with
# slopes precomputed as Python float literals so the Spark expression
# and the generated SQL do bit-identical arithmetic.
HLL_BIAS_RAW = [
    511.9373, 581.9096, 655.0145, 729.6625, 806.161,
    883.9413, 962.7952, 1042.4135, 1121.3965,
]
HLL_BIAS = [
    31.9373, 21.9096, 15.0145, 9.6625, 6.161,
    3.9413, 2.7952, 2.4135, 1.3965,
]
_HLL_SLOPES = [
    (HLL_BIAS[i + 1] - HLL_BIAS[i]) / (HLL_BIAS_RAW[i + 1] - HLL_BIAS_RAW[i])
    for i in range(len(HLL_BIAS) - 1)
]


def _hll_bias_col(e: Column) -> Column:
    """bias(e_raw) as a Spark Column: clamp-left, piecewise-linear
    inside the knots, zero above the last knot. Branch order and
    float literals mirror _hll_bias_sql exactly; the result is
    round(..., 6) on BOTH sides (repo float policy) because the two
    engines' interpolation multiply was measured one ulp apart."""
    expr = F.when(e <= F.lit(HLL_BIAS_RAW[0]), F.lit(HLL_BIAS[0]))
    for i, slope in enumerate(_HLL_SLOPES):
        expr = expr.when(
            e <= F.lit(HLL_BIAS_RAW[i + 1]),
            F.lit(HLL_BIAS[i]) + (e - F.lit(HLL_BIAS_RAW[i])) * F.lit(slope),
        )
    return F.round(expr.otherwise(F.lit(0.0)), 6)


def _hll_bias_sql(e: str) -> str:
    """The same bias(e_raw) as DuckDB SQL text, generated from the
    same constants (fuzzy/oracle.py discipline: never hand-drift)."""
    arms = [f"WHEN {e} <= {HLL_BIAS_RAW[0]!r} THEN {HLL_BIAS[0]!r}"]
    for i, slope in enumerate(_HLL_SLOPES):
        arms.append(
            f"WHEN {e} <= {HLL_BIAS_RAW[i + 1]!r} THEN {HLL_BIAS[i]!r} "
            f"+ ({e} - {HLL_BIAS_RAW[i]!r}) * {slope!r}"
        )
    return "round(CASE " + " ".join(arms) + " ELSE 0.0 END, 6)"


def hll_registers(ev: DataFrame) -> DataFrame:
    """The sketch STATE: (event_type, reg, mx) — at most HLL_M rows
    per type, max-mergeable. Factored so tests can pin the bound the
    100 TB mergeability claim rests on."""
    hashed = ev.select(
        "event_type",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    return (
        hashed.select(
            "event_type",
            (F.col("h") % HLL_M).alias("reg"),
            F.expr("h div 256").alias("w"),
        )
        .withColumn(
            "rho",
            F.when(F.col("w") == 0, F.lit(53)).otherwise(
                F.lit(53) - F.length(F.expr("bin(w)"))
            ),
        )
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("mx"))
    )


def hll_estimate(regs: DataFrame, ev: DataFrame) -> DataFrame:
    """Finisher shared by the batch key and the streaming twin: fold
    the register table (integer-exact denominator), apply the
    small-range correction, and join the exact distinct count for the
    artifact's accuracy columns."""
    folded = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - mx)")).alias("s_obs"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    est = folded.select(
        "event_type",
        (
            F.col("s_obs")
            + (F.lit(HLL_M) - F.col("n_obs"))
            * F.expr("shiftleft(CAST(1 AS BIGINT), 53)")
        ).alias("denom"),
        (F.lit(HLL_M) - F.col("n_obs")).alias("v_empty"),
    ).select(
        "event_type",
        (
            F.lit(HLL_ALPHA * HLL_M * HLL_M)
            * (F.lit(9007199254740992.0) / F.col("denom"))
        ).alias("e_raw"),
        "v_empty",
    ).select(
        "event_type",
        F.when(
            (F.col("e_raw") <= F.lit(2.5 * HLL_M)) & (F.col("v_empty") > 0),
            F.lit(float(HLL_M))
            * F.log(F.lit(float(HLL_M)) / F.col("v_empty")),
        )
        # bias-corrected raw (r13): identity above the last knot
        .otherwise(F.col("e_raw") - _hll_bias_col(F.col("e_raw")))
        .alias("e"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.round(F.col("e"), 4).alias("hll_estimate"),
            F.round(
                F.abs(F.col("e") - F.col("n_exact"))
                / F.col("n_exact")
                * F.lit(100.0),
                4,
            ).alias("rel_err_pct"),
            (
                F.abs(F.col("e") - F.col("n_exact")) / F.col("n_exact")
                <= F.lit(3.0 * 1.04) / F.lit(16.0)
            ).alias("within_3_sigma"),
        )
    )


def q_sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    return hll_estimate(hll_registers(ev), ev)


def _sketch_hll_sql() -> str:
    hexv = (
        "list_sum(list_transform(range(0, 15), "
        "i -> (CAST(strpos('0123456789abcdef', "
        "substr(md5('hll:' || CAST(user_id AS VARCHAR)), i + 1, 1)) AS BIGINT)"
        " - 1) << (4 * (14 - i))))"
    )
    return f"""
WITH h AS (
  SELECT event_type, {hexv} AS h FROM events
),
regs AS (
  SELECT event_type, h % {HLL_M} AS reg,
         max(CASE WHEN h // 256 = 0 THEN 53
                  ELSE 53 - length(bin(h // 256)) END) AS mx
  FROM h GROUP BY 1, 2
),
folded AS (
  SELECT event_type,
         sum(CAST(1 AS BIGINT) << (53 - mx)) AS s_obs,
         count(*) AS n_obs
  FROM regs GROUP BY 1
),
raw AS (
  SELECT event_type,
         {HLL_ALPHA * HLL_M * HLL_M!r}
             * (9007199254740992.0 /
                (s_obs + ({HLL_M} - n_obs)
                         * (CAST(1 AS BIGINT) << 53))) AS e_raw,
         ({HLL_M} - n_obs) AS v_empty
  FROM folded
),
est AS (
  SELECT event_type,
         CASE WHEN e_raw <= {2.5 * HLL_M!r} AND v_empty > 0
              THEN {float(HLL_M)!r}
                   * ln({float(HLL_M)!r} / v_empty)
              ELSE e_raw - ({_hll_bias_sql("e_raw")})
         END AS e
  FROM raw
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY 1
)
SELECT x.event_type, x.n_exact,
       round(e.e, 4) AS hll_estimate,
       round(abs(e.e - x.n_exact) / x.n_exact * 100.0, 4) AS rel_err_pct,
       abs(e.e - x.n_exact) / x.n_exact <= 3.0 * 1.04 / 16.0
           AS within_3_sigma
FROM exact x JOIN est e ON x.event_type = e.event_type
"""


def register_all() -> None:
    register("timeseries_gapfill", q_timeseries_gapfill, TIMESERIES_GAPFILL_SQL)
    register("sketch_hll_distinct", q_sketch_hll_distinct, _sketch_hll_sql())
    register("agg_active_users_7d", q_agg_active_users_7d, AGG_ACTIVE_USERS_7D_SQL)
    register(
        "window_retention_cohorts",
        q_window_retention_cohorts,
        WINDOW_RETENTION_COHORTS_SQL,
    )
    register(
        "events_path_transitions",
        q_events_path_transitions,
        EVENTS_PATH_TRANSITIONS_SQL,
    )
    register("window_streaks", q_window_streaks, WINDOW_STREAKS_SQL)
    register("join_scd2_pit", q_join_scd2_pit, _join_scd2_pit_sql())
    register("timeseries_twap", q_timeseries_twap, TIMESERIES_TWAP_SQL)
    register("timeseries_ohlc", q_timeseries_ohlc, TIMESERIES_OHLC_SQL)
    register("timeseries_ewma", q_timeseries_ewma, _timeseries_ewma_sql())
    register("events_attribution", q_events_attribution, EVENTS_ATTRIBUTION_SQL)
    register("events_rfm", q_events_rfm, EVENTS_RFM_SQL)
    register("agg_daily_corr", q_agg_daily_corr, AGG_DAILY_CORR_SQL)
    register("agg_market_basket", q_agg_market_basket, AGG_MARKET_BASKET_SQL)
    register(
        "timeseries_interpolate",
        q_timeseries_interpolate,
        TIMESERIES_INTERPOLATE_SQL,
    )
    register("anomaly_mad", q_anomaly_mad, ANOMALY_MAD_SQL)
    register(
        "agg_revenue_concentration",
        q_agg_revenue_concentration,
        AGG_REVENUE_CONCENTRATION_SQL,
    )
    register("anomaly_zscore", q_anomaly_zscore, ANOMALY_ZSCORE_SQL)
    register("scd2_build", q_scd2_build, SCD2_BUILD_SQL)
    register("merge_scd2", q_merge_scd2, SCD2_BUILD_SQL)
    register("drift_psi", q_drift_psi, DRIFT_PSI_SQL)
    register("drift_ks", q_drift_ks, DRIFT_KS_SQL)
    register("join_fuzzy_match", q_join_fuzzy_match, JOIN_FUZZY_MATCH_SQL)
    register("agg_stats_moments", q_agg_stats_moments, AGG_STATS_MOMENTS_SQL)
    register("agg_histogram", q_agg_histogram, AGG_HISTOGRAM_SQL)
    register("window_ntile", q_window_ntile, WINDOW_NTILE_SQL)
    register("sql_q13", q_sql_q13, SQL_Q13)
    register("join_interval", q_join_interval, JOIN_INTERVAL_SQL)
    register("text_dedup_soft", q_text_dedup_soft, TEXT_DEDUP_SOFT_SQL)
    register("doc_chunking", q_doc_chunking, DOC_CHUNKING_SQL)
    register("token_freq_topn", q_token_freq_topn, TOKEN_FREQ_TOPN_SQL)
    register(
        "embed_centroid_by_label", q_embed_centroid_by_label, _embed_centroid_sql()
    )
    register("simsearch_range", q_simsearch_range, _simsearch_range_sql())
    register("token_doc_freq", q_token_doc_freq, _token_doc_freq_sql())
    register("dedup_latest_event", q_dedup_latest_event, DEDUP_LATEST_EVENT_SQL)
    register("embed_quantize", q_embed_quantize, EMBED_QUANTIZE_SQL)
    register("window_funnel", q_window_funnel, WINDOW_FUNNEL_SQL)


# --- RFM customer segmentation ----------------------------------------------
# The classic marketing triad over the event stream: per-user Recency
# (days since last purchase, anchored at the corpus-max purchase ts so
# the result is replayable), Frequency (purchase count) and Monetary
# (exact integer cent sum), each quartiled with ntile(4) and mapped to
# a named segment. Parity: all three metrics are integers; the ntile
# orderings carry `user_id` as a total-order tiebreak so both engines
# assign identical quartiles (ntile's equal-buckets-remainder-first
# split is deterministic given a total order).
# Scale shape: ONE map-side-combined agg over events collapses the
# stream to |users| rows; the three ntile windows are global sorts of
# that already-tiny per-user table (users << events). At 100 TB the
# quartile edges come from approx_percentile over the same per-user
# agg (the discretize_quantile_sketch recipe) instead of a global
# sort — same outputs, no single-reducer window.


def rfm_score(per_user: DataFrame) -> DataFrame:
    """Score a (user_id, last_day, freq, cents) per-user table — the
    shared back half of the batch key and its streaming twin, so both
    paths are bit-identical by construction."""
    from pyspark.sql.window import Window

    anchored = per_user.select(
        "user_id",
        F.datediff(
            F.max("last_day").over(Window.partitionBy()), F.col("last_day")
        ).alias("recency_days"),
        "freq",
        "cents",
    )
    r = F.ntile(4).over(
        Window.orderBy(F.desc("recency_days"), F.col("user_id"))
    )
    f = F.ntile(4).over(Window.orderBy(F.col("freq"), F.col("user_id")))
    m = F.ntile(4).over(Window.orderBy(F.col("cents"), F.col("user_id")))
    scored = anchored.select(
        "user_id",
        "recency_days",
        "freq",
        "cents",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
    )
    seg = (
        F.when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "champion")
        .when((F.col("r_score") >= 3) & (F.col("f_score") >= 3), "loyal")
        .when((F.col("r_score") <= 2) & (F.col("m_score") >= 3), "at_risk")
        .when(F.col("r_score") <= 1, "hibernating")
        .otherwise("other")
    )
    return scored.select("*", seg.alias("segment"))


def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    return rfm_score(per_user)


EVENTS_RFM_SQL = """
WITH per_user AS (
  SELECT user_id,
         max(CAST(ts AS DATE)) AS last_day,
         count(*) AS freq,
         sum(CAST(round(100 * value) AS BIGINT)) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
anchored AS (
  SELECT user_id,
         datediff('day', last_day, max(last_day) OVER ()) AS recency_days,
         freq, cents
  FROM per_user
),
scored AS (
  SELECT user_id, recency_days, CAST(freq AS BIGINT) AS freq,
         CAST(cents AS BIGINT) AS cents,
         ntile(4) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
         ntile(4) OVER (ORDER BY freq, user_id) AS f_score,
         ntile(4) OVER (ORDER BY cents, user_id) AS m_score
  FROM anchored
)
SELECT user_id, recency_days, freq, cents, r_score, f_score, m_score,
       CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champion'
            WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
            WHEN r_score <= 2 AND m_score >= 3 THEN 'at_risk'
            WHEN r_score <= 1 THEN 'hibernating'
            ELSE 'other' END AS segment
FROM scored
"""


# --- market-basket association rules ----------------------------------------
# Frequent-pair mining over the TPC-H order baskets: support,
# directional confidence and lift for every part pair co-purchased in
# >= BASKET_MIN_SUPPORT orders. The pair generator is an equi-self-
# join ON THE BASKET KEY (l_orderkey) with p1 < p2 — join volume is
# sum over orders of C(basket_size, 2), bounded by the max basket
# size (7 lineitems in TPC-H), NEVER |parts|^2. At 100 TB the same
# plan holds because basket size is a data invariant; a pathological
# mega-basket would be capped/salted first (the join_salted_skew
# recipe). Parity: counts are exact integers; lift and confidence are
# ONE division of exact integers each (identical doubles on both
# engines), rounded 6dp; ordering ties break on the integer support
# then (p1, p2).
BASKET_MIN_SUPPORT = 2
BASKET_TOP_N = 50


def q_agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # localCheckpoint: baskets feeds FOUR consumers (the n_orders
    # count, item_n, and both self-join legs) — without it the
    # scan + (ok, p) distinct exchange re-executes per consumer
    # (r16, guide §5; blocks free via ContextCleaner when the plan
    # is dropped, nothing persists across query invocations)
    baskets = (
        li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_orders = baskets.select("ok").distinct().count()
    item_n = baskets.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))
    a = baskets.select("ok", F.col("p").alias("pa"))
    b = baskets.select("ok", F.col("p").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= BASKET_MIN_SUPPORT)
    )
    # no broadcast hints here (VERDICT r8 "What's wrong" #1): item_n
    # is |distinct parts|-sized — a catalog-sized dimension at 100 TB
    # that would blow the broadcast budget if hinted. Neither side is
    # provably small at scale (frequent pairs can be large too), so
    # let AQE pick the strategy from RUNTIME sizes: at fixture scale
    # it broadcasts whichever side fits, at 100 TB it falls back to a
    # shuffle hash join on the part key — both correct, never OOM.
    enriched = (
        pairs.join(
            item_n.withColumnRenamed("p", "pa")
                  .withColumnRenamed("cnt", "cnt_a"), "pa"
        )
        .join(
            item_n.withColumnRenamed("p", "pb")
                  .withColumnRenamed("cnt", "cnt_b"), "pb"
        )
        .select(
            "pa",
            "pb",
            "pair_n",
            "cnt_a",
            "cnt_b",
            F.round(
                F.col("pair_n").cast("double") / F.col("cnt_a"), 6
            ).alias("conf_a_to_b"),
            F.round(
                (F.lit(n_orders) * F.col("pair_n")).cast("double")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
    )
    return (
        enriched.orderBy(
            F.desc("pair_n"), F.desc("lift"), F.col("pa"), F.col("pb")
        )
        .limit(BASKET_TOP_N)
    )


AGG_MARKET_BASKET_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
),
n_ord AS (SELECT count(DISTINCT ok) AS n_orders FROM baskets),
item_n AS (SELECT p, count(*) AS cnt FROM baskets GROUP BY p),
pairs AS (
  SELECT a.p AS pa, b.p AS pb, count(*) AS pair_n
  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {BASKET_MIN_SUPPORT}
)
SELECT pa, pb, CAST(pair_n AS BIGINT) AS pair_n,
       CAST(ia.cnt AS BIGINT) AS cnt_a, CAST(ib.cnt AS BIGINT) AS cnt_b,
       round(CAST(pair_n AS DOUBLE) / ia.cnt, 6) AS conf_a_to_b,
       round(CAST(n_orders * pair_n AS DOUBLE) / (ia.cnt * ib.cnt), 6)
         AS lift
FROM pairs
JOIN item_n ia ON pairs.pa = ia.p
JOIN item_n ib ON pairs.pb = ib.p
CROSS JOIN n_ord
ORDER BY pair_n DESC, lift DESC, pa, pb
LIMIT {BASKET_TOP_N}
"""


# --- linear interpolation onto an hourly grid -------------------------------
# The resampling twin of timeseries_gapfill: instead of LOCF, each
# hourly grid point between a type's first and last observation gets
# the LINEAR interpolation of its surrounding observations. ZERO
# joins against the data: observations and grid points UNION into one
# stream and two IGNORE-NULLS window picks per side (value and ts
# null out on exactly the same rows, so both always come from the
# same observation) recover (prev, next) — the SCD2 union-marker
# plan. A grid point landing exactly on an observation sorts AFTER it
# ((t_us, is_grid) order), so prev == that observation and the
# interpolation factor is exactly 0. Parity: values are integer
# cents, timestamps integer micros; the factor is ONE division of
# exact integers, the result expression is identical on both engines,
# 6dp-rounded. Scale: one shuffle on event_type, grid is
# spine x |types| (tiny), window is partition-local.


def q_timeseries_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, sf_dir)
    obs = ev.select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        F.lit(0).alias("is_grid"),
    )
    d0, d1 = ev.agg(
        F.date_trunc("hour", F.min("ts")), F.date_trunc("hour", F.max("ts"))
    ).first()
    spine = spark.range(1).select(
        F.explode(
            F.expr(
                f"sequence(TIMESTAMP'{d0}', TIMESTAMP'{d1}', interval 1 hour)"
            )
        ).alias("g_ts")
    )
    types = ev.select("event_type").distinct()
    grid = spine.crossJoin(F.broadcast(types)).select(
        "event_type",
        F.unix_micros("g_ts").alias("t_us"),
        F.lit(None).cast("long").alias("v_cents"),
        F.lit(1).alias("is_grid"),
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("t_us", "is_grid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # "first obs strictly after me" re-expressed over the REVERSED
    # total order so the frame GROWS (unboundedPreceding..-1): Spark
    # evaluates growing frames incrementally in O(n), but a shrinking
    # (k, unboundedFollowing) frame is recomputed per row — O(n^2)
    # per partition, measured 29s at sf0.1 before this rewrite.
    w_next = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("t_us"), F.desc("is_grid"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    u = obs.unionByName(grid).select(
        "event_type",
        "t_us",
        "is_grid",
        F.last("v_cents", ignorenulls=True).over(w_prev).alias("v0"),
        F.last(
            F.when(F.col("v_cents").isNotNull(), F.col("t_us")),
            ignorenulls=True,
        ).over(w_prev).alias("t0"),
        F.last("v_cents", ignorenulls=True).over(w_next).alias("v1"),
        F.last(
            F.when(F.col("v_cents").isNotNull(), F.col("t_us")),
            ignorenulls=True,
        ).over(w_next).alias("t1"),
    )
    interior = u.filter(
        (F.col("is_grid") == 1)
        & F.col("v0").isNotNull()
        & F.col("v1").isNotNull()
    )
    interp = (
        F.col("v0")
        + (F.col("v1") - F.col("v0"))
        * (
            (F.col("t_us") - F.col("t0")).cast("double")
            / (F.col("t1") - F.col("t0")).cast("double")
        )
    ) / F.lit(100.0)
    return interior.select(
        "event_type",
        F.timestamp_micros(F.col("t_us")).alias("grid_ts"),
        F.round(interp, 6).alias("v_interp"),
    )


TIMESERIES_INTERPOLATE_SQL = """
WITH obs AS (
  SELECT event_type, epoch_us(ts) AS t_us,
         CAST(round(100 * value) AS BIGINT) AS v_cents, 0 AS is_grid
  FROM events
),
b AS (
  SELECT date_trunc('hour', min(ts)) AS d0, date_trunc('hour', max(ts)) AS d1
  FROM events
),
spine AS (
  SELECT unnest(range(d0, d1 + INTERVAL 1 HOUR, INTERVAL 1 HOUR)) AS g_ts
  FROM b
),
grid AS (
  SELECT t.event_type, epoch_us(CAST(s.g_ts AS TIMESTAMP)) AS t_us,
         CAST(NULL AS BIGINT) AS v_cents, 1 AS is_grid
  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t
),
u AS (
  SELECT event_type, t_us, is_grid,
         last_value(v_cents IGNORE NULLS) OVER wp AS v0,
         last_value(CASE WHEN v_cents IS NOT NULL THEN t_us END IGNORE NULLS)
           OVER wp AS t0,
         first_value(v_cents IGNORE NULLS) OVER wn AS v1,
         first_value(CASE WHEN v_cents IS NOT NULL THEN t_us END IGNORE NULLS)
           OVER wn AS t1
  FROM (SELECT * FROM obs UNION ALL SELECT * FROM grid)
  WINDOW wp AS (PARTITION BY event_type ORDER BY t_us, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wn AS (PARTITION BY event_type ORDER BY t_us, is_grid
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT event_type, make_timestamp(t_us) AS grid_ts,
       round((v0 + (v1 - v0) * (CAST(t_us - t0 AS DOUBLE)
                                / CAST(t1 - t0 AS DOUBLE))) / 100.0, 6)
         AS v_interp
FROM u
WHERE is_grid = 1 AND v0 IS NOT NULL AND v1 IS NOT NULL
"""
