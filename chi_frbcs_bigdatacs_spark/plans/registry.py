"""Registry of checked queries: key -> (Spark callable, DuckDB oracle).

This is the engine's public query surface. Every operator claimed in
SURVEY.md §2 registers here; __spark_entry__.queries()/oracle_sql()
are thin views over this registry, and the driver hash-compares each
pair at sf0.01. Queries without an oracle (non-SQL-expressible ops:
streaming, MinHash-LSH) register sql=None and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle, or None -> rows-only check


_REGISTRY: dict[str, QuerySpec] = {}

# The driver's correctness sweep checks the FIRST 50 registry keys in
# iteration order (observed rounds 1-12: CORRECTNESS_r{N} = keys
# 0..49 exactly). Keys listed here are yielded first so the driver
# verifies them this round; keys past the cap are NOT verified this
# round and rely on their latest green CORRECTNESS_r{N} row plus the
# local parity suite (tests/test_oracle_parity.py runs ALL oracled
# keys every CI run -- the rotation only affects which subset the
# external driver re-hashes).
#
# Round-14 window (VERDICT r13 "Next round" #1), composed from named
# groups below; the groups concatenate and the driver cap lands on
# the last _R7_STALE_FILL entry (39 + changed-plan + new + fill = 50):
#   (1) _R6_STALE: ALL 39 keys whose last external check is r6 —
#       derived by cross-referencing CORRECTNESS_r{01..13} (r06
#       artifact order, minus rule_conflict_resolve_d8 which
#       re-certified in r13). When these re-certify the staleness
#       floor jumps to r7 in one round.
#   (2) _CHANGED_PLAN_R13: keys whose plan changed this round with
#       bit-identical output (locally re-swept every CI run; this is
#       the external certification of the new plans).
#   (3) _NEW_R14: keys first registered this round — never
#       driver-checked. VERDICT r13 caps new keys at <=11 so all 39
#       stale keys fit.
#   (4) _R7_STALE_FILL: oldest r7 keys in CORRECTNESS_r07 artifact
#       order, as many as fit under the cap.
# r15 plan (VERDICT r13 #9): after r14 the floor is r7. 47 keys were
# r7-stale entering r14 and the fill below re-certifies the first 4
# (scan_csv .. sink_partitioned), leaving 43 r7-stale — lead r15
# with ALL 43 (CORRECTNESS_r07 artifact order, starting
# simsearch_ivf_build), cap new/changed keys at 7, fill any
# remainder from oldest r8.

_R6_STALE: list[str] = [
    "simsearch_ivf_kmeans",
    "simsearch_ivf_probe2",
    "simsearch_recall",
    "ruleweight_pcf_plain",
    "ruleweight_pcfcs_costmatrix",
    "agg_pricing_summary",
    "agg_rollup",
    "agg_percentile",
    "join_broadcast",
    "join_sortmerge",
    "agg_cube",
    "agg_distinct",
    "join_semi",
    "join_anti",
    "join_outer",
    "join_cross",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "setop_union",
    "setop_except",
    "setop_intersect",
    "unpivot_measures",
    "window_rank",
    "window_distribution",
    "fuzzify_nominal",
    "rulegen_nominal",
    "agg_pivot",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "join_salted",
    "topk_global",
    "dedup_exact",
    "dedup_groups",
    "dedup_hashkey",
    "embed_cosine",
    "simsearch_ivf",
    "media_meta",
    "media_frames",
]

_CHANGED_PLAN_R13: list[str] = [
    # graph_wcc: convergence probe collapsed from two exceptAll
    # count() actions per round to ONE full-outer-join null check
    # (VERDICT r13 #5) — labels identical, driver re-certifies the
    # rewritten loop.
    "graph_wcc",
    # sketch_hll_distinct is NOT here despite the r14 bias-table
    # re-simulation: at sf0.01 every per-type cardinality (~150) is
    # in the linear-counting branch and at sf0.1 (~1500) above both
    # tables' last knot, so outputs are unchanged at every checked SF
    # (same reasoning as the r13 table's original landing) — verified
    # by parity at sf0.001/0.01 before commit.
]

_NEW_R14: list[str] = [
    # filled in as r14 keys land; each addition evicts the tail of
    # _R7_STALE_FILL (the window-size check below keeps it exactly 50)
    "mv_incremental_refresh_minmax",  # new: MAX-retraction group re-scan
    "stream_mv_refresh_minmax",  # new: streaming twin, batch-tail re-scan
    "embed_pca_topk",  # new: k=3 PCA via driver-side Hotelling deflation
    "embed_pca_project",  # new: map-only per-vector component scores
    "resample_smote_enn",  # new: Batista 2004 SMOTE+ENN composite
    "metrics_pr_auc",  # new: threshold-sweep average precision (AC posterior)
]

# CORRECTNESS_r07 artifact order. Truncated to fit the 50-key cap at
# import time -- the slice below is the single source of truth.
_R7_STALE_FILL: list[str] = [
    "scan_csv",
    "scan_jsonl",
    "scan_orc",
    "sink_partitioned",
    "simsearch_ivf_build",
    "simsearch_ivf_from_index",
    "text_repetition",
    "corpus_report",
    "filter_length_band",
    "retrieval_hybrid_rrf",
    "bpe_top_merges",
]

_WINDOW = 50
CHECK_PRIORITY: list[str] = (
    _R6_STALE
    + _CHANGED_PLAN_R13
    + _NEW_R14
    + _R7_STALE_FILL[: _WINDOW - len(_R6_STALE) - len(_CHANGED_PLAN_R13) - len(_NEW_R14)]
)
# Window invariants raise unconditionally (ADVICE r13: bare asserts
# are stripped under python -O, silently desyncing the external
# driver's 50-key verification window).
if len(CHECK_PRIORITY) != _WINDOW:
    raise RuntimeError(
        f"rotation window is {len(CHECK_PRIORITY)} keys, expected {_WINDOW}"
    )
if len(set(CHECK_PRIORITY)) != _WINDOW:
    raise RuntimeError("duplicate key in rotation window")



def register(key: str, fn: QueryFn, sql: str | None = None) -> None:
    if key in _REGISTRY:
        raise ValueError(f"duplicate query key: {key}")
    _REGISTRY[key] = QuerySpec(key, fn, sql)


def get_registry() -> dict[str, QuerySpec]:
    """Import all operator catalogs (idempotent) and return the registry,
    ordered so the driver's capped correctness sweep (first 50 keys)
    hits CHECK_PRIORITY keys first."""
    import chi_frbcs_bigdatacs_spark.plans.catalog  # noqa: F401

    unknown = [k for k in CHECK_PRIORITY if k not in _REGISTRY]
    if unknown:
        # A typo'd rotation entry would otherwise silently shrink the
        # external driver's 50-key verification window.
        raise KeyError(f"CHECK_PRIORITY keys not registered: {unknown}")
    ordered: dict[str, QuerySpec] = {}
    for k in CHECK_PRIORITY:
        ordered[k] = _REGISTRY[k]
    for k, spec in _REGISTRY.items():
        if k not in ordered:
            ordered[k] = spec
    return ordered
