"""Registry of checked queries: key -> (Spark callable, DuckDB oracle).

This is the engine's public query surface. Every operator claimed in
SURVEY.md §2 registers here; __spark_entry__.queries()/oracle_sql()
are thin views over this registry, and the driver hash-compares each
pair at sf0.01. EVERY key carries a DuckDB oracle (sql is never None
since r13 — streaming ops register their strict batch twin's oracle,
and MinHash-LSH registers the banding self-join's SQL equivalent);
the local parity suite (tests/test_oracle_parity.py) sweeps all keys
vs DuckDB every CI run. Because the external driver only re-hashes
the FIRST 50 keys per round, CHECK_PRIORITY below rotates which keys
lead: stale keys (oldest external check first) plus this round's
new/changed-plan keys, so every key's latest external check stays
fresh over a bounded number of rounds.
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
    sql: str | None  # DuckDB oracle (always set; None kept for API compat only)


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
# Round-15 window (VERDICT r14 "Next round" #1, pinned in r14's
# registry comment), composed from named groups below; the groups
# concatenate and the driver cap lands on the last fill entry:
#   (1) _R7_STALE: ALL 43 keys whose last external check is r7 —
#       derived by cross-referencing CORRECTNESS_r{01..14}
#       (CORRECTNESS_r07 artifact order, starting
#       simsearch_ivf_build). When these re-certify the staleness
#       floor jumps to r8 in one round.
#   (2) _CHANGED_PLAN_R14: keys whose plan/tables changed with
#       locally-verified-identical output at checked SFs — external
#       certification of the new plans (includes sketch_hll_distinct
#       per ADVICE r14: the re-simulated bias table shipped in r14
#       without external re-certification).
#   (3) _NEW_R15: keys first registered this round — never
#       driver-checked. VERDICT r14 caps new/changed at <=7 total so
#       all 43 stale keys fit.
#   (4) _R8_STALE_FILL: oldest r8 keys in CORRECTNESS_r08 artifact
#       order, as many as fit under the cap (0 if groups 2+3 use all
#       7 slots).
# r16 plan: after r15 the floor is r8 (38 keys r8-stale). Lead r16
# with ALL 38 (CORRECTNESS_r08 artifact order, starting
# discretize_quantile_sketch), cap new/changed keys at 12, fill any
# remainder from oldest r9. Keys registered in r15 AFTER the 7-slot
# new/changed cap filled (never driver-checked yet — they MUST join
# the r16 new group): join_bloom_prune, stream_bloom_build,
# join_bloom_filtered.

_R7_STALE: list[str] = [
    "simsearch_ivf_build",
    "simsearch_ivf_from_index",
    "text_repetition",
    "corpus_report",
    "filter_length_band",
    "retrieval_hybrid_rrf",
    "bpe_top_merges",
    "drift_psi",
    "stream_index_maintain",
    "dedup_semantic",
    "profile_columns",
    "audit_fk_orphans",
    "scalar_zorder_key",
    "sample_group_topn",
    "discretize_quantile",
    "stream_drift_psi",
    "dedup_semantic_keep",
    "drift_ks",
    "stream_ivf_assign",
    "audit_duplicate_pk",
    "graph_pagerank",
    "anonymize_kgroups",
    "pipeline_training_data",
    "anomaly_zscore",
    "text_phrase_search",
    "text_posindex_build",
    "text_phrase_from_index",
    "scd2_build",
    "merge_upsert",
    "table_diff",
    "delete_cascade",
    "discretize_quantile_approx",
    "embed_project_rp",
    "agg_active_users_7d",
    "stream_merge_upsert",
    "bpe_train_merges",
    "scan_zorder_pruned",
    "mask_columns",
    "audit_freshness",
    "window_retention_cohorts",
    "stream_audit_freshness",
    "maintenance_compact",
    "text_tfidf",
]

_CHANGED_PLAN_R14: list[str] = [
    # sketch_hll_distinct: r14 re-simulated HLL bias table (30k
    # trials, monotone knots) changed raw-estimate correction in the
    # ~1121-1200 band; outputs unchanged at checked SFs but ADVICE
    # r14 asks for external certification of the new table.
    "sketch_hll_distinct",
]

_NEW_R15: list[str] = [
    # filled in as r15 keys land; each addition evicts the tail of
    # _R8_STALE_FILL (the window-size check below keeps it exactly 50)
    "metrics_roc_auc",  # new: trapezoidal ROC over the bounded posterior grid
    "simsearch_ivf_sq8_residual",  # new: residual-encoded IVFADC (VERDICT r14 #2)
    "mv_incremental_refresh_minmax",  # changed plan: size-gated aff broadcast
    "stream_mv_refresh_minmax",  # changed plan: streaming twin, same gate
    "simsearch_opq_recall",  # new: OPQ-lite (eigen-allocation + Hadamard rotation) vs raw PQ
    "simsearch_nsw_beam",  # new: graph-ANN — NSW + medoid hubs, beam-search serve
]

# CORRECTNESS_r08 artifact order. Truncated to fit the 50-key cap at
# import time -- the slice below is the single source of truth.
_R8_STALE_FILL: list[str] = [
    "discretize_quantile_sketch",
    "agg_count_min_sketch",
    "graph_triangle_count",
    "timeseries_ohlc",
    "stream_ohlc",
    "embed_pq_adc",
    "agg_hll_union",
    "sketch_kmv_overlap",
]

_WINDOW = 50
CHECK_PRIORITY: list[str] = (
    _R7_STALE
    + _CHANGED_PLAN_R14
    + _NEW_R15
    + _R8_STALE_FILL[: _WINDOW - len(_R7_STALE) - len(_CHANGED_PLAN_R14) - len(_NEW_R15)]
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
