"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec}, "sf": ...}.

Each query executes fully via the noop sink (no driver-side collect
skew); a tiny warmup action amortizes JVM/codegen startup out of q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "classify_wr",          # flagship: full fuzzy fit + broadcast WR scoring
    "metrics_gm_auc",       # fit + score + metrics
    "rulemerge_max",        # partitioned emulation + fusion
    "agg_pricing_summary",  # TPC-H q1 shape
    "filter_pred",          # pushdown + q6 shape
    "join_sortmerge",       # fact-fact shuffle join
    "join_broadcast",       # dim broadcast join
    "window_rank",          # per-group top-k
    "dedup_exact",          # hash-group dedup
    "dedup_minhash",        # MinHash-LSH banding near-dup
    "simsearch_topk",       # brute-force cosine top-k
    "text_tokens",          # tokenization scan
    "json_extract",         # json path extraction
    "stream_tumbling",      # structured-streaming windowed agg
]

# Second headline group (r8, VERDICT r7 item 3): the heavy surfaces
# added in r7-r8 were invisible to BENCH artifacts. Tracked under
# separate ext fields so the primary group stays comparable with
# BENCH_r01+ across rounds.
HEADLINE_EXT = [
    "merge_upsert",              # lakehouse MERGE: full-outer PK join + CASE
    "merge_scd2",                # type-2 MERGE: union-window version rebuild
    "stream_merge_upsert",       # stateful streaming CDC upsert
    "text_tfidf",                # one-scan tf + token-window df
    "bpe_train_merges",          # iterative tokenizer training loop
    "discretize_quantile_sketch",  # sketch edges + map-only binning
    "agg_active_users_7d",       # coverage-explode windowed distinct
    "agg_market_basket",         # basket-key pair mining (late r8)
    "timeseries_interpolate",    # zero-join union-window resample (late r8)
    "simsearch_pq_recall",       # Lloyd-trained PQ codebook + ADC recall (r9)
    "resample_smote_probe",      # SMOTE grid-pair probe (warm 5.8-6.5s, NOTES r11)
]

# Third headline group (r12): the surfaces added this round, tracked
# under their own fields so value/value_ext stay comparable with every
# earlier BENCH_r{N} artifact.
HEADLINE_R12 = [
    "dedup_substring",            # exact-substr accounting: gram window + islands
    "dedup_substring_trim",       # + complement-segment rebuild
    "simsearch_sq8",              # per-dim 8-bit ADC serve + re-rank
    "simsearch_bq",               # sign-bit Hamming serve + re-rank
    "media_decode_jpeg_progressive",  # SOF2 multi-scan decode (Arrow batches)
    "graph_sssp",                 # level-synchronous BFS to frontier drain
    # r13 (VERDICT r12 #2): the slowest streaming key, with a
    # demonstrated scaling cliff pre-sharding — must be
    # regression-tracked. value_r12_warm_baseline6 below keeps the
    # 6-key r12 series comparable across artifacts.
    "stream_dedup_substring",
]
_R12_BASELINE6 = HEADLINE_R12[:6]

# Fourth headline group (r14, VERDICT r13 #3): the heavy surfaces
# added in r13, artifact-tracked with warm medians + calibrated
# values under their own fields so every earlier series stays
# comparable.
HEADLINE_R13 = [
    "simsearch_ivf_sq8",            # IVF{K},SQ8 composed index (Lloyd + ADC)
    "stream_dedup_substring_trim",  # streaming trim twin (digest state)
    "graph_wcc",                    # large-star/small-star contraction
    "stream_mv_refresh",            # streaming delta-rule MV maintenance
    "resample_enn",                 # Wilson-editing kNN vote undersampling
    "embed_pca_power",              # one-pass covariance + power iteration
]

# Fifth headline group (r15): the heavy surfaces added in r14/r15,
# same cold + median-of-3 protocol, own fields so every earlier
# series stays comparable.
HEADLINE_R15 = [
    "metrics_pr_auc",            # bounded-grid average precision (r14)
    "stream_mv_refresh_minmax",  # minmax MV streaming twin + size-gated aff (r14/r15)
    "simsearch_ivf_sq8_residual",  # residual-encoded IVFADC (r15)
    "simsearch_opq_recall",      # OPQ-lite 3-variant recall study (r15)
    "simsearch_nsw_beam",        # NSW + medoid hubs, beam serve (r15)
    "stream_bloom_build",        # streaming Bloom maintenance twin (r15)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.session import get_spark
    from chi_frbcs_bigdatacs_spark.plans.registry import get_registry

    spark = get_spark(app_name="chi-frbcs-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = get_registry()

    def calibrate() -> float:
        """Fixed calibration probe (VERDICT r11 #1a): a pure parquet
        scan + group-agg over the fact table — no UDFs, no joins, no
        iteration — so its wall-clock tracks HOST TENANCY (cpu steal,
        page cache, JVM scheduling) and nothing about this repo's
        operators. Every query is reported both raw and divided by
        the calibration median, making cross-session comparisons
        meaningful on a box with ±40-50%% tenancy swings (judge's r11
        A/B data): calibrated units cancel the shared host factor."""
        t0 = time.perf_counter()
        (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sq"),
                F.sum("l_extendedprice").alias("sp"),
                F.count(F.lit(1)).alias("n"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return round(time.perf_counter() - t0, 4)

    # warmup: run the flagship pipeline once at the smallest sf so JVM
    # JIT + whole-stage codegen are warm before any timed query (the
    # recorded baseline is produced by this same harness, so warm-vs-warm
    # comparisons are apples-to-apples), then touch the fact table.
    # Warmup failures are non-fatal — a cold bench signal beats none.
    try:
        reg["metrics_gm_auc"].fn(spark, "/root/testdata/sf0.001").collect()
        reg["classify_wr"].fn(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    except Exception as exc:  # noqa: BLE001
        print(f"warmup failed (continuing cold): {exc!r}", file=sys.stderr)

    def run_pass(keys: list[str] = HEADLINE) -> tuple[dict[str, float], dict[str, str]]:
        """One timed pass. A broken query records an error string
        instead of zeroing the whole round's perf signal (VERDICT r3:
        one bad key crashed the bench and lost every timing)."""
        t: dict[str, float] = {}
        errs: dict[str, str] = {}
        for key in keys:
            t0 = time.perf_counter()
            try:
                df = reg[key].fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                t[key] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                errs[key] = repr(exc)[:500]
        return t, errs

    cal_samples: list[float] = [calibrate()]  # first: post-warmup, pre-cold

    timings, errs = run_pass()  # cold-ish: first planning/compile

    # Steady state: N_WARM full passes (default 5) so the artifact
    # carries per-query MEDIANS, not a single warm sample — this box
    # shows ±2-3x host-noise spikes (NOTES r4), and single-shot warm
    # numbers repeatedly mis-flagged regressions (VERDICT r4 item 1:
    # "plausibly noise is not a number"). Median-of-5 is the record.
    n_warm = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    warm_samples: dict[str, list[float]] = {k: [] for k in HEADLINE}
    warm_errs: dict[str, str] = {}
    for _ in range(n_warm):
        cal_samples.append(calibrate())  # interleaved: one per warm pass
        w, we = run_pass()
        warm_errs.update(we)
        for k, v in w.items():
            warm_samples[k].append(v)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    warm = {k: round(median(v), 3) for k, v in warm_samples.items() if v}

    # ext group: same cold + median-of-N protocol, separate fields.
    # Cold and warm error dicts stay SEPARATE (ADVICE r8): a key that
    # fails only warm must be distinguishable from a cold failure in
    # the artifact, matching the primary group's errs/warm_errs split.
    ext_timings, ext_errs = run_pass(HEADLINE_EXT)
    ext_samples: dict[str, list[float]] = {k: [] for k in HEADLINE_EXT}
    ext_warm_errs: dict[str, str] = {}
    for _ in range(n_warm):
        w, we = run_pass(HEADLINE_EXT)
        ext_warm_errs.update(we)
        for k, v in w.items():
            ext_samples[k].append(v)
    ext_warm = {k: round(median(v), 3) for k, v in ext_samples.items() if v}

    # r12 group: cold + median-of-3 (the keys are cheap; 3 passes
    # bound the added bench time while still resisting single-sample
    # host spikes).
    r12_timings, r12_errs = run_pass(HEADLINE_R12)
    r12_samples: dict[str, list[float]] = {k: [] for k in HEADLINE_R12}
    r12_warm_errs: dict[str, str] = {}
    for _ in range(min(n_warm, 3)):
        w, we = run_pass(HEADLINE_R12)
        r12_warm_errs.update(we)
        for k, v in w.items():
            r12_samples[k].append(v)
    r12_warm = {k: round(median(v), 3) for k, v in r12_samples.items() if v}

    # r13 group: same cold + median-of-3 protocol as the r12 group.
    r13_timings, r13_errs = run_pass(HEADLINE_R13)
    r13_samples: dict[str, list[float]] = {k: [] for k in HEADLINE_R13}
    r13_warm_errs: dict[str, str] = {}
    for _ in range(min(n_warm, 3)):
        w, we = run_pass(HEADLINE_R13)
        r13_warm_errs.update(we)
        for k, v in w.items():
            r13_samples[k].append(v)
    r13_warm = {k: round(median(v), 3) for k, v in r13_samples.items() if v}

    # r15 group: same cold + median-of-3 protocol.
    r15_timings, r15_errs = run_pass(HEADLINE_R15)
    r15_samples: dict[str, list[float]] = {k: [] for k in HEADLINE_R15}
    r15_warm_errs: dict[str, str] = {}
    for _ in range(min(n_warm, 3)):
        w, we = run_pass(HEADLINE_R15)
        r15_warm_errs.update(we)
        for k, v in w.items():
            r15_samples[k].append(v)
    r15_warm = {k: round(median(v), 3) for k, v in r15_samples.items() if v}

    cal = median(cal_samples)
    warm_cal = {k: round(v / cal, 2) for k, v in warm.items()}
    ext_warm_cal = {k: round(v / cal, 2) for k, v in ext_warm.items()}

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "value_warm": round(sum(warm.values()), 3),
        "queries_warm": warm,
        "warm_protocol": f"median_of_{n_warm}",
        # ADVICE r12: warm sums cover only keys with >=1 warm success;
        # a key erroring in ALL warm passes would silently shrink the
        # headline sum. n_summed makes the coverage explicit so
        # cross-round warm totals are only compared at equal counts
        # (the error is also recorded under warm:<key>).
        "warm_n_summed": [len(warm), len(HEADLINE)],
        # r16 (VERDICT r15 #10): BENCH_r14 went unparsed because the
        # one-line JSON outgrew the driver's tail-capture budget. The
        # per-query COLD dicts of the non-primary groups and the
        # warm-best dict are dropped from the line (never used in any
        # round-over-round comparison — those run on the warm medians
        # and calibrated series, all kept); every cold TOTAL stays.
        # The primary "queries" dict is the driver contract and stays.
        "value_ext": round(sum(ext_timings.values()), 3),
        "value_ext_warm": round(sum(ext_warm.values()), 3),
        "queries_ext_warm": ext_warm,
        "ext_warm_n_summed": [len(ext_warm), len(HEADLINE_EXT)],
        # r11 added resample_smote_probe as the 11th ext key; these
        # subtotals exclude it so the ext series stays comparable with
        # the 10-key BASELINE_BENCH/BENCH_r09-r10 artifacts.
        "value_ext_baseline10": round(
            sum(v for k, v in ext_timings.items() if k != "resample_smote_probe"),
            3,
        ),
        "value_ext_warm_baseline10": round(
            sum(v for k, v in ext_warm.items() if k != "resample_smote_probe"),
            3,
        ),
        # Calibrated units (r12, VERDICT r11 #1a): each warm median
        # divided by the calibration median. The probe is a fixed
        # parquet scan+group-agg on the fact table, sampled once
        # post-warmup and once before every warm pass — its samples
        # measure host tenancy, so dividing by it cancels the shared
        # host factor and makes cross-session comparisons meaningful.
        "calibration": {
            "probe": "lineitem parquet scan + groupBy(flag,status) 3-agg",
            "samples": cal_samples,
            "median": round(cal, 4),
        },
        "queries_warm_calibrated": warm_cal,
        "value_warm_calibrated": round(sum(warm_cal.values()), 2),
        "queries_ext_warm_calibrated": ext_warm_cal,
        "value_ext_warm_calibrated": round(sum(ext_warm_cal.values()), 2),
        "value_r12": round(sum(r12_timings.values()), 3),
        "value_r12_warm": round(sum(r12_warm.values()), 3),
        "queries_r12_warm": r12_warm,
        "r12_warm_n_summed": [len(r12_warm), len(HEADLINE_R12)],
        # r13 comparability subtotal: the original 6 r12 keys only,
        # so value_r12_warm_baseline6 lines up with BENCH_r12's
        # value_r12_warm even after stream_dedup_substring joined the
        # group.
        "value_r12_warm_baseline6": round(
            sum(v for k, v in r12_warm.items() if k in _R12_BASELINE6), 3
        ),
        "queries_r12_warm_calibrated": {
            k: round(v / cal, 2) for k, v in r12_warm.items()
        },
        "value_r12_warm_calibrated": round(
            sum(v / cal for v in r12_warm.values()), 2
        ),
        "value_r13": round(sum(r13_timings.values()), 3),
        "value_r13_warm": round(sum(r13_warm.values()), 3),
        "queries_r13_warm": r13_warm,
        "r13_warm_n_summed": [len(r13_warm), len(HEADLINE_R13)],
        "queries_r13_warm_calibrated": {
            k: round(v / cal, 2) for k, v in r13_warm.items()
        },
        "value_r13_warm_calibrated": round(
            sum(v / cal for v in r13_warm.values()), 2
        ),
        "value_r15": round(sum(r15_timings.values()), 3),
        "value_r15_warm": round(sum(r15_warm.values()), 3),
        "queries_r15_warm": r15_warm,
        "r15_warm_n_summed": [len(r15_warm), len(HEADLINE_R15)],
        "queries_r15_warm_calibrated": {
            k: round(v / cal, 2) for k, v in r15_warm.items()
        },
        "value_r15_warm_calibrated": round(
            sum(v / cal for v in r15_warm.values()), 2
        ),
    }
    if (
        errs or warm_errs or ext_errs or ext_warm_errs
        or r12_errs or r12_warm_errs or r13_errs or r13_warm_errs
        or r15_errs or r15_warm_errs
    ):
        # pass-qualified keys: "<key>" cold primary, "warm:<key>",
        # "ext:<key>", "ext_warm:<key>", "r12:<key>", "r12_warm:<key>",
        # "r13:<key>", "r13_warm:<key>"
        # — which pass failed is never collapsed away (ADVICE r8).
        merged = {
            **{f"warm:{k}": v for k, v in warm_errs.items()},
            **errs,
            **{f"ext:{k}": v for k, v in ext_errs.items()},
            **{f"ext_warm:{k}": v for k, v in ext_warm_errs.items()},
            **{f"r12:{k}": v for k, v in r12_errs.items()},
            **{f"r12_warm:{k}": v for k, v in r12_warm_errs.items()},
            **{f"r13:{k}": v for k, v in r13_errs.items()},
            **{f"r13_warm:{k}": v for k, v in r13_warm_errs.items()},
            **{f"r15:{k}": v for k, v in r15_errs.items()},
            **{f"r15_warm:{k}": v for k, v in r15_warm_errs.items()},
        }
        out["errors"] = merged
        out["n_failed"] = len(
            set(errs) | set(warm_errs) | set(ext_errs) | set(ext_warm_errs)
            | set(r12_errs) | set(r12_warm_errs)
            | set(r13_errs) | set(r13_warm_errs)
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
