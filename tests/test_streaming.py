"""Streaming batch-equivalence (SURVEY.md §5/M5): the Structured
Streaming tumbling/sliding aggregations must equal the same windowed
aggregation run in batch mode on the same input."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_tumbling_stream_equals_batch(spark):
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table
    from chi_frbcs_bigdatacs_spark.streaming.windows import q_stream_tumbling

    got = (
        q_stream_tumbling(spark, SF_SMALL)
        .toPandas()
        .sort_values(["hour", "event_type"], ignore_index=True)
    )
    ev = load_table(spark, SF_SMALL, "events")
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour"), "event_type", "n")
        .toPandas()
        .sort_values(["hour", "event_type"], ignore_index=True)
    )
    assert got.equals(want)


def test_sliding_stream_equals_batch(spark):
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table
    from chi_frbcs_bigdatacs_spark.streaming.windows import q_stream_sliding

    got = (
        q_stream_sliding(spark, SF_SMALL)
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    ev = load_table(spark, SF_SMALL, "events")
    want = (
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .toPandas()
        .sort_values(["window_start", "event_type"], ignore_index=True)
    )
    assert got.equals(want)


def test_stream_rule_stats_any_split_equals_batch(spark, tmp_path):
    """Incremental O8 statistics must equal the batch build for ANY
    micro-batch split of the training input — here four deliberately
    SKEWED files (one per class slice, very uneven sizes), so batches
    see wildly different class mixes and cell coverage. The final
    streamed sums must still match one batch pass (associativity of
    the mu-sum is the whole correctness argument for incremental rule
    maintenance)."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.fuzzy import rules as R
    from chi_frbcs_bigdatacs_spark.fuzzy.partitions import (
        LINEITEM_CLF_PARTITIONS as P,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf
    from chi_frbcs_bigdatacs_spark.streaming.stateful import q_stream_rule_stats
    from tests.conftest import SF_SMALL

    df = lineitem_clf(spark, SF_SMALL)
    src = str(tmp_path / "skewed_src")
    # four skewed appends: all of class 1 in one file, class 0 cut at
    # arbitrary unequal id boundaries
    parts = [
        df.filter(F.col("label") == 1),
        df.filter((F.col("label") == 0) & (F.col("id") % 100 < 7)),
        df.filter((F.col("label") == 0) & (F.col("id") % 100).between(7, 60)),
        df.filter((F.col("label") == 0) & (F.col("id") % 100 > 60)),
    ]
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)

    streamed = q_stream_rule_stats(spark, SF_SMALL, staged_src=src)

    ants = [R.label_col(i) for i in range(len(P.features))]
    fz = R.with_antecedent(R.fuzzify(df, P), P)
    touched = fz.select(*ants).distinct()
    batch = (
        R.candidate_cells(R.fuzzify(df, P), P)
        .groupBy(*ants, F.col("label").alias("cls"))
        .agg(F.round(F.sum("mu"), 6).alias("s"))
        .join(F.broadcast(touched), ants, "left_semi")
    )
    a = sorted(tuple(r) for r in streamed.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert a == b


def test_stream_stream_join_split_invariant(spark):
    """The stream-stream interval join's final appended result must
    not depend on how the time-ordered replay is chopped into
    micro-batches: 3-file and 6-file replays both equal the batch
    interval join."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.streaming.windows import (
        ATTRIB_WINDOW_MIN,
        q_stream_stream_join,
    )
    from tests.conftest import SF_SMALL

    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events

    ev = load_events(spark, SF_SMALL)
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("vts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("cts"),
    )
    batch = sorted(
        map(
            tuple,
            v.join(c, "user_id")
            .filter(
                (F.col("cts") >= F.col("vts"))
                & (
                    F.col("cts")
                    < F.col("vts") + F.expr(f"INTERVAL {ATTRIB_WINDOW_MIN} MINUTES")
                )
            )
            .select(
                "user_id",
                "view_id",
                "click_id",
                (F.unix_micros("cts") - F.unix_micros("vts")).alias("gap_us"),
            )
            .collect(),
        )
    )
    assert batch, "fixture must produce at least one attribution pair"
    for n_files in (3, 6):
        got = sorted(
            map(tuple, q_stream_stream_join(spark, SF_SMALL, n_files).collect())
        )
        assert got == batch, f"n_files={n_files} diverged from batch join"


def test_stream_minhash_pairs_invariant_under_skewed_split(spark, tmp_path):
    """The emitted verified pair set must not depend on how the
    corpus is split into micro-batches: stage a deliberately skewed
    3-file layout (one file carries over half the corpus) and compare
    against the batch MinHash operator."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.dedup_near import q_dedup_minhash
    from chi_frbcs_bigdatacs_spark.streaming.neardup import q_stream_dedup_minhash
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    src = str(tmp_path / "skewed_docs")
    parts = [
        docs.filter(F.col("doc_id") % 100 < 55),
        docs.filter((F.col("doc_id") % 100).between(55, 61)),
        docs.filter(F.col("doc_id") % 100 > 61),
    ]
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)

    streamed = sorted(
        map(tuple, q_stream_dedup_minhash(spark, SF_SMALL, staged_src=src).collect())
    )
    batch = sorted(map(tuple, q_dedup_minhash(spark, SF_SMALL).collect()))
    assert streamed == batch and streamed


def test_stream_twap_invariant_under_replay_split(spark):
    """The streaming TWAP carries exact integer state, so any
    time-ordered replay split must produce bit-identical sums: 3-file
    and 6-file stagings equal each other and the batch window key."""
    from chi_frbcs_bigdatacs_spark.operators.curation import q_timeseries_twap
    from chi_frbcs_bigdatacs_spark.streaming.stateful import q_stream_twap

    t3 = sorted(map(tuple, q_stream_twap(spark, SF_SMALL, n_files=3).collect()))
    t6 = sorted(map(tuple, q_stream_twap(spark, SF_SMALL, n_files=6).collect()))
    batch = sorted(map(tuple, q_timeseries_twap(spark, SF_SMALL).collect()))
    assert t3 and t3 == t6 == batch


def test_stream_anomaly_invariant_under_replay_split(spark):
    """The anomaly set is a pure function of the time-ordered event
    stream, not of how replay chops it into micro-batches: a 3-file
    and a 6-file staging produce the identical result, and both equal
    the batch prefix-window computation."""
    from chi_frbcs_bigdatacs_spark.operators.curation import q_anomaly_zscore
    from chi_frbcs_bigdatacs_spark.streaming.stateful import (
        q_stream_anomaly_detect,
    )

    a3 = sorted(map(tuple, q_stream_anomaly_detect(spark, SF_SMALL, n_files=3).collect()))
    a6 = sorted(map(tuple, q_stream_anomaly_detect(spark, SF_SMALL, n_files=6).collect()))
    batch = sorted(map(tuple, q_anomaly_zscore(spark, SF_SMALL).collect()))
    assert a3 and a3 == a6 == batch


def test_stream_attribution_invariant_under_replay_split(spark):
    """Attribution credits are a pure function of the time-ordered
    event stream: 3-file and 6-file replays equal each other and the
    batch window key (integer cents/micros state, one final
    division)."""
    from chi_frbcs_bigdatacs_spark.operators.curation import q_events_attribution
    from chi_frbcs_bigdatacs_spark.streaming.stateful import q_stream_attribution

    a3 = sorted(map(tuple, q_stream_attribution(spark, SF_SMALL, n_files=3).collect()))
    a6 = sorted(map(tuple, q_stream_attribution(spark, SF_SMALL, n_files=6).collect()))
    batch = sorted(map(tuple, q_events_attribution(spark, SF_SMALL).collect()))
    assert a3 and a3 == a6 == batch


def test_stream_kmv_sketch_invariant_under_skewed_split(spark, tmp_path):
    """Bottom-k merge is commutative/associative/idempotent, so the
    final sketch — and every pair estimate served from it — must not
    depend on how ingest chops the corpus: a deliberately skewed
    3-file staging equals the batch sketch estimates."""
    from chi_frbcs_bigdatacs_spark.operators.text import kmv_pair_estimates
    from chi_frbcs_bigdatacs_spark.streaming.stateful import q_stream_sketch_kmv

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    src = str(tmp_path / "skewed_docs_kmv")
    parts = [
        docs.filter(F.col("doc_id") % 100 < 60),
        docs.filter((F.col("doc_id") % 100).between(60, 64)),
        docs.filter(F.col("doc_id") % 100 > 64),
    ]
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)

    streamed = sorted(
        map(tuple, q_stream_sketch_kmv(spark, SF_SMALL, staged_src=src).collect())
    )
    toks = (
        docs.select(
            "lang",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("token"),
        )
        .filter(F.length("token") >= 3)
        .distinct()
        .withColumn("h", F.md5("token"))
    )
    from pyspark.sql.window import Window
    from chi_frbcs_bigdatacs_spark.operators.text import KMV_K

    wk = Window.partitionBy("lang").orderBy("h", "token")
    kmv = (
        toks.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= KMV_K)
        .select("lang", "token", "h")
    )
    batch = sorted(map(tuple, kmv_pair_estimates(kmv).collect()))
    assert streamed and streamed == batch


def test_stream_rfm_is_replay_split_invariant(spark):
    """The RFM twin must produce the identical scored table whatever
    the micro-batch split (state accumulators are max/sum/sum —
    order-free), and match the batch key exactly."""
    from chi_frbcs_bigdatacs_spark.operators.curation import q_events_rfm
    from chi_frbcs_bigdatacs_spark.streaming.stateful import q_stream_rfm
    from tests.conftest import SF_SMALL

    batch = sorted(map(tuple, q_events_rfm(spark, SF_SMALL).collect()))
    s3 = sorted(map(tuple, q_stream_rfm(spark, SF_SMALL, n_files=3).collect()))
    s6 = sorted(map(tuple, q_stream_rfm(spark, SF_SMALL, n_files=6).collect()))
    assert s3 == batch
    assert s6 == batch


def test_stream_token_budget_equals_batch(spark):
    """The token-budget twin must equal the batch ranking row for row
    (sums are order-free; the finisher is shared code)."""
    from chi_frbcs_bigdatacs_spark.operators.text import q_corpus_token_budget
    from chi_frbcs_bigdatacs_spark.streaming.stateful import (
        q_stream_token_budget,
    )
    from tests.conftest import SF_SMALL

    batch = sorted(map(tuple, q_corpus_token_budget(spark, SF_SMALL).collect()))
    stream = sorted(map(tuple, q_stream_token_budget(spark, SF_SMALL).collect()))
    assert stream == batch


def test_stream_daily_corr_equals_batch(spark):
    """The correlation twin must equal the batch key row for row
    (per-day tallies are order-free sums; the Pearson finisher is
    shared code)."""
    from chi_frbcs_bigdatacs_spark.operators.curation import q_agg_daily_corr
    from chi_frbcs_bigdatacs_spark.streaming.stateful import (
        q_stream_daily_corr,
    )
    from tests.conftest import SF_SMALL

    batch = sorted(map(tuple, q_agg_daily_corr(spark, SF_SMALL).collect()))
    stream = sorted(map(tuple, q_stream_daily_corr(spark, SF_SMALL).collect()))
    assert stream == batch


def test_stream_late_data_is_actually_dropped(spark):
    """The watermark-semantics key (VERDICT r10 #7) must PROVE the
    watermark bites: every event type loses rows to the late filter
    (n_dropped_late > 0), the drop volume equals the staged stragglers
    inside closed windows (accepted + dropped == staged closed rows,
    by construction of n_dropped_late — so assert against the
    independent straggler formula instead), and an in-order replay of
    the SAME aggregation (stream_tumbling) counts strictly more rows."""
    from chi_frbcs_bigdatacs_spark.streaming.windows import (
        LATE_STRAGGLER_END,
        LATE_WM_DELAY_HOURS,
        q_stream_late_data_accounting,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_events
    from tests.conftest import SF_SMALL

    rows = {
        r.event_type: r for r in
        q_stream_late_data_accounting(spark, SF_SMALL).collect()
    }
    assert rows, "no output"
    for et, r in rows.items():
        assert r.n_dropped_late > 0, f"{et}: watermark never dropped a row"
        assert r.n_accepted > r.n_dropped_late  # stragglers are the minority
    # independent straggler model: dropped == stragglers in closed windows
    ev = load_events(spark, SF_SMALL)
    expected = {
        r.event_type: r.n for r in (
            ev.crossJoin(
                F.broadcast(ev.agg(F.max("ts").alias("tmax")))
            )
            .filter(
                F.expr(
                    "event_id % 7 = 0"
                    f" AND ts < TIMESTAMP '{LATE_STRAGGLER_END}'"
                    " AND date_trunc('hour', ts) + INTERVAL 1 HOUR"
                    f" <= tmax - INTERVAL {LATE_WM_DELAY_HOURS} HOUR"
                )
            )
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert {k: v.n_dropped_late for k, v in rows.items()} == expected


def test_checkpoint_recovery_really_restores_state(spark, tmp_path):
    """The recovery key's claim, proven phase by phase in private
    dirs: phase 1 (half the files) emits a strict non-empty SUBSET of
    the final windows; phase 2 (a NEW query on the SAME checkpoint)
    completes the result WITHOUT re-emitting phase-1 windows
    (exactly-once sink: no duplicate (hour, event_type) rows) and
    with boundary-straddling windows counting rows from BOTH phases
    (state restore, not a fresh aggregation)."""
    from chi_frbcs_bigdatacs_spark.streaming.windows import (
        N_RECOVERY_FILES,
        RECOVERY_PHASE1,
        _recovery_phase,
    )
    from tests.conftest import SF_SMALL

    work = str(tmp_path / "rec")
    _recovery_phase(spark, SF_SMALL, work, RECOVERY_PHASE1)
    p1 = spark.read.parquet(f"{work}/data").collect()
    _recovery_phase(spark, SF_SMALL, work, N_RECOVERY_FILES)
    final = spark.read.parquet(f"{work}/data").collect()
    assert 0 < len(p1) < len(final), (len(p1), len(final))
    # exactly-once: no (hour, event_type) appears twice in the sink
    keys = [(r.hour, r.event_type) for r in final]
    assert len(keys) == len(set(keys)), "duplicate window emissions"
    # phase-1 rows survive verbatim (never re-emitted or re-counted)
    p1_map = {(r.hour, r.event_type): r.n for r in p1}
    f_map = {(r.hour, r.event_type): r.n for r in final}
    assert all(f_map[k] == v for k, v in p1_map.items())
    # state restore: at least one window emitted in phase 2 contains
    # rows whose event time predates the phase boundary (it was open
    # in the state store when phase 1 terminated). The LAST phase-1
    # file's max ts bounds what phase 1 saw; any phase-2-emitted
    # window starting before it must straddle.
    import os

    import pandas as pd

    from chi_frbcs_bigdatacs_spark.streaming.windows import (
        _events_tsorder_src,
    )

    full = _events_tsorder_src(spark, SF_SMALL, N_RECOVERY_FILES)
    seen1 = pd.concat(
        [
            pd.read_parquet(f"{full}/{f}")
            for f in sorted(os.listdir(full))[:RECOVERY_PHASE1]
        ]
    )
    t_boundary = pd.to_datetime(seen1["ts"]).max()
    p2_keys = set(f_map) - set(p1_map)
    straddlers = [k for k in p2_keys if pd.Timestamp(k[0]) < t_boundary]
    assert straddlers, "no phase-2 window straddles the restart boundary"


def test_stream_hll_equals_batch_sketch(spark):
    """The streaming HLL twin must equal the batch key row for row:
    max-merge registers are arrival-order invariant, and the finisher
    is shared code — any divergence means the incremental state
    maintenance corrupted a register."""
    from chi_frbcs_bigdatacs_spark.operators.curation import (
        q_sketch_hll_distinct,
    )
    from chi_frbcs_bigdatacs_spark.streaming.windows import (
        q_stream_sketch_hll,
    )
    from tests.conftest import SF_SMALL

    batch = sorted(map(tuple, q_sketch_hll_distinct(spark, SF_SMALL).collect()))
    stream = sorted(map(tuple, q_stream_sketch_hll(spark, SF_SMALL).collect()))
    assert stream == batch


def test_cdc_checkpoint_recovery_restores_custom_state(spark, tmp_path):
    """r12 (VERDICT r11 #7): the applyInPandasWithState recovery key's
    claims, phase by phase in a private dir. The staging puts every
    base row in phase 1 and every changeset op in phase 2, so:
    (a) offsets resume + exactly-once sink: phase 1 emits exactly one
        n_seen=1 'keep' row per base key, and phase 2 adds exactly one
        row per changeset key — any base-file reprocessing would
        duplicate phase-1 emissions;
    (b) CUSTOM state restore is load-bearing: every 'U' op arrives
        AFTER the restart, and its emitted row is present=true with
        n_seen=2 — possible only if the key's pending base half came
        back out of the restored state store."""
    from chi_frbcs_bigdatacs_spark.operators.lakehouse import _changeset, _target
    from chi_frbcs_bigdatacs_spark.streaming.cdc import (
        CDC_RECOVERY_FILES,
        CDC_RECOVERY_PHASE1,
        _cdc_recovery_phase,
    )
    from tests.conftest import SF_SMALL

    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    n_base = _target(o).count()
    chg = _changeset(o)
    n_chg = chg.count()
    upd_keys = {
        r.o_orderkey for r in chg.filter(F.col("op") == "U").collect()
    }
    assert upd_keys, "fixture has no U ops - the state-restore claim is vacuous"

    work = str(tmp_path / "cdcrec")
    _cdc_recovery_phase(spark, SF_SMALL, work, CDC_RECOVERY_PHASE1)
    p1 = spark.read.parquet(f"{work}/data").collect()
    assert len(p1) == n_base, (len(p1), n_base)
    assert all(r.n_seen == 1 and r.merge_action == "keep" for r in p1)

    _cdc_recovery_phase(spark, SF_SMALL, work, CDC_RECOVERY_FILES)
    final = spark.read.parquet(f"{work}/data").collect()
    # exactly-once: phase 2 appended one emission per changeset key,
    # and phase-1 rows were not re-emitted (offset resume)
    assert len(final) == n_base + n_chg, (len(final), n_base, n_chg)
    p2 = [r for r in final if r.n_seen >= 2 or r.merge_action != "keep"]
    assert len(p2) == n_chg
    # state restore: every post-restart update merged against its
    # phase-1 base half
    upd_rows = [r for r in final if r.merge_action == "update"]
    assert {r.o_orderkey for r in upd_rows} == upd_keys
    assert all(r.present and r.n_seen == 2 for r in upd_rows)


def test_stream_substring_dedup_invariant_under_skewed_split(spark, tmp_path):
    """Retroactive emission (r12): whether both occurrences of a
    duplicated gram arrive in one micro-batch, in two adjacent ones,
    or split across a skewed 3-file layout, the final per-doc span
    accounting must equal the batch ExactSubstr operator exactly —
    the buffered-first-occurrence state is what makes the hit set
    split-invariant."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.dedup_near import (
        q_dedup_substring,
    )
    from chi_frbcs_bigdatacs_spark.streaming.neardup import (
        q_stream_dedup_substring,
    )
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    src = str(tmp_path / "skewed_docs_substr")
    parts = [
        docs.filter(F.col("doc_id") % 100 < 55),
        docs.filter((F.col("doc_id") % 100).between(55, 61)),
        docs.filter(F.col("doc_id") % 100 > 61),
    ]
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)

    streamed = sorted(
        map(
            tuple,
            q_stream_dedup_substring(
                spark, SF_SMALL, staged_src=src
            ).collect(),
        )
    )
    batch = sorted(map(tuple, q_dedup_substring(spark, SF_SMALL).collect()))
    assert streamed == batch and streamed
    assert any(r[2] > 0 for r in batch), "fixture must contain dup spans"


def test_stream_substring_trim_invariant_under_skewed_split(spark, tmp_path):
    """The trim twin (r13): the same skewed 3-file split must
    reproduce the batch complement-segment rebuild byte-for-byte —
    clean_text included, since a single mis-buffered occurrence would
    shift every downstream segment boundary in that doc."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.dedup_near import (
        q_dedup_substring_trim,
    )
    from chi_frbcs_bigdatacs_spark.streaming.neardup import (
        q_stream_dedup_substring_trim,
    )
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    src = str(tmp_path / "skewed_docs_substr_trim")
    parts = [
        docs.filter(F.col("doc_id") % 100 < 23),
        docs.filter((F.col("doc_id") % 100).between(23, 88)),
        docs.filter(F.col("doc_id") % 100 > 88),
    ]
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)

    streamed = sorted(
        map(
            tuple,
            q_stream_dedup_substring_trim(
                spark, SF_SMALL, staged_src=src
            ).collect(),
        )
    )
    batch = sorted(
        map(tuple, q_dedup_substring_trim(spark, SF_SMALL).collect())
    )
    assert streamed == batch and streamed
    # the fixture must actually trim something
    full = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", F.length("text").alias("n_chars"))
        .collect()
    }
    assert any(r[1] < full[r[0]] for r in batch), "nothing was trimmed"


def test_stream_mv_refresh_invariant_under_skewed_split(spark, tmp_path):
    """The streaming MV twin (r13) accumulates retract/add deltas via
    the built-in streaming aggregation; delta aggregation commutes,
    so a skewed 3-file changeset split must yield the exact batch
    refresh — including the group-moving 'R' rows whose retract and
    add can land in DIFFERENT micro-batches."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.lakehouse import (
        _changeset,
        q_mv_incremental_refresh,
    )
    from chi_frbcs_bigdatacs_spark.streaming.cdc import q_stream_mv_refresh
    from tests.conftest import SF_SMALL

    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    c = _changeset(o).select("o_orderkey", "op", "c_status", "c_price")
    src = str(tmp_path / "mv_cdc_skewed")
    parts = [
        c.filter(F.col("o_orderkey") % 100 < 7),
        c.filter((F.col("o_orderkey") % 100).between(7, 71)),
        c.filter(F.col("o_orderkey") % 100 > 71),
    ]
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)

    streamed = sorted(
        map(
            tuple,
            q_stream_mv_refresh(spark, SF_SMALL, staged_src=src).collect(),
        )
    )
    batch = sorted(
        map(tuple, q_mv_incremental_refresh(spark, SF_SMALL).collect())
    )
    assert streamed == batch and streamed
    assert any(r[0] == "R" for r in batch), "group-moving rows missing"


def test_stream_mv_refresh_minmax_invariant_under_skewed_split(spark, tmp_path):
    """The MAX-retraction streaming twin (r14): the streaming layer
    accumulates only the commutative delta stats (retract/add count +
    max); the non-self-maintainable affected-group re-scan runs in
    the shared batch tail. A skewed 3-file changeset split — a max
    row's U retract and add can land in different micro-batches —
    must yield the exact batch refresh."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.lakehouse import (
        _changeset_cust,
        q_mv_incremental_refresh_minmax,
    )
    from chi_frbcs_bigdatacs_spark.streaming.cdc import (
        q_stream_mv_refresh_minmax,
    )
    from tests.conftest import SF_SMALL

    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    c = _changeset_cust(o)
    src = str(tmp_path / "mvmm_cdc_skewed")
    parts = [
        c.filter(F.col("c_key") % 100 < 7),
        c.filter((F.col("c_key") % 100).between(7, 71)),
        c.filter(F.col("c_key") % 100 > 71),
    ]
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)

    streamed = sorted(
        map(
            tuple,
            q_stream_mv_refresh_minmax(
                spark, SF_SMALL, staged_src=src
            ).collect(),
        )
    )
    batch = sorted(
        map(tuple, q_mv_incremental_refresh_minmax(spark, SF_SMALL).collect())
    )
    assert streamed == batch and streamed

    # r15 aff size gate: the streaming twin forced into shuffle-hash
    # mode (aff_broadcast_max=0) must still be bit-equal to batch
    streamed_sh = sorted(
        map(
            tuple,
            q_stream_mv_refresh_minmax(
                spark, SF_SMALL, staged_src=src, aff_broadcast_max=0
            ).collect(),
        )
    )
    assert streamed_sh == batch


def test_stream_bloom_build_invariant_under_skewed_split(spark, tmp_path):
    """stream_bloom_build (38th strict twin): the Bloom word state is
    an idempotent bit_or, so the finished accounting must be
    bit-identical to the batch key under a deliberately skewed
    micro-batch split — including one file that duplicates rows
    already seen (idempotence, the property a filter maintained from
    an at-least-once source needs)."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.quality import q_join_bloom_prune
    from chi_frbcs_bigdatacs_spark.streaming.windows import q_stream_bloom_build
    from tests.conftest import SF_SMALL

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    src = str(tmp_path / "skewed_orders")
    parts = [
        orders.filter(F.col("o_orderkey") % 100 < 70),
        orders.filter((F.col("o_orderkey") % 100).between(70, 74)),
        orders.filter(F.col("o_orderkey") % 100 >= 70),  # overlaps on purpose
    ]
    for p in parts:
        p.coalesce(1).write.mode("append").parquet(src)

    streamed = q_stream_bloom_build(spark, SF_SMALL, staged_src=src).collect()
    batch = q_join_bloom_prune(spark, SF_SMALL).collect()
    assert list(map(tuple, streamed)) == list(map(tuple, batch)) and streamed
