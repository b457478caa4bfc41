"""Semantic invariants for the lakehouse CDC trio + the round-7
scale-path operators, beyond the cross-engine parity gate:
MERGE branch accounting, diff/changeset agreement, cascade-delete
conservation, streaming-merge arrival-order invariance, and the
JL projection's rank/isometry sanity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _orders(spark):
    return spark.read.parquet(f"{SF_SMALL}/orders.parquet")


def test_merge_branches_partition_the_keyspace(spark):
    """Every MERGE branch lands where ANSI semantics say: I keys are
    inserted, D keys are gone, U keys carry the updated status/price,
    untouched target rows pass through bit-identically."""
    from chi_frbcs_bigdatacs_spark.operators.lakehouse import (
        _MERGE_UPDATE_STATUS,
        merged_snapshot,
    )

    o = _orders(spark)
    merged = merged_snapshot(o).cache()
    try:
        rows = {r["o_orderkey"]: r for r in merged.collect()}
        for r in o.collect():
            k = r["o_orderkey"]
            if k % 10 >= 8:  # insert
                assert rows[k]["merge_action"] == "insert"
                assert rows[k]["o_totalprice"] == r["o_totalprice"]
            elif k % 13 == 0:  # delete
                assert k not in rows
            elif k % 7 == 0:  # update
                assert rows[k]["merge_action"] == "update"
                assert rows[k]["o_orderstatus"] == _MERGE_UPDATE_STATUS
                assert rows[k]["o_totalprice"] == r["o_totalprice"] + 1.0
            else:  # keep
                assert rows[k]["merge_action"] == "keep"
                assert rows[k]["o_orderstatus"] == r["o_orderstatus"]
                assert rows[k]["o_totalprice"] == r["o_totalprice"]
        assert len(rows) == merged.count()  # key is unique in the output
    finally:
        merged.unpersist()


def test_table_diff_counts_equal_changeset_arithmetic(spark):
    from chi_frbcs_bigdatacs_spark.operators.lakehouse import q_table_diff

    o = _orders(spark)
    keys = [r["o_orderkey"] for r in o.select("o_orderkey").collect()]
    n_added = sum(1 for k in keys if k % 10 >= 8)
    n_removed = sum(1 for k in keys if k % 10 < 8 and k % 13 == 0)
    n_changed = sum(
        1 for k in keys if k % 10 < 8 and k % 13 != 0 and k % 7 == 0
    )
    got = {
        r["diff"]: r["n"]
        for r in q_table_diff(spark, SF_SMALL).groupBy("diff").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert got == {"added": n_added, "removed": n_removed, "changed": n_changed}


def test_delete_cascade_conserves_rows(spark):
    """Conservation + EXACT per-table deleted counts recomputed from
    the erased key set (c_custkey % 97 == 0). Cross-table monotonicity
    (orders deleted >= customers deleted) is deliberately NOT asserted:
    a customer with zero orders makes it fixture-dependent, not an
    operator invariant (ADVICE r7)."""
    from chi_frbcs_bigdatacs_spark.operators.lakehouse import q_delete_cascade
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table

    audit = {r["table_name"]: r for r in q_delete_cascade(spark, SF_SMALL).collect()}
    for t in ("customer", "orders", "lineitem"):
        assert audit[t]["n_rows"] == audit[t]["n_deleted"] + audit[t]["n_remaining"]
    erased_c = {
        r["c_custkey"]
        for r in load_table(spark, SF_SMALL, "customer")
        .filter(F.col("c_custkey") % 97 == 0)
        .select("c_custkey")
        .collect()
    }
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    erased_o = {r["o_orderkey"] for r in orders if r["o_custkey"] in erased_c}
    n_li = sum(
        1
        for r in load_table(spark, SF_SMALL, "lineitem")
        .select("l_orderkey")
        .collect()
        if r["l_orderkey"] in erased_o
    )
    assert audit["customer"]["n_deleted"] == len(erased_c) >= 1
    assert audit["orders"]["n_deleted"] == sum(
        1 for r in orders if r["o_custkey"] in erased_c
    )
    assert audit["lineitem"]["n_deleted"] == n_li


def test_stream_merge_invariant_under_op_before_base_split(spark, tmp_path):
    """The streaming MERGE must converge to the batch result even when
    every changeset op arrives BEFORE its base row (the adversarial
    arrival order for upsert state): stage changeset-first files and
    compare against the batch operator."""
    from chi_frbcs_bigdatacs_spark.operators.lakehouse import (
        _changeset,
        _target,
        merged_snapshot,
    )
    from chi_frbcs_bigdatacs_spark.streaming.cdc import q_stream_merge_upsert

    o = _orders(spark)
    src = str(tmp_path / "cdc_op_first")
    chg = _changeset(o).select("o_orderkey", "op", "c_status", "c_price")
    base = _target(o).select(
        "o_orderkey",
        F.lit("B").alias("op"),
        F.col("o_orderstatus").alias("c_status"),
        F.col("o_totalprice").alias("c_price"),
    )
    # file 1: ALL ops; files 2-3: the base snapshot split unevenly
    chg.coalesce(1).write.mode("append").parquet(src)
    base.filter(F.col("o_orderkey") % 5 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    base.filter(F.col("o_orderkey") % 5 != 0).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    streamed = sorted(
        map(tuple, q_stream_merge_upsert(spark, SF_SMALL, staged_src=src).collect())
    )
    batch = sorted(map(tuple, merged_snapshot(o).collect()))
    assert streamed == batch and streamed


def test_rp_projection_rank_and_isometry(spark):
    """The sign matrix must be full-rank (the r7 hash fix: the weak
    multiplicative hash produced p_{j+7} == -p_j) and the scaled
    projection roughly norm-preserving on real fixture vectors (JL
    with k=16: loose [0.4, 2.2] ratio band, deterministic data)."""
    from chi_frbcs_bigdatacs_spark.operators.similarity import (
        DIM,
        RP_DIM,
        _rp_sign,
        q_embed_project_rp,
    )

    M = np.array(
        [[_rp_sign(i, j) for j in range(RP_DIM)] for i in range(DIM)],
        dtype=np.float64,
    )
    assert np.linalg.matrix_rank(M) == RP_DIM
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").orderBy("vec_id")
    vecs = np.array([r["embedding"] for r in emb.limit(20).collect()])
    proj = q_embed_project_rp(spark, SF_SMALL).orderBy("vec_id").limit(20).collect()
    P = np.array([[r[f"p{j + 1}"] for j in range(RP_DIM)] for r in proj])
    ratios = np.linalg.norm(P, axis=1) / np.linalg.norm(vecs, axis=1)
    assert ratios.min() > 0.4 and ratios.max() < 2.2


def test_discretize_approx_bins_are_near_equal_population(spark):
    from chi_frbcs_bigdatacs_spark.operators.quality import (
        N_QBINS,
        q_discretize_quantile_approx,
    )

    rows = q_discretize_quantile_approx(spark, SF_SMALL).collect()
    assert sorted(r["bin"] for r in rows) == list(range(1, N_QBINS + 1))
    total = sum(r["n"] for r in rows)
    for r in rows:
        assert abs(r["n"] - total / N_QBINS) <= total * 0.01, r


def test_schema_evolution_nulls_only_v1_rows(spark):
    """The merged read must null-fill quality_score for exactly the
    v1 (even doc_id) rows and carry the v2 values through unchanged —
    checked row-level, not just in aggregate."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.streaming.staging import staged_dir
    from tests.conftest import SF_SMALL

    # reuse the staged dir the key built (memoized per sf_dir)
    from chi_frbcs_bigdatacs_spark.operators.lakehouse import (
        q_scan_schema_evolution,
    )

    q_scan_schema_evolution(spark, SF_SMALL).collect()  # ensure staged
    src = staged_dir("schema_evo", SF_SMALL, lambda d: None)
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    bad_null = merged.filter(
        (F.col("doc_id") % 2 == 0) & F.col("quality_score").isNotNull()
    ).count()
    bad_val = merged.filter(
        (F.col("doc_id") % 2 == 1)
        & (F.col("quality_score") != F.col("doc_id") % 100)
    ).count()
    assert bad_null == 0 and bad_val == 0


def test_mv_incremental_refresh_equals_full_recompute(spark):
    """The delta-rule refresh (r13) must equal a from-scratch
    aggregate over the merged snapshot — including the group-moving
    'U' case: updates flip status to 'R', a group absent from the
    base MV, so retract/add must cross groups correctly. Deletes must
    shrink counts; a group with every row deleted must vanish."""
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.lakehouse import (
        merged_snapshot,
        q_mv_incremental_refresh,
    )
    from chi_frbcs_bigdatacs_spark.sources.testdata import load_table
    from tests.conftest import SF_SMALL

    inc = {
        r["o_orderstatus"]: (r["n_orders"], round(r["total_price"], 2))
        for r in q_mv_incremental_refresh(spark, SF_SMALL).collect()
    }
    full = {
        r["o_orderstatus"]: (r["n"], round(r["p"], 2))
        for r in merged_snapshot(load_table(spark, SF_SMALL, "orders"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("p"),
        )
        .collect()
    }
    assert inc == full and inc
    assert "R" in inc, "update-moved group must appear in the refreshed MV"


def test_mv_minmax_retraction_rescans_only_affected_groups(spark, tmp_path):
    """mv_incremental_refresh_minmax (r14, VERDICT r13 #4): MAX is
    not self-maintainable under retraction. Crafted keyspace (op is
    key-derived: %10>=8 I, %13==0 D, %7==0 U) covering every case:
      g100: D removes the group max       -> re-scan finds 50
      g200: D removes ONE of two max rows -> duplicate keeps max 80
      g300: U retracts the group max, adds max+1 -> 100
      g400: every row deleted             -> group vanishes
      g500: insert-only group             -> appears, max from adds
      g600: untouched                     -> pure-incremental path
    """
    from chi_frbcs_bigdatacs_spark.operators.lakehouse import (
        q_mv_incremental_refresh_minmax,
    )

    rows = [
        # (o_orderkey, o_custkey, o_totalprice)
        (1, 100, 50.0), (13, 100, 100.0),            # D of max
        (2, 200, 80.0), (3, 200, 80.0), (26, 200, 80.0),  # D of dup max
        (7, 300, 99.0),                               # U of max -> 100
        (65, 400, 10.0),                              # sole row, D
        (18, 500, 60.0),                              # I-only group
        (4, 600, 77.0),                               # untouched
    ]
    df = spark.createDataFrame(
        [(k, c, "O", p) for k, c, p in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    got = {
        r["o_custkey"]: (r["n_orders"], round(r["max_price"], 2))
        for r in q_mv_incremental_refresh_minmax(
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {
        100: (1, 50.0),
        200: (2, 80.0),
        300: (1, 100.0),
        500: (1, 60.0),
        600: (1, 77.0),
    }


def test_mv_minmax_aff_gate_modes_bit_equal_and_plan_pinned(spark):
    """The r15 size gate on the affected-group set (VERDICT r14 #5):
    below MV_AFF_BROADCAST_MAX the re-scan cut broadcasts `aff`; past
    it (adversarial all-retraction: aff is MV-sized) it switches to a
    shuffle-hash semi-join riding the re-scan's grp exchange. Both
    modes must be BIT-equal on the same input, and each mode's plan
    must carry its join strategy on the aff cut."""
    from chi_frbcs_bigdatacs_spark.operators.lakehouse import (
        q_mv_incremental_refresh_minmax,
    )
    from tests.conftest import SF_SMALL

    dfs = {}
    for mode, gate in (("broadcast", None), ("shuffle", 0)):
        dfs[mode] = q_mv_incremental_refresh_minmax(
            spark, SF_SMALL, aff_broadcast_max=gate
        )
    rows = {
        m: sorted(map(tuple, df.collect())) for m, df in dfs.items()
    }
    assert rows["broadcast"] == rows["shuffle"] and rows["broadcast"]

    plans = {
        m: df._jdf.queryExecution().executedPlan().toString()
        for m, df in dfs.items()
    }
    # the aff cut joins on o_custkey (survivors) and c_cust (adds):
    # broadcast mode builds aff as a broadcast on BOTH
    assert "BroadcastHashJoin [o_custkey" in plans["broadcast"]
    assert "BroadcastHashJoin [c_cust" in plans["broadcast"]
    assert "ShuffledHashJoin [o_custkey" not in plans["broadcast"]
    # shuffle mode: the hint wins on both cuts — aff never broadcasts
    assert "ShuffledHashJoin [o_custkey" in plans["shuffle"]
    assert "ShuffledHashJoin [c_cust" in plans["shuffle"]
    assert "BroadcastHashJoin [o_custkey" not in plans["shuffle"]


def test_mv_minmax_matches_python_model_on_random_tables(spark, tmp_path):
    """Randomized pin for the MAX-retraction refresh (r14): seeded
    random order tables (duplicate prices, singleton and dense
    groups) vs a pure-Python model applying the same op rules
    (%10>=8 I, %13 D, %7 U with price+1.00). Catches any drift
    between the incremental path, the affected-group rule, and the
    re-scan — including max-duplicate and group-vanish cases the
    hand fixture can't enumerate."""
    import random
    from decimal import Decimal

    from chi_frbcs_bigdatacs_spark.operators.lakehouse import (
        q_mv_incremental_refresh_minmax,
    )

    rng = random.Random(20260816)
    for trial in range(4):
        n = rng.randrange(30, 120)
        keys = rng.sample(range(1, 2000), n)
        rows = [
            (k, rng.randrange(1, 8) * 100, float(rng.randrange(1, 9) * 25))
            for k in keys
        ]
        df = spark.createDataFrame(
            [(k, c, "O", p) for k, c, p in rows],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double",
        )
        path = str(tmp_path / f"t{trial}")
        df.write.mode("overwrite").parquet(path + "/orders.parquet")

        # python model: target = key%10<8; apply ops to it
        state: dict = {}
        for k, c, p in rows:
            if k % 10 < 8:
                state[k] = (c, Decimal(str(p)))
        for k, c, p in rows:
            if k % 10 >= 8:
                state[k] = (c, Decimal(str(p)))  # I
            elif k % 13 == 0:
                state.pop(k, None)  # D
            elif k % 7 == 0:
                state[k] = (c, Decimal(str(p)) + Decimal("1.00"))  # U
        want: dict = {}
        for c, p in state.values():
            n0, mx = want.get(c, (0, None))
            want[c] = (n0 + 1, p if mx is None or p > mx else mx)

        got = {
            r["o_custkey"]: (r["n_orders"], Decimal(str(r["max_price"])))
            for r in q_mv_incremental_refresh_minmax(spark, path).collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"
