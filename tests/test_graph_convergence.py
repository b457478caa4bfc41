"""Fixpoint contracts for the run-to-convergence graph wrappers
(VERDICT r8 #6). The registry keys stay fixed-round + DuckDB-oracled;
these wrappers are the production API, and their correctness claim is
the fixpoint property itself: once converged is reported, ONE MORE
round of the same update must be the identity. Each test re-applies
the update verbatim and compares exact sets — no epsilon anywhere
(kcore/LPA are set/label-valued; pagerank is integer micro-units).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_kcore_converged_is_fixpoint(spark):
    from chi_frbcs_bigdatacs_spark.operators.graph import (
        K_CORE,
        _edges,
        kcore_converged,
        q_graph_kcore,
    )

    final, rounds, converged = kcore_converged(spark, SF_SMALL)
    assert converged, "peeling is monotone — must converge within |V| rounds"
    assert rounds >= 1
    survivors = {r.node for r in final.collect()}
    # one more peel round over the reported fixpoint is the identity
    edges = _edges(spark, SF_SMALL)
    surv_df = final.select("node")
    again = (
        edges.join(surv_df.withColumnRenamed("node", "src"), "src")
        .join(surv_df.withColumnRenamed("node", "dst"), "dst")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= K_CORE)
    )
    assert {r.src for r in again.collect()} == survivors
    # the converged core is a subset of any fixed-round prefix
    fixed = {r.node for r in q_graph_kcore(spark, SF_SMALL).collect()}
    assert survivors <= fixed


def test_lpa_converged_flag_is_honest(spark):
    from chi_frbcs_bigdatacs_spark.operators.graph import (
        _edges,
        lpa_converged,
    )

    labels, rounds, converged = lpa_converged(spark, SF_SMALL, max_rounds=30)
    got = {(r.node, r.label) for r in labels.collect()}
    # every node keeps exactly one label
    assert len(got) == len({n for n, _ in got})
    if not converged:
        # synchronous LPA may oscillate on this bipartite graph; the
        # honest report is max_rounds with converged=False
        assert rounds == 30
        return
    # converged => one more propagation round is the identity
    edges = _edges(spark, SF_SMALL)
    nxt = (
        labels.join(edges, labels["node"] == edges["src"])
        .groupBy(F.col("dst").alias("n2"), "label")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("n2")
        .agg(F.min(F.struct((-F.col("c")).alias("nc"), "label")).alias("s"))
        .select(F.col("n2").alias("node"), F.col("s.label").alias("label"))
    )
    assert {(r.node, r.label) for r in nxt.collect()} == got


def test_lpa_semisync_converges_where_sync_oscillates(spark):
    """The r10 algorithmic half of the LPA ask (VERDICT r9 #5): the
    semi-synchronous tie-sticky variant must reach converged=True on
    this bipartite fixture — the one sync LPA honestly fails on — and
    the reported fixpoint must be a REAL fixpoint: one more full
    round (both half-steps, same sticky rule) changes nothing."""
    from chi_frbcs_bigdatacs_spark.operators.graph import (
        _edges,
        lpa_converged,
        lpa_converged_semisync,
    )

    labels, rounds, converged = lpa_converged_semisync(
        spark, SF_SMALL, max_rounds=30
    )
    assert converged, f"semi-sync LPA did not converge in {rounds} rounds"
    got = {(r.node, r.label) for r in labels.collect()}
    assert len(got) == len({n for n, _ in got})  # one label per node
    # fixpoint => re-applying one full round via the production API
    # from this state is the identity. The wrapper re-derives initial
    # labels internally, so replay the half-steps here verbatim.
    edges = _edges(spark, SF_SMALL)
    cur = labels
    for side in ("p", "s"):
        votes = (
            cur.join(edges, cur["node"] == edges["src"])
            .groupBy(F.col("dst").alias("n2"), F.col("label").alias("vlabel"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            votes.groupBy("n2")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"),
                        F.col("vlabel").alias("label"),
                    )
                ).alias("s")
            )
            .select(
                F.col("n2").alias("node"),
                (-F.col("s.nc")).alias("best_c"),
                F.col("s.label").alias("cand"),
            )
        )
        cur2 = cur.join(
            votes,
            (cur["node"] == votes["n2"]) & (cur["label"] == votes["vlabel"]),
            "left_outer",
        ).select(
            cur["node"], cur["label"], F.coalesce(votes["c"], F.lit(0)).alias("cur_c")
        )
        cur = cur2.join(best, "node", "left_outer").select(
            "node",
            F.when(
                (F.substring("node", 1, 1) == F.lit(side))
                & F.col("best_c").isNotNull()
                & (F.col("best_c") > F.col("cur_c")),
                F.col("cand"),
            )
            .otherwise(F.col("label"))
            .alias("label"),
        )
    assert {(r.node, r.label) for r in cur.collect()} == got
    # and the fixture really is the oscillating one: sync LPA at the
    # same budget reports non-convergence (keeps this test meaningful)
    _, _, sync_conv = lpa_converged(spark, SF_SMALL, max_rounds=5)
    assert not sync_conv


def test_pagerank_converged_is_integer_fixpoint(spark):
    from chi_frbcs_bigdatacs_spark.operators.graph import (
        PR_BASE,
        _edges,
        pagerank_converged,
    )

    ranks, rounds, converged = pagerank_converged(
        spark, SF_SMALL, max_rounds=60, rel_tol_ppm=None
    )
    got = {(r.node, r.rank) for r in ranks.collect()}
    assert all(rank >= PR_BASE for _, rank in got)
    if not converged:
        assert rounds == 60
        return
    # converged => one more damped update is the identity (exact
    # integer arithmetic, so equality is legitimate)
    edges = _edges(spark, SF_SMALL)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(outdeg, "src")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    contrib = (
        ranks.join(ed, ranks["node"] == ed["src"])
        .select("dst", F.expr("rank div deg").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    nxt = nodes.join(
        contrib, nodes["node"] == contrib["dst"], "left_outer"
    ).select(
        "node",
        (F.lit(PR_BASE) + F.expr("(17 * coalesce(s, 0)) div 20"))
        .cast("long")
        .alias("rank"),
    )
    assert {(r.node, r.rank) for r in nxt.collect()} == got


def test_pagerank_tolerance_converges_and_bounds_residual(spark):
    """With a nonzero tolerance the wrapper must stop early AND the
    reported state must actually satisfy the criterion: one more
    update moves no rank by more than tol_micro."""
    from chi_frbcs_bigdatacs_spark.operators.graph import (
        PR_BASE,
        _edges,
        pagerank_converged,
    )

    TOL = 2000
    # No rel_tol_ppm opt-out needed (r12): an explicit tol_micro now
    # disables the relative default, restoring the documented idiom.
    ranks, rounds, converged = pagerank_converged(
        spark, SF_SMALL, max_rounds=80, tol_micro=TOL
    )
    assert converged and rounds < 80
    edges = _edges(spark, SF_SMALL)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(outdeg, "src")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    contrib = (
        ranks.join(ed, ranks["node"] == ed["src"])
        .select("dst", F.expr("rank div deg").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    nxt = nodes.join(
        contrib, nodes["node"] == contrib["dst"], "left_outer"
    ).select(
        "node",
        (F.lit(PR_BASE) + F.expr("(17 * coalesce(s, 0)) div 20"))
        .cast("long")
        .alias("rank"),
    )
    resid = (
        nxt.join(ranks.withColumnRenamed("rank", "prev"), "node")
        .agg(F.max(F.abs(F.col("rank") - F.col("prev"))).alias("mx"))
        .collect()[0]["mx"]
    )
    assert resid <= TOL


def test_pagerank_default_relative_tolerance_is_practical(spark):
    """The r11 practicality fix (VERDICT r10 #6): the DEFAULT stop
    criterion (2% relative per-node residual) must converge the
    fixture in <= 30 rounds, and the claimed state must satisfy the
    criterion — one more damped update moves no rank by more than
    rel_tol_ppm of its previous value."""
    from chi_frbcs_bigdatacs_spark.operators.graph import (
        PR_BASE,
        PR_REL_TOL_PPM,
        _edges,
        pagerank_converged,
    )

    ranks, rounds, converged = pagerank_converged(spark, SF_SMALL)
    assert converged, "default tolerance failed to converge the fixture"
    assert rounds <= 30, f"default tolerance needed {rounds} rounds"
    edges = _edges(spark, SF_SMALL)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(outdeg, "src")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    contrib = (
        ranks.join(ed, ranks["node"] == ed["src"])
        .select("dst", F.expr("rank div deg").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    nxt = nodes.join(
        contrib, nodes["node"] == contrib["dst"], "left_outer"
    ).select(
        "node",
        (F.lit(PR_BASE) + F.expr("(17 * coalesce(s, 0)) div 20"))
        .cast("long")
        .alias("rank"),
    )
    rel_ppm = (
        nxt.join(ranks.withColumnRenamed("rank", "prev"), "node")
        .agg(
            F.max(
                (F.abs(F.col("rank") - F.col("prev")) * F.lit(1_000_000))
                / F.col("prev")
            ).alias("rel")
        )
        .collect()[0]["rel"]
    )
    assert rel_ppm <= PR_REL_TOL_PPM, rel_ppm


def test_sssp_chain_graph_multi_level_distances(spark, tmp_path):
    """BFS correctness beyond the fixture's diameter-3 graph: a
    bipartite CHAIN p1-s1-p2-s2-p3 (plus an unreachable island
    p9-s9) must yield hop distances 0..4 from the lexicographically
    smallest node and EXCLUDE the island — settled nodes must never
    be re-labeled by a longer path."""
    from chi_frbcs_bigdatacs_spark.operators.graph import q_graph_sssp

    li = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 2), (3, 2), (9, 9)],
        "l_partkey long, l_suppkey long",
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["node"]: r["dist"]
        for r in q_graph_sssp(spark, str(tmp_path)).collect()
    }
    assert got == {"p1": 0, "s1": 1, "p2": 2, "s2": 3, "p3": 4}


def test_sssp_shuffle_fallback_matches_broadcast(spark, tmp_path):
    """broadcast_max_settled=0 forces the co-located shuffle anti-join
    from level 1 on (the settled set 'exceeds the broadcast limit'
    immediately); distances must be identical to the broadcast path,
    island exclusion included."""
    from chi_frbcs_bigdatacs_spark.operators.graph import q_graph_sssp

    li = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 2), (3, 2), (9, 9)],
        "l_partkey long, l_suppkey long",
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["node"]: r["dist"]
        for r in q_graph_sssp(
            spark, str(tmp_path), broadcast_max_settled=0
        ).collect()
    }
    assert got == {"p1": 0, "s1": 1, "p2": 2, "s2": 3, "p3": 4}


def test_sssp_no_edge_shuffle_in_both_modes(spark, tmp_path):
    """The edge table must never be exchanged in EITHER anti-join
    mode: the frontier join is a broadcast-hash join over the edge
    scan. Broadcast mode has zero hash exchanges; shuffle mode
    exchanges only `node`-keyed sets (the dist side of the hinted
    shuffle-hash anti-join — the candidate side rides the distinct()
    exchange), never src/dst."""
    import re

    from chi_frbcs_bigdatacs_spark.operators.graph import (
        _edges,
        _sssp_level,
    )

    li = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 2), (3, 2)],
        "l_partkey long, l_suppkey long",
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    edges = _edges(spark, str(tmp_path)).localCheckpoint(eager=True)
    dist = spark.createDataFrame([("p1", 0)], "node string, dist long")
    for broadcast_settled in (True, False):
        lvl = _sssp_level(
            edges, dist, dist, 1, broadcast_settled=broadcast_settled
        )
        p = lvl._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p, p[:800]
        keys = [
            m.split("#")[0]
            for m in re.findall(r"Exchange hashpartitioning\((\w+)", p)
        ]
        assert set(keys) <= {"node"}, f"edge-keyed exchange leaked: {keys}"
        if broadcast_settled:
            # the candidate distinct() is the ONLY exchange
            assert len(keys) == 1, f"broadcast mode: {keys}"
        else:
            # distinct() + the dist side of the shuffle-hash anti-join
            assert len(keys) == 2, f"shuffle mode: {keys}"
            assert "ShuffledHashJoin" in p, p[:1200]


def test_wcc_star_contraction_multi_component(spark, tmp_path):
    """large-star/small-star correctness on a graph with THREE
    components of different shapes (a chain p1-s1-p2-s2, a pair
    p7-s7, an isolated edge p9-s9): every node must label with its
    component's lexicographic min, and no cross-component label may
    leak. Quantities put all edges past the WCC_MIN_QTY cut."""
    from chi_frbcs_bigdatacs_spark.operators.graph import q_graph_wcc

    li = spark.createDataFrame(
        [(1, 1, 50), (2, 1, 50), (2, 2, 50), (7, 7, 50), (9, 9, 50),
         (3, 3, 1)],  # below the quantity cut: must not appear at all
        "l_partkey long, l_suppkey long, l_quantity long",
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["node"]: r["component"]
        for r in q_graph_wcc(spark, str(tmp_path)).collect()
    }
    assert got == {
        "p1": "p1", "s1": "p1", "p2": "p1", "s2": "p1",
        "p7": "p7", "s7": "p7",
        "p9": "p9", "s9": "p9",
    }


def test_wcc_star_phase_output_is_duplicate_free(spark):
    """graph_wcc's convergence probe (one full-outer-join null check)
    is SET equality, not multiset equality — it is only sound because
    every _star_round phase ends .distinct() (ADVICE r14). Enforce
    that invariant directly: feed each phase a multigraph with
    duplicated and reversed edges and require the output to carry no
    duplicate (u, v) rows, so a future perf change that drops a
    distinct() fails HERE instead of silently corrupting the probe."""
    from chi_frbcs_bigdatacs_spark.operators.graph import _star_round

    # chain a-b-c plus duplicates and a reversed copy: worst-case
    # multiplicity into the phase
    dup = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a"), ("b", "c"), ("b", "c")],
        "u string, v string",
    )
    for large in (True, False):
        out = _star_round(dup, large=large).collect()
        pairs = [(r.u, r.v) for r in out]
        assert len(pairs) == len(set(pairs)), (
            f"large={large}: duplicate (u,v) rows — probe precondition broken"
        )


def test_wcc_matches_union_find_on_random_graphs(spark, tmp_path):
    """Star contraction vs a pure-Python union-find reference over
    randomized bipartite edge sets (seeded — deterministic CI): the
    component partition must match exactly for every draw, including
    draws that produce many singleton-pair components and draws that
    collapse to one giant component. This is the algorithm's
    correctness pin beyond the hand-built 3-component fixture."""
    import random

    from chi_frbcs_bigdatacs_spark.operators.graph import q_graph_wcc

    rng = random.Random(20260816)
    for trial in range(3):
        n_edges = rng.randrange(5, 40)
        rows = [
            (rng.randrange(1, 25), rng.randrange(1, 12), 50)
            for _ in range(n_edges)
        ]
        li = spark.createDataFrame(
            rows, "l_partkey long, l_suppkey long, l_quantity long"
        )
        path = str(tmp_path / f"li_{trial}")
        li.write.mode("overwrite").parquet(path + "/lineitem.parquet")

        # union-find reference over the same stringified node ids
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for p, s, _q in rows:
            a, b = find(f"p{p}"), find(f"s{s}")
            if a != b:
                parent[a] = b
        want = {}
        comps: dict = {}
        for node in list(parent):
            comps.setdefault(find(node), []).append(node)
        for members in comps.values():
            root = min(members)
            for m in members:
                want[m] = root

        got = {
            r["node"]: r["component"]
            for r in q_graph_wcc(spark, path).collect()
        }
        assert got == want, f"trial {trial}: mismatch"


def test_wcc_convergence_probe_is_single_action_per_round(
    spark, tmp_path, monkeypatch
):
    """graph_wcc (r14, VERDICT r13 #5): the fixed-point check must
    cost exactly ONE action per contraction round (the full-outer
    symmetric-difference count), never the old two exceptAll+count
    probes. Rounds are counted via the per-round localCheckpoint
    (total checkpoints = 2 seed tables + 1 per round)."""
    # patch the CONCRETE class: on Spark 4 pyspark.sql.DataFrame is an
    # abstract facade and instance calls resolve to the classic
    # subclass's own methods
    from pyspark.sql.classic.dataframe import DataFrame

    from chi_frbcs_bigdatacs_spark.operators.graph import q_graph_wcc

    li = spark.createDataFrame(
        [(1, 1, 50), (2, 1, 50), (2, 2, 50), (7, 7, 50)],
        "l_partkey long, l_suppkey long, l_quantity long",
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    calls = {"count": 0, "ckpt": 0, "exceptAll": 0}
    orig_count = DataFrame.count
    orig_ckpt = DataFrame.localCheckpoint

    def counting_count(self):
        calls["count"] += 1
        return orig_count(self)

    def counting_ckpt(self, eager=True):
        calls["ckpt"] += 1
        return orig_ckpt(self, eager)

    def forbidden_exceptAll(self, other):
        calls["exceptAll"] += 1
        raise AssertionError("exceptAll probe must not be used")

    monkeypatch.setattr(DataFrame, "count", counting_count)
    monkeypatch.setattr(DataFrame, "localCheckpoint", counting_ckpt)
    monkeypatch.setattr(DataFrame, "exceptAll", forbidden_exceptAll)

    got = {
        r["node"]: r["component"]
        for r in q_graph_wcc(spark, str(tmp_path)).collect()
    }
    assert got["s2"] == "p1" and got["p7"] == "p7"

    rounds = calls["ckpt"] - 2
    assert rounds >= 1
    assert calls["exceptAll"] == 0
    assert calls["count"] == rounds, (
        f"{calls['count']} convergence actions for {rounds} rounds"
    )
