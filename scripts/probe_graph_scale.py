"""Larger-N SSSP settled-set probe (r16, VERDICT r15 #9).

The r15 graph-loop rewrite (f0f107d) stopped re-writing the SSSP
settled set every level: `dist` is now a UNION of per-level
localCheckpoints instead of an O(n) re-checkpoint per level —
O(n * diameter) checkpoint writes removed. At sf0.1 the bench
measured flat (fixed per-level overhead dominates), so this probe
demonstrates the effect at a size where n matters: the edge graph is
replicated REP times under disjoint node-id suffixes (same diameter,
REP x nodes/edges — the settled set grows REP x while level count
stays fixed, isolating exactly the term the rewrite removed), and
HEAD's loop runs against a local re-implementation of the r14 loop
shape (per-level eager re-checkpoint of the whole union).

    python scripts/probe_graph_scale.py [--rep 4] [--sf DIR]

Prints one JSON line {"rep": R, "head_sec": [...], "old_sec": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=4)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.operators.graph import _edges, _sssp_level
    from chi_frbcs_bigdatacs_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="probe-graph-scale", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    base = _edges(spark, args.sf)
    reps = [
        base.select(
            F.concat(F.col("src"), F.lit(f"#{i}")).alias("src"),
            F.concat(F.col("dst"), F.lit(f"#{i}")).alias("dst"),
        )
        for i in range(args.rep)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    edges = big.localCheckpoint(eager=True)
    n_edges = edges.count()

    src0 = edges.agg(F.min("src")).collect()[0][0]

    def run_head() -> float:
        t0 = time.perf_counter()
        dist = spark.createDataFrame([(src0, 0)], "node string, dist long")
        frontier = dist
        d = 0
        while True:
            d += 1
            nxt = _sssp_level(
                edges, frontier, dist, d, broadcast_settled=True
            ).localCheckpoint(eager=False)
            if nxt.count() == 0:
                break
            dist = dist.unionByName(nxt)
            frontier = nxt
        dist.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    def run_old() -> float:
        """The r14 loop shape: the WHOLE settled union re-checkpointed
        eagerly every level (plus the separate materialization job
        that shape implied)."""
        t0 = time.perf_counter()
        dist = spark.createDataFrame([(src0, 0)], "node string, dist long")
        frontier = dist
        d = 0
        while True:
            d += 1
            nxt = _sssp_level(
                edges, frontier, dist, d, broadcast_settled=True
            ).localCheckpoint(eager=True)
            if nxt.count() == 0:
                break
            dist = dist.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        dist.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    head = [run_head() for _ in range(args.runs)]
    old = [run_old() for _ in range(args.runs)]
    print(
        json.dumps(
            {"rep": args.rep, "n_edges": n_edges, "head_sec": head, "old_sec": old}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
