"""NSW build/serve scale probe (r15, VERDICT r14 #9 probe discipline).

Question: does simsearch_nsw_beam's build cost stay LINEAR-ish as the
corpus grows, and does serve recall hold? The build's only
superlinear-risk term is the per-cell kNN self-join (sum over cells
of occupancy^2 — the same statistic the ENN/Tomek and LSH probes
track); NSW_CELLS is FIXED at 8 in the registered key, so the probe
reports both the fixed-cell growth (what the shipped key does) and
the occupancy-rescaled growth (cells scaled with the corpus — the
documented 100 TB posture, where cell count grows so occupancy stays
flat).

Method: replicate the sf0.1 embeddings Nx (ids shifted, vectors
jittered by +id*1e-6 so replicas aren't exact duplicates), measure
sum-of-occupancy^2 for the build bucket join at fixed K=8 and at
K=8*N, plus wall-clock for the full registered key and its recall
rows at each scale.

Run: python scripts/probe_nsw_scale.py   (prints a JSON line per scale)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import shutil
    import tempfile

    import pandas as pd

    from chi_frbcs_bigdatacs_spark.operators.similarity import (
        NSW_CELLS,
        _kmeans_index,
        q_simsearch_nsw_beam,
    )
    from chi_frbcs_bigdatacs_spark.session import get_spark
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-nsw-scale", master="local[32]")
    base = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    n0 = len(base)
    work = tempfile.mkdtemp(prefix="nsw_probe_")
    try:
        for scale in (1, 2, 4):
            d = f"{work}/x{scale}"
            os.makedirs(d, exist_ok=True)
            reps = []
            for r in range(scale):
                cp = base.copy()
                cp["vec_id"] = cp["vec_id"] + r * n0
                if r:
                    cp["embedding"] = cp.apply(
                        lambda row: [
                            float(v) + (int(row["vec_id"]) % 97) * 1e-6
                            for v in row["embedding"]
                        ],
                        axis=1,
                    )
                reps.append(cp)
            pd.concat(reps, ignore_index=True).to_parquet(
                f"{d}/embeddings.parquet", index=False
            )

            occ = {}
            for label, k in (("fixed8", NSW_CELLS), ("scaled", NSW_CELLS * scale)):
                a2, _, _ = _kmeans_index(spark, d, k=k)
                occ[label] = [
                    (int(r["k"]), int(r["c"]))
                    for r in a2.groupBy("k")
                    .agg(F.count(F.lit(1)).alias("c"))
                    .collect()
                ]

            t0 = time.time()
            rows = q_simsearch_nsw_beam(spark, d).collect()
            wall = time.time() - t0
            out = {
                "scale": scale,
                "n_vecs": n0 * scale,
                "wall_sec": round(wall, 1),
                "recall": {r["variant"]: r["recall_at_10"] for r in rows},
            }
            for label, cells in occ.items():
                occs = [c for _, c in cells]
                out[f"sumsq_{label}"] = sum(c * c for c in occs)
                out[f"maxocc_{label}"] = max(occs)
                out[f"ncells_{label}"] = len(occs)
            print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
