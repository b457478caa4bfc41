"""Diagnostic (r16): reproduce the r13-group bench sequence and watch
the JVM code cache + JIT compilation state between keys.

Hypothesis (VERDICT r15 #1/#3): the unrolled literal distance chains
in assign_cells_col generate K x DIM-term methods with FRESH literals
every Lloyd round; each distinct source is a new Janino class. Across
bench passes these fill the JVM code cache, the JIT disables
compilation, and every LATER query in the pass (stream_mv_refresh,
resample_enn, embed_pca_power) runs interpreted — which is exactly
the driver's r15 regression pattern (keys after ivf_sq8 in the r13
group regressed 0.11-0.70x with zero code changes).

Usage: python scripts/probe_codecache.py [--passes N]
Prints one JSON line with per-pass timings + code-cache readings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEQ = [
    "simsearch_ivf_sq8",
    "stream_dedup_substring_trim",
    "graph_wcc",
    "stream_mv_refresh",
    "resample_enn",
    "embed_pca_power",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--keys", nargs="*", default=SEQ)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from chi_frbcs_bigdatacs_spark.plans.registry import get_registry
    from chi_frbcs_bigdatacs_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="chi-frbcs-codecache-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = get_registry()
    jvm = spark.sparkContext._jvm

    def code_cache() -> dict[str, int]:
        """Used bytes of every JVM code-cache segment + metaspace."""
        out: dict[str, int] = {}
        beans = jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
        for i in range(beans.size()):
            b = beans.get(i)
            name = b.getName()
            if "CodeHeap" in name or "Metaspace" in name or "Code Cache" in name:
                out[name] = int(b.getUsage().getUsed())
        return out

    readings = []
    for p in range(args.passes):
        row: dict[str, object] = {"pass": p}
        for key in args.keys:
            t0 = time.perf_counter()
            reg[key].fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            row[key] = round(time.perf_counter() - t0, 3)
        row["code_cache"] = code_cache()
        readings.append(row)
    print(json.dumps(readings, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
