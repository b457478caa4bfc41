"""Per-key isolation probe for optimization rounds (guide §1).

Usage:
    python scripts/probe_keys.py KEY [KEY ...] [--warm N] [--plans DIR]
        [--sf DIR]

Times each key cold + median-of-N warm via the noop sink on the same
session/config bench.py uses, labels jobs, and (optionally) writes
`.explain("formatted")` to DIR/<key>.txt. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--suffix", default="")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.plans.registry import get_registry
    from chi_frbcs_bigdatacs_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="chi-frbcs-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = get_registry()

    def calibrate() -> float:
        t0 = time.perf_counter()
        (
            spark.read.parquet(f"{args.sf}/lineitem.parquet")
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

    # warmup
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()
    cal = [calibrate()]

    out: dict[str, dict] = {}
    for key in args.keys:
        sc = spark.sparkContext
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = reg[key].fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{args.plans}/{key}{args.suffix}.txt", "w") as fh:
                fh.write(buf.getvalue())
        if args.plans_only:
            out[key] = {"plan": "dumped"}
            continue
        samples: list[float] = []
        sc.setJobDescription(f"probe:{key}")
        for i in range(args.warm + 1):
            t0 = time.perf_counter()
            df = reg[key].fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        sc.setJobDescription(None)
        cal.append(calibrate())
        w = sorted(samples[1:])
        med = w[len(w) // 2] if len(w) % 2 else (w[len(w) // 2 - 1] + w[len(w) // 2]) / 2
        out[key] = {"cold": samples[0], "warm": samples[1:], "warm_median": round(med, 3)}

    cs = sorted(cal)
    cmed = cs[len(cs) // 2] if len(cs) % 2 else (cs[len(cs) // 2 - 1] + cs[len(cs) // 2]) / 2
    print(
        json.dumps(
            {
                "sf": args.sf,
                "cal_samples": cal,
                "cal_median": round(cmed, 4),
                "keys": out,
                "calibrated": {
                    k: round(v["warm_median"] / cmed, 2)
                    for k, v in out.items()
                    if "warm_median" in v
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
