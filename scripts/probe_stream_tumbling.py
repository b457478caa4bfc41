"""3-session median probe for stream_tumbling (VERDICT r14 #6).

The judge's single r14 session read stream_tumbling at 2.31x
calibrated vs baseline while the driver artifact read 1.06x; per the
pinned protocol single sessions are not regression evidence, but
streaming keys carry FIXED micro-batch trigger latency that the
calibration probe (a batch scan+agg) does NOT cancel, so the
calibrated-units defense is weaker for the stream_* family. This
script settles the question with the protocol's own remedy: three
SEPARATE JVM sessions (fresh process each), each 1 cold + median-of-5
warm, calibration interleaved exactly like bench.py, then the
cross-session median of the per-session calibrated warm medians.

Run:  python scripts/probe_stream_tumbling.py            (all 3 sessions)
      python scripts/probe_stream_tumbling.py --one      (single session, JSON line)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEY = "stream_tumbling"
N_WARM = 5


def one_session() -> dict:
    from pyspark.sql import functions as F

    from chi_frbcs_bigdatacs_spark.plans.registry import get_registry
    from chi_frbcs_bigdatacs_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe-stream-tumbling", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    reg = get_registry()

    def calibrate() -> float:
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

    # bench.py's warmup, minus the classify keys (irrelevant to this
    # probe's JIT surface): one tiny streaming run + fact-table touch.
    reg[KEY].fn(spark, "/root/testdata/sf0.001").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    cal = [calibrate()]

    def run_once() -> float:
        t0 = time.perf_counter()
        reg[KEY].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 3)

    cold = run_once()
    warm: list[float] = []
    for _ in range(N_WARM):
        cal.append(calibrate())
        warm.append(run_once())

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    cal_med = median(cal)
    warm_med = median(warm)
    out = {
        "key": KEY,
        "cold": cold,
        "warm_samples": warm,
        "warm_median": warm_med,
        "cal_samples": cal,
        "cal_median": cal_med,
        "warm_calibrated": round(warm_med / cal_med, 2),
    }
    spark.stop()
    return out


def main() -> None:
    if "--one" in sys.argv:
        print(json.dumps(one_session()))
        return
    sessions = []
    for i in range(3):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one"],
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        s = json.loads(line)
        sessions.append(s)
        print(f"session {i + 1}: warm={s['warm_median']}s "
              f"cal={s['cal_median']}s -> {s['warm_calibrated']} cal-units",
              file=sys.stderr)
    meds = sorted(s["warm_calibrated"] for s in sessions)
    raws = sorted(s["warm_median"] for s in sessions)
    print(json.dumps({
        "key": KEY,
        "sessions": sessions,
        "median_warm_calibrated": meds[1],
        "median_warm_raw": raws[1],
        "baseline_warm_raw": 1.43,
        "baseline_cal_median": 0.3818,
        "baseline_warm_calibrated": round(1.43 / 0.3818, 2),
    }))


if __name__ == "__main__":
    main()
