#!/usr/bin/env python
"""Verify NAMED registry keys against the DuckDB oracle at one or
more SFs — the per-key counterpart of verify_window.py, for
re-certifying exactly the keys an optimization touched.

    python scripts/verify_keys.py KEY [KEY ...] [--sf DIR ...]

Exit 0 = every (key, sf) pair green (bit-exact comparator).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument(
        "--sf",
        nargs="+",
        default=["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
    )
    args = ap.parse_args()

    import duckdb

    from chi_frbcs_bigdatacs_spark.plans.registry import get_registry
    from chi_frbcs_bigdatacs_spark.session import get_spark
    from chi_frbcs_bigdatacs_spark.sources.testdata import TABLES
    from tests.parity import compare

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    reg = get_registry()
    fails = []
    for sf in args.sf:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        for key in args.keys:
            spec = reg[key]
            tk = time.time()
            try:
                compare(spec.fn(spark, sf), con.execute(spec.sql).df())
                status = "OK"
            except Exception as exc:  # noqa: BLE001
                fails.append((sf, key, str(exc)[:200]))
                status = f"FAIL {str(exc)[:120]}"
            print(f"{sf.rsplit('/',1)[-1]} {key:40s} {status} ({time.time()-tk:.1f}s)")
        con.close()
    for sf, key, err in fails:
        print(f"FAILED {sf} {key}: {err}")
    print(f"{'GREEN' if not fails else 'RED'}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
