#!/usr/bin/env python
"""Pre-flight the external driver's 50-key correctness window.

Runs the EXACT driver-shaped check (registry fn vs DuckDB oracle,
tests/parity.compare — the bit-exact comparator) over the first 50
registry keys (CHECK_PRIORITY order) at sf0.01, the SF the driver
hashes. This is the command the round-11 rotation was certified with;
run it after ANY change to a windowed key's plan or oracle, before
committing.

    python scripts/verify_window.py [sf_dir] [n_keys]

Exit code 0 = every window key green. ~3 min on local[32]. Do NOT run
concurrently with pytest (host contention produces spurious parity
failures — NOTES r5).
"""

from __future__ import annotations

import os
import sys
import time

# runnable from anywhere: the repo root is this file's parent dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import duckdb

    from chi_frbcs_bigdatacs_spark.plans.registry import get_registry
    from chi_frbcs_bigdatacs_spark.session import get_spark
    from chi_frbcs_bigdatacs_spark.sources.testdata import TABLES
    from tests.parity import compare

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    reg = get_registry()
    window = list(reg)[:n]
    con = duckdb.connect()
    for t in TABLES:  # stays in lockstep with tests/conftest.py's views
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    fails: list[tuple[str, str]] = []
    t0 = time.time()
    for i, key in enumerate(window):
        spec = reg[key]
        tk = time.time()
        try:
            if spec.sql:
                compare(spec.fn(spark, sf), con.execute(spec.sql).df())
                status = "OK"
            else:
                # Execution IS the check for SQL-less keys; count()
                # can't be negative, so no assert (ADVICE r11: the old
                # `>= 0` assert implied a check it didn't perform).
                spec.fn(spark, sf).count()
                status = "rows-only OK"
        except Exception as exc:  # noqa: BLE001
            fails.append((key, str(exc)[:200]))
            status = f"FAIL {str(exc)[:120]}"
        print(f"{i + 1:3d}/{n} {key:40s} {status} ({time.time() - tk:.1f}s)")
    print(f"\n{n - len(fails)}/{n} green in {time.time() - t0:.0f}s")
    for key, err in fails:
        print(f"FAILED {key}: {err}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
