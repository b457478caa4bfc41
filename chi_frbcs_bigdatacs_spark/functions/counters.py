"""O18 — run accounting: Hadoop-counter-style metrics, Spark-native.

The reference uses Hadoop counters for rows-processed/timing
[REF: job framework | conf=L]. The Spark-native equivalent is
`DataFrame.observe`: named aggregates collected ON THE SAME PASS as
the action (no extra job), delivered via Observation. Use `observed`
to instrument any stage of a pipeline; tests/test_counters.py pins
the behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str = "counters") -> tuple[DataFrame, Observation]:
    """Attach rows/valid-rows counters to a pipeline stage; metrics are
    available from the returned Observation after the first action."""
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_processed"),
        F.sum(F.when(F.col(df.columns[0]).isNotNull(), 1).otherwise(0)).alias(
            "rows_nonnull_key"
        ),
    )
    return out, obs
