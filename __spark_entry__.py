"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship: full Chi-FRBCS-CS fit + WR scoring +
                  confusion matrix on sf0.001 lineitem_clf.
queries()      -> every checked operator from SURVEY.md §2 (registry).
oracle_sql()   -> matching DuckDB SQL per key (None-sql keys omitted
                  -> rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chi_frbcs_bigdatacs_spark.plans.registry import get_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = get_registry()
    return reg["metrics_confusion"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: spec.fn for k, spec in get_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {k: spec.sql for k, spec in get_registry().items() if spec.sql is not None}
