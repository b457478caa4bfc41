"""Registry of checked queries: key -> (Spark callable, DuckDB oracle).

This is the engine's public query surface. Every operator claimed in
SURVEY.md §2 registers here; __spark_entry__.queries()/oracle_sql()
are thin views over this registry, and the driver hash-compares each
pair at sf0.01. Queries without an oracle (non-SQL-expressible ops:
streaming, MinHash-LSH) register sql=None and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    key: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle, or None -> rows-only check


_REGISTRY: dict[str, QuerySpec] = {}


def register(key: str, fn: QueryFn, sql: str | None = None) -> None:
    if key in _REGISTRY:
        raise ValueError(f"duplicate query key: {key}")
    _REGISTRY[key] = QuerySpec(key, fn, sql)


def get_registry() -> dict[str, QuerySpec]:
    """Import all operator catalogs (idempotent) and return the registry."""
    import chi_frbcs_bigdatacs_spark.plans.catalog  # noqa: F401

    return dict(_REGISTRY)
