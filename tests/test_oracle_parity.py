"""Primary correctness gate replica: every registered query with an
oracle must match DuckDB at sf0.001 (the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from tests.parity import compare


def _keys():
    from chi_frbcs_bigdatacs_spark.plans.registry import get_registry

    return sorted(k for k, s in get_registry().items() if s.sql is not None)


@pytest.mark.parametrize("key", _keys())
def test_query_matches_oracle(spark, duck, key):
    from chi_frbcs_bigdatacs_spark.plans.registry import get_registry
    from tests.conftest import SF_SMALL

    spec = get_registry()[key]
    sdf = spec.fn(spark, SF_SMALL)
    ddf = duck.execute(spec.sql).df()
    compare(sdf, ddf, label=key)


def test_rows_only_keys_run(spark):
    from chi_frbcs_bigdatacs_spark.plans.registry import get_registry
    from tests.conftest import SF_SMALL

    for k, spec in get_registry().items():
        if spec.sql is None:
            assert spec.fn(spark, SF_SMALL).count() >= 0, k


def test_check_priority_names_are_registered():
    """Every CHECK_PRIORITY entry must name a real registry key — a
    typo would silently waste one of the driver's 50 verified slots —
    and the driver-visible first 50 keys must all be oracle-equipped
    (only past-cap keys may be rows-only)."""
    from chi_frbcs_bigdatacs_spark.plans.registry import CHECK_PRIORITY, get_registry

    reg = get_registry()
    missing = [k for k in CHECK_PRIORITY if k not in reg]
    assert not missing, f"CHECK_PRIORITY names unknown keys: {missing}"
    first50 = list(reg)[:50]
    rows_only = [k for k in first50 if reg[k].sql is None]
    assert not rows_only, f"unexpected rows-only keys inside the cap: {rows_only}"
