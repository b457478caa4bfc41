"""functions/ordering.py property tests: the sortable-bits gadget and
the decimal argmax key must be EXACTLY order-isomorphic to the float
order the classify_* oracles use — any drift here silently flips
tie-breaks and surfaces rounds later as an anonymous parity hash
mismatch, so the gadget is pinned against numpy's raw IEEE-754 bits.
"""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.functions.ordering import (
    CLS_CAP,
    T_MAX,
    argmax_decimal_key,
    decode_last_tie,
    double_sortable_bits,
)


def _expect_bits(v: float) -> int:
    """Reference: sign-magnitude raw bits (numpy/struct ground truth)."""
    if v == 0.0:
        return 0
    raw = struct.unpack("<q", struct.pack("<d", abs(v)))[0]
    return raw if v > 0 else -raw

# deliberately nasty: binade edges, subnormals, the largest/smallest
# normals, values whose log2 rounds the wrong way
_EDGES = [
    0.0, 1.0, -1.0, 2.0, 0.5, 1.5, math.pi,
    2.0**-1022, 2.0**-1021, 5e-324, 2.2250738585072014e-308,
    2.225073858507201e-308, 1.7976931348623157e308,
    1.0000000000000002, 0.9999999999999999, 2.0**52, 2.0**53,
    float("inf"), float("-inf"), -5e-324, -1e308, 1e-300, 6.25e-2,
]


def test_sortable_bits_matches_ieee754_on_edges(spark):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(_EDGES)], "i int, s double"
    )
    got = {
        r["i"]: r["b"]
        for r in df.select("i", double_sortable_bits(F.col("s")).alias("b")).collect()
    }
    for i, v in enumerate(_EDGES):
        if math.isinf(v):
            # inf maps to +-(0x7FF << 52) == the raw-bits magnitude too
            assert got[i] == _expect_bits(v), v
        else:
            assert got[i] == _expect_bits(v), v


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=True, width=64),
        min_size=2,
        max_size=40,
    )
)
def test_sortable_bits_is_order_isomorphic(spark, vals):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i int, s double"
    )
    got = {
        r["i"]: r["b"]
        for r in df.select("i", double_sortable_bits(F.col("s")).alias("b")).collect()
    }
    for i, vi in enumerate(vals):
        for j, vj in enumerate(vals):
            if vi < vj:
                assert got[i] < got[j], (vi, vj)
            elif vi == vj:
                assert got[i] == got[j], (vi, vj)


def test_argmax_key_matches_lexicographic_order(spark):
    """max(key) == ORDER BY s DESC, l ASC, c ASC LIMIT 1, including
    -inf scores, subnormal scores, and exact score ties."""
    rows = [
        (1, 0.5, 2, 3), (1, 0.5, 1, 7), (1, 0.7, 9, 9),
        (2, -float("inf"), 0, 4), (2, -float("inf"), 0, 2),
        (3, 1e-320, 5, 1), (3, 1e-320, 5, 0),
        (4, 0.0, 3, 2), (4, -0.0, 1, 5),  # +-0 must tie -> l ASC wins
    ]
    df = spark.createDataFrame(rows, "id int, s double, l int, c int")
    key = argmax_decimal_key(F.col("s"), [(F.col("l"), 10), (F.col("c"), 16)])
    got = {
        r["id"]: r["pred"]
        for r in df.groupBy("id")
        .agg(decode_last_tie(F.max(key), 16).alias("pred"))
        .collect()
    }
    assert got == {1: 9, 2: 2, 3: 0, 4: 5}


def test_argmax_key_plans_hash_aggregate(spark):
    df = spark.range(100).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id").cast("double") / 3).alias("s"),
        (F.col("id") % 5).cast("int").alias("c"),
    )
    key = argmax_decimal_key(F.col("s"), [(F.col("c"), CLS_CAP)])
    p = (
        df.groupBy("g")
        .agg(F.max(key).alias("k"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" in p and "SortAggregate" not in p


def test_argmax_key_rejects_oversized_tie_space(spark):
    with pytest.raises(ValueError, match="tie space"):
        argmax_decimal_key(
            F.lit(1.0), [(F.lit(0), T_MAX), (F.lit(0), 2)]
        )
