"""O6 — fuzzification: triangular membership evaluation.

[REF: DataBase.java::membership, Fuzzy.java | conf=M] [CHI96]
[FSS258 §2.1]. Implemented as closed-form Catalyst column
expressions (greatest/least/abs) — pure JVM whole-stage-codegen, no
UDF — plus a structurally identical DuckDB SQL generator so the
oracle computes bit-identical doubles.

Membership of x in label j (0-based, peak p_j, half-width h):
  j == 0     : greatest(0, least(1, 1 - (x - p_0)/h))   (left shoulder)
  j == L-1   : greatest(0, least(1, 1 - (p_j - x)/h))   (right shoulder)
  otherwise  : greatest(0, 1 - abs(x - p_j)/h)
Within the declared range this equals the classic unshouldered
triangle; outside it the shoulders keep membership 1 (KEEL edge
semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from chi_frbcs_bigdatacs_spark.fuzzy.partitions import FeatureSpec, FuzzyPartitions


def _dlit(v: float) -> str:
    """SQL literal for a Python float that parses back to the exact
    same IEEE double in DuckDB (repr round-trips; CAST pins DOUBLE)."""
    return f"CAST({v!r} AS DOUBLE)"


def membership_col(x: Column, peak: float, h: float, j: int, num_labels: int) -> Column:
    if j == 0:
        core = F.lit(1.0) - (x - F.lit(peak)) / F.lit(h)
        return F.greatest(F.lit(0.0), F.least(F.lit(1.0), core))
    if j == num_labels - 1:
        core = F.lit(1.0) - (F.lit(peak) - x) / F.lit(h)
        return F.greatest(F.lit(0.0), F.least(F.lit(1.0), core))
    core = F.lit(1.0) - F.abs(x - F.lit(peak)) / F.lit(h)
    return F.greatest(F.lit(0.0), core)


def membership_sql(xexpr: str, peak: float, h: float, j: int, num_labels: int) -> str:
    p, hh = _dlit(peak), _dlit(h)
    if j == 0:
        return f"greatest(0.0, least(1.0, 1.0 - ({xexpr} - {p}) / {hh}))"
    if j == num_labels - 1:
        return f"greatest(0.0, least(1.0, 1.0 - ({p} - {xexpr}) / {hh}))"
    return f"greatest(0.0, 1.0 - abs({xexpr} - {p}) / {hh})"


def memberships_array_col(feature: FeatureSpec, parts: FuzzyPartitions) -> Column:
    """array<double> of the L memberships of column `feature.name`."""
    h = parts.half_width(feature)
    peaks = parts.peaks(feature)
    return F.array(
        *[
            membership_col(F.col(feature.name), peaks[j], h, j, parts.num_labels)
            for j in range(parts.num_labels)
        ]
    )


def memberships_array_sql(feature: FeatureSpec, parts: FuzzyPartitions) -> str:
    """DuckDB list literal of the L memberships, mirror of the above."""
    h = parts.half_width(feature)
    peaks = parts.peaks(feature)
    exprs = [
        membership_sql(feature.name, peaks[j], h, j, parts.num_labels)
        for j in range(parts.num_labels)
    ]
    return "[" + ", ".join(exprs) + "]"
