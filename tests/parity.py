"""Replica of the driver's Spark-vs-DuckDB compare: row count, schema
(column names), and order-insensitive values. Stricter than the
driver on values: exact equality for non-floats, and for floats we
assert bit-equality by default, reporting max abs diff on failure so
rounding policy can be tuned.

Flake trap (NOTES watch item, r5 `simsearch_topk_batch`): on ANY
mismatch, both normalized frames are dumped to a parquet pair under
$TMPDIR/chi_parity_dumps BEFORE the assertion raises, so a
non-reproducing failure still leaves a diffable artifact instead of
a shrug. The dump path is appended to the assertion message.
"""

from __future__ import annotations

import math
import os
import tempfile

import pandas as pd

_DUMP_DIR = os.path.join(tempfile.gettempdir(), "chi_parity_dumps")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _dump(s: pd.DataFrame, d: pd.DataFrame, label: str) -> str:
    """Persist both frames for post-mortem; never mask the real failure."""
    try:
        os.makedirs(_DUMP_DIR, exist_ok=True)
        base = tempfile.mkdtemp(prefix=f"{label}_", dir=_DUMP_DIR)
        s.to_parquet(os.path.join(base, "spark.parquet"), index=False)
        d.to_parquet(os.path.join(base, "oracle.parquet"), index=False)
        return base
    except Exception as e:  # pragma: no cover - best-effort trap
        return f"<dump failed: {e}>"


def compare(
    spark_df, duck_df: pd.DataFrame, float_tol: float = 0.0, label: str = "cmp"
) -> None:
    s = normalize(spark_df.toPandas())
    d = normalize(duck_df)
    try:
        _compare_normalized(s, d, float_tol)
    except AssertionError as e:
        where = _dump(s, d, label)
        raise AssertionError(f"{e} [frames dumped to {where}]") from None


def _compare_normalized(s: pd.DataFrame, d: pd.DataFrame, float_tol: float) -> None:
    assert list(s.columns) == list(d.columns), f"columns: {list(s.columns)} vs {list(d.columns)}"
    assert len(s) == len(d), f"row count: {len(s)} vs {len(d)}"
    for c in s.columns:
        sk, dk = s[c].dtype.kind, d[c].dtype.kind
        # int-vs-float (or any numeric-kind) drift changes the driver's
        # value hash even when the values are equal (agg_pivot, round 1).
        assert sk == dk, f"col {c}: dtype kind {s[c].dtype} vs {d[c].dtype}"
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            sa, da = sv.astype(float).to_numpy(), dv.astype(float).to_numpy()
            bad = []
            for i, (a, b) in enumerate(zip(sa, da)):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b and abs(a - b) > float_tol:
                    bad.append((i, a, b, abs(a - b)))
            assert not bad, (
                f"col {c}: {len(bad)} float mismatches, worst {max(bad, key=lambda t: t[3])[:4]}"
            )
        else:
            sv = sv.astype(object).where(pd.notna(sv), "\x00NULL")
            dv = dv.astype(object).where(pd.notna(dv), "\x00NULL")
            mism = (sv != dv).to_numpy().nonzero()[0]
            assert len(mism) == 0, (
                f"col {c}: {len(mism)} mismatches, first at {mism[0]}: "
                f"{sv.iloc[mism[0]]!r} vs {dv.iloc[mism[0]]!r}"
            )
