"""Golden sequential Chi-FRBCS-CS oracle — pure Python/numpy, written
directly from [FSS258 §2.1, §3.2, §4.2] and [CHI96], independent of
both Spark and DuckDB. The engine's exact-global mode must match this
rule-for-rule and prediction-for-prediction (SURVEY.md §5.2).

Tie-break contract (must mirror the engine):
  - per-feature argmax membership: lowest label index wins;
  - consequent: max PCF-CS weight, then lowest class id;
  - WR scoring: max score, then lowest antecedent labels, lowest cls;
  - weights rounded to 6 decimals HALF_UP (engine/oracle policy).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np


def memberships(x: float, fmin: float, fmax: float, L: int) -> np.ndarray:
    """Shouldered uniform triangular memberships of x in L labels."""
    h = (fmax - fmin) / (L - 1)
    out = np.zeros(L)
    for j in range(L):
        p = fmin + j * h
        if j == 0:
            out[j] = max(0.0, min(1.0, 1.0 - (x - p) / h))
        elif j == L - 1:
            out[j] = max(0.0, min(1.0, 1.0 - (p - x) / h))
        else:
            out[j] = max(0.0, 1.0 - abs(x - p) / h)
    return out


def round6(v: float) -> float:
    return float(Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _norm_spec(s) -> tuple:
    """Feature spec forms: legacy (fmin, fmax) numeric 2-tuple, or
    tagged ('num', fmin, fmax) / ('nom', V) for mixed datasets
    (SURVEY §1 D3: nominal = crisp per-category membership)."""
    if isinstance(s[0], str):
        return s
    return ("num", s[0], s[1])


def memberships_spec(x: float, spec, L: int) -> np.ndarray:
    spec = _norm_spec(spec)
    if spec[0] == "nom":
        V = spec[1]
        return np.array([1.0 if int(x) == j else 0.0 for j in range(V)])
    return memberships(x, spec[1], spec[2], L)


def fit(X: np.ndarray, y: np.ndarray, specs: list[tuple[float, float]], L: int = 3):
    """Returns dict antecedent(tuple of 1-based labels) -> (cls, weight6)."""
    n, d = X.shape
    mus = [
        [memberships_spec(X[i, k], specs[k], L) for k in range(d)]
        for i in range(n)
    ]  # n x d x (per-feature label count)

    # costs: N_largest / N_c  [FSS258 §3.2]
    classes, counts = np.unique(y, return_counts=True)
    cost = {int(c): counts.max() / cnt for c, cnt in zip(classes, counts)}

    # O7: per-example antecedent = argmax label per feature (ties -> low)
    ants = [tuple(int(np.argmax(mus[i][k])) + 1 for k in range(d)) for i in range(n)]

    # candidate (antecedent, class) pairs
    cands: dict[tuple, set[int]] = {}
    for a, cls in zip(ants, y):
        cands.setdefault(a, set()).add(int(cls))

    # O8: matching stats s[ant][cls] = sum mu_A(x) * cost(cls(x))
    stats: dict[tuple, dict[int, float]] = {a: {} for a in cands}
    for i in range(n):
        for a in cands:
            mu = 1.0
            for k in range(d):
                mu *= mus[i][k][a[k] - 1]
            if mu > 0:
                c = int(y[i])
                stats[a][c] = stats[a].get(c, 0.0) + mu * cost[c]

    # PCF-CS + O9 conflict resolution
    rules: dict[tuple, tuple[int, float]] = {}
    for a, clss in cands.items():
        S = sum(stats[a].values())
        best = None
        for c in sorted(clss):
            w = round6((2.0 * stats[a][c] - S) / S)
            if best is None or w > best[1]:
                best = (c, w)
        rules[a] = best
    return rules


def classify_wr(
    X: np.ndarray,
    rules: dict,
    specs: list[tuple[float, float]],
    default_cls: int,
    L: int = 3,
) -> np.ndarray:
    n, d = X.shape
    pos_rules = sorted(
        [(a, c, w) for a, (c, w) in rules.items() if w > 0],
        key=lambda r: (r[0], r[1]),
    )
    preds = np.empty(n, dtype=int)
    for i in range(n):
        mus = [memberships_spec(X[i, k], specs[k], L) for k in range(d)]
        best = None  # (score, ant, cls)
        for a, c, w in pos_rules:
            mu = 1.0
            for k in range(d):
                mu *= mus[k][a[k] - 1]
            if mu > 0:
                cand = (mu * w, tuple(-x for x in a), -c)
                if best is None or (
                    cand[0] > best[0]
                    or (cand[0] == best[0] and (cand[1], cand[2]) > (best[1], best[2]))
                ):
                    best = cand
        preds[i] = -best[2] if best is not None else default_cls
    return preds
