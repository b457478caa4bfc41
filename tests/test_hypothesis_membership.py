"""Property-based tests (hypothesis) of the membership math the whole
engine rests on — fast numpy-level checks against the golden oracle
implementation (the Spark exprs are pinned to it by the parity and
golden tests)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.oracle_chi import memberships

FMIN, FMAX = -7.5, 13.25


@settings(max_examples=300, deadline=None)
@given(
    x=st.floats(min_value=FMIN, max_value=FMAX, allow_nan=False),
    L=st.integers(min_value=2, max_value=9),
)
def test_partition_of_unity_within_range(x, L):
    """Inside the declared range, adjacent triangular memberships sum
    to ~1 and at most 2 labels are nonzero [CHI96]."""
    mus = memberships(x, FMIN, FMAX, L)
    assert abs(mus.sum() - 1.0) < 1e-9
    assert (mus > 0).sum() <= 2
    assert ((0.0 <= mus) & (mus <= 1.0)).all()


@settings(max_examples=200, deadline=None)
@given(
    x=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    L=st.integers(min_value=2, max_value=9),
)
def test_shoulders_cover_out_of_range(x, L):
    """Outside the declared range the edge shoulders keep membership 1
    (KEEL edge semantics) — argmax is always well-defined."""
    mus = memberships(x, FMIN, FMAX, L)
    if x <= FMIN:
        assert mus[0] == 1.0
    if x >= FMAX:
        assert mus[L - 1] == 1.0
    assert mus.max() > 0


@settings(max_examples=200, deadline=None)
@given(x=st.floats(min_value=FMIN, max_value=FMAX, allow_nan=False))
def test_argmax_is_nearest_peak(x):
    """The generated antecedent label is the nearest peak (ties ->
    lower index), i.e. Chi rule generation picks the dominant label."""
    L = 5
    h = (FMAX - FMIN) / (L - 1)
    mus = memberships(x, FMIN, FMAX, L)
    j = int(np.argmax(mus))
    peaks = [FMIN + k * h for k in range(L)]
    dists = np.abs(np.array(peaks) - x)
    assert dists[j] <= dists.min() + 1e-12


@settings(max_examples=200, deadline=None)
@given(
    v=st.integers(min_value=-2, max_value=12),
    V=st.integers(min_value=2, max_value=10),
)
def test_nominal_crisp_membership_laws(v, V):
    """Crisp nominal membership (SURVEY §1 D3): exactly one indicator
    fires for an in-vocab encoded value, none for out-of-vocab, and
    the fired index IS the encoded value (so rulegen's argmax label
    equals the category, 1-based)."""
    mus = np.array([1.0 if v == j else 0.0 for j in range(V)])
    if 0 <= v < V:
        assert mus.sum() == 1.0
        assert int(np.argmax(mus)) == v
    else:
        assert mus.sum() == 0.0
