"""Fuzzy DataBase: per-attribute uniform triangular partitions.

Semantics [CHI96; FSS258 §2.1, §4.2], reference locus
[REF: DataBase.java, Fuzzy.java | conf=M — snapshot empty, SURVEY §0]:
for a numeric attribute with DECLARED range [min, max] and L
linguistic labels, label j (0-based) is a triangular membership
function with peak at `min + j*h`, half-width `h = (max-min)/(L-1)`,
and the edge labels shouldered (membership 1 beyond the outermost
peaks). Ranges are declared (KEEL header semantics), never recomputed
from data — so the partitioning is a pure compile-time constant.

All peaks/half-widths are computed once here in Python floats and
embedded as LITERALS into both the Spark plan and the DuckDB oracle
SQL, guaranteeing bit-identical membership arithmetic in both engines.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class FeatureSpec:
    """One input attribute: a declared numeric range (kind='numeric'),
    or a declared category vocabulary (kind='nominal', SURVEY §1 D3).

    Nominal attributes get CRISP membership — one indicator "label"
    per category (μ = 1 iff the dictionary-encoded value equals the
    category index) [FSS258 §4.2: KDD Cup 99 protocol_type/service/
    flag are nominal; REF: DataBase.java nominal branch | conf=M].
    The column feeding a nominal feature is its 0-based dictionary
    encoding (sources/keel.py::encode_nominal order = declared vocab).
    """

    name: str
    fmin: float = 0.0
    fmax: float = 1.0
    kind: str = "numeric"  # 'numeric' | 'nominal'
    values: tuple[str, ...] = ()  # declared vocab (nominal only)


def nominal_feature(name: str, values: tuple[str, ...]) -> FeatureSpec:
    return FeatureSpec(name, 0.0, float(len(values) - 1), "nominal", tuple(values))


@dataclass(frozen=True)
class FuzzyPartitions:
    """The DataBase: triangular partitions for every numeric input
    attribute, crisp category indicators for every nominal one."""

    features: tuple[FeatureSpec, ...]
    num_labels: int = 3

    def labels_for(self, f: FeatureSpec) -> int:
        """Membership-array length: L for numeric, |vocab| for nominal."""
        return len(f.values) if f.kind == "nominal" else self.num_labels

    def half_width(self, f: FeatureSpec) -> float:
        assert f.kind == "numeric", f"half_width on nominal feature {f.name}"
        return (f.fmax - f.fmin) / (self.num_labels - 1)

    def peaks(self, f: FeatureSpec) -> list[float]:
        h = self.half_width(f)
        return [f.fmin + j * h for j in range(self.num_labels)]

    @property
    def names(self) -> list[str]:
        return [f.name for f in self.features]


# Declared ranges for the lineitem_clf fixture (FIXTURES.md §B1).
# Fixed constants covering every scale factor (profiled: f1 in [1,50],
# f2 in [~900, ~105000], f3 in [0, 0.1], f4 in [0, 0.08]); declared,
# not data-derived, per reference semantics (SURVEY §1 D2).
LINEITEM_CLF_PARTITIONS = FuzzyPartitions(
    features=(
        FeatureSpec("f1", 1.0, 50.0),
        FeatureSpec("f2", 900.0, 105000.0),
        FeatureSpec("f3", 0.0, 0.1),
        FeatureSpec("f4", 0.0, 0.08),
    ),
    num_labels=3,
)

# Mixed numeric + nominal fixture (orders_clf_nominal, SURVEY §1 D3):
# declared price range covers every sf; vocabs are the declared
# category sets (dictionary-encoded 0-based by sources/testdata.py).
ORDERS_CLF_NOMINAL_PARTITIONS = FuzzyPartitions(
    features=(
        FeatureSpec("f1", 0.0, 510000.0),
        nominal_feature("n1", ("F", "O", "P")),
        nominal_feature(
            "n2", ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        ),
    ),
    num_labels=3,
)

# Embeddings multiclass fixture: components are roughly N(0,1)-ish;
# declared range [-4, 4] covers them (shoulders absorb outliers).
EMBEDDINGS_CLF_PARTITIONS = FuzzyPartitions(
    features=(
        FeatureSpec("f1", -4.0, 4.0),
        FeatureSpec("f2", -4.0, 4.0),
        FeatureSpec("f3", -4.0, 4.0),
        FeatureSpec("f4", -4.0, 4.0),
    ),
    num_labels=3,
)
