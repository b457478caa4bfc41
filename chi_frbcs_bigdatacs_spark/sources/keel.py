"""O1/O2 — KEEL dataset format: header parse + schema-bound load.

The reference reads KEEL text files from HDFS: a header
(`@relation`, `@attribute name real [min, max]` or
`@attribute name {v1, v2, ...}`, `@inputs`, `@outputs`) followed by
CSV rows after `@data`
[REF: data/DataLoader.java::generateDataset, data/Dataset.java |
conf=M — snapshot empty, SURVEY §0] [FSS258 §5].

Spark-native translation: the header is parsed driver-side (it is a
few KB) into an explicit StructType + declared ranges (never
inferSchema — ranges are DECLARED, SURVEY §1 D2), then the data
section is read by the distributed CSV reader with that schema.
Nominal attributes keep their string values; `encode_nominal`
dictionary-encodes them from the DECLARED vocab (deterministic,
unlike StringIndexer's frequency ordering). The declared ranges feed
FuzzyPartitions directly, so a KEEL file is a complete model input.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from chi_frbcs_bigdatacs_spark.fuzzy.partitions import (
    FeatureSpec,
    FuzzyPartitions,
    nominal_feature,
)

# Grammar robustness (VERDICT r4 soft spot): accepts half-open /
# paren bounds `[a, b)` `(a, b]`, the ARFF `numeric` synonym, typed
# vocab headers (`integer {0, 1, 2}` -> nominal over the integer
# literals), and rangeless numerics (`real` with no bounds — legal as
# an output/passthrough column; fuzzy_partitions rejects it as an
# INPUT with a clear error, since triangular partitions need declared
# bounds). The vocab alternative is tried first so `integer {0,1}`
# parses as nominal, not as a rangeless integer.
_ATTR_RE = re.compile(
    r"@attribute\s+(?P<name>\S+)\s+"
    r"(?:(?:(?:real|integer|numeric)\s+)?\{\s*(?P<vocab>.*?)\s*\}"
    r"|(?P<kind>real|integer|numeric)"
    r"(?:\s*[\[(]\s*(?P<lo>[-\d.eE+]+)\s*,\s*(?P<hi>[-\d.eE+]+)\s*[\])])?)",
    re.IGNORECASE,
)


@dataclass
class KeelAttribute:
    name: str
    kind: str  # 'real' | 'integer' | 'nominal'
    fmin: float | None = None
    fmax: float | None = None
    values: list[str] = field(default_factory=list)


@dataclass
class KeelDataset:
    relation: str
    attributes: list[KeelAttribute]
    inputs: list[str]
    outputs: list[str]
    data_start_line: int

    def attr(self, name: str) -> KeelAttribute:
        return next(a for a in self.attributes if a.name == name)

    def schema(self) -> StructType:
        fields = []
        for a in self.attributes:
            # `integer` binds to a 64-bit integer so int-valued keys
            # (e.g. content-addressed 60-bit ids) round-trip EXACTLY —
            # a double mantissa (53 bits) would silently corrupt them.
            if a.kind == "nominal":
                t: object = StringType()
            elif a.kind == "integer":
                t = LongType()
            else:
                t = DoubleType()
            fields.append(StructField(a.name, t))
        return StructType(fields)

    def fuzzy_partitions(self, num_labels: int = 3) -> FuzzyPartitions:
        """DataBase from the DECLARED header [FSS258 §2.1]: triangular
        partitions over declared ranges for numeric inputs, crisp
        category indicators over the declared vocab for nominal inputs
        (SURVEY §1 D3; KDD Cup 99 [FSS258 §4.2] has nominal attrs).
        Nominal columns must be dictionary-encoded first
        (`encode_nominal`, 0-based declared-vocab order)."""
        feats = []
        for name in self.inputs:
            a = self.attr(name)
            if a.kind == "nominal":
                feats.append(nominal_feature(name, tuple(a.values)))
            else:
                if a.fmin is None or a.fmax is None:
                    raise ValueError(
                        f"input attribute {name!r} has no declared [min, max]"
                        " bounds; triangular fuzzy partitions need a range"
                    )
                feats.append(FeatureSpec(name, float(a.fmin), float(a.fmax)))
        return FuzzyPartitions(features=tuple(feats), num_labels=num_labels)


def parse_header(text: str) -> KeelDataset:
    relation = ""
    attributes: list[KeelAttribute] = []
    inputs: list[str] = []
    outputs: list[str] = []
    data_line = 0
    for i, line in enumerate(text.splitlines()):
        s = line.strip()
        low = s.lower()
        if low.startswith("@relation"):
            relation = s.split(None, 1)[1] if " " in s else ""
        elif low.startswith("@attribute"):
            m = _ATTR_RE.match(s)
            if not m:
                raise ValueError(f"unparsable @attribute line: {s!r}")
            name = m.group("name")
            vocab = m.group("vocab")
            if vocab is not None:
                attributes.append(
                    KeelAttribute(
                        name, "nominal", values=[v.strip() for v in vocab.split(",")]
                    )
                )
            else:
                kind = m.group("kind").lower()
                kind = "real" if kind == "numeric" else kind
                lo, hi = m.group("lo"), m.group("hi")
                attributes.append(
                    KeelAttribute(
                        name,
                        kind,
                        float(lo) if lo is not None else None,
                        float(hi) if hi is not None else None,
                    )
                )
        elif low.startswith("@inputs"):
            inputs = [v.strip() for v in s.split(None, 1)[1].split(",")]
        elif low.startswith("@outputs"):
            outputs = [v.strip() for v in s.split(None, 1)[1].split(",")]
        elif low.startswith("@data"):
            data_line = i + 1
            break
    if not inputs:  # KEEL default: all but last are inputs
        inputs = [a.name for a in attributes[:-1]]
    if not outputs:
        outputs = [attributes[-1].name]
    return KeelDataset(relation, attributes, inputs, outputs, data_line)


def read_keel(
    spark: SparkSession, path: str, drop_missing: bool = True
) -> tuple[DataFrame, KeelDataset]:
    """Parse the header (driver-side) and load @data distributed.

    Missing values: KEEL writes `?`. Policy (SURVEY §1, documented):
    `?` -> null -> row dropped. Numeric columns get this for free
    (unparsable double -> malformed row under DROPMALFORMED); nominal
    columns parse `?` as a plain string, so it is nullified explicitly
    and the row dropped via na.drop. drop_missing=False keeps the
    nulls for callers with their own imputation.
    """
    # Header is a few KB at the top of a possibly-huge file: read
    # line-by-line and stop at @data — never slurp the data section
    # into driver memory.
    header_lines: list[str] = []
    with open(path) as fh:
        for line in fh:
            header_lines.append(line)
            if line.strip().lower().startswith("@data"):
                break
    ds = parse_header("".join(header_lines))
    df = (
        spark.read.schema(ds.schema())
        .option("comment", "@")  # header lines all start with @
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .option("mode", "DROPMALFORMED")  # O4 [REF: data/DataConverter.java | conf=M]
        .csv(path)
    )
    if drop_missing:
        for a in ds.attributes:
            if a.kind == "nominal":
                df = df.withColumn(
                    a.name,
                    F.when(F.col(a.name) == "?", F.lit(None)).otherwise(
                        F.col(a.name)
                    ),
                )
        df = df.na.drop(subset=[a.name for a in ds.attributes])
    return df, ds


def encode_nominal(df: DataFrame, ds: KeelDataset) -> DataFrame:
    """Dictionary-encode nominal columns from the DECLARED vocab
    (0-based, header order — deterministic; O3)."""
    out = df
    for a in ds.attributes:
        if a.kind != "nominal":
            continue
        col = F.lit(None).cast("int")
        expr = col
        for idx, v in enumerate(a.values):
            expr = F.when(F.col(a.name) == v, idx).otherwise(expr)
        out = out.withColumn(a.name, expr)
    return out


def decode_nominal(df: DataFrame, ds: KeelDataset) -> DataFrame:
    """Inverse of encode_nominal: 0-based codes back to the declared
    vocab strings (unknown/out-of-range codes -> null -> `?` on
    write)."""
    out = df
    for a in ds.attributes:
        if a.kind != "nominal":
            continue
        expr = F.lit(None).cast("string")
        for idx, v in enumerate(a.values):
            expr = F.when(F.col(a.name) == idx, F.lit(v)).otherwise(expr)
        out = out.withColumn(a.name, expr)
    return out


def format_header(ds: KeelDataset) -> str:
    """Serialize the descriptor back to KEEL header text (the inverse
    of parse_header; parse(format(ds)) == ds)."""
    lines = [f"@relation {ds.relation}"]
    for a in ds.attributes:
        if a.kind == "nominal":
            lines.append(f"@attribute {a.name} {{{', '.join(a.values)}}}")
        elif a.fmin is None or a.fmax is None:
            lines.append(f"@attribute {a.name} {a.kind}")
        else:
            lines.append(
                f"@attribute {a.name} {a.kind} [{a.fmin!r}, {a.fmax!r}]"
            )
    lines.append(f"@inputs {', '.join(ds.inputs)}")
    lines.append(f"@outputs {', '.join(ds.outputs)}")
    lines.append("@data")
    return "\n".join(lines) + "\n"


def write_keel(df: DataFrame, ds: KeelDataset, path: str) -> None:
    """KEEL text sink (O12/O15 counterpart of read_keel): serialize
    rows DISTRIBUTED (nominal strings pass through, nulls -> `?`,
    doubles via the JVM's shortest round-trip repr, so
    read_keel(write_keel(df)) reproduces the exact doubles), then
    stream the part files into the single .dat behind the header —
    KEEL's one-file convention. The driver never materializes rows,
    only streams bytes; at real scale keep the parts and ship the
    header separately (the reference's Hadoop jobs also pair a
    descriptor file with data splits)."""
    import glob
    import shutil
    import tempfile

    cols = []
    for a in ds.attributes:
        c = F.col(a.name)
        if a.kind != "nominal":
            c = c.cast("string")
        cols.append(F.coalesce(c, F.lit("?")))
    lines = df.select(F.concat_ws(",", *cols).alias("value"))
    tmp = tempfile.mkdtemp(prefix="chi_keel_out_")
    try:
        lines.write.mode("overwrite").text(f"{tmp}/parts")
        with open(path, "w") as out:
            out.write(format_header(ds))
            for part in sorted(glob.glob(f"{tmp}/parts/part-*")):
                with open(part) as fh:
                    shutil.copyfileobj(fh, out)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
