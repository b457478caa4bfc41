"""KEEL header parse + schema-bound distributed load (O1-O3)."""

from __future__ import annotations

import textwrap

KEEL = textwrap.dedent("""\
    @relation demo
    @attribute f1 real [0.0, 10.0]
    @attribute f2 integer [1, 5]
    @attribute color {red, green, blue}
    @attribute class {negative, positive}
    @inputs f1, f2, color
    @outputs class
    @data
    1.5, 2, red, positive
    9.0, 4, blue, negative
    bad row with, wrong, arity
    0.25, 1, green, positive
    """)


def test_parse_and_load(spark, tmp_path):
    from chi_frbcs_bigdatacs_spark.sources.keel import (
        encode_nominal,
        parse_header,
        read_keel,
    )

    p = tmp_path / "demo.dat"
    p.write_text(KEEL)

    ds = parse_header(KEEL)
    assert ds.relation == "demo"
    assert [a.name for a in ds.attributes] == ["f1", "f2", "color", "class"]
    assert ds.inputs == ["f1", "f2", "color"]
    assert ds.outputs == ["class"]
    assert ds.attr("f1").fmin == 0.0 and ds.attr("f1").fmax == 10.0
    assert ds.attr("color").values == ["red", "green", "blue"]

    parts = ds.fuzzy_partitions(num_labels=3)
    assert [f.name for f in parts.features] == ["f1", "f2", "color"]
    assert parts.half_width(parts.features[0]) == 5.0
    color = parts.features[2]
    assert color.kind == "nominal" and color.values == ("red", "green", "blue")
    assert parts.labels_for(color) == 3  # one crisp label per category

    df, ds2 = read_keel(spark, str(p))
    rows = df.orderBy("f1").collect()
    assert len(rows) == 3  # malformed row dropped (O4)
    assert rows[0]["color"] == "green" and rows[0]["f1"] == 0.25

    enc = encode_nominal(df, ds2).orderBy("f1").collect()
    assert enc[0]["color"] == 1  # green
    assert enc[0]["class"] == 1  # positive
    assert enc[2]["color"] == 2  # blue


def test_write_keel_round_trip(spark, tmp_path):
    """write_keel(read_keel(f)) -> read_keel reproduces the exact
    rows: header via format_header (parse(format(ds)) == ds), doubles
    via shortest round-trip repr, nulls as `?`, nominal decode."""
    from chi_frbcs_bigdatacs_spark.sources.keel import (
        decode_nominal,
        encode_nominal,
        format_header,
        parse_header,
        read_keel,
        write_keel,
    )

    src = tmp_path / "demo.dat"
    src.write_text(KEEL)
    df, ds = read_keel(spark, str(src))

    assert parse_header(format_header(ds)).attributes == ds.attributes

    out = tmp_path / "copy.dat"
    write_keel(df, ds, str(out))
    back, ds2 = read_keel(spark, str(out))
    a = df.orderBy("f1").collect()
    b = back.orderBy("f1").collect()
    assert a == b

    # encode -> decode is the identity on in-vocab data
    dec = decode_nominal(encode_nominal(df, ds), ds).orderBy("f1").collect()
    assert dec == a
