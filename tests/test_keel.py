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


def test_parse_grammar_variants():
    """Half-open/paren bounds, the ARFF `numeric` synonym, typed
    integer vocab headers, and rangeless numerics all parse (VERDICT
    r4 grammar-robustness item)."""
    from chi_frbcs_bigdatacs_spark.sources.keel import parse_header

    ds = parse_header(
        "@relation g\n"
        "@attribute a real [0.0, 1.0)\n"
        "@attribute b integer (1, 5]\n"
        "@attribute c numeric [2, 3]\n"
        "@attribute d integer {0, 1, 2}\n"
        "@attribute e real\n"
        "@attribute class {n, p}\n"
        "@inputs a, b, c, d\n"
        "@outputs class\n"
        "@data\n"
    )
    kinds = {a.name: a.kind for a in ds.attributes}
    assert kinds == {
        "a": "real", "b": "integer", "c": "real",
        "d": "nominal", "e": "real", "class": "nominal",
    }
    assert (ds.attr("a").fmin, ds.attr("a").fmax) == (0.0, 1.0)
    assert (ds.attr("b").fmin, ds.attr("b").fmax) == (1.0, 5.0)
    assert ds.attr("d").values == ["0", "1", "2"]
    assert ds.attr("e").fmin is None and ds.attr("e").fmax is None
    parts = ds.fuzzy_partitions()  # inputs a-d are all well-declared
    assert len(parts.features) == 4


def test_rangeless_numeric_input_rejected_clearly():
    import pytest

    from chi_frbcs_bigdatacs_spark.sources.keel import parse_header

    ds = parse_header(
        "@relation g\n@attribute x real\n@attribute class {n, p}\n"
        "@inputs x\n@outputs class\n@data\n"
    )
    with pytest.raises(ValueError, match="no declared \\[min, max\\]"):
        ds.fuzzy_partitions()


def test_header_round_trip_property():
    """parse(format(ds)) == ds over randomized headers (hypothesis),
    including integer vocabs and rangeless numerics."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from chi_frbcs_bigdatacs_spark.sources.keel import (
        KeelAttribute,
        KeelDataset,
        format_header,
        parse_header,
    )

    name = st.from_regex(r"[a-zA-Z][a-zA-Z0-9_]{0,8}", fullmatch=True)
    finite = st.floats(
        allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
    )
    vocab_token = st.one_of(
        st.from_regex(r"[a-zA-Z0-9_]{1,6}", fullmatch=True),
        st.integers(-99, 99).map(str),
    )

    def mk_attr(n, choice, lo, hi, vocab):
        if choice == "nominal":
            return KeelAttribute(n, "nominal", values=vocab)
        if choice == "rangeless":
            return KeelAttribute(n, "real")
        return KeelAttribute(n, choice, min(lo, hi), max(lo, hi))

    attr = st.builds(
        mk_attr,
        name,
        st.sampled_from(["real", "integer", "nominal", "rangeless"]),
        finite,
        finite,
        st.lists(vocab_token, min_size=1, max_size=4, unique=True),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(attr, min_size=2, max_size=6))
    def prop(attrs):
        # unique names; last attribute is the output by construction
        seen = {}
        for i, a in enumerate(attrs):
            a.name = f"{a.name}_{i}"
            seen[a.name] = a
        ds = KeelDataset(
            "prop_rel",
            attrs,
            [a.name for a in attrs[:-1]],
            [attrs[-1].name],
            0,
        )
        rt = parse_header(format_header(ds))
        assert [a.name for a in rt.attributes] == [a.name for a in attrs]
        for orig, back in zip(attrs, rt.attributes):
            assert back.kind == orig.kind
            assert back.values == orig.values
            assert back.fmin == orig.fmin and back.fmax == orig.fmax
        assert rt.inputs == ds.inputs and rt.outputs == ds.outputs

    prop()


def test_integer_attribute_binds_long(spark, tmp_path):
    """Plain `integer` attributes load as exact 64-bit integers — a
    60-bit content-addressed id must survive the text round-trip
    bit-exactly (a double mantissa would corrupt it)."""
    big = (1 << 60) - 3  # not representable as a double
    txt = (
        "@relation ids\n"
        "@attribute id integer\n"
        "@attribute f1 real [0.0, 1.0]\n"
        "@inputs f1\n@outputs f1\n@data\n"
        f"{big},0.5\n{big - 1},0.25\n"
    )
    p = tmp_path / "ids.dat"
    p.write_text(txt)
    from chi_frbcs_bigdatacs_spark.sources.keel import read_keel, write_keel

    df, ds = read_keel(spark, str(p))
    assert df.schema["id"].dataType.typeName() == "long"
    assert sorted(r.id for r in df.collect()) == [big - 1, big]
    out = tmp_path / "copy.dat"
    write_keel(df, ds, str(out))
    back, _ = read_keel(spark, str(out))
    assert sorted(r.id for r in back.collect()) == [big - 1, big]


def test_crossval_keel_folds_partition_the_fixture(spark):
    """The staged 5-fold KEEL file pairs are a real partition: the
    five test files are disjoint and their union is the fixture; each
    train file is the complement of its paired test file."""
    from chi_frbcs_bigdatacs_spark.fuzzy.keel_cv import N_FOLDS, _fold_files
    from chi_frbcs_bigdatacs_spark.sources.keel import read_keel
    from chi_frbcs_bigdatacs_spark.sources.testdata import lineitem_clf
    from tests.conftest import SF_SMALL

    d = _fold_files(spark, SF_SMALL)
    all_ids = {r.id for r in lineitem_clf(spark, SF_SMALL).select("id").collect()}
    seen: set[int] = set()
    for k in range(N_FOLDS):
        tst, _ = read_keel(spark, f"{d}/lineitem-5-{k + 1}tst.dat")
        tra, _ = read_keel(spark, f"{d}/lineitem-5-{k + 1}tra.dat")
        tst_ids = {r.id for r in tst.select("id").collect()}
        tra_ids = {r.id for r in tra.select("id").collect()}
        assert tst_ids and not (tst_ids & seen)
        assert tra_ids == all_ids - tst_ids
        seen |= tst_ids
    assert seen == all_ids
