"""Hypothesis property tests for the pure-Python media codecs.

The example-based codec tests (test_edge_cases.py) pin known shapes;
these sweep RANDOMIZED geometry/content so the wire-format corners the
examples never chose — odd widths per Adam7 pass, filter/ctype/level
combinations, JPEG AC patterns near the category boundaries — are
machine-generated every CI run. Pure-Python, no Spark session.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _png_expect(w: int, h: int, d: int) -> tuple[int, int, int, int]:
    run = d % 3 + 2

    def idx(x: int, y: int) -> int:
        return (d + 5 * y + 3 * (x // run)) % 256

    t = sum(
        idx(x, y) + (2 * idx(x, y)) % 256 + (3 * idx(x, y)) % 256
        for y in range(h)
        for x in range(w)
    )
    c = sum(
        (1 + x + w * y)
        * (
            idx(x, y)
            + 2 * ((2 * idx(x, y)) % 256)
            + 3 * ((3 * idx(x, y)) % 256)
        )
        for y in range(h)
        for x in range(w)
    )
    return (w, h, t, c)


@settings(max_examples=80, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=21),
    h=st.integers(min_value=1, max_value=13),
    d=st.integers(min_value=0, max_value=238),
    ctype=st.sampled_from([0, 2, 3]),
    interlace=st.sampled_from([0, 1]),
    filter_cycle=st.booleans(),
    level=st.sampled_from([None, 0, 1, 9]),
)
def test_png_all_wire_formats_roundtrip(w, h, d, ctype, interlace, filter_cycle, level):
    """EVERY combination of color type x interlace x filter cycling x
    compressor (our fixed-Huffman or stdlib zlib at stored/fixed/
    dynamic levels) must decode to the closed-form features — palette
    and RGB identically, grayscale to the (v,v,v) mapping."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    raw = _encode_png(
        w, h, d, level=level, filter_cycle=filter_cycle,
        ctype=ctype, interlace=interlace,
    )
    got = _decode_png(raw)
    if ctype in (2, 3):
        assert got == _png_expect(w, h, d)
    else:
        run = d % 3 + 2

        def idx(x: int, y: int) -> int:
            return (d + 5 * y + 3 * (x // run)) % 256

        tg = sum(3 * idx(x, y) for y in range(h) for x in range(w))
        cg = sum(
            (1 + x + w * y) * 6 * idx(x, y)
            for y in range(h)
            for x in range(w)
        )
        assert got == (w, h, tg, cg)


@settings(max_examples=40, deadline=None)
@given(
    bw=st.integers(min_value=1, max_value=3),
    bh=st.integers(min_value=1, max_value=2),
    data=st.data(),
    ncomp=st.sampled_from([1, 3]),
)
def test_jpeg_random_images_bounded_drift(bw, bh, data, ncomp):
    """Random textured images through the REAL transform pipeline:
    with the all-ones quant table, reconstruction drift is bounded by
    coefficient rounding alone — mean per-pixel error must stay under
    one grey level for every geometry and component count."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    w, h = 8 * bw, 8 * bh
    planes = [
        [
            [data.draw(st.integers(min_value=0, max_value=255)) for _ in range(w)]
            for _ in range(h)
        ]
        for _ in range(ncomp)
    ]
    gw, gh, total, _chk = _decode_jpeg(_encode_jpeg(planes))
    assert (gw, gh) == (w, h)
    true_total = sum(sum(sum(r) for r in p) for p in planes)
    assert abs(total - true_total) / (ncomp * w * h) <= 1.0


@settings(max_examples=60, deadline=None)
@given(
    bw=st.integers(min_value=1, max_value=4),
    bh=st.integers(min_value=1, max_value=3),
    vals=st.lists(
        st.integers(min_value=0, max_value=255), min_size=12, max_size=12
    ),
    ncomp=st.sampled_from([1, 3]),
)
def test_jpeg_flat_blocks_always_bit_exact(bw, bh, vals, ncomp):
    """ANY per-block-constant image (not just the fixture formula)
    must survive the DCT round trip bit-exactly — DC-only blocks are
    the codec's exactness contract, and the per-component DC
    differential chains must never cross."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    w, h = 8 * bw, 8 * bh
    planes = [
        [
            [vals[(c * 4 + (y // 8) * bw + (x // 8)) % 12] for x in range(w)]
            for y in range(h)
        ]
        for c in range(ncomp)
    ]
    gw, gh, total, chk = _decode_jpeg(_encode_jpeg(planes))
    assert (gw, gh) == (w, h)
    assert total == sum(sum(sum(r) for r in p) for p in planes)
    assert chk == sum(
        (1 + x + w * y)
        * sum((c + 1) * planes[c][y][x] for c in range(ncomp))
        for y in range(h)
        for x in range(w)
    )


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=21),
    h=st.integers(min_value=1, max_value=13),
    d=st.integers(min_value=0, max_value=238),
    interlace=st.sampled_from([0, 1]),
    filter_cycle=st.booleans(),
    level=st.sampled_from([None, 0, 1, 9]),
)
def test_png_rgba_roundtrip(w, h, d, interlace, filter_cycle, level):
    """ctype 6 (r12): the 4-byte pixel moves every Sub/Average/Paeth
    predictor offset, so each filter/interlace/compressor combination
    must reconstruct the closed-form RGBA features exactly."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    raw = _encode_png(
        w, h, d, level=level, filter_cycle=filter_cycle,
        ctype=6, interlace=interlace,
    )
    run = d % 3 + 2

    def idx(x: int, y: int) -> int:
        return (d + 5 * y + 3 * (x // run)) % 256

    def chans(x: int, y: int) -> tuple[int, int, int, int]:
        i = idx(x, y)
        return i, (2 * i) % 256, (3 * i) % 256, (5 * i + 11) % 256

    t = sum(sum(chans(x, y)) for y in range(h) for x in range(w))
    c = sum(
        (1 + x + w * y)
        * sum((k + 1) * v for k, v in enumerate(chans(x, y)))
        for y in range(h)
        for x in range(w)
    )
    assert _decode_png(raw) == (w, h, t, c)


@settings(max_examples=40, deadline=None)
@given(
    bw=st.integers(min_value=1, max_value=3),
    bh=st.integers(min_value=1, max_value=2),
    vals=st.lists(
        st.integers(min_value=0, max_value=255), min_size=16, max_size=16
    ),
)
def test_jpeg_420_flat_blocks_bit_exact(bw, bh, vals):
    """4:2:0 (r12): ANY per-Y-block / per-MCU-chroma constant image
    round-trips bit-exactly through the subsampled MCU grammar —
    including partial edge MCUs (bw/bh odd), where the encoder's
    clamp-padded blocks must decode and then crop away without
    corrupting the three DC predictor chains."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg_420,
    )

    w, h = 8 * bw, 8 * bh
    mcx, mcy = (w + 15) // 16, (h + 15) // 16
    y = [[vals[((yy // 8) * bw + xx // 8) % 16] for xx in range(w)] for yy in range(h)]
    cb = [
        [vals[(8 + (yy // 8) * mcx + xx // 8) % 16] for xx in range(8 * mcx)]
        for yy in range(8 * mcy)
    ]
    cr = [
        [vals[(12 + (yy // 8) * mcx + xx // 8) % 16] for xx in range(8 * mcx)]
        for yy in range(8 * mcy)
    ]
    gw, gh, total, chk = _decode_jpeg(_encode_jpeg_420(y, cb, cr))
    assert (gw, gh) == (w, h)
    et = ec = 0
    for gy in range(h):
        for gx in range(w):
            vy, vb, vr = y[gy][gx], cb[gy // 2][gx // 2], cr[gy // 2][gx // 2]
            et += vy + vb + vr
            ec += (1 + gx + w * gy) * (vy + 2 * vb + 3 * vr)
    assert (total, chk) == (et, ec)


def test_jpeg_sampling_rejection_guards():
    """Unsupported sampling layouts must be rejected BY NAME (the
    wire-format guard convention): 2:4 and 1:4 SOFs raise
    NotImplementedError rather than silently mis-decoding. (4:2:2 —
    0x21 — graduated from this list to a real decode path in r12;
    4:1:1 — 0x41 — in r13.)"""
    import pytest

    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg_420,
    )

    y = [[7] * 16 for _ in range(16)]
    c8 = [[9] * 8 for _ in range(8)]
    raw = bytearray(_encode_jpeg_420(y, c8, c8))
    i = raw.find(b"\xff\xc0")
    # SOF0: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) then
    # [id, sampling, qtab] per component -> comp-1 sampling at i+11
    assert i > 0 and raw[i + 11] == 0x22
    for bad in (0x12, 0x14):  # 2:4 / 1:4 vertical layouts
        patched = bytearray(raw)
        patched[i + 11] = bad
        with pytest.raises(NotImplementedError, match="sampling"):
            _decode_jpeg(bytes(patched))


@settings(max_examples=40, deadline=None)
@given(
    bw=st.integers(min_value=1, max_value=4),
    bh=st.integers(min_value=1, max_value=3),
    vals=st.lists(
        st.integers(min_value=0, max_value=255), min_size=12, max_size=12
    ),
    ncomp=st.sampled_from([1, 3]),
    interval=st.integers(min_value=1, max_value=5),
)
def test_jpeg_restart_markers_bit_exact(bw, bh, vals, ncomp, interval):
    """r12 DRI/RSTn: any restart interval (including 1, and intervals
    longer than the MCU count) must decode IDENTICALLY to the plain
    stream — the DC predictor resets on both sides must line up at
    exactly the declared MCU boundaries or the values after the first
    restart drift by the lost delta."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
    )

    w, h = 8 * bw, 8 * bh
    planes = [
        [
            [vals[(c * 4 + (y // 8) * bw + (x // 8)) % 12] for x in range(w)]
            for y in range(h)
        ]
        for c in range(ncomp)
    ]
    plain = _decode_jpeg(_encode_jpeg(planes))
    with_rst = _decode_jpeg(_encode_jpeg(planes, restart_interval=interval))
    assert with_rst == plain


def test_jpeg_restart_rejection_guards():
    """A wrong RST sequence number (lost MCUs) and a missing marker
    must both fail by name, never silently mis-decode."""
    import pytest

    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg,
        _jpeg_fixture_pixels,
    )

    raw = bytearray(
        _encode_jpeg([_jpeg_fixture_pixels(3, 2, 10)], restart_interval=1)
    )
    i = raw.find(b"\xff\xd0")
    assert i > 0
    bad = bytearray(raw)
    bad[i + 1] = 0xD4  # out-of-sequence RST4 where RST0 is due
    with pytest.raises(ValueError, match="RST"):
        _decode_jpeg(bytes(bad))
    # DRI declared but markers absent: strip DRI's promise by doubling
    # the interval in the segment -> decoder expects the marker later
    # than the encoder emitted it -> marker lands inside entropy data
    j = raw.find(b"\xff\xdd")
    assert j > 0
    bad2 = bytearray(raw)
    bad2[j + 4 : j + 6] = (2).to_bytes(2, "big")  # encoder used 1
    with pytest.raises(ValueError, match="marker inside entropy data"):
        _decode_jpeg(bytes(bad2))


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=21),
    h=st.integers(min_value=1, max_value=13),
    d=st.integers(min_value=0, max_value=238),
    interlace=st.sampled_from([0, 1]),
    filter_cycle=st.booleans(),
    level=st.sampled_from([None, 0, 1, 9]),
)
def test_png_16bit_gray_roundtrip(w, h, d, interlace, filter_cycle, level):
    """depth 16 (r12): u16 big-endian samples filter at bpp=2, hi and
    lo bytes predicting from each other — every filter/interlace/
    compressor combination must render the MSB closed form exactly."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    raw = _encode_png(
        w, h, d, level=level, filter_cycle=filter_cycle,
        ctype=0, depth=16, interlace=interlace,
    )
    run = d % 3 + 2

    def idx(x: int, y: int) -> int:
        return (d + 5 * y + 3 * (x // run)) % 256

    t = sum(3 * idx(x, y) for y in range(h) for x in range(w))
    c = sum(
        (1 + x + w * y) * 6 * idx(x, y) for y in range(h) for x in range(w)
    )
    assert _decode_png(raw) == (w, h, t, c)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=21),
    h=st.integers(min_value=1, max_value=13),
    d=st.integers(min_value=0, max_value=238),
    trns_len=st.integers(min_value=1, max_value=256),
    interlace=st.sampled_from([0, 1]),
    filter_cycle=st.booleans(),
    level=st.sampled_from([None, 0, 9]),
)
def test_png_trns_palette_roundtrip(
    w, h, d, trns_len, interlace, filter_cycle, level
):
    """tRNS (r12) at ANY chunk length 1..256: entries below the chunk
    take (7*i+13)%256, entries at or past it are opaque 255 — both
    branches of the spec's short-chunk rule land in the features."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    raw = _encode_png(
        w, h, d, level=level, filter_cycle=filter_cycle,
        ctype=3, trns=trns_len, interlace=interlace,
    )
    run = d % 3 + 2

    def chans(x: int, y: int) -> tuple[int, int, int, int]:
        i = (d + 5 * y + 3 * (x // run)) % 256
        a = (7 * i + 13) % 256 if i < trns_len else 255
        return i, (2 * i) % 256, (3 * i) % 256, a

    t = sum(sum(chans(x, y)) for y in range(h) for x in range(w))
    c = sum(
        (1 + x + w * y)
        * sum((k + 1) * v for k, v in enumerate(chans(x, y)))
        for y in range(h)
        for x in range(w)
    )
    assert _decode_png(raw) == (w, h, t, c)


@settings(max_examples=40, deadline=None)
@given(
    bw=st.integers(min_value=1, max_value=4),
    bh=st.integers(min_value=1, max_value=3),
    data=st.data(),
)
def test_jpeg_progressive_equals_baseline_bit_exact(bw, bh, data):
    """The progressive exactness contract (r12): with the all-ones
    quant table the 5-scan script (DC/AC first at Al=1, then full
    refinement to Al=0) restores every coefficient exactly, so the
    SOF2 decode of ANY random image must be BIT-IDENTICAL to the
    baseline SOF0 decode of the same pixels — this pins spectral
    selection, EOB runs, ZRL-in-refinement, and the G.1.2.3
    correction-bit interleave all at once."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_jpeg,
        _decode_jpeg_progressive,
        _encode_jpeg_gray,
        _encode_jpeg_progressive,
    )

    w, h = 8 * bw, 8 * bh
    px = [
        [data.draw(st.integers(min_value=0, max_value=255)) for _ in range(w)]
        for _ in range(h)
    ]
    assert _decode_jpeg_progressive(
        _encode_jpeg_progressive(px)
    ) == _decode_jpeg(_encode_jpeg_gray(px))


@settings(max_examples=40, deadline=None)
@given(
    freqs=st.dictionaries(
        st.integers(min_value=0, max_value=255),
        st.integers(min_value=1, max_value=10_000),
        min_size=1,
        max_size=120,
    )
)
def test_jpeg_optimal_table_is_legal_huffman(freqs):
    """T.81 K.2 table construction: every symbol coded, lengths within
    the 16-bit DHT limit, the code set strictly Kraft-incomplete (the
    reserved codepoint guarantees no all-ones code word), and the
    canonical expansion prefix-free."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _jpeg_canonical,
        _jpeg_optimal_table,
    )

    bits, vals = _jpeg_optimal_table(freqs)
    assert len(bits) == 16
    assert sorted(vals) == sorted(freqs)
    assert sum(bits) == len(freqs)
    kraft = sum(n / (1 << (i + 1)) for i, n in enumerate(bits))
    assert kraft < 1.0  # reserved all-ones codepoint removed
    tab = _jpeg_canonical(bits, vals)
    codes = sorted((ln, code) for code, ln in tab.values())
    for i in range(len(codes) - 1):
        l1, c1 = codes[i]
        l2, c2 = codes[i + 1]
        assert (c2 >> (l2 - l1)) != c1  # prefix-free
    for ln, code in codes:
        assert code != (1 << ln) - 1  # all-ones reserved


def test_jpeg_progressive_rejection_guards():
    """Grammar violations fail by name: baseline/progressive streams
    are not interchangeable, AC scans cannot precede DC, successive
    approximation must step Al by exactly one, DRI is rejected."""
    import pytest

    from chi_frbcs_bigdatacs_spark.operators import multimodal as mm

    px = mm._jpeg_fixture_pixels(2, 2, 77)
    prog = mm._encode_jpeg_progressive(px)
    base = mm._encode_jpeg_gray(px)
    with pytest.raises(NotImplementedError, match="SOF0"):
        mm._decode_jpeg(prog)
    with pytest.raises(ValueError, match="SOF2 decoder"):
        mm._decode_jpeg_progressive(base)

    orig = mm._JPEG_PROG_SCANS[:]
    try:
        # AC scan first: the decoder must refuse to start the band
        mm._JPEG_PROG_SCANS[:] = [("ac_first", 1, 63, 0, 0)]
        bad = mm._encode_jpeg_progressive(px)
        with pytest.raises(ValueError, match="AC scan before DC"):
            mm._decode_jpeg_progressive(bad)
        # refinement that skips a precision level
        mm._JPEG_PROG_SCANS[:] = [
            ("dc_first", 0, 0, 0, 2),
            ("dc_refine", 0, 0, 2, 0),
        ]
        bad = mm._encode_jpeg_progressive(px)
        with pytest.raises(ValueError, match="step Al by 1"):
            mm._decode_jpeg_progressive(bad)
    finally:
        mm._JPEG_PROG_SCANS[:] = orig
    # a DC-only scan script decodes to the DC approximation (legal
    # stream: progressive viewers render exactly this between scans)
    try:
        mm._JPEG_PROG_SCANS[:] = [
            ("dc_first", 0, 0, 0, 1),
            ("dc_refine", 0, 0, 1, 0),
        ]
        dc_only = mm._encode_jpeg_progressive(px)
        w, h, total, chk = mm._decode_jpeg_progressive(dc_only)
        assert (w, h) == (16, 16)
        # fixture blocks are constant -> DC alone reconstructs exactly
        assert total == sum(sum(r) for r in px)
    finally:
        mm._JPEG_PROG_SCANS[:] = orig


@settings(max_examples=40, deadline=None)
@given(
    bw=st.integers(min_value=1, max_value=3),
    bh=st.integers(min_value=1, max_value=3),
    vals=st.lists(
        st.integers(min_value=0, max_value=255), min_size=16, max_size=16
    ),
)
def test_jpeg_422_flat_blocks_bit_exact(bw, bh, vals):
    """4:2:2 (r12): per-Y-block / per-MCU-chroma constant images
    round-trip bit-exactly through the 2x1 MCU grammar — partial
    RIGHT-edge MCUs (bw odd) clamp-pad and crop, every MCU row is full
    height, and chroma upsamples horizontally only."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_jpeg,
        _encode_jpeg_422,
    )

    w, h = 8 * bw, 8 * bh
    mcx, mcy = (w + 15) // 16, h // 8
    y = [[vals[((yy // 8) * bw + xx // 8) % 16] for xx in range(w)] for yy in range(h)]
    cb = [
        [vals[(8 + (yy // 8) * mcx + xx // 8) % 16] for xx in range(8 * mcx)]
        for yy in range(8 * mcy)
    ]
    cr = [
        [vals[(12 + (yy // 8) * mcx + xx // 8) % 16] for xx in range(8 * mcx)]
        for yy in range(8 * mcy)
    ]
    gw, gh, total, chk = _decode_jpeg(_encode_jpeg_422(y, cb, cr))
    assert (gw, gh) == (w, h)
    et = ec = 0
    for gy in range(h):
        for gx in range(w):
            vy, vb, vr = y[gy][gx], cb[gy][gx // 2], cr[gy][gx // 2]
            et += vy + vb + vr
            ec += (1 + gx + w * gy) * (vy + 2 * vb + 3 * vr)
    assert (total, chk) == (et, ec)


@settings(max_examples=60, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=3000),
    alphabet=st.integers(min_value=1, max_value=256),
)
def test_lzw_roundtrip_any_bytes(data, alphabet):
    """GIF-flavor LZW over arbitrary byte strings: the add-ahead
    encoder and the one-behind decoder must agree on every width
    transition, the KwKwK corner, and the CLEAR-on-full reset (small
    alphabets fill the 4096-entry table quickly)."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    data = bytes(b % alphabet for b in data)
    assert _lzw_decode(_lzw_encode(data, 8), 8, len(data)) == data


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=23),
    h=st.integers(min_value=1, max_value=14),
    d=st.integers(min_value=0, max_value=238),
    interlace=st.sampled_from([0, 1]),
)
def test_gif_roundtrip_closed_form(w, h, d, interlace):
    """GIF (r12): every geometry x interlace combination decodes to
    the shared palette closed form — entry i = (i, 2i%256, 3i%256)
    through the global color table, rows restored from the 4-pass
    interlace permutation."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_gif,
        _encode_gif,
    )

    run = d % 3 + 2

    def chans(x: int, y: int) -> tuple[int, int, int]:
        i = (d + 5 * y + 3 * (x // run)) % 256
        return i, (2 * i) % 256, (3 * i) % 256

    t = sum(sum(chans(x, y)) for y in range(h) for x in range(w))
    c = sum(
        (1 + x + w * y)
        * sum((k + 1) * v for k, v in enumerate(chans(x, y)))
        for y in range(h)
        for x in range(w)
    )
    assert _decode_gif(_encode_gif(w, h, d, interlace)) == (w, h, t, c)


def test_gif_rejection_guards():
    """GIF grammar violations fail by name: wrong magic, missing
    global color table, local color tables, sub-rectangle frames,
    truncated LZW, codes beyond the assigned table."""
    import pytest

    from chi_frbcs_bigdatacs_spark.operators import multimodal as mm

    raw = bytearray(mm._encode_gif(9, 6, 42))
    with pytest.raises(ValueError, match="not a GIF"):
        mm._decode_gif(b"JIF89a" + bytes(raw[6:]))
    nogct = bytearray(raw)
    nogct[10] &= 0x7F  # clear the GCT flag
    with pytest.raises(NotImplementedError, match="global color table"):
        mm._decode_gif(bytes(nogct))
    i = raw.index(0x2C, 13 + 768)  # image descriptor after the GCT
    local = bytearray(raw)
    local[i + 9] |= 0x80  # claim a local color table
    with pytest.raises(NotImplementedError, match="local color"):
        mm._decode_gif(bytes(local))
    shifted = bytearray(raw)
    shifted[i + 1] = 1  # left offset 1 -> sub-rectangle
    with pytest.raises(NotImplementedError, match="sub-rectangle"):
        mm._decode_gif(bytes(shifted))
    with pytest.raises(ValueError):
        mm._decode_gif(bytes(raw[: i + 14]))  # truncated mid-LZW
    # a code beyond the assigned table: craft a stream whose second
    # code is far past next_code
    from chi_frbcs_bigdatacs_spark.operators.multimodal import _lzw_decode

    acc = 256 | (400 << 9) | (300 << 18)  # CLEAR, literal 400? no: 400 > 257+0
    bad = acc.to_bytes(5, "little")
    with pytest.raises(ValueError, match="beyond assigned"):
        _lzw_decode(bad, 8, 100)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=21),
    h=st.integers(min_value=1, max_value=13),
    d=st.integers(min_value=0, max_value=238),
    interlace=st.sampled_from([0, 1]),
    filter_cycle=st.booleans(),
    level=st.sampled_from([None, 0, 1, 9]),
)
def test_png_grayalpha_roundtrip(w, h, d, interlace, filter_cycle, level):
    """ctype 4 (r12): 2-byte gray+alpha pixels put the filter
    predictors at bpp=2 — gray predicts from gray, alpha from alpha —
    under every filter/interlace/compressor combination; decode
    renders (v,v,v) plus alpha at channel weight 4."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    raw = _encode_png(
        w, h, d, level=level, filter_cycle=filter_cycle,
        ctype=4, interlace=interlace,
    )
    run = d % 3 + 2

    def va(x: int, y: int) -> tuple[int, int]:
        i = (d + 5 * y + 3 * (x // run)) % 256
        return i, (5 * i + 11) % 256

    t = sum(3 * v + a for y in range(h) for x in range(w)
            for v, a in [va(x, y)])
    c = sum(
        (1 + x + w * y) * (6 * v + 4 * a)
        for y in range(h)
        for x in range(w)
        for v, a in [va(x, y)]
    )
    assert _decode_png(raw) == (w, h, t, c)


@settings(max_examples=25, deadline=None)
@given(
    bw=st.integers(min_value=1, max_value=3),
    bh=st.integers(min_value=1, max_value=2),
    data=st.data(),
)
def test_jpeg_progressive_color_equals_baseline(bw, bh, data):
    """3-component progressive (r12): the 8-scan script — interleaved
    DC with three predictor chains, per-component AC bands, DC and
    per-component AC refinements — must reconstruct BIT-IDENTICALLY
    to the baseline interleaved color decode of the same planes."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_jpeg,
        _decode_jpeg_progressive,
        _encode_jpeg,
        _encode_jpeg_progressive_color,
    )

    w, h = 8 * bw, 8 * bh
    planes = [
        [
            [data.draw(st.integers(min_value=0, max_value=255)) for _ in range(w)]
            for _ in range(h)
        ]
        for _ in range(3)
    ]
    assert _decode_jpeg_progressive(
        _encode_jpeg_progressive_color(planes)
    ) == _decode_jpeg(_encode_jpeg(planes))


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=12),
    data=st.data(),
    mode=st.sampled_from(["random", "gradient", "flat"]),
)
def test_qoi_roundtrip_all_op_mixes(w, h, data, mode):
    """QOI (r12): random pixels hit RGB/INDEX, gradients hit
    DIFF/LUMA, flat images hit maximal RUNs — every coding mode must
    decode back to the exact per-pixel features, with the 64-entry
    running index staying in lockstep between encoder and decoder."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_qoi,
        _encode_qoi_pixels,
    )

    if mode == "flat":
        v = data.draw(st.integers(min_value=0, max_value=255))
        rows = [[(v, v, v)] * w for _ in range(h)]
    elif mode == "gradient":
        base = data.draw(st.integers(min_value=0, max_value=255))
        step = data.draw(st.integers(min_value=-2, max_value=2))
        rows = [
            [
                (
                    (base + step * (x + w * y)) % 256,
                    (base + step * (x + w * y) + 1) % 256,
                    (base + step * (x + w * y) + 2) % 256,
                )
                for x in range(w)
            ]
            for y in range(h)
        ]
    else:
        rows = [
            [
                tuple(
                    data.draw(st.integers(min_value=0, max_value=255))
                    for _ in range(3)
                )
                for _ in range(w)
            ]
            for y in range(h)
        ]
    t = sum(sum(p) for r in rows for p in r)
    c = sum(
        (1 + x + w * y) * (r + 2 * g + 3 * b)
        for y, row in enumerate(rows)
        for x, (r, g, b) in enumerate(row)
    )
    assert _decode_qoi(_encode_qoi_pixels(rows)) == (w, h, t, c)


def test_qoi_rejection_guards():
    import pytest

    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_qoi,
        _encode_qoi,
    )

    raw = bytearray(_encode_qoi(6, 4, 9))
    with pytest.raises(ValueError, match="not a QOI"):
        _decode_qoi(b"qoix" + bytes(raw[4:]))
    rgba = bytearray(raw)
    rgba[12] = 4  # channels byte
    with pytest.raises(NotImplementedError, match="3-channel"):
        _decode_qoi(bytes(rgba))
    with pytest.raises(ValueError, match="ended before"):
        _decode_qoi(bytes(raw[: len(raw) - 12]))
    noend = bytearray(raw)
    noend[-1] = 0  # corrupt the end marker
    with pytest.raises(ValueError, match="end marker"):
        _decode_qoi(bytes(noend))


def test_adpcm_tables_and_state_machine_invariants():
    """IMA ADPCM constants and recurrence (r13): the public 89-entry
    step table is strictly increasing from 7 to 32767; the index
    table is the IMA [-1,-1,-1,-1,2,4,6,8]; and the state machine
    honors the spec's envelope — nibble 0 adds exactly step>>3 and
    decays the index, nibble 15 subtracts the full
    step+step>>1+step>>2+step>>3 and raises it by 8, and the
    predictor clamps at int16 bounds."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        ADPCM_INDEX,
        ADPCM_STEP,
        _adpcm_step_state,
    )

    assert len(ADPCM_STEP) == 89
    assert ADPCM_STEP[0] == 7 and ADPCM_STEP[-1] == 32767
    assert all(a < b for a, b in zip(ADPCM_STEP, ADPCM_STEP[1:]))
    assert ADPCM_INDEX == [-1, -1, -1, -1, 2, 4, 6, 8]

    # nibble 0 at index 30 (step 130): +130>>3 = +16, index 29
    p, ix = _adpcm_step_state(100, 30, 0)
    assert (p, ix) == (116, 29)
    # nibble 15 at index 30: -(130 + 65 + 32 + 16) = -243, index 38
    p, ix = _adpcm_step_state(100, 30, 15)
    assert (p, ix) == (100 - 243, 38)
    # clamping: predictor pinned at int16, index pinned at [0, 88]
    p, ix = _adpcm_step_state(32760, 88, 7)  # huge positive add
    assert p == 32767 and ix == 88
    p, ix = _adpcm_step_state(-32768, 0, 8)  # sign-only nibble
    assert p == -32768 and ix == 0  # index decays but clamps at 0


def test_adpcm_roundtrip_features_match_direct_state_walk():
    """The full wire decode (chunk walk + block parse) must equal a
    direct Python walk of the same closed-form nibble stream — pins
    the header-sample convention (each block header = that block's
    first sample), the PER-BLOCK STATE RESET, and the
    low-nibble-first packing; zero-crossings run across block
    boundaries."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _adpcm_block_init,
        _adpcm_nibble,
        _adpcm_step_state,
        _decode_wav_adpcm,
        _encode_wav_adpcm,
    )

    for seed, n, nb in ((5, 16, 1), (123, 40, 2), (238, 62, 3)):
        sr, ns, peak, sa, zc, cs = _decode_wav_adpcm(
            _encode_wav_adpcm(seed, n, nb)
        )
        samples = []
        for b in range(nb):
            pred, idx = _adpcm_block_init(seed, b)
            samples.append(pred)  # header = the block's first sample
            for i in range(n):
                pred, idx = _adpcm_step_state(
                    pred, idx, _adpcm_nibble(seed, b * n + i)
                )
                samples.append(pred)
        assert ns == nb * (n + 1) == len(samples)
        assert peak == max(abs(s) for s in samples)
        assert sa == sum(abs(s) for s in samples)
        assert cs == sum((i + 1) * s for i, s in enumerate(samples))
        assert zc == sum(
            1
            for i in range(1, len(samples))
            if (samples[i - 1] < 0) != (samples[i] < 0)
        )


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=17),
    h=st.integers(min_value=1, max_value=11),
    d=st.integers(min_value=0, max_value=238),
    ctype=st.sampled_from([0, 2]),
    interlace=st.sampled_from([0, 1]),
    filter_cycle=st.booleans(),
    level=st.sampled_from([None, 0, 9]),
)
def test_png_16bit_roundtrip(w, h, d, ctype, interlace, filter_cycle, level):
    """depth 16 (gray r12, RGB r13): u16 samples at v*257 put the
    filter predictors at bpp 2/6 with hi and lo bytes cross-
    predicting; every interlace/filter/compressor combination must
    decode to the SAME closed-form features as the 8-bit rendering
    of the same fixture."""
    from chi_frbcs_bigdatacs_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    raw = _encode_png(
        w, h, d, level=level, filter_cycle=filter_cycle,
        ctype=ctype, interlace=interlace, depth=16,
    )
    got = _decode_png(raw)
    if ctype == 2:
        assert got == _png_expect(w, h, d)
    else:
        run = d % 3 + 2

        def idx(x: int, y: int) -> int:
            return (d + 5 * y + 3 * (x // run)) % 256

        tg = sum(3 * idx(x, y) for y in range(h) for x in range(w))
        cg = sum(
            (1 + x + w * y) * 6 * idx(x, y)
            for y in range(h)
            for x in range(w)
        )
        assert got == (w, h, tg, cg)
