"""JPEG SOF dims parsing (operators/jpeg.py) and its resize_image
wiring — header-only, so fixtures are hand-built marker streams, no
codec needed."""

from __future__ import annotations

import pytest

from webpagesgraphdatabase_spark.operators import jpeg, multimodal


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _sof(marker: int, width: int, height: int, ncomp: int = 3) -> bytes:
    body = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    body += bytes([ncomp]) + bytes([1, 0x22, 0]) * ncomp  # component specs
    return _seg(marker, body)


def make_jpeg(width: int, height: int, ncomp: int = 3, sof: int = 0xC0) -> bytes:
    """Minimal well-formed header stream: SOI, JFIF APP0, a DQT to skip,
    SOFn, EOI — everything parse_dims walks in a real photo."""
    app0 = _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = _seg(0xDB, bytes(65))
    return jpeg.JPEG_SOI + app0 + dqt + _sof(sof, width, height, ncomp) + b"\xff\xd9"


def test_parse_dims_baseline_and_progressive():
    assert jpeg.parse_dims(make_jpeg(640, 480)) == (640, 480, 3)
    assert jpeg.parse_dims(make_jpeg(31, 7, ncomp=1, sof=0xC2)) == (31, 7, 1)


def test_is_jpeg_discriminates():
    assert jpeg.is_jpeg(make_jpeg(2, 2))
    assert not jpeg.is_jpeg(b"\x89PNG\r\n\x1a\n")
    assert not jpeg.is_jpeg(b"")


def test_parse_dims_skips_fill_bytes():
    blob = jpeg.JPEG_SOI + b"\xff" + make_jpeg(9, 9)[2:]
    assert jpeg.parse_dims(blob) == (9, 9, 3)


def test_parse_dims_rst_standalone_markers_skipped():
    blob = jpeg.JPEG_SOI + b"\xff\xd0" + _sof(0xC0, 5, 6) + b"\xff\xd9"
    assert jpeg.parse_dims(blob) == (5, 6, 3)


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"xx" + b[2:], "bad SOI"),
        (lambda b: b.replace(_sof(0xC0, 8, 8), b""), "no SOF"),
        (lambda b: b[:-4], "bad segment length"),  # SOF truncated mid-segment
        (lambda b: b.replace(b"\xff\xdb", b"\x00\xdb"), "expected marker"),
    ],
)
def test_malformed_jpeg_raises(mutate, msg):
    blob = make_jpeg(8, 8)
    with pytest.raises(jpeg.JpegError, match=msg):
        jpeg.parse_dims(mutate(blob))


def test_zero_dims_raise():
    with pytest.raises(jpeg.JpegError, match="zero-dimension"):
        jpeg.parse_dims(make_jpeg(0, 8))


def test_sos_before_sof_raises():
    blob = jpeg.JPEG_SOI + _seg(0xDA, bytes(6)) + b"\xff\xd9"
    with pytest.raises(jpeg.JpegError, match="no SOF before SOS"):
        jpeg.parse_dims(blob)


def test_dht_not_mistaken_for_sof():
    # 0xC4 (DHT) sits inside the SOF numeric range but is not a frame
    # header — its payload must be skipped, not parsed as dims
    blob = jpeg.JPEG_SOI + _seg(0xC4, bytes(20)) + _sof(0xC0, 12, 34) + b"\xff\xd9"
    assert jpeg.parse_dims(blob) == (12, 34, 3)


def test_spark_resize_reads_jpeg_sof(spark):
    """resize_image real path over JPEG payloads: dims from the SOF
    walk, box arithmetic identical to the PNG path."""
    rows = [
        (1, bytearray(make_jpeg(100, 50))),
        (2, bytearray(make_jpeg(10, 40, ncomp=1, sof=0xC2))),
    ]
    pdf = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in multimodal.resize_image_payloads(pdf, max_side=32).collect()}
    assert (out[1].width, out[1].height) == (100, 50)
    assert (out[1].new_width, out[1].new_height) == (32, 16)
    assert (out[2].width, out[2].height) == (10, 40)
    assert (out[2].new_width, out[2].new_height) == (8, 32)


def test_spark_resize_mixed_png_jpeg_payloads(spark):
    from webpagesgraphdatabase_spark.operators import png
    import numpy as np

    blob_png = png.encode(np.zeros((50, 10, 3), dtype=np.uint8))
    rows = [(1, bytearray(blob_png)), (2, bytearray(make_jpeg(60, 30)))]
    pdf = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in multimodal.resize_image_payloads(pdf).collect()}
    assert (out[1].width, out[1].height) == (10, 50)
    assert (out[2].width, out[2].height) == (60, 30)


# --- baseline codec (encode is the decoder's in-repo adversary) -----

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

ONES = [1] * 64


def _rand_img(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ch=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
@example(
    h=16,
    w=20,
    ch=3,
    seed=27292,
).via('discovered failure')
def test_roundtrip_unit_quant_near_lossless(h, w, ch, seed):
    """All-ones quant tables leave only DCT float rounding (plus the
    color transform's for RGB): error must stay within ±1 (gray) / ±3
    (RGB) on arbitrary noise images of arbitrary non-aligned dims.
    The RGB budget: coefficient rint (±0.5 each of 64 coefficients,
    worst-case spatial stack ~±1.5 on noise) amplified through the
    Cr→R/B gains (1.4-1.8) plus the final pixel rint — hypothesis
    found a genuine ±3 pixel (pinned below), so ±2 was empirically
    too tight, not a codec defect."""
    img = _rand_img(h, w, ch, seed)
    blob = jpeg.encode(img, quant_luma=ONES, quant_chroma=ONES)
    gw, gh, gch, out = jpeg.decode(blob)
    assert (gw, gh, gch) == (w, h, ch)
    err = np.abs(out.reshape(h, w, ch).astype(int) - img.reshape(h, w, ch).astype(int))
    assert err.max() <= (1 if ch == 1 else 3)


def test_annexk_tables_bounded_loss_on_smooth_image():
    yy, xx = np.mgrid[0:33, 0:47]
    smooth = ((yy * 2 + xx) % 180 + 30).astype(np.uint8)
    img = np.stack([smooth] * 3, axis=2)
    _, _, _, out = jpeg.decode(jpeg.encode(img))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


def test_subsampled_chroma_roundtrip():
    # constant-chroma image: 4:2:0 box filter + nearest upsample is
    # lossless on chroma, so error stays at luma-rounding scale
    base = _rand_img(24, 40, 1, seed=3)[:, :]
    img = np.stack([base] * 3, axis=2)
    blob = jpeg.encode(img, quant_luma=ONES, quant_chroma=ONES, subsample=True)
    w, h, ch, out = jpeg.decode(blob)
    assert (w, h, ch) == (40, 24, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    assert jpeg.parse_dims(blob) == (40, 24, 3)


def test_restart_intervals_roundtrip():
    img = _rand_img(40, 56, 1, seed=4)  # 5x7 MCUs, RST every 3
    blob = jpeg.encode(img, quant_luma=ONES, quant_chroma=ONES, restart_interval=3)
    assert b"\xff\xd0" in blob  # RST0 actually emitted
    _, _, _, out = jpeg.decode(blob)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_decode_arithmetic_frame_raises_cleanly():
    # SOF9 (extended sequential, arithmetic coding) stays an honest
    # boundary now that SOF2 decodes for real
    blob = make_jpeg(8, 8, sof=0xC9)
    with pytest.raises(jpeg.JpegError, match="SOF9"):
        jpeg.decode(blob)


# --- progressive (SOF2) decode: T.81 Annex G ------------------------


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ch=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
@example(
    h=25,
    w=12,
    ch=1,
    seed=1,
).via('discovered failure')
@example(
    h=8,
    w=25,
    ch=1,
    seed=259,
).via('discovered failure')
def test_progressive_decode_equals_baseline_decode(h, w, ch, seed):
    """Once every successive-approximation bit has arrived, the
    progressive decoder must reconstruct the exact quantized
    coefficients — so its pixels must match the baseline decode of the
    same image under the same Annex K tables bit-for-bit, on arbitrary
    noise images of arbitrary non-aligned dims."""
    img = _rand_img(h, w, ch, seed)
    _, _, _, base = jpeg.decode(jpeg.encode(img))
    gw, gh, gch, prog = jpeg.decode(jpeg.encode_progressive(img))
    assert (gw, gh, gch) == (w, h, ch)
    assert np.array_equal(base, prog)


def test_progressive_unit_quant_near_lossless():
    img = _rand_img(23, 31, 3, seed=11)
    blob = jpeg.encode_progressive(img, quant_luma=ONES, quant_chroma=ONES)
    w, h, ch, out = jpeg.decode(blob)
    assert (w, h, ch) == (31, 23, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_progressive_restart_intervals_roundtrip():
    """DRI applies per scan group: the DC scans carry RST markers, the
    AC scans see interval 0 — the decode must still be bit-identical to
    baseline."""
    img = _rand_img(29, 37, 3, seed=12)
    blob = jpeg.encode_progressive(img, restart_interval=3)
    assert b"\xff\xd0" in blob  # RST0 actually emitted
    _, _, _, base = jpeg.decode(jpeg.encode(img))
    _, _, _, prog = jpeg.decode(blob)
    assert np.array_equal(base, prog)


def test_progressive_partial_scan_prefix_decodes_coarse():
    """Spectral selection means a truncated scan script still yields an
    image: replaying only the DC-first scan (drop everything after the
    first SOS's entropy data) must give the DC-only approximation —
    each 8×8 block flat at (roughly) its mean."""
    img = _rand_img(16, 16, 1, seed=13)
    blob = jpeg.encode_progressive(img, quant_luma=ONES, quant_chroma=ONES)
    first_sos = blob.index(b"\xff\xda")
    second_sos = blob.index(b"\xff\xda", first_sos + 2)
    truncated = blob[:second_sos] + b"\xff\xd9"
    w, h, ch, out = jpeg.decode(truncated)
    assert (w, h, ch) == (16, 16, 1)
    # DC at Al=1 → block means within the 2-unit successive-approx step
    for by in range(2):
        for bx in range(2):
            blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            got = out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
            assert np.all(got == got[0, 0])  # flat block
            assert abs(int(got[0, 0]) - blk.mean()) <= 3


def test_spark_decode_image_progressive_jpeg_path(spark):
    img = _rand_img(16, 24, 3, seed=14)
    blob = jpeg.encode_progressive(img, quant_luma=ONES, quant_chroma=ONES)
    pdf = spark.createDataFrame([(9, bytearray(blob))], "doc_id long, payload binary")
    row = multimodal.decode_image_payloads(pdf).collect()[0]
    assert (row.width, row.height, row.channels) == (24, 16, 3)
    for c in range(3):
        assert abs(row.features[c] - int(img[:, :, c].mean())) <= 2


def test_decode_missing_table_raises():
    img = _rand_img(8, 8, 1, seed=5)
    blob = jpeg.encode(img)
    # strip the DHT segments: decoder must name the missing table
    i = blob.index(b"\xff\xc4")
    j = blob.index(b"\xff\xda")
    with pytest.raises(jpeg.JpegError, match="missing table"):
        jpeg.decode(blob[:i] + blob[j:])


def test_spark_decode_image_real_jpeg_path(spark):
    img = _rand_img(16, 24, 3, seed=6)
    blob = jpeg.encode(img, quant_luma=ONES, quant_chroma=ONES)
    pdf = spark.createDataFrame([(7, bytearray(blob))], "doc_id long, payload binary")
    row = multimodal.decode_image_payloads(pdf).collect()[0]
    assert (row.width, row.height, row.channels) == (24, 16, 3)
    for c in range(3):
        assert abs(row.features[c] - int(img[:, :, c].mean())) <= 2
