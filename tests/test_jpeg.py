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
