"""BMP codec tests — encoder-as-adversary round trips (BMP is
uncompressed, so decode(encode(x)) must be bit-exact), hand-built
palette / top-down fixtures, and honest guards on compressed or
truncated payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webpagesgraphdatabase_spark.operators import bmp


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    ch=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_is_bit_exact(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    gw, gh, gch, px = bmp.decode(bmp.encode(img))
    assert (gw, gh, gch) == (w, h, 3)
    expect = np.repeat(img, 3, axis=2) if ch == 1 else img
    assert np.array_equal(px, expect)


def test_parse_dims_matches_decode():
    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    payload = bmp.encode(img)
    assert bmp.parse_dims(payload) == (7, 5, 24)
    assert bmp.is_bmp(payload)


def _bmp_8bit_palette() -> tuple[bytes, np.ndarray]:
    """Hand-built 2x2 8-bit paletted BMP: indices [[0,1],[2,3]] over a
    4-color palette (stored bottom-up, rows padded to 4 bytes)."""
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]], dtype=np.uint8
    )
    quads = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    rows = bytes([2, 3, 0, 0]) + bytes([0, 1, 0, 0])  # bottom-up
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(rows), 0, 0, 4, 0)
    off = 14 + 40 + len(quads)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    expect = palette[np.array([[0, 1], [2, 3]])]
    return hdr + info + quads + rows, expect


def test_decode_8bit_palette():
    payload, expect = _bmp_8bit_palette()
    w, h, ch, px = bmp.decode(payload)
    assert (w, h, ch) == (2, 2, 3)
    assert np.array_equal(px, expect)


def test_decode_top_down_and_32bit():
    """Negative height = top-down rows; 32-bit BGRA → RGBA channels."""
    rgba = np.array([[[1, 2, 3, 4], [5, 6, 7, 8]]], dtype=np.uint8)
    bgra = rgba[:, :, [2, 1, 0, 3]]
    data = bgra.tobytes()  # 1 row of 2 px = 8 bytes, already 4-aligned
    info = struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 32, 0, len(data), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    w, h, ch, px = bmp.decode(hdr + info + data)
    assert (w, h, ch) == (2, 1, 4)
    assert np.array_equal(px, rgba)


def test_compressed_and_truncated_raise_cleanly():
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    payload = bytearray(bmp.encode(img))
    payload[30] = 1  # BI_RLE8
    with pytest.raises(bmp.BmpError, match="compression"):
        bmp.decode(bytes(payload))
    with pytest.raises(bmp.BmpError, match="truncated"):
        bmp.decode(bmp.encode(img)[:40])
    with pytest.raises(bmp.BmpError, match="signature"):
        bmp.decode(b"not a bmp at all")
    with pytest.raises(bmp.BmpError, match="truncated"):
        bmp.decode(bmp.encode(img)[:-5])


def test_probe_bytes_reports_bmp():
    from webpagesgraphdatabase_spark.operators import mediainfo

    img = np.zeros((4, 6, 3), dtype=np.uint8)
    out = mediainfo.probe_bytes(bmp.encode(img))
    assert out["kind"] == "bmp"
    assert (out["width"], out["height"]) == (6, 4)
    # corrupt header must come back as err, never raise
    bad = bmp.encode(img)[:20]
    assert mediainfo.probe_bytes(bad)["kind"] == "bmp"
    assert "err" in mediainfo.probe_bytes(bad)
