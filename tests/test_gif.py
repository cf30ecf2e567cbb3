"""Pure-stdlib GIF codec tests: LZW round-trips (plain, interlaced,
table-reset), hand-built malformed payloads, and the mapInPandas
wiring — the same strategy as the PNG/JPEG/WAV suites."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webpagesgraphdatabase_spark.operators import gif, multimodal


def _pal_img(h, w, n_colors, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, size=(n_colors, 3), dtype=np.uint8)
    # unique-ify palette rows so n_colors is honest
    pal = np.unique(pal, axis=0)
    idx = rng.randint(0, len(pal), size=(h, w))
    return pal[idx]


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    n_colors=st.integers(1, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_lossless(h, w, n_colors, interlace, seed):
    img = _pal_img(h, w, n_colors, seed)
    blob = gif.encode(img, interlace=interlace)
    gw, gh, ch, out = gif.decode(blob)
    assert (gw, gh, ch) == (w, h, 3)
    assert np.array_equal(out, img)


def test_lzw_table_reset_path_roundtrips():
    # >4096 dictionary entries forces the encoder's mid-stream CLEAR
    img = _pal_img(120, 120, 256, seed=1)
    assert np.array_equal(gif.decode(gif.encode(img))[3], img)


def test_parse_dims_header_only():
    blob = gif.encode(_pal_img(5, 9, 4, seed=2))
    assert gif.parse_dims(blob) == (9, 5)
    assert gif.is_gif(blob)
    assert not gif.is_gif(b"\x89PNG")


def test_extension_blocks_are_skipped():
    blob = gif.encode(_pal_img(4, 4, 3, seed=3))
    # splice a GCE extension (0x21 0xF9, one 4-byte sub-block) before
    # the image descriptor, as real 89a writers emit
    i = blob.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = blob[:i] + gce + blob[i:]
    assert np.array_equal(gif.decode(spliced)[3], gif.decode(blob)[3])


def test_too_many_colors_rejected_by_encoder():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)  # ~1024 colors
    with pytest.raises(gif.GifError, match="palette"):
        gif.encode(img)


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"NOTGIF" + b[6:], "bad signature"),
        (lambda b: b[:9], "truncated logical screen"),
        (lambda b: b[: b.index(b"\x2c")] + b"\x3b", "no image descriptor"),
        (lambda b: b[:-8], "truncated|overruns|underrun"),
    ],
)
def test_malformed_gif_raises(mutate, msg):
    blob = gif.encode(_pal_img(6, 6, 4, seed=5))
    with pytest.raises(gif.GifError, match=msg):
        gif.decode(mutate(blob))


def test_zero_dims_raise():
    blob = bytearray(gif.encode(_pal_img(2, 2, 2, seed=6)))
    struct.pack_into("<H", blob, 6, 0)
    with pytest.raises(gif.GifError, match="zero-dimension"):
        gif.parse_dims(bytes(blob))


def test_spark_decode_and_resize_gif_path(spark):
    img = _pal_img(20, 30, 5, seed=7)
    blob = gif.encode(img)
    pdf = spark.createDataFrame([(3, bytearray(blob))], "doc_id long, payload binary")
    dec = multimodal.decode_image_payloads(pdf).collect()[0]
    assert (dec.width, dec.height, dec.channels) == (30, 20, 3)
    assert dec.features == [int(img[:, :, c].mean()) for c in range(3)]
    rs = multimodal.resize_image_payloads(pdf, max_side=10).collect()[0]
    assert (rs.width, rs.height) == (30, 20)
    assert (rs.new_width, rs.new_height) == (10, 6)
