"""Unified media-metadata probe: header parsers (FLAC/MP4 new, others
reused from their codec modules) + the one-pass Spark probe."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from webpagesgraphdatabase_spark.operators import gif, mediainfo as mi, png


def test_flac_streaminfo_roundtrip():
    h = mi.encode_flac_header(48000, 1, 24, 12345678)
    si = mi.parse_flac_streaminfo(h)
    assert si == {
        "sample_rate": 48000,
        "channels": 1,
        "bits_per_sample": 24,
        "n_samples": 12345678,
    }


def test_flac_rejects_bad_marker_and_truncation():
    with pytest.raises(mi.MediaInfoError):
        mi.parse_flac_streaminfo(b"fLaX" + b"\x00" * 40)
    with pytest.raises(mi.MediaInfoError):
        mi.parse_flac_streaminfo(mi.encode_flac_header(44100, 2, 16, 10)[:20])


def test_mp4_roundtrip_and_zero_guard():
    v = mi.encode_mp4_header(3600_000, 640, 480)
    assert mi.parse_mp4(v) == {"duration_ms": 3600_000, "width": 640, "height": 480}
    with pytest.raises(mi.MediaInfoError):
        mi.parse_mp4(b"\x00\x00\x00\x08ftyp")  # no moov, bad sizes


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def test_mp4_truncated_boxes_raise_mediainfo_error_not_struct_error():
    """r5 advice: an mvhd/tkhd payload shorter than its fixed fields must
    raise MediaInfoError (probe_bytes' contract), not struct.error or
    IndexError — and must never decode the adjacent box's bytes."""
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isom")
    # 4-byte mvhd: version readable, fields not
    for payload in (b"\x00\x00\x00\x00", b""):
        short = ftyp + _box(b"moov", _box(b"mvhd", payload))
        with pytest.raises(mi.MediaInfoError):
            mi.parse_mp4(short)
    # tkhd too short for the v0 width/height offset (needs 84 bytes)
    good_mvhd = _box(b"mvhd", b"\x00" * 12 + struct.pack(">II", 1000, 5000) + b"\x00" * 80)
    for payload in (b"\x00" * 40, b""):
        short_tkhd = ftyp + _box(
            b"moov", good_mvhd + _box(b"trak", _box(b"tkhd", payload))
        )
        with pytest.raises(mi.MediaInfoError):
            mi.parse_mp4(short_tkhd)
    # an mvhd exactly at the v0 minimum still parses
    minimal = ftyp + _box(
        b"moov", _box(b"mvhd", b"\x00" * 12 + struct.pack(">II", 1000, 5000))
    )
    assert mi.parse_mp4(minimal)["duration_ms"] == 5000


def test_probe_bytes_never_raises_on_truncated_moov():
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isom")
    for evil in (
        ftyp + _box(b"moov", _box(b"mvhd", b"\x00\x00\x00\x00")),
        ftyp + _box(b"moov", _box(b"mvhd", b"")),
        ftyp + _box(b"moov", b"\x00\x00\x00\xff"),  # bad inner size
    ):
        out = mi.probe_bytes(evil)
        assert out["kind"] == "mp4" and out["err"]


def test_probe_bytes_all_kinds():
    png_b = png.encode(np.zeros((4, 6, 3), dtype=np.uint8))
    gif_b = gif.encode(np.zeros((5, 7, 3), dtype=np.uint8))
    flac_b = mi.encode_flac_header(16000, 1, 16, 32000)
    mp4_b = mi.encode_mp4_header(1500, 320, 240)
    assert mi.probe_bytes(png_b) == {"kind": "png", "width": 6, "height": 4}
    assert mi.probe_bytes(gif_b)["width"] == 7
    fl = mi.probe_bytes(flac_b)
    assert (fl["kind"], fl["duration_ms"]) == ("flac", 2000)
    assert mi.probe_bytes(mp4_b)["duration_ms"] == 1500
    bad = mi.probe_bytes(b"fLaC" + b"\xff" * 3)
    assert bad["kind"] == "flac" and "err" in bad


def test_media_info_spark_probe_mixed_corpus(spark):
    rows = [
        (1, bytearray(png.encode(np.zeros((2, 3, 3), dtype=np.uint8)))),
        (2, bytearray(mi.encode_flac_header(8000, 2, 16, 8000))),
        (3, bytearray(mi.encode_mp4_header(2500, 100, 50))),
        (4, bytearray(b"random junk bytes")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in mi.media_info(df).collect()}
    assert (out[1].kind, out[1].width, out[1].height) == ("png", 3, 2)
    assert (out[2].kind, out[2].sample_rate, out[2].duration_ms) == ("flac", 8000, 1000)
    assert (out[3].kind, out[3].duration_ms, out[3].width) == ("mp4", 2500, 100)
    assert out[4].kind == "unknown" and out[4].err
    # one-pass, no shuffle, stream-safe
    plan = mi.media_info(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_mp3_header_roundtrip_and_id3_skip():
    """Frame-header fields round-trip through the fixture encoder; an
    ID3v2 tag is skipped by its syncsafe size; CBR duration estimate =
    audio_bytes * 8 / bitrate_kbps (ms, since kbps = bits/ms)."""
    b = mi.encode_mp3_header(
        bitrate_kbps=128, sample_rate=44100, channels=2,
        n_audio_bytes=16_000, id3_size=100,
    )
    got = mi.parse_mp3(b)
    assert (got["version"], got["layer"]) == ("1", 3)
    assert (got["bitrate_kbps"], got["sample_rate"], got["channels"]) == (
        128, 44100, 2,
    )
    assert got["duration_ms_cbr_est"] == 16_000 * 8 // 128  # 1000 ms
    # MPEG-2 layer II mono at 24 kHz
    b2 = mi.encode_mp3_header(
        version="2", layer=2, bitrate_kbps=48, sample_rate=24000, channels=1
    )
    got2 = mi.parse_mp3(b2)
    assert (got2["version"], got2["layer"], got2["sample_rate"],
            got2["channels"]) == ("2", 2, 24000, 1)


def test_mp3_sniff_is_last_and_guarded():
    """The bare-sync signature must not shadow magic-numbered
    containers, reserved header fields must not sniff as mp3, and a
    malformed stream after an ID3 tag yields a typed error row."""
    wav_b = b"RIFF\x24\x00\x00\x00WAVE"
    assert mi.sniff_kind(wav_b) != "mp3"
    # reserved version (bits 01) and reserved layer (00) refuse
    assert not mi.is_mp3(bytes([0xFF, 0xE8, 0x92, 0x00]))
    assert not mi.is_mp3(bytes([0xFF, 0xE1, 0x92, 0x00]))
    # bad bitrate index (0xF) refuses
    assert not mi.is_mp3(bytes([0xFF, 0xFB, 0xF0, 0x00]))
    good = mi.encode_mp3_header()
    assert mi.sniff_kind(good) == "mp3"
    tagged_junk = b"ID3\x04\x00\x00\x00\x00\x00\x02\x00\x00" + b"junk"
    out = mi.probe_bytes(tagged_junk)
    assert out["kind"] == "mp3" and "err" in out


def test_probe_bytes_mp3():
    b = mi.encode_mp3_header(bitrate_kbps=64, n_audio_bytes=8_000)
    got = mi.probe_bytes(b)
    assert (got["kind"], got["sample_rate"], got["channels"]) == (
        "mp3", 44100, 2,
    )
    assert got["duration_ms"] == 8_000 * 8 // 64
