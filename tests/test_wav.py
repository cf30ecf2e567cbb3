"""Pure-stdlib WAV parser tests: property round-trips against the
*independent* stdlib ``wave`` writer (two implementations must agree
on every generated file), hand-built malformed/edge payloads, and the
real-decode path through Spark's ``mapInPandas`` plumbing — mirroring
the PNG suite's strategy for the audio leg."""

from __future__ import annotations

import io
import struct
import wave as stdlib_wave

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webpagesgraphdatabase_spark.operators import multimodal, wav


def _stdlib_wav_bytes(samples: np.ndarray, rate: int, sampwidth: int) -> bytes:
    """Encode (n_frames, n_channels) int samples with the stdlib writer
    — unsigned bytes for width 1, signed little-endian otherwise."""
    n_frames, n_ch = samples.shape
    buf = io.BytesIO()
    with stdlib_wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 1:
            raw = (samples + 128).astype(np.uint8).tobytes()
        elif sampwidth == 2:
            raw = samples.astype("<i2").tobytes()
        else:
            raw = samples.astype("<i4").tobytes()
        w.writeframes(raw)
    return buf.getvalue()


@settings(max_examples=40, deadline=None)
@given(
    n_frames=st.integers(0, 200),
    n_ch=st.integers(1, 4),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    sampwidth=st.sampled_from([1, 2, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_against_stdlib_writer(n_frames, n_ch, rate, sampwidth, seed):
    rng = np.random.RandomState(seed)
    lo, hi = {1: (-128, 128), 2: (-32768, 32768), 4: (-(2**31), 2**31)}[sampwidth]
    samples = rng.randint(lo, hi, size=(n_frames, n_ch)).astype(np.int64)
    blob = _stdlib_wav_bytes(samples, rate, sampwidth)
    assert wav.is_wav(blob)
    ch, got_rate, got = wav.decode(blob)
    assert (ch, got_rate) == (n_ch, rate)
    assert got.shape == (n_frames, n_ch)
    assert np.array_equal(got, samples)


def test_parse_fmt_header_only():
    blob = _stdlib_wav_bytes(np.zeros((10, 2), dtype=np.int64), 22050, 2)
    assert wav.parse_fmt(blob) == (1, 2, 22050, 16)


def test_extra_chunk_before_data_is_skipped():
    # a LIST metadata chunk (odd size → pad byte) between fmt and data
    base = _stdlib_wav_bytes(np.array([[100], [-100], [50]], dtype=np.int64), 8000, 2)
    fmt_end = base.index(b"data")
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
    blob = base[:fmt_end] + junk + base[fmt_end:]
    # fix the RIFF size field (not load-bearing for our parser, but keep honest)
    blob = blob[:4] + struct.pack("<I", len(blob) - 8) + blob[8:]
    ch, rate, got = wav.decode(blob)
    assert (ch, rate) == (1, 8000)
    assert got[:, 0].tolist() == [100, -100, 50]


def test_not_wav_rejected():
    assert not wav.is_wav(b"RIFFxxxxAVI ")
    assert not wav.is_wav(b"\x89PNG")
    with pytest.raises(wav.WavError, match="RIFF/WAVE"):
        wav.parse_fmt(b"not audio at all")


def test_truncated_chunk_raises_with_offset():
    blob = _stdlib_wav_bytes(np.zeros((100, 1), dtype=np.int64), 8000, 2)
    with pytest.raises(wav.WavError, match="overruns"):
        wav.decode(blob[:50])


def test_unsupported_format_tag_rejected():
    blob = bytearray(_stdlib_wav_bytes(np.zeros((4, 1), dtype=np.int64), 8000, 2))
    i = blob.index(b"fmt ") + 8
    struct.pack_into("<H", blob, i, 2)  # ADPCM tag
    with pytest.raises(wav.WavError, match="format tag 2"):
        wav.decode(bytes(blob))


def _g711_wav(payload: bytes, tag: int, rate: int = 8000) -> bytes:
    """Hand-built single-channel G.711 WAV (the stdlib writer only
    emits PCM): RIFF + fmt(tag, 8-bit) + data."""
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body) + 4) + body


@pytest.mark.parametrize("tag", [6, 7])
def test_g711_expansion_matches_stdlib_audioop(tag):
    # audioop (independent C implementation of the same G.711 tables)
    # must agree byte-for-byte on every code point
    audioop = pytest.importorskip("audioop")
    all_codes = bytes(range(256))
    ch, rate, got = wav.decode(_g711_wav(all_codes, tag))
    assert (ch, rate) == (1, 8000)
    fn = audioop.alaw2lin if tag == 6 else audioop.ulaw2lin
    want = np.frombuffer(fn(all_codes, 2), dtype="<i2").astype(np.int32)
    assert got[:, 0].tolist() == want.tolist()


def test_g711_wrong_bit_depth_rejected():
    blob = bytearray(_g711_wav(bytes(8), 7))
    i = blob.index(b"fmt ") + 8 + 14  # bits_per_sample field
    struct.pack_into("<H", blob, i, 16)
    with pytest.raises(wav.WavError, match="8-bit"):
        wav.decode(bytes(blob))


def test_features_rms_and_crossings():
    samples = np.array([[3], [-3], [3], [-3]], dtype=np.int32)
    rms, crossings = wav.features(samples)
    assert rms == pytest.approx(3.0)
    assert crossings == 3
    # zeros don't count as crossings (sign changes only between nonzero)
    samples = np.array([[1], [0], [-1], [0], [1]], dtype=np.int32)
    assert wav.features(samples)[1] == 2
    assert wav.features(np.zeros((0, 1), dtype=np.int32)) == (0.0, 0)


def test_decode_audio_real_path_in_spark(spark):
    tone = (
        (1000 * np.sin(np.arange(400) * 2 * np.pi * 440 / 8000))
        .astype(np.int64)
        .reshape(-1, 1)
    )
    blob = _stdlib_wav_bytes(tone, 8000, 2)
    payload_df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id long, payload binary"
    )
    row = multimodal.decode_audio_payloads(payload_df).collect()[0]
    assert (row.n_channels, row.sample_rate, row.n_frames) == (1, 8000, 400)
    expected_rms, expected_cross = wav.features(tone)
    assert row.rms == int(expected_rms)
    assert row.zero_crossings == expected_cross


def test_decode_audio_non_wav_raises_clearly(spark):
    payload_df = spark.createDataFrame(
        [(1, bytearray(b"ID3\x03mp3 data"))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="only WAV payloads"):
        multimodal.decode_audio_payloads(payload_df).collect()


def test_decode_audio_fake_twin_matches_md5_derivation(spark):
    import hashlib

    texts = {1: "some document", 2: "another body of text", 3: "third"}
    docs = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    rows = multimodal.decode_audio(docs, fake=True).collect()
    assert len(rows) == 3
    for r in rows:
        h = hashlib.md5(texts[r.doc_id].encode()).digest()
        assert r.n_channels == 1 + h[4] % 2
        assert r.sample_rate == (8000, 16000, 22050, 44100)[h[5] % 4]
        assert r.n_frames == 256 + 16 * h[6]
        assert (r.rms, r.zero_crossings) == (h[7], 4 * h[8])


def test_spectral_centroid_of_pure_tone():
    # 440 Hz tone, 400 samples at 8 kHz: period exactly 22 bins, so the
    # spectrum is a single line and the centroid reads the tone exactly
    t = np.arange(400)
    tone = (1000 * np.sin(2 * np.pi * 440 * t / 8000)).reshape(-1, 1)
    centroid, roll = wav.spectral_features(tone.astype(np.int32), 8000)
    assert abs(centroid - 440.0) < 1.0
    assert abs(roll - 440.0) < 21.0  # rolloff lands on the line's bin


def test_spectral_centroid_orders_low_vs_high_tones():
    t = np.arange(800)
    low = (1000 * np.sin(2 * np.pi * 200 * t / 8000)).reshape(-1, 1)
    high = (1000 * np.sin(2 * np.pi * 3000 * t / 8000)).reshape(-1, 1)
    c_low, _ = wav.spectral_features(low.astype(np.int32), 8000)
    c_high, _ = wav.spectral_features(high.astype(np.int32), 8000)
    assert c_low < 300 < 2500 < c_high


def test_spectral_features_silence_and_empty():
    assert wav.spectral_features(np.zeros((64, 1), dtype=np.int32), 8000) == (0.0, 0.0)
    assert wav.spectral_features(np.zeros((0, 1), dtype=np.int32), 8000) == (0.0, 0.0)
    # constant DC offset is not pitch
    dc = np.full((64, 1), 500, dtype=np.int32)
    assert wav.spectral_features(dc, 8000) == (0.0, 0.0)
