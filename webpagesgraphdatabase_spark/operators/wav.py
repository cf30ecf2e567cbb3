"""Pure-stdlib WAV (RIFF/PCM) parsing — the audio leg of the
multimodal suite, mirroring :mod:`.png` for images.

Clean-room implementation of the public RIFF/WAVE container format
(chunk walk with even-byte padding, ``fmt `` fields per the WAVEFORMAT
spec, PCM ``data`` payload) — no codec library, no port of anything.
The property tests round-trip against the *independent* stdlib
``wave`` writer/reader, so two separate implementations must agree on
every generated file.

Supports integer PCM (format tag 1) at 8/16/32 bits — 8-bit is
unsigned per the spec and is centered to signed on decode so all
widths come back zero-centered — plus G.711 A-law/μ-law companding
(tags 6/7, the telephony shapes), expanded via the spec formulas and
property-tested against the independent stdlib ``audioop``
expander. Other formats (ADPCM, IEEE float) raise :class:`WavError`
with the tag, the honest boundary the image side draws at
unsupported codecs.

Scale note: parsing runs inside ``mapInPandas`` workers on payload
bytes that are already local to the task — no shuffle, no driver
participation; a corrupt file fails its own row's task with a readable
error naming the offset.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Malformed or unsupported WAV payload."""


def is_wav(b: bytes) -> bool:
    """RIFF container with a WAVE form type."""
    return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE"


def _chunks(b: bytes):
    """Yield (chunk_id, start, size) walking the RIFF body; chunks are
    word-aligned (odd sizes carry a pad byte that is not data)."""
    off = 12
    while off + 8 <= len(b):
        cid = b[off : off + 4]
        (size,) = struct.unpack_from("<I", b, off + 4)
        start = off + 8
        if start + size > len(b):
            raise WavError(
                f"chunk {cid!r} at offset {off} overruns payload "
                f"({start + size} > {len(b)})"
            )
        yield cid, start, size
        off = start + size + (size & 1)


def parse_fmt(b: bytes) -> tuple[int, int, int, int]:
    """(format_tag, n_channels, sample_rate, bits_per_sample) from the
    ``fmt `` chunk — header-only, O(1) in payload size."""
    if not is_wav(b):
        raise WavError("not a RIFF/WAVE payload")
    for cid, start, size in _chunks(b):
        if cid == b"fmt ":
            if size < 16:
                raise WavError(f"fmt chunk too short ({size} < 16)")
            tag, ch, rate, _byte_rate, _align, bits = struct.unpack_from(
                "<HHIIHH", b, start
            )
            return tag, ch, rate, bits
    raise WavError("no fmt chunk")


def _ulaw_table() -> np.ndarray:
    """G.711 μ-law byte → linear int16, from the public spec's
    expansion (bias 0x84, 3-bit segment, 4-bit mantissa)."""
    out = np.empty(256, dtype=np.int32)
    for b in range(256):
        u = ~b & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        out[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return out


def _alaw_table() -> np.ndarray:
    """G.711 A-law byte → linear int16 (0x55 toggle, segmented)."""
    out = np.empty(256, dtype=np.int32)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[b] = t if (a & 0x80) else -t
    return out


_ULAW = _ulaw_table()
_ALAW = _alaw_table()


def decode(b: bytes) -> tuple[int, int, np.ndarray]:
    """(n_channels, sample_rate, samples) — ``samples`` is an int32
    array of shape (n_frames, n_channels), zero-centered for every
    supported format: integer PCM at 8/16/32 bits (8-bit is stored
    unsigned and shifted here) and G.711 A-law/μ-law companding
    (format tags 6/7, the telephony WAV shapes) expanded to 13/14-bit
    linear via the spec formulas."""
    tag, ch, rate, bits = parse_fmt(b)
    if tag not in (1, 6, 7):
        raise WavError(
            f"unsupported format tag {tag} (PCM=1, A-law=6, μ-law=7)"
        )
    if tag == 1 and bits not in (8, 16, 32):
        raise WavError(f"unsupported bit depth {bits}")
    if tag in (6, 7) and bits != 8:
        raise WavError(f"G.711 wants 8-bit samples, got {bits}")
    if ch < 1:
        raise WavError(f"bad channel count {ch}")
    data = None
    for cid, start, size in _chunks(b):
        if cid == b"data":
            data = b[start : start + size]
            break
    if data is None:
        raise WavError("no data chunk")
    width = bits // 8
    n_frames = len(data) // (width * ch)
    data = data[: n_frames * width * ch]
    if tag == 7:
        arr = _ULAW[np.frombuffer(data, dtype=np.uint8)]
    elif tag == 6:
        arr = _ALAW[np.frombuffer(data, dtype=np.uint8)]
    elif bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    elif bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.int32)
    else:
        arr = np.frombuffer(data, dtype="<i4").astype(np.int32)
    return ch, rate, arr.reshape(n_frames, ch)


def spectral_features(
    samples: np.ndarray, rate: int, rolloff: float = 0.85
) -> tuple[float, float]:
    """(spectral_centroid_hz, rolloff_hz) over channel 0 — the
    frequency-domain curation signals (speech sits low, hiss/noise
    pushes the centroid up; rolloff bounds the band holding ``rolloff``
    of the energy). One numpy rfft over the whole channel; the DC bin
    is excluded so silence and constant offset read centroid 0.
    Weighting is *power* (|X|²), not magnitude — a pure tone's centroid
    then reads the tone frequency even with quantization noise spread
    across the band (noise power is ~1e-7 of the line's, where its
    magnitude would bias a flat-weighted mean by whole hertz)."""
    if samples.size == 0:
        return 0.0, 0.0
    c0 = samples[:, 0].astype(np.float64)
    mag = np.abs(np.fft.rfft(c0)) ** 2
    mag[0] = 0.0  # DC carries no pitch information
    total = mag.sum()
    if total == 0.0:
        return 0.0, 0.0
    freqs = np.fft.rfftfreq(len(c0), d=1.0 / rate)
    centroid = float((freqs * mag).sum() / total)
    cum = np.cumsum(mag)
    roll_idx = int(np.searchsorted(cum, rolloff * total))
    return centroid, float(freqs[min(roll_idx, len(freqs) - 1)])


def features(samples: np.ndarray) -> tuple[float, int]:
    """(rms, zero_crossings) over channel 0 — the light-weight audio
    quality signals a curation pass filters on (silence ≈ rms 0,
    clipped noise ≈ high rms; crossings ≈ coarse pitch/noisiness)."""
    if samples.size == 0:
        return 0.0, 0
    c0 = samples[:, 0].astype(np.float64)
    rms = float(np.sqrt(np.mean(c0 * c0)))
    signs = np.sign(c0)
    nz = signs[signs != 0]
    crossings = int(np.count_nonzero(nz[1:] != nz[:-1]))
    return rms, crossings
