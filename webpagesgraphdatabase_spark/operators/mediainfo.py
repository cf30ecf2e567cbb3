"""Unified media-metadata probe — the first pass of a multimodal
ingest: sniff every binary payload's container and extract its typed
metadata (dimensions / duration / sample rate) from headers only,
O(header bytes) per file regardless of payload size.

New pure-stdlib parsers here, from the public specs:

- **FLAC** STREAMINFO (the mandatory first metadata block; RFC 9639
  §8.2): sample rate, channels, bits/sample, total samples.
- **MP4 / ISO-BMFF** (ISO 14496-12) box walk: ``moov/mvhd`` timescale
  + duration, ``moov/trak/tkhd`` presentation width/height (16.16
  fixed point) — size-prefixed box recursion, no codec work.
- **MP3 / MPEG audio** (ISO 11172-3 / 13818-3) frame header: version /
  layer / bitrate / sample rate / channels from the first frame's
  4-byte header (ID3v2 tags skipped via their syncsafe size), plus a
  CBR duration estimate — the honest header-only read; VBR exactness
  would need a Xing scan.

PNG/JPEG/GIF/WAV reuse their codec modules' header parsers. Frame and
sample *decode* for FLAC/MP4 stays honestly out of scope (those codecs
need entropy decoders this container doesn't ship); metadata is the
part a 100 TB curation pass actually runs on every file — routing,
size/duration filters, aspect buckets — before any decode is paid.

Scale: :func:`media_info` is one ``mapInPandas`` projection (Arrow
batches, header-only slicing); no shuffle, stream-safe. Unknown or
malformed payloads come back as a typed error row, never an exception
(a single corrupt file must not kill an ingest job).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


class MediaInfoError(ValueError):
    pass


# --------------------------------------------------------------------------
# FLAC STREAMINFO
# --------------------------------------------------------------------------


def is_flac(b: bytes) -> bool:
    return b[:4] == b"fLaC"


def parse_flac_streaminfo(b: bytes) -> dict:
    """(sample_rate, channels, bits_per_sample, total_samples) from the
    mandatory STREAMINFO block (RFC 9639 §8.2) — a 34-byte bitfield
    right after the stream marker."""
    if not is_flac(b):
        raise MediaInfoError("not a FLAC stream (bad marker)")
    if len(b) < 8 + 34:
        raise MediaInfoError("truncated FLAC header")
    block_type = b[4] & 0x7F
    if block_type != 0:
        raise MediaInfoError("first metadata block is not STREAMINFO")
    (length,) = struct.unpack(">I", b"\x00" + b[5:8])
    if length < 34:
        raise MediaInfoError(f"STREAMINFO too short ({length})")
    si = b[8 : 8 + 34]
    # bytes 10..17 hold: sample_rate(20) channels-1(3) bps-1(5) total(36)
    bits = int.from_bytes(si[10:18], "big")
    sample_rate = (bits >> 44) & 0xFFFFF
    channels = ((bits >> 41) & 0x7) + 1
    bps = ((bits >> 36) & 0x1F) + 1
    total_samples = bits & 0xFFFFFFFFF
    if sample_rate == 0:
        raise MediaInfoError("zero sample rate")
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits_per_sample": bps,
        "n_samples": total_samples,
    }


def encode_flac_header(
    sample_rate: int, channels: int, bps: int, n_samples: int
) -> bytes:
    """A minimal valid FLAC stream header (marker + last-flagged
    STREAMINFO, zeroed min/max block/frame sizes and MD5) — the
    round-trip adversary for :func:`parse_flac_streaminfo` in tests
    (same encoder-as-test-fixture pattern as the PNG/GIF/JPEG codecs)."""
    bits = (
        ((sample_rate & 0xFFFFF) << 44)
        | (((channels - 1) & 0x7) << 41)
        | (((bps - 1) & 0x1F) << 36)
        | (n_samples & 0xFFFFFFFFF)
    )
    si = b"\x00" * 10 + bits.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + b"\x80" + struct.pack(">I", 34)[1:] + si


# --------------------------------------------------------------------------
# MP4 / ISO-BMFF
# --------------------------------------------------------------------------


def is_mp4(b: bytes) -> bool:
    return len(b) >= 12 and b[4:8] == b"ftyp"


def _boxes(b: bytes, start: int, end: int) -> Iterator[tuple[bytes, int, int]]:
    """(type, payload_start, payload_end) for each box in [start, end);
    handles 64-bit largesize. Malformed sizes raise."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", b, pos)
        btype = b[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise MediaInfoError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", b, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            raise MediaInfoError(f"bad box size {size} for {btype!r}")
        yield btype, body, pos + size
        pos += size


def parse_mp4(b: bytes) -> dict:
    """(duration_ms, width, height) from ``moov``: mvhd gives
    timescale+duration (version 0 or 1), the first video ``tkhd`` with
    nonzero dimensions gives presentation size (16.16 fixed point)."""
    if not is_mp4(b):
        raise MediaInfoError("not an ISO-BMFF stream (no ftyp)")
    duration_ms = None
    width = height = None
    for btype, s, e in _boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ctype, cs, ce in _boxes(b, s, e):
            if ctype == b"mvhd":
                # bounds-check before every fixed-offset read: a box
                # sized >=8 but shorter than its fields must raise
                # MediaInfoError, not struct.error/IndexError, and must
                # never decode the adjacent box's bytes as its own
                if ce - cs < 1:
                    raise MediaInfoError("empty mvhd box")
                version = b[cs]
                need = 32 if version == 1 else 20
                if ce - cs < need:
                    raise MediaInfoError(
                        f"truncated mvhd (v{version}: {ce - cs} < {need} bytes)"
                    )
                if version == 1:
                    timescale, duration = struct.unpack_from(">IQ", b, cs + 20)
                else:
                    timescale, duration = struct.unpack_from(">II", b, cs + 12)
                if timescale:
                    duration_ms = int(duration * 1000 // timescale)
            elif ctype == b"trak":
                for ttype, ts, te in _boxes(b, cs, ce):
                    if ttype != b"tkhd":
                        continue
                    if te - ts < 1:
                        raise MediaInfoError("empty tkhd box")
                    version = b[ts]
                    off = ts + (96 if version == 1 else 84)
                    if te < off:
                        raise MediaInfoError(
                            f"truncated tkhd (v{version}: {te - ts} bytes)"
                        )
                    w16, h16 = struct.unpack_from(">II", b, off - 8)
                    w, h = w16 >> 16, h16 >> 16
                    if w and h and width is None:
                        width, height = w, h
    if duration_ms is None:
        raise MediaInfoError("no mvhd box")
    return {"duration_ms": duration_ms, "width": width, "height": height}


def encode_mp4_header(
    duration_ms: int, width: int, height: int, timescale: int = 1000
) -> bytes:
    """Minimal ftyp + moov(mvhd, trak(tkhd)) skeleton — the round-trip
    adversary for :func:`parse_mp4`."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isom")
    mvhd = box(
        b"mvhd",
        b"\x00" * 12
        + struct.pack(">II", timescale, duration_ms * timescale // 1000)
        + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        b"\x00" * 76 + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


# --------------------------------------------------------------------------
# the unified probe
# --------------------------------------------------------------------------

MEDIA_INFO_SCHEMA = (
    "doc_id long, kind string, width int, height int, duration_ms long, "
    "sample_rate int, channels int, n_samples long, err string"
)


# --------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 audio) frame header — ISO 11172-3 / 13818-3
# --------------------------------------------------------------------------

#: bitrate tables in kbps, indexed [table][bitrate_index]; 0 = free, -1
#: = bad. Tables keyed by (mpeg1?, layer).
_MP3_BITRATES = {
    (True, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (True, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (True, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (False, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    # MPEG-2/2.5 layers II and III share one table
    (False, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (False, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_RATES_V1 = [44100, 48000, 32000]


def _mp3_sync_offset(b: bytes) -> int:
    """Offset of the first audio frame: 0, or past an ID3v2 tag
    (10-byte header + syncsafe 28-bit size)."""
    if b[:3] == b"ID3" and len(b) >= 10:
        size = (
            ((b[6] & 0x7F) << 21)
            | ((b[7] & 0x7F) << 14)
            | ((b[8] & 0x7F) << 7)
            | (b[9] & 0x7F)
        )
        return 10 + size
    return 0


def _mp3_header_fields(b: bytes, off: int) -> dict | None:
    """Decode the 4-byte frame header at ``off``; None when it is not a
    valid, non-reserved MPEG audio frame header."""
    if len(b) < off + 4:
        return None
    b0, b1, b2, b3 = b[off], b[off + 1], b[off + 2], b[off + 3]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    ver_bits = (b1 >> 3) & 3  # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (b1 >> 1) & 3  # 0=reserved, 1=III, 2=II, 3=I
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 3
    if ver_bits == 1 or layer_bits == 0 or br_idx in (0, 0xF) or sr_idx == 3:
        return None
    layer = 4 - layer_bits
    mpeg1 = ver_bits == 3
    bitrate = _MP3_BITRATES[(mpeg1, layer)][br_idx]
    rate = _MP3_RATES_V1[sr_idx]
    if ver_bits == 2:  # MPEG2
        rate //= 2
    elif ver_bits == 0:  # MPEG2.5
        rate //= 4
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    version = {3: "1", 2: "2", 0: "2.5"}[ver_bits]
    return {
        "version": version,
        "layer": layer,
        "bitrate_kbps": bitrate,
        "sample_rate": rate,
        "channels": channels,
    }


def is_mp3(b: bytes) -> bool:
    """ID3v2-tagged, or a valid non-reserved frame header at byte 0.
    Checked AFTER every magic-numbered container in :func:`sniff_kind`
    — a bare 0xFFEx sync is the weakest signature here, so it must
    never shadow a real magic."""
    return b[:3] == b"ID3" or _mp3_header_fields(b, 0) is not None


def parse_mp3(b: bytes) -> dict:
    """Header fields of the first audio frame plus a CBR duration
    estimate: audio_bytes · 8 / bitrate. Honest caveat in the field
    name — VBR streams need a Xing/VBRI scan this probe doesn't do."""
    off = _mp3_sync_offset(b)
    fields = _mp3_header_fields(b, off)
    if fields is None:
        raise MediaInfoError("no MPEG audio frame header after ID3 tag")
    audio_bytes = max(len(b) - off, 0)
    if fields["bitrate_kbps"]:
        fields["duration_ms_cbr_est"] = int(
            audio_bytes * 8 // fields["bitrate_kbps"]
        )
    return fields


def encode_mp3_header(
    version: str = "1",
    layer: int = 3,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    n_audio_bytes: int = 0,
    id3_size: int = 0,
) -> bytes:
    """Test fixture builder: optional ID3v2 tag + one frame header +
    zero padding (round-trips through :func:`parse_mp3`)."""
    ver_bits = {"1": 3, "2": 2, "2.5": 0}[version]
    layer_bits = 4 - layer
    mpeg1 = ver_bits == 3
    br_idx = _MP3_BITRATES[(mpeg1, layer)].index(bitrate_kbps)
    rate = {3: sample_rate, 2: sample_rate * 2, 0: sample_rate * 4}[ver_bits]
    sr_idx = _MP3_RATES_V1.index(rate)
    b1 = 0xE0 | (ver_bits << 3) | (layer_bits << 1)
    b2 = (br_idx << 4) | (sr_idx << 2)
    b3 = (3 << 6) if channels == 1 else 0
    frame = bytes([0xFF, b1, b2, b3])
    head = b""
    if id3_size:
        head = b"ID3\x04\x00\x00" + bytes(
            [
                (id3_size >> 21) & 0x7F,
                (id3_size >> 14) & 0x7F,
                (id3_size >> 7) & 0x7F,
                id3_size & 0x7F,
            ]
        ) + b"\x00" * id3_size
    pad = b"\x00" * max(n_audio_bytes - 4, 0)
    return head + frame + pad


def sniff_kind(b: bytes) -> str:
    from . import bmp, gif, jpeg, png, wav

    if png.is_png(b):
        return "png"
    if bmp.is_bmp(b):
        return "bmp"
    if jpeg.is_jpeg(b):
        return "jpeg"
    if gif.is_gif(b):
        return "gif"
    if wav.is_wav(b):
        return "wav"
    if is_flac(b):
        return "flac"
    if is_mp4(b):
        return "mp4"
    if is_mp3(b):  # weakest signature: must stay last
        return "mp3"
    return "unknown"


def probe_bytes(b: bytes) -> dict:
    """Header-only metadata for one payload; never raises — malformed
    payloads come back with kind + err."""
    from . import gif, jpeg, png, wav

    kind = sniff_kind(b)
    out: dict = {"kind": kind}
    try:
        if kind == "png":
            w, h, _c = png.parse_ihdr(b)
            out.update(width=w, height=h)
        elif kind == "jpeg":
            w, h, _c = jpeg.parse_dims(b)
            out.update(width=w, height=h)
        elif kind == "gif":
            w, h = gif.parse_dims(b)
            out.update(width=w, height=h)
        elif kind == "bmp":
            from . import bmp

            w, h, _bpp = bmp.parse_dims(b)
            out.update(width=w, height=h)
        elif kind == "wav":
            _tag, ch, rate, _bits = wav.parse_fmt(b)
            out.update(sample_rate=rate, channels=ch)
        elif kind == "flac":
            si = parse_flac_streaminfo(b)
            out.update(
                sample_rate=si["sample_rate"],
                channels=si["channels"],
                n_samples=si["n_samples"],
                duration_ms=int(si["n_samples"] * 1000 // si["sample_rate"]),
            )
        elif kind == "mp4":
            mi = parse_mp4(b)
            out.update(
                width=mi["width"],
                height=mi["height"],
                duration_ms=mi["duration_ms"],
            )
        elif kind == "mp3":
            mi = parse_mp3(b)
            out.update(
                sample_rate=mi["sample_rate"],
                channels=mi["channels"],
                duration_ms=mi.get("duration_ms_cbr_est"),
            )
        else:
            out["err"] = "unknown container"
    # struct.error / IndexError are defense in depth: the parsers
    # bounds-check and raise MediaInfoError themselves, but "never
    # raises" is this function's contract — one corrupt payload must not
    # kill a 100 TB ingest job — so catch the raw-read failures too
    except (MediaInfoError, ValueError, struct.error, IndexError) as e:
        out["err"] = f"{type(e).__name__}: {e}"
    return out


def media_info(payload_df: DataFrame) -> DataFrame:
    """(doc_id, kind, width, height, duration_ms, sample_rate,
    channels, n_samples, err) per payload row (doc_id, payload binary)
    — the routing/filter table a multimodal curation pass builds before
    paying for any decode. One Arrow-batched projection, no shuffle,
    stream-safe."""

    def probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                r = probe_bytes(bytes(payload))
                rows.append(
                    {
                        "doc_id": doc_id,
                        "kind": r.get("kind"),
                        "width": r.get("width"),
                        "height": r.get("height"),
                        "duration_ms": r.get("duration_ms"),
                        "sample_rate": r.get("sample_rate"),
                        "channels": r.get("channels"),
                        "n_samples": r.get("n_samples"),
                        "err": r.get("err"),
                    }
                )
            yield pd.DataFrame(rows)

    return payload_df.select("doc_id", "payload").mapInPandas(
        probe, schema=MEDIA_INFO_SCHEMA
    )
