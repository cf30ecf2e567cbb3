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
