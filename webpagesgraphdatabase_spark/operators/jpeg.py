"""Pure-stdlib JPEG header parse: marker walk to the SOF segment for
(width, height, components) — dims-only, no entropy decode (a full
stdlib JPEG decoder is out of scope; the pixel path keeps its honest
``NotImplementedError``). This unblocks :func:`.multimodal.resize_image`
for the dominant real-world photo format, whose resize arithmetic needs
only the header geometry.

Structure (ITU-T T.81 §B): the stream is SOI (FFD8) then marker
segments ``FF xx [len16 payload]``; frame headers SOFn (FFC0–FFCF minus
the non-frame DHT/JPG/DAC codes) carry precision(1) height(2) width(2)
ncomponents(1). Parsing stops at the first SOF — everything before it
(APPn/JFIF/Exif blobs, quant tables) is skipped by segment length, so
the walk is O(#segments), independent of payload size.
"""

from __future__ import annotations

JPEG_SOI = b"\xff\xd8"

#: markers in FFC0–FFCF that are NOT frame headers
_NON_SOF = {0xC4, 0xC8, 0xCC}  # DHT, JPG (reserved), DAC

#: standalone markers with no length field
_STANDALONE = {0x01, 0xD8} | set(range(0xD0, 0xD8))  # TEM, SOI, RSTn


class JpegError(ValueError):
    """Malformed or unsupported JPEG payload."""


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == JPEG_SOI


def parse_dims(payload: bytes) -> tuple[int, int, int]:
    """(width, height, components) from the first SOFn marker.

    Supports every frame type (baseline SOF0, progressive SOF2, …) since
    the frame-header layout is shared; raises :class:`JpegError` on a
    missing/truncated SOF, zero dimensions, or a malformed marker
    stream (including SOS-before-SOF, which a valid stream never has).
    """
    if not is_jpeg(payload):
        raise JpegError("not a JPEG (bad SOI)")
    pos, n = 2, len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise JpegError(f"expected marker at byte {pos}")
        while pos < n and payload[pos] == 0xFF:  # fill bytes are legal
            pos += 1
        if pos >= n:
            break
        marker = payload[pos]
        pos += 1
        if marker in _STANDALONE:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > n:
            raise JpegError("truncated segment length")
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            raise JpegError("bad segment length")
        if 0xC0 <= marker <= 0xCF and marker not in _NON_SOF:
            if seglen < 8:
                raise JpegError("SOF segment too short")
            height = int.from_bytes(payload[pos + 3 : pos + 5], "big")
            width = int.from_bytes(payload[pos + 5 : pos + 7], "big")
            ncomp = payload[pos + 7]
            if width == 0 or height == 0:
                raise JpegError("zero-dimension image")
            return width, height, ncomp
        if marker == 0xDA:  # SOS: entropy data follows, SOF had to precede
            raise JpegError("no SOF before SOS")
        pos += seglen
    raise JpegError("no SOF marker")
