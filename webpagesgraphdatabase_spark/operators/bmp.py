"""Pure-numpy BMP codec (Windows DIB, public format — clean room):
BITMAPFILEHEADER + BITMAPINFOHEADER dims walk, uncompressed (BI_RGB)
pixel decode for 8-bit-paletted, 24-bit, and 32-bit images (bottom-up
and top-down), and a 24-bit encoder so the decoder round-trips against
an in-repo producer — the same encoder-as-adversary strategy as
:mod:`.png` / :mod:`.jpeg` / :mod:`.gif`. BMP is uncompressed, so the
round-trip is bit-exact (the property the tests pin).

RLE4/RLE8/bitfield compression and OS/2 CORE headers raise
:class:`BmpError` — honest guards, not silent misdecodes.

Scale note: like the other codecs this runs inside ``mapInPandas``
workers on payload bytes local to the task; row de-padding and
BGR→RGB channel flips are whole-array numpy, no per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    """Malformed or unsupported BMP payload."""


def is_bmp(b: bytes) -> bool:
    return b[:2] == b"BM"


def parse_dims(b: bytes) -> tuple[int, int, int]:
    """(width, height, bits_per_pixel) from the info header — O(1).
    Height is reported positive regardless of row order."""
    if not is_bmp(b):
        raise BmpError("not a BMP (bad signature)")
    if len(b) < 30:
        raise BmpError("truncated header")
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size} (OS/2 core)")
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    if w <= 0 or h == 0:
        raise BmpError(f"bad dimensions {w}x{h}")
    return w, abs(h), bpp


def decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, pixels uint8[h, w, ch]) for an
    uncompressed (BI_RGB) BMP: 8-bit paletted → 3 channels (RGB via
    palette), 24-bit → 3 (BGR storage flipped to RGB), 32-bit → 4
    (BGRA → RGBA). Bottom-up rows (positive height) are flipped;
    top-down (negative height) read as-is."""
    w, h, bpp = parse_dims(payload)
    if len(payload) < 54:
        raise BmpError("truncated info header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    raw_h = struct.unpack_from("<i", payload, 22)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise BmpError(f"unsupported compression {compression} (BI_RGB only)")
    if bpp not in (8, 24, 32):
        raise BmpError(f"unsupported bit depth {bpp}")

    palette = None
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + hdr_size
        pal_end = pal_off + 4 * n_colors
        if pal_end > len(payload):
            raise BmpError("truncated palette")
        quads = np.frombuffer(payload[pal_off:pal_end], dtype=np.uint8)
        palette = quads.reshape(n_colors, 4)[:, [2, 1, 0]]  # BGRx → RGB

    bytes_per_px = bpp // 8
    stride = (w * bytes_per_px + 3) & ~3  # rows padded to 4 bytes
    need = data_offset + stride * h
    if need > len(payload):
        raise BmpError("truncated pixel data")
    rows = np.frombuffer(
        payload[data_offset : data_offset + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, : w * bytes_per_px]
    if raw_h > 0:  # bottom-up storage
        rows = rows[::-1]

    if bpp == 8:
        px = palette[rows]
        ch = 3
    else:
        px = rows.reshape(h, w, bytes_per_px)
        if bpp == 24:
            px = px[:, :, [2, 1, 0]]  # BGR → RGB
            ch = 3
        else:
            px = px[:, :, [2, 1, 0, 3]]  # BGRA → RGBA
            ch = 4
    return w, h, ch, np.ascontiguousarray(px)


def encode(pixels: np.ndarray) -> bytes:
    """24-bit BI_RGB bottom-up BMP bytes for uint8 pixels of shape
    (h, w) / (h, w, 1) (grayscale replicated to RGB) or (h, w, 3)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    elif ch != 3:
        raise BmpError(f"unsupported component count {ch}")
    bgr = px[:, :, [2, 1, 0]]
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = bgr.reshape(h, w * 3)
    body = body[::-1]  # bottom-up
    data = body.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return file_hdr + info + data
