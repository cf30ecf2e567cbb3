"""Pure-stdlib PNG decode: chunk walk + zlib inflate + per-scanline
unfilter (PNG spec §9, filters 0–4). No Pillow/codec dependency — this
is the real-decode path behind :func:`multimodal.decode_image`, kept
deliberately minimal:

- bit depth 8 only (the overwhelmingly common case; 1/2/4/16 raise),
- color types: 0 grayscale, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA,
- no Adam7 interlace (raises — interlaced PNGs are rare in pipelines).

Decode cost is O(bytes) per image and runs inside the Arrow-batched
``mapInPandas`` worker, so at cluster scale each partition decodes its
own payloads locally; pixel arrays never shuffle (callers emit per-image
features only). The unfilter loop is per-scanline Python over numpy row
vectors: Up/Average/Paeth have cross-scanline dependencies, so full
vectorization isn't possible; within a row, Sub/Average/Paeth carry a
left-neighbor dependency and run per-pixel-column over ``bpp``-strided
numpy slices (one Python iteration per pixel column, not per byte).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed or unsupported PNG payload."""


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_SIGNATURE


def _chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise PngError(f"truncated {ctype!r} chunk")
        yield ctype, data
        pos += 12 + length  # length + type + data + crc (crc not verified)
    if pos != n:
        raise PngError("trailing garbage after final chunk")


def parse_ihdr(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the IHDR without a full decode —
    enough for resize arithmetic; validates the same support matrix as
    :func:`decode`."""
    if not is_png(payload):
        raise PngError("not a PNG (bad signature)")
    for ctype, data in _chunks(payload):
        if ctype != b"IHDR":
            raise PngError("first chunk is not IHDR")
        if len(data) != 13:
            raise PngError("IHDR length != 13")
        width, height, depth, color, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", data
        )
        if depth != 8:
            raise PngError(f"unsupported bit depth {depth} (only 8)")
        if color not in _CHANNELS:
            raise PngError(f"unsupported color type {color}")
        if comp != 0 or filt != 0:
            raise PngError("nonstandard compression/filter method")
        if interlace != 0:
            raise PngError("Adam7 interlace not supported")
        if width == 0 or height == 0:
            raise PngError("zero-dimension image")
        return width, height, _CHANNELS[color]
    raise PngError("no IHDR chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode(payload: bytes):
    """Full decode → (width, height, channels, pixels) where pixels is a
    numpy uint8 array of shape (height, width, channels). Palette images
    (color type 3) are expanded through the PLTE to RGB (channels=3)."""
    import numpy as np

    width, height, _ = parse_ihdr(payload)
    color = payload[8 + 8 + 9]  # IHDR data byte 9 = color type
    spp = _CHANNELS[color]
    plte = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"PLTE":
            if len(data) % 3:
                raise PngError("PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if color == 3 and plte is None:
        raise PngError("palette image without PLTE")
    if not idat:
        raise PngError("no IDAT data")

    bpp = spp  # bytes per pixel (depth 8)
    stride = width * spp
    expected = height * (1 + stride)
    # Bounded inflate: the IHDR already tells us the exact decompressed
    # size, so cap the output at expected+1 — a crafted decompression
    # bomb (tiny IDAT, huge inflate ratio) cannot allocate past the
    # declared geometry inside the mapInPandas worker.
    try:
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise PngError(f"IDAT inflate failed: {exc}") from exc
    if len(raw) != expected or d.unconsumed_tail:
        raise PngError(
            f"decompressed size {len(raw)}{'+' if d.unconsumed_tail else ''}"
            f" != expected {expected}"
        )

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        off = y * (1 + stride)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int32
        )
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype} on scanline {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur

    pixels = out.reshape(height, width, spp)
    if color == 3:
        idx = pixels[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise PngError("palette index out of range")
        pixels = plte[idx]  # (h, w, 3)
    return width, height, pixels.shape[2], pixels


def encode(pixels, color: int | None = None, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (tests + fixtures only): depth 8, no
    interlace, a single uniform ``filter_type`` (0/1/2/3/4) applied to
    every scanline so each unfilter branch is exercisable. ``pixels`` is
    a numpy uint8 array (h, w) or (h, w, channels)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if color is None:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[spp]
    bpp = spp
    stride = w * spp
    flat = px.reshape(h, stride).astype(np.int32)

    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            enc = cur.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(prev[x - bpp]) if x >= bpp else 0
                enc[x] = (cur[x] - _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter_type {filter_type}")
        lines.append(filter_type)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )
