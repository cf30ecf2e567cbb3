"""Pure-stdlib GIF codec (GIF87a/89a, public spec — clean room): header
dims walk, first-frame pixel decode (variable-width LZW, global/local
palettes, 4-pass interlace), and a minimal encoder (real LZW
compression, optional interlace) so the decoder round-trips against an
in-repo producer — the same testing strategy as :mod:`.png` and
:mod:`.jpeg`.

Animation is out of scope by design: :func:`decode` returns the first
image descriptor's frame (training-data feature extraction wants *a*
representative raster, and frame deltas need composition semantics a
curation pass doesn't); later frames and GCE disposal raise nothing —
they are simply not read past.

Scale note: like the other codecs this runs inside ``mapInPandas``
workers on payload bytes local to the task; LZW is a per-payload
Python loop bounded by pixel count, palette math is numpy.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    """Malformed or unsupported GIF payload."""


def is_gif(b: bytes) -> bool:
    return b[:6] in (b"GIF87a", b"GIF89a")


def parse_dims(b: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor — O(1)."""
    if not is_gif(b):
        raise GifError("not a GIF (bad signature)")
    if len(b) < 10:
        raise GifError("truncated logical screen descriptor")
    w, h = struct.unpack_from("<HH", b, 6)
    if w == 0 or h == 0:
        raise GifError("zero-dimension image")
    return w, h


def _sub_blocks(b: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns
    (data, position after the 0x00 terminator)."""
    out = bytearray()
    n = len(b)
    while True:
        if pos >= n:
            raise GifError("truncated sub-blocks")
        size = b[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise GifError("sub-block overruns payload")
        out += b[pos : pos + size]
        pos += size


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF-variant LZW: variable code width from ``min_code_size + 1``
    up to 12 bits, CLEAR resets the table, codes are packed LSB-first."""
    clear = 1 << min_code_size
    end = clear + 1
    out: list[int] = []
    table: list[list[int]] = []
    width = 0
    prev: list[int] | None = None

    def reset():
        nonlocal table, width, prev
        table = [[i] for i in range(clear)] + [[], []]
        width = min_code_size + 1
        prev = None

    reset()
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                continue
            if code == end:
                return out
            if prev is None:
                if code >= len(table) or not table[code]:
                    raise GifError(f"bad first code {code}")
                entry = table[code]
            elif code < len(table) and table[code]:
                entry = table[code]
                table.append(prev + [entry[0]])
            elif code == len(table):
                entry = prev + [prev[0]]  # the KwKwK case
                table.append(entry)
            else:
                raise GifError(f"out-of-range code {code}")
            out.extend(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= n_pixels:
                return out
    return out


#: interlace passes: (row offset, row step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = [r for off, step in _INTERLACE for r in range(off, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, 3, pixels uint8[h, w, 3]) — the first frame,
    palette-expanded to RGB. Raises :class:`GifError` on malformed
    streams or a frame without any palette."""
    sw, sh = parse_dims(b)
    packed = b[10]
    pos = 13
    global_pal = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        global_pal = np.frombuffer(b[pos : pos + 3 * size], dtype=np.uint8)
        if len(global_pal) != 3 * size:
            raise GifError("truncated global color table")
        global_pal = global_pal.reshape(size, 3)
        pos += 3 * size
    n = len(b)
    while pos < n:
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= n:
                raise GifError("truncated extension")
            pos += 1
            _, pos = _sub_blocks(b, pos)
            continue
        if block != 0x2C:
            raise GifError(f"unexpected block 0x{block:02x} at {pos - 1}")
        if pos + 9 > n:
            raise GifError("truncated image descriptor")
        left, top, w, h = struct.unpack_from("<HHHH", b, pos)
        ipacked = b[pos + 8]
        pos += 9
        pal = global_pal
        if ipacked & 0x80:
            size = 2 << (ipacked & 0x07)
            pal = np.frombuffer(b[pos : pos + 3 * size], dtype=np.uint8)
            if len(pal) != 3 * size:
                raise GifError("truncated local color table")
            pal = pal.reshape(size, 3)
            pos += 3 * size
        if pal is None:
            raise GifError("no color table for frame")
        if pos >= n:
            raise GifError("truncated LZW header")
        min_code = b[pos]
        if not 2 <= min_code <= 11:
            raise GifError(f"bad LZW min code size {min_code}")
        data, pos = _sub_blocks(b, pos + 1)
        idx = _lzw_decode(data, min_code, w * h)
        if len(idx) < w * h:
            raise GifError(f"LZW underrun: {len(idx)} of {w * h} pixels")
        arr = np.array(idx[: w * h], dtype=np.int64).reshape(h, w)
        if arr.max() >= len(pal):
            raise GifError("pixel index outside color table")
        if ipacked & 0x40:
            arr = _deinterlace(arr)
        # the first frame is returned at its own (w, h); left/top offsets
        # compose onto the logical screen only for animation, skipped here
        return w, h, 3, pal[arr]
    raise GifError("no image descriptor")


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    seq: tuple[int, ...] = ()
    for px in indices:
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:  # table full: reset, like real encoders
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        seq = (px,)
    if seq:
        emit(table[seq])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """GIF89a bytes for uint8 RGB pixels (h, w, 3) with ≤256 distinct
    colors (a palette format — more raises :class:`GifError`). Real
    LZW compression; ``interlace=True`` writes the 4-pass row order so
    the decoder's deinterlace path has a producer."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise GifError("encoder wants (h, w, 3) RGB")
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise GifError(f"{len(pal)} colors exceed the 256-entry palette")
    pal_bits = max(1, int(len(pal) - 1).bit_length())
    pal_size = 1 << pal_bits
    pal_full = np.zeros((pal_size, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (pal_bits - 1), 0, 0])
    out += pal_full.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    idx = inv.reshape(h, w)
    if interlace:
        order = [r for off, step in _INTERLACE for r in range(off, h, step)]
        idx = idx[order]
    min_code = max(2, pal_bits)
    out += bytes([min_code])
    data = _lzw_encode([int(i) for i in idx.reshape(-1)], min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
