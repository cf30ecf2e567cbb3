"""Pure-stdlib JPEG codec (ITU-T T.81, public spec — clean room, no
library port): header parse, full SOF0 *and* progressive SOF2 pixel
decode, and encoders for both used by the property tests to
round-trip.

- :func:`parse_dims` — marker walk to the SOF segment for
  (width, height, components); O(#segments), what resize needs.
- :func:`decode` — baseline sequential (SOF0) pixel decode: DQT/DHT
  table collection, Huffman entropy decode with byte-destuffing and
  restart intervals, dequantize + dezigzag, 8×8 IDCT (orthonormal
  DCT-III as a numpy matrix sandwich), nearest-neighbor chroma
  upsample for subsampled scans, BT.601 YCbCr→RGB. Progressive (SOF2,
  T.81 Annex G) decodes too: multi-scan spectral selection +
  successive approximation accumulate into a per-component coefficient
  store, reconstructed with one vectorized batch IDCT at EOI.
  Arithmetic coding and hierarchical frames raise :class:`JpegError` —
  the honest boundary, clearly named.
- :func:`encode` / :func:`encode_progressive` — baseline and
  progressive encoders (grayscale or RGB; baseline adds optional 4:2:0
  chroma subsampling) with the Annex K quantization and typical
  Huffman tables. They exist so the decoder has *in-repo adversaries*:
  with all-ones quant tables a round-trip is exact up to DCT float
  rounding, and a progressive decode must equal the baseline decode of
  the same image bit-for-bit (both reconstruct identical quantized
  coefficients once every successive-approximation bit has arrived).

Scale note: decode runs inside ``mapInPandas`` workers on payload
bytes already local to the task; the per-block Python loop is bounded
by image size, and the heavy math (IDCT, color transform) is numpy
over whole planes.
"""

from __future__ import annotations

import struct

import numpy as np

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


# --- baseline codec -------------------------------------------------

#: zigzag scan order: position i in the scan reads flat index ZIGZAG[i]
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

#: Annex K.1/K.2 quantization tables (quality-50 reference points)
QUANT_LUMA = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)
QUANT_CHROMA = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)

# Annex K "typical" Huffman tables as (bits[1..16], huffval) pairs.
_DC_LUMA = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_DC_CHROMA = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_AC_LUMA = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)
_AC_CHROMA = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: forward F = T @ B @ T.T,
    inverse B = T.T @ F @ T."""
    k = np.arange(8).reshape(8, 1).astype(np.float64)
    n = np.arange(8).reshape(1, 8).astype(np.float64)
    t = np.cos(np.pi * (2 * n + 1) * k / 16.0) * 0.5
    t[0] *= 1.0 / np.sqrt(2.0)
    return t


_DCT_T = _dct_matrix()


def _canonical_codes(bits, huffval):
    """(length, code) per symbol in canonical Huffman order (T.81 §C)."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[i]] = (length, code)
            code += 1
            i += 1
        code <<= 1
    return out


def _decode_table(bits, huffval):
    """{(length, code): symbol} for the bit-at-a-time decoder."""
    return {lc: sym for sym, lc in _canonical_codes(bits, huffval).items()}


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t low bits back to a signed value."""
    return v - (1 << t) + 1 if v < (1 << (t - 1)) else v


class _BitReader:
    """MSB-first bit reader over a destuffed entropy chunk."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise JpegError("entropy data exhausted mid-symbol")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


def _split_entropy(payload: bytes, start: int):
    """Destuffed entropy chunks from ``start`` (just after the SOS
    header) split at RSTn markers; returns (chunks, end_pos)."""
    chunks, cur = [], bytearray()
    pos, n = start, len(payload)
    while pos < n:
        b = payload[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            raise JpegError("truncated entropy stream")
        m = payload[pos + 1]
        if m == 0x00:  # stuffed FF
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: chunk boundary
            chunks.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:  # next real marker (EOI or another segment) ends the scan
            break
    chunks.append(bytes(cur))
    return chunks, pos


def decode(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, pixels uint8[h, w, ch]) for a baseline
    sequential (SOF0) or progressive (SOF2, T.81 Annex G: spectral
    selection + successive approximation) JPEG. Raises
    :class:`JpegError` on arithmetic-coded / hierarchical / 12-bit
    streams or malformed tables."""
    if not is_jpeg(payload):
        raise JpegError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (width, height, [(cid, h, v, tq), ...])
    progressive = False
    geo = None  # progressive geometry, built at first SOS
    coefs: dict[int, np.ndarray] = {}  # cid -> int32[by, bx, 64] zigzag
    restart = 0
    pos, n = 2, len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise JpegError(f"expected marker at byte {pos}")
        while pos < n and payload[pos] == 0xFF:
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
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec == 0:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                    i += 64
                else:
                    vals = np.frombuffer(seg[i : i + 128], dtype=">u2")
                    i += 128
                if len(vals) != 64:
                    raise JpegError("truncated quant table")
                tab = np.zeros(64, dtype=np.float64)
                tab[list(ZIGZAG)] = vals.astype(np.float64)
                qt[tid] = tab.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0x0F
                bits = tuple(seg[i + 1 : i + 17])
                cnt = sum(bits)
                huffval = tuple(seg[i + 17 : i + 17 + cnt])
                if len(huffval) != cnt:
                    raise JpegError("truncated Huffman table")
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _decode_table(
                    bits, huffval
                )
                i += 17 + cnt
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if seg[0] != 8:
                raise JpegError(f"unsupported precision {seg[0]}")
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
            frame = (width, height, comps)
            progressive = marker == 0xC2
        elif 0xC1 <= marker <= 0xCF and marker not in _NON_SOF:
            # Arithmetic-coded frames (SOF9/SOF10) were evaluated for
            # implementation and deliberately left refusing: the QM
            # coder's Annex D probability-state table (113 exact
            # (Qe, NMPS, NLPS, switch) rows) is not reproducible from
            # first principles, and ANY self-consistent table
            # round-trips an own-encoder adversary — the only test
            # oracle available in this container — so a from-memory
            # table would pass every local test while silently failing
            # on real arithmetic streams. A conformance claim that the
            # test harness cannot falsify is worse than this honest
            # refusal. (Baseline+progressive Huffman cover the real
            # web: encoders ship arithmetic off by default because of
            # the historical patent cloud.)
            raise JpegError(
                f"unsupported frame type SOF{marker - 0xC0} "
                "(baseline and progressive-Huffman only)"
            )
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("no SOF before SOS")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid = seg[1 + 2 * c]
                td, ta = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0x0F
                scan.append((cid, td, ta))
            chunks, pos = _split_entropy(payload, pos + seglen)
            if not progressive:
                return _decode_scan(
                    frame, dict((c, (d, a)) for c, d, a in scan),
                    qt, dc_tabs, ac_tabs, restart, chunks,
                )
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if geo is None:
                geo = _prog_geometry(frame)
                (_hvmax, (mcols, mrows), _cg) = geo
                # MCU-padded store per component (interleaved DC scans
                # touch the padding blocks; they fall off at crop time)
                for cid, h, v, _tq in frame[2]:
                    coefs[cid] = np.zeros(
                        (mrows * v, mcols * h, 64), dtype=np.int32
                    )
            _prog_scan(
                frame, geo, coefs, scan,
                ss, se, ahal >> 4, ahal & 0x0F,
                chunks, restart, dc_tabs, ac_tabs,
            )
            continue  # pos already advanced past the entropy data
        pos += seglen
    if progressive and coefs:
        return _prog_reconstruct(frame, geo, coefs, qt)
    raise JpegError("no SOS marker")


def _decode_scan(frame, scan, qt, dc_tabs, ac_tabs, restart, chunks):
    width, height, comps = frame
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcols = (width + mcu_w - 1) // mcu_w
    mrows = (height + mcu_h - 1) // mcu_h
    planes = {}
    for cid, h, v, _tq in comps:
        planes[cid] = np.zeros((mrows * v * 8, mcols * h * 8), dtype=np.float64)

    n_mcus = mcols * mrows
    per_chunk = restart if restart else n_mcus
    mcu = 0
    for chunk in chunks:
        if mcu >= n_mcus:
            break
        rd = _BitReader(chunk)
        preds = {cid: 0 for cid, *_ in comps}
        for _ in range(min(per_chunk, n_mcus - mcu)):
            my, mx = divmod(mcu, mcols)
            for cid, h, v, tq in comps:
                td, ta = scan[cid]
                try:
                    dc_t, ac_t, q = dc_tabs[td], ac_tabs[ta], qt[tq]
                except KeyError as e:
                    raise JpegError(f"missing table {e}") from None
                for by in range(v):
                    for bx in range(h):
                        zz = np.zeros(64, dtype=np.float64)
                        t = rd.read_symbol(dc_t)
                        diff = _extend(rd.read_bits(t), t) if t else 0
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = rd.read_symbol(ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC run past block end")
                            zz[k] = _extend(rd.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[list(ZIGZAG)] = zz
                        blk = blk.reshape(8, 8) * q
                        px = _DCT_T.T @ blk @ _DCT_T + 128.0
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu += 1

    return _assemble_image(comps, planes, width, height, hmax, vmax)


def _assemble_image(comps, planes, width, height, hmax, vmax):
    """Upsample subsampled planes, crop to the frame, color-convert —
    shared by the baseline and progressive reconstruction paths."""
    out = []
    for cid, h, v, _tq in comps:
        p = planes[cid]
        if h < hmax or v < vmax:  # nearest-neighbor upsample
            p = np.repeat(np.repeat(p, vmax // v, axis=0), hmax // h, axis=1)
        out.append(p[:height, :width])
    ncomp = len(comps)
    if ncomp == 1:
        px = out[0][:, :, None]
    elif ncomp == 3:
        y, cb, cr = out
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        px = np.stack([r, g, b], axis=2)
    else:
        raise JpegError(f"unsupported component count {ncomp}")
    return width, height, ncomp, np.clip(np.rint(px), 0, 255).astype(np.uint8)


# --- progressive (SOF2) scan decoding — T.81 Annex G ----------------


def _prog_geometry(frame):
    """((hmax, vmax), (mcols, mrows), {cid: (h, v, tq, nbx, nby)}):
    MCU grid for interleaved DC scans plus each component's own
    (un-padded) block grid for non-interleaved scans (T.81 A.2.2)."""
    width, height, comps = frame
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcols = (width + 8 * hmax - 1) // (8 * hmax)
    mrows = (height + 8 * vmax - 1) // (8 * vmax)
    comp_geo = {}
    for cid, h, v, tq in comps:
        cw = (width * h + hmax - 1) // hmax
        ch = (height * v + vmax - 1) // vmax
        comp_geo[cid] = (h, v, tq, (cw + 7) // 8, (ch + 7) // 8)
    return (hmax, vmax), (mcols, mrows), comp_geo


def _ac_first_block(rd, zz, ss, se, al, ac_t, eobrun: int) -> int:
    """First AC scan for one block's band (G.1.2.2): run-length /
    magnitude symbols with EOB-run codes; new coefficients land as
    ``value << al``. Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.read_symbol(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            return (1 << r) - 1 + (rd.read_bits(r) if r else 0)
        k += r
        if k > se:
            raise JpegError("AC run past band end")
        zz[k] = _extend(rd.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(rd, zz, ss, se, al, ac_t, eobrun: int) -> int:
    """AC successive-approximation refinement for one block's band
    (G.1.2.3): newly-significant coefficients arrive as ±(1 << al);
    every already-nonzero coefficient passed emits a correction bit
    (applied only if the ``al`` bit isn't set yet — two's-complement
    test, matching the spec's sign-magnitude growth). Returns the
    remaining EOB run."""
    p1 = 1 << al

    def correct(k: int) -> None:
        if rd.read_bit() and (int(zz[k]) & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else -p1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.read_symbol(ac_t)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:  # EOBn: run of end-of-bands begins here
                    eobrun = (1 << r) + (rd.read_bits(r) if r else 0)
                    break
                # r == 15 (ZRL): skip 16 zero-history coefficients
            elif s == 1:
                newval = p1 if rd.read_bit() else -p1
            else:
                raise JpegError("AC refinement magnitude must be 1")
            while k <= se:
                if zz[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if k <= se:
                if newval:
                    zz[k] = newval
                k += 1
    if eobrun > 0:
        # the EOB code ends this block, but correction bits for the
        # remaining nonzero-history coefficients still follow
        while k <= se:
            if zz[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _prog_scan(
    frame, geo, coefs, scan, ss, se, ah, al, chunks, restart, dc_tabs, ac_tabs
):
    """Apply one progressive scan to the coefficient store. DC scans
    (Ss=0) may interleave components in MCU order; AC scans are
    single-component in the component's own block raster order. Restart
    intervals reset DC predictors and the EOB run per entropy chunk."""
    (hmax, vmax), (mcols, mrows), comp_geo = geo
    if ss == 0:
        if se != 0:
            raise JpegError("DC scan must have Se=0")
        interleaved = len(scan) > 1
    else:
        if len(scan) != 1:
            raise JpegError("progressive AC scans are single-component")
        if se > 63 or ss > se:
            raise JpegError("bad spectral band")
        interleaved = False

    if interleaved:
        n_units = mcols * mrows
    else:
        cid = scan[0][0]
        try:
            _h, _v, _tq, nbx, nby = comp_geo[cid]
        except KeyError:
            raise JpegError(f"scan references unknown component {cid}") from None
        n_units = nbx * nby

    per_chunk = restart if restart else n_units
    unit = 0
    for chunk in chunks:
        if unit >= n_units:
            break
        rd = _BitReader(chunk)
        preds = {c: 0 for c, _, _ in scan}
        eobrun = 0
        for _ in range(min(per_chunk, n_units - unit)):
            if ss == 0:
                for cid, td, _ta in scan:
                    h, v, _tq, nbx, _nby = comp_geo[cid]
                    if interleaved:
                        my, mx = divmod(unit, mcols)
                        blocks = [
                            coefs[cid][my * v + by, mx * h + bx]
                            for by in range(v)
                            for bx in range(h)
                        ]
                    else:
                        blocks = [coefs[cid][unit // nbx, unit % nbx]]
                    for zz in blocks:
                        if ah == 0:
                            try:
                                t = rd.read_symbol(dc_tabs[td])
                            except KeyError as e:
                                raise JpegError(f"missing table {e}") from None
                            diff = _extend(rd.read_bits(t), t) if t else 0
                            preds[cid] += diff
                            zz[0] = preds[cid] << al
                        else:
                            zz[0] += rd.read_bit() << al
            else:
                cid, _td, ta = scan[0]
                _h, _v, _tq, nbx, _nby = comp_geo[cid]
                zz = coefs[cid][unit // nbx, unit % nbx]
                try:
                    ac_t = ac_tabs[ta]
                except KeyError as e:
                    raise JpegError(f"missing table {e}") from None
                fn = _ac_first_block if ah == 0 else _ac_refine_block
                eobrun = fn(rd, zz, ss, se, al, ac_t, eobrun)
            unit += 1


def _prog_reconstruct(frame, geo, coefs, qt):
    """Dequantize + batch-IDCT the accumulated coefficient store and
    assemble the image (same math as the baseline path, vectorized over
    all blocks at once)."""
    width, height, comps = frame
    (hmax, vmax), _mcu, _comp_geo = geo
    planes = {}
    for cid, h, v, tq in comps:
        try:
            q = qt[tq]
        except KeyError as e:
            raise JpegError(f"missing table {e}") from None
        cb = coefs[cid]
        nat = np.zeros(cb.shape, dtype=np.float64)
        nat[:, :, list(ZIGZAG)] = cb.astype(np.float64)
        blocks = nat.reshape(cb.shape[0], cb.shape[1], 8, 8) * q
        # batched matmul mirrors the baseline decoder's per-block IDCT
        # float op order (see encode_progressive's note on rint ties)
        px = _DCT_T.T @ blocks @ _DCT_T + 128.0
        planes[cid] = px.transpose(0, 2, 1, 3).reshape(
            cb.shape[0] * 8, cb.shape[1] * 8
        )
    return _assemble_image(comps, planes, width, height, hmax, vmax)


# --- encoder (the decoder's in-repo adversary; also a valid baseline
# JPEG writer any external decoder can read) -------------------------


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        # pad the final partial byte with 1-bits (T.81 F.1.2.3)
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    bw: _BitWriter, blk: np.ndarray, q: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    """Quantize + zigzag + Huffman-encode one 8×8 spatial block;
    returns the new DC predictor."""
    coef = _DCT_T @ (blk - 128.0) @ _DCT_T.T
    zz = np.rint(coef / q).astype(np.int64).reshape(64)[list(ZIGZAG)]
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    length, code = dc_codes[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0].max()) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        length, code = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        length, code = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_seg(tid: int, q: np.ndarray) -> bytes:
    zz = q.reshape(64)[list(ZIGZAG)].astype(np.int64)
    return _seg(0xDB, bytes([tid]) + bytes(int(x) for x in zz))


def _dht_seg(cls: int, tid: int, table) -> bytes:
    bits, huffval = table
    return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(huffval))


def _trunc_shift(v: int, al: int) -> int:
    """AC point transform: |v| >> al with the sign restored (division
    toward zero — T.81 G.1.2.2; the DC transform is an arithmetic
    shift instead)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def encode_progressive(
    pixels: np.ndarray,
    quant_luma=QUANT_LUMA,
    quant_chroma=QUANT_CHROMA,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) JPEG bytes for uint8 pixels of shape (h, w) /
    (h, w, 1) / (h, w, 3) — the in-repo adversary for the progressive
    decode path (same encoder-as-test-fixture pattern as the baseline
    codec; also a valid SOF2 writer for external decoders).

    Scan script (spectral selection × successive approximation, both
    Annex G dimensions exercised): interleaved DC first scan at Al=1,
    per-component AC first scans for bands 1–5 and 6–63 at Al=1, a DC
    refinement scan (raw bits), then per-component AC refinement scans
    for both bands at Ah=1 → Al=0. EOB runs are emitted per block
    (length 1 — the Annex K tables carry no EOBn codes above 0x00).
    ``restart_interval`` applies to the DC scans. No chroma
    subsampling: every component is 1×1, so MCU order equals block
    order and the full quality of the successive-approximation path is
    in the coefficients, not the geometry."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ncomp = px.shape
    if ncomp not in (1, 3):
        raise JpegError(f"unsupported component count {ncomp}")
    ql = np.asarray(quant_luma, dtype=np.float64).reshape(8, 8)
    qc = np.asarray(quant_chroma, dtype=np.float64).reshape(8, 8)

    if ncomp == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
    else:
        planes = [px[:, :, 0]]

    # quantized zigzag coefficient blocks per component (batch DCT)
    zblocks = []
    for ci, p in enumerate(planes):
        ph, pw = (-p.shape[0]) % 8, (-p.shape[1]) % 8
        p = np.pad(p, ((0, ph), (0, pw)), mode="edge")
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) - 128.0
        q = ql if ci == 0 else qc
        # batched matmul, NOT einsum: np.matmul runs the same dgemm per
        # 8×8 slice as the baseline encoder's per-block expression
        # (_encode_block), so quantization ties round identically and
        # decode(encode(x)) == decode(encode_progressive(x)) exactly
        coef = _DCT_T @ blocks @ _DCT_T.T
        nat = np.rint(coef / q).astype(np.int64).reshape(nby, nbx, 64)
        zblocks.append(nat[:, :, list(ZIGZAG)])
    nby, nbx = zblocks[0].shape[:2]

    dc_codes = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    out = bytearray(JPEG_SOI)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, ql)
    if ncomp == 3:
        out += _dqt_seg(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xC2, sof)
    out += _dht_seg(0, 0, _DC_LUMA) + _dht_seg(1, 0, _AC_LUMA)
    if ncomp == 3:
        out += _dht_seg(0, 1, _DC_CHROMA) + _dht_seg(1, 1, _AC_CHROMA)
    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            t = 0 if ci == 0 else 1
            body += bytes([ci + 1, (t << 4) | t])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    def dc_first_scan(al: int) -> bytes:
        data = bytearray()
        bw = _BitWriter()
        preds = [0] * ncomp
        unit = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and unit and unit % restart_interval == 0:
                    bw.flush()
                    data += bw.out
                    data += bytes(
                        [0xFF, 0xD0 + (unit // restart_interval - 1) % 8]
                    )
                    bw = _BitWriter()
                    preds = [0] * ncomp
                for ci in range(ncomp):
                    v = int(zblocks[ci][by, bx, 0]) >> al  # arithmetic
                    diff = v - preds[ci]
                    preds[ci] = v
                    t = _category(diff)
                    length, code = dc_codes[0 if ci == 0 else 1][t]
                    bw.write(code, length)
                    if t:
                        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                unit += 1
        bw.flush()
        return bytes(data + bw.out)

    def dc_refine_scan(al: int) -> bytes:
        data = bytearray()
        bw = _BitWriter()
        unit = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and unit and unit % restart_interval == 0:
                    bw.flush()
                    data += bw.out
                    data += bytes(
                        [0xFF, 0xD0 + (unit // restart_interval - 1) % 8]
                    )
                    bw = _BitWriter()
                for ci in range(ncomp):
                    bw.write((int(zblocks[ci][by, bx, 0]) >> al) & 1, 1)
                unit += 1
        bw.flush()
        return bytes(data + bw.out)

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        bw = _BitWriter()
        codes = ac_codes[0 if ci == 0 else 1]
        for by in range(nby):
            for bx in range(nbx):
                zz = zblocks[ci][by, bx]
                run = 0
                for k in range(ss, se + 1):
                    v = _trunc_shift(int(zz[k]), al)
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        length, code = codes[0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    s = _category(v)
                    length, code = codes[(run << 4) | s]
                    bw.write(code, length)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if run:  # EOB run of exactly 1
                    length, code = codes[0x00]
                    bw.write(code, length)
        bw.flush()
        return bytes(bw.out)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        bw = _BitWriter()
        codes = ac_codes[0 if ci == 0 else 1]
        for by in range(nby):
            for bx in range(nbx):
                zz = zblocks[ci][by, bx]
                mags = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                # last newly-significant index: pending ZRLs past it fold
                # into the closing EOB instead of being emitted
                eob_i = max(
                    (i for i, t in enumerate(mags) if t == 1), default=-1
                )
                run = 0
                buffered: list[int] = []
                for i, t in enumerate(mags):
                    if t == 0:
                        run += 1
                        continue
                    # flush pending ZRLs before ANY nonzero coefficient —
                    # correction or newly-significant (T.81 figure G.7;
                    # flushing only at t==1 desyncs the decoder, which
                    # consumes correction bits positionally while it
                    # walks each run)
                    while run > 15 and i <= eob_i:
                        length, code = codes[0xF0]
                        bw.write(code, length)
                        run -= 16
                        for bit in buffered:
                            bw.write(bit, 1)
                        buffered = []
                    if t > 1:  # history-nonzero: buffer a correction bit
                        buffered.append(t & 1)
                        continue
                    length, code = codes[(run << 4) | 1]
                    bw.write(code, length)
                    bw.write(1 if zz[ss + i] > 0 else 0, 1)
                    for bit in buffered:
                        bw.write(bit, 1)
                    buffered = []
                    run = 0
                if run or buffered:  # EOB run of 1 + its correction bits
                    length, code = codes[0x00]
                    bw.write(code, length)
                    for bit in buffered:
                        bw.write(bit, 1)
        bw.flush()
        return bytes(bw.out)

    def dri(interval: int) -> bytes:
        # DRI applies to every following scan until changed (T.81
        # B.2.4.4): the DC scans restart, the AC scans (which emit no
        # RST markers here) must see interval 0, so the segment is
        # re-issued around each group
        return _seg(0xDD, struct.pack(">H", interval)) if restart_interval else b""

    all_comps = list(range(ncomp))
    bands = ((1, 5), (6, 63))
    out += dri(restart_interval)
    out += sos_header(all_comps, 0, 0, 0, 1) + dc_first_scan(1)
    out += dri(0)
    for ci in all_comps:
        for ss, se in bands:
            out += sos_header([ci], ss, se, 0, 1) + ac_first_scan(ci, ss, se, 1)
    out += dri(restart_interval)
    out += sos_header(all_comps, 0, 0, 1, 0) + dc_refine_scan(0)
    out += dri(0)
    for ci in all_comps:
        for ss, se in bands:
            out += sos_header([ci], ss, se, 1, 0) + ac_refine_scan(
                ci, ss, se, 0
            )
    out += b"\xff\xd9"
    return bytes(out)


def encode(
    pixels: np.ndarray,
    quant_luma=QUANT_LUMA,
    quant_chroma=QUANT_CHROMA,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG bytes for uint8 pixels of shape (h, w) /
    (h, w, 1) (grayscale) or (h, w, 3) (RGB). ``subsample=True`` writes
    4:2:0 chroma (2×2 box-filtered); quant tables of all ones give a
    round-trip exact up to DCT float rounding, which the property
    tests exploit. ``restart_interval`` > 0 writes a DRI segment and
    RSTn markers every that many MCUs (byte-aligned, DC predictors
    reset) — it exists mainly so the decoder's restart path has an
    in-repo producer to test against."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ncomp = px.shape
    if ncomp not in (1, 3):
        raise JpegError(f"unsupported component count {ncomp}")
    ql = np.asarray(quant_luma, dtype=np.float64).reshape(8, 8)
    qc = np.asarray(quant_chroma, dtype=np.float64).reshape(8, 8)

    if ncomp == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
    else:
        planes = [px[:, :, 0]]
        subsample = False

    luma_f = 2 if subsample else 1  # luma sampling factor (h == v)
    mcu_px = 8 * luma_f

    def pad(p: np.ndarray, mult: int) -> np.ndarray:
        ph = (-p.shape[0]) % mult
        pw = (-p.shape[1]) % mult
        return np.pad(p, ((0, ph), (0, pw)), mode="edge")

    prepped = []
    for ci, p in enumerate(planes):
        if ci == 0:
            prepped.append(pad(p, mcu_px))
        elif subsample:
            p = pad(p, 16)
            p = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            prepped.append(p)
        else:
            prepped.append(pad(p, 8))

    out = bytearray(JPEG_SOI)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, ql)
    if ncomp == 3:
        out += _dqt_seg(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        f = luma_f if ci == 0 else 1
        sof += bytes([ci + 1, (f << 4) | f, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    out += _dht_seg(0, 0, _DC_LUMA) + _dht_seg(1, 0, _AC_LUMA)
    if ncomp == 3:
        out += _dht_seg(0, 1, _DC_CHROMA) + _dht_seg(1, 1, _AC_CHROMA)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    dc_codes = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]
    bw = _BitWriter()
    mcols = prepped[0].shape[1] // mcu_px
    mrows = prepped[0].shape[0] // mcu_px
    preds = [0] * ncomp
    mcu = 0
    for my in range(mrows):
        for mx in range(mcols):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                out += bw.out
                out += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                )
                bw = _BitWriter()
                preds = [0] * ncomp
            for ci in range(ncomp):
                f = luma_f if ci == 0 else 1
                ti = 0 if ci == 0 else 1
                q = ql if ci == 0 else qc
                for by in range(f):
                    for bx in range(f):
                        y0 = (my * f + by) * 8
                        x0 = (mx * f + bx) * 8
                        blk = prepped[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            bw, blk, q, preds[ci], dc_codes[ti], ac_codes[ti]
                        )
            mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
