"""Pure-stdlib PNG codec (zlib + struct): the one REAL decoder behind
the multimodal `mode="real"` slot.

The container has no PIL/libvips, but PNG needs neither — the format
is public (RFC 2083 / W3C PNG spec): length-prefixed CRC32 chunks,
IHDR geometry, zlib-compressed scanlines with five per-row predictor
filters. Supports bit depth 8, color types 0 (gray), 2 (RGB), 4
(gray+alpha), 6 (RGBA), no interlacing — the slice real web corpora
overwhelmingly use. The encoder always writes filter 0; the decoder
implements all five filters (Sub/Up/Average/Paeth) so foreign PNGs
decode too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W) gray or (H, W, C) C in {1,2,3,4} uint8 -> PNG bytes.

    Deterministic (fixed zlib level, filter 0 rows) — equal pixel
    arrays give byte-identical files, so encoded corpora are
    content-addressable."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), px.reshape(h, w * c)],
        axis=1).tobytes()
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline predictor filters. Row loop is O(height)
    Python iterations with vectorized row math; Sub/Paeth recurrences
    are inherently sequential within a row, so those columns iterate —
    images are decoded inside actor-pool batches, parallelism comes
    from the pool, not from here."""
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    cur = rows[:, 1:].astype(np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    out = np.empty((h, stride), dtype=np.uint8)
    for y in range(h):
        f, row = int(ftypes[y]), cur[y]
        if f == 0:
            line = row
        elif f == 1:  # Sub
            line = row.copy()
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            line = (row + prev) & 0xFF
        elif f == 3:  # Average
            line = row.copy()
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            line = row.copy()
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa_ <= pb and pa_ <= pcc else (
                    b if pb <= pcc else cc)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = line.astype(np.uint8)
        prev = line
    return out


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """PNG bytes -> (width, height, channels, (H, W, C) uint8 array).

    Raises ValueError on a non-PNG signature, CRC mismatch, or an
    unsupported feature (depth != 8, palette, interlace)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            meta = (w, h, _CHANNELS[color_type])
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, c = meta
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match geometry")
    px = _unfilter(raw, h, stride, c).reshape(h, w, c)
    return w, h, c, px
