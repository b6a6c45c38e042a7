"""Pure-stdlib GIF codec (GIF87a/89a, 8-bit palette images): a real
LZW decoder — variable code widths (9→12 bits, LSB-first packing),
dictionary growth with the 4096-entry cap, CLEAR/EOI handling, the
KwKwK self-reference case, multi-sub-block data, 89a extension-block
skipping — plus an encoder used by the deterministic media fixtures.

The encoder writes a 256-entry grayscale global color table and emits
LZW either in the clear-heavy mode (a CLEAR before the dictionary
would outgrow 9 bits — the classic 'uncompressed GIF' trick) or in
grow mode (no early CLEARs, so the DECODER must track the encoder's
code-width bumps at 512/1024/2048 and the 4096-cap CLEAR — the paths
a degenerate stream never exercises). Both modes round-trip in
pytest; the decoder is the one the media pipeline trusts.
"""

from __future__ import annotations

import struct

import numpy as np

_TRAILER = 0x3B
_IMAGE_SEP = 0x2C
_EXTENSION = 0x21


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(indices: np.ndarray, min_code_size: int = 8,
                clear_interval: int | None = 252) -> bytes:
    """LZW-encode a flat uint8 index array.

    ``clear_interval`` emits a CLEAR every N literals and codes every
    pixel as a literal (the uncompressed trick, width pinned at
    min+1); ``None`` runs real greedy LZW with dictionary growth and
    width bumps — both decode identically."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()
    if clear_interval is not None:
        width = min_code_size + 1
        bw.write(clear, width)
        for n, v in enumerate(indices.tolist()):
            if n and n % clear_interval == 0:
                bw.write(clear, width)
            bw.write(int(v), width)
        bw.write(eoi, width)
        return bw.flush()
    # greedy LZW
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i
                               for i in range(1 << min_code_size)}
    next_code = eoi + 1
    bw.write(clear, width)
    prev = b""
    for v in indices.tolist():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        bw.write(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # bump when the just-assigned index == 2^width: the decoder
        # appends the same entry one read later, reaching table length
        # 2^width right before the first code that needs the new width
        # (the lockstep derivation is in the pytest round-trip)
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(1 << min_code_size)}
            next_code = eoi + 1
            width = min_code_size + 1
        # greedy LZW restart: the next phrase begins at the CURRENT
        # symbol (prev+K was just emitted+added; K starts the match)
        prev = bytes([v])
    if prev:
        bw.write(table[prev], width)
    bw.write(eoi, width)
    return bw.flush()


def encode_gif(indices: np.ndarray,
               clear_interval: int | None = 252) -> bytes:
    """(h, w) uint8 index image -> GIF87a bytes with a 256-entry
    grayscale global color table (index i -> rgb(i, i, i))."""
    h, w = indices.shape
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out.append(0b11110111)          # GCT present, 8-bit, 256 entries
    out += b"\x00\x00"              # bg color, aspect
    for i in range(256):
        out += bytes([i, i, i])
    out.append(_IMAGE_SEP)
    out += struct.pack("<HHHH", 0, 0, w, h)
    out.append(0)                   # no local color table
    out.append(8)                   # LZW minimum code size
    data = _lzw_encode(indices.reshape(-1), 8, clear_interval)
    for off in range(0, len(data), 255):
        block = data[off:off + 255]
        out.append(len(block))
        out += block
    out.append(0)                   # block terminator
    out.append(_TRAILER)
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int | None:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int,
                n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReader(data)
    out = bytearray()

    def reset():
        return ([bytes([i]) for i in range(clear)] + [b"", b""],
                min_code_size + 1)

    table, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = br.read(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]          # the KwKwK case
        else:
            raise ValueError(f"gif: invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(
            f"gif: stream ended at {len(out)}/{n_pixels} pixels")
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def decode_gif(payload: bytes):
    """GIF bytes -> (width, height, palette-index array (h, w) uint8,
    grayscale pixel array (h, w) uint8 via the red channel of the
    global color table).  First image frame only (the fixtures and
    the media stats stage are single-frame); 89a extension blocks are
    skipped."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos) \
            .reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == _EXTENSION:
            pos += 1                         # extension label
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == _IMAGE_SEP:
            _l, _t, w, h = struct.unpack_from("<HHHH", payload, pos)
            pos += 8
            ipacked = payload[pos]
            pos += 1
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(payload, np.uint8, n * 3, pos) \
                    .reshape(n, 3)
                pos += n * 3
            if ipacked & 0x40:
                raise ValueError("gif: interlaced images unsupported")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code,
                              w * h).reshape(h, w)
            if pal is None:
                raise ValueError("gif: no color table")
            gray = pal[idx, 0]
            return w, h, idx, gray
        elif b == _TRAILER:
            break
        else:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
    raise ValueError("gif: no image block found")


def encode_gif_animated(frames: list[np.ndarray],
                        clear_interval: int | None = None) -> bytes:
    """List of (h, w) uint8 index images (uniform geometry) -> an
    animated GIF89a: one graphics-control extension + image block per
    frame over the shared grayscale global color table."""
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out.append(0b11110111)
    out += b"\x00\x00"
    for i in range(256):
        out += bytes([i, i, i])
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("gif: frames must share geometry")
        # graphics control extension: 4-byte block, 10cs delay
        out += bytes([_EXTENSION, 0xF9, 4, 0, 10, 0, 0, 0])
        out.append(_IMAGE_SEP)
        out += struct.pack("<HHHH", 0, 0, w, h)
        out.append(0)
        out.append(8)
        data = _lzw_encode(fr.reshape(-1), 8, clear_interval)
        for off in range(0, len(data), 255):
            block = data[off:off + 255]
            out.append(len(block))
            out += block
        out.append(0)
    out.append(_TRAILER)
    return bytes(out)


def decode_gif_frames(payload: bytes):
    """GIF bytes -> (width, height, [frame index arrays (h, w)
    uint8]) — EVERY image block, extensions skipped (the animation
    form of :func:`decode_gif`, which returns the first frame)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct_n = 0
    if packed & 0x80:
        gct_n = 2 << (packed & 0x07)
        pos += gct_n * 3
    frames = []
    fw = fh = None
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == _EXTENSION:
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == _IMAGE_SEP:
            _l, _t, w, h = struct.unpack_from("<HHHH", payload, pos)
            pos += 8
            ipacked = payload[pos]
            pos += 1
            if ipacked & 0x80:
                pos += (2 << (ipacked & 0x07)) * 3
            if ipacked & 0x40:
                raise ValueError("gif: interlaced images unsupported")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            frames.append(_lzw_decode(b"".join(chunks), min_code,
                                      w * h).reshape(h, w))
            fw, fh = w, h
        elif b == _TRAILER:
            break
        else:
            raise ValueError(f"gif: unexpected block 0x{b:02x}")
    if not frames:
        raise ValueError("gif: no image block found")
    return fw, fh, frames
