"""Pure-stdlib baseline JPEG (ITU T.81 sequential DCT) codec — the
image/jpeg `mode="real"` slot of functions/multimodal.py, previously a
declared NotImplementedError (no PIL/libjpeg in this container).

Decoder: SOF0 baseline, 8-bit, grayscale or YCbCr with arbitrary
h x v sampling factors (4:4:4 / 4:2:2 / 4:2:0), multi-table DQT/DHT
segments, restart intervals, byte unstuffing — enough to decode
real-world baseline files (validated against the CPython/IPython test
JPEGs when present on the host). Progressive (SOF2) and arithmetic
coding are out of scope and raise with a clear message.

Encoder: baseline 4:4:4 (and grayscale), Annex K quantization and
Huffman tables, JFIF APP0 — used to synthesize deterministic test
payloads (docs_as_jpeg) so the decoder is exercised end to end
without any external fixture.

Everything is numpy + stdlib; the DCT is the orthonormal 8x8 DCT-II
matrix product (exact to float64 rounding), entropy coding is plain
Python over per-image bit streams (images in the media tables are
tiny; a production path would slot libjpeg-turbo here).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constants (ITU T.81 Annex K — public tables)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

# (bits-per-length[1..16], symbol values) — Annex K.3
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
          list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
            list(range(12)))
AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    C *= np.sqrt(2.0 / 8)
    C[0] *= np.sqrt(0.5)
    return C


_C = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple]:
    """symbol -> (code, length) per the canonical JPEG assignment."""
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple, int]:
    """(length, code) -> symbol."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits,
                                                          vals).items()}


# ---------------------------------------------------------------------------
# Encoder (baseline, 4:4:4 / grayscale, Annex K tables)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(w: _BitWriter, q: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    zz = q.reshape(-1)[ZIGZAG]
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)
    return int(zz[0])


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane -> (n_blocks_v, n_blocks_h, 8, 8), edge-
    replicated to multiples of 8."""
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    return padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JFIF bytes
    (4:4:4, Annex K quantization + Huffman tables)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
    else:
        r = px[..., 0].astype(np.float64)
        g = px[..., 1].astype(np.float64)
        b = px[..., 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b,
        ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    qts = [QT_LUM] if gray else [QT_LUM, QT_CHROM]
    for tq, qt in enumerate(qts):
        body = bytes([tq]) + bytes(int(v) for v in qt.reshape(-1)[ZIGZAG])
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, *DC_LUM) + _dht_segment(1, 0, *AC_LUM)
    if not gray:
        out += _dht_segment(0, 1, *DC_CHROM) + _dht_segment(1, 1, *AC_CHROM)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    dc_maps = [_canonical_codes(*DC_LUM)] + \
        [_canonical_codes(*DC_CHROM)] * (ncomp - 1)
    ac_maps = [_canonical_codes(*AC_LUM)] + \
        [_canonical_codes(*AC_CHROM)] * (ncomp - 1)
    blocks = [_component_blocks(p) for p in planes]
    qmats = [QT_LUM] + [QT_CHROM] * (ncomp - 1)
    # quantized coefficients per component, vectorized DCT
    qblocks = []
    for bl, qm in zip(blocks, qmats):
        coef = np.einsum("ij,abjk,lk->abil", _C, bl - 128.0, _C)
        qblocks.append(np.round(coef / qm).astype(np.int64))

    wtr = _BitWriter()
    preds = [0] * ncomp
    nv, nh = qblocks[0].shape[:2]
    for bv in range(nv):
        for bh in range(nh):
            for ci in range(ncomp):
                preds[ci] = _encode_block(
                    wtr, qblocks[ci][bv, bh], preds[ci],
                    dc_maps[ci], ac_maps[ci])
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (baseline SOF0, arbitrary sampling factors, restarts)
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.i = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.i >= len(self.d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.d[self.i]
            self.i += 1
            if b == 0xFF:
                nxt = self.d[self.i] if self.i < len(self.d) else 0
                if nxt == 0x00:
                    self.i += 1  # stuffed byte
                else:
                    # marker: behave as end of data (padding zeros)
                    self.i -= 1
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> None:
        """Skip to just past the next RSTn marker, resetting state."""
        self.acc = 0
        self.nbits = 0
        while self.i < len(self.d) - 1:
            if self.d[self.i] == 0xFF and 0xD0 <= self.d[self.i + 1] <= 0xD7:
                self.i += 2
                return
            self.i += 1
        raise ValueError("jpeg: missing restart marker")


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    for _ in range(16):
        code = (code << 1) | r.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """baseline JPEG bytes -> (width, height, n_components,
    uint8 pixels (h, w, n_components); YCbCr already converted to
    RGB for 3-component images)."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart = 0
    scan = None
    while i < len(d):
        if d[i] != 0xFF:
            i += 1
            continue
        m = d[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            break
        ln = struct.unpack(">H", d[i + 2:i + 4])[0]
        seg = d[i + 4:i + 2 + ln]
        if m == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                n = 64 * (2 if pq else 1)
                vals = (np.frombuffer(seg[j + 1:j + 1 + n],
                                      dtype=">u2" if pq else np.uint8)
                        .astype(np.int64))
                tbl = np.zeros(64, np.int64)
                tbl[ZIGZAG] = vals
                qt[tq] = tbl.reshape(8, 8)
                j += 1 + n
        elif m == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, vals)
                j += 17 + nv
        elif m == 0xC0 or m == 0xC1:
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
        elif m == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) not supported by the baseline "
                "decoder")
        elif m == 0xDD:
            restart = struct.unpack(">H", seg)[0]
        elif m == 0xDA:
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c:3 + 2 * c]
                sel[cid] = (tt >> 4, tt & 15)
            scan = (sel, i + 2 + ln)
            break
        i += 2 + ln
    if scan is None or not comps:
        raise ValueError("jpeg: no scan found")

    sel, data_start = scan
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               np.float64))
    r = _BitReader(d[data_start:])
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                r.align_to_marker()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = sel[c["id"]]
                dtab = huff[(0, dct)]
                atab = huff[(1, act)]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        s = _huff_decode(r, dtab)
                        diff = _extend(r.bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, atab)
                            rr, ss = rs >> 4, rs & 15
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("jpeg: AC overflow")
                            zz[k] = _extend(r.bits(ss), ss)
                            k += 1
                        blk = np.zeros(64, np.float64)
                        blk[ZIGZAG] = zz * q.reshape(-1)[ZIGZAG]
                        blk = blk.reshape(8, 8)
                        pix = _C.T @ blk @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1

    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        px = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, px[:, :, None]
    Y, Cb, Cr = full
    rch = Y + 1.402 * (Cr - 128.0)
    gch = Y - 0.344136286 * (Cb - 128.0) - 0.714136286 * (Cr - 128.0)
    bch = Y + 1.772 * (Cb - 128.0)
    px = np.clip(np.round(np.stack([rch, gch, bch], axis=2)),
                 0, 255).astype(np.uint8)
    return w, h, 3, px
