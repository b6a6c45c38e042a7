"""Pure-stdlib ISO BMFF (MP4) container codec for JPEG-coded video.

The container has no ffmpeg, but ISO BMFF is a public format
(ISO/IEC 14496-12): big-endian `size+fourcc` boxes, a `moov` movie
box holding per-track sample tables (`stsd` codec entry, `stts`
timing, `stsc` sample->chunk runs, `stsz` sizes, `stco`/`co64`
absolute chunk offsets) and an `mdat` payload box. Motion-JPEG in
MP4 ("jpeg" sample entries, QuickTime-lineage) needs no inter-frame
codec beyond the repo's baseline JPEG (functions/jpeg.py), so this
module makes MP4 a REAL end-to-end path: box walk + sample-table
resolution here, per-frame pixel decode in functions/jpeg.py.
Inter-frame codecs (avc1/hev1/vp09) still require ffmpeg and keep
the explicit NotImplementedError slot in multimodal.py.

Reference parity note: the reference stack delegates media handling
entirely (no media pipeline of its own); this module exists for the
LLM-data-pipeline operator family (multimodal columns), not for a
reference operator.
"""

from __future__ import annotations

import struct


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full(tag: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags) + body)


def encode_mp4(frames: list[bytes], width: int, height: int,
               fps: int = 25) -> bytes:
    """JPEG frame payloads -> a minimal one-video-track MP4.

    Deterministic (fixed box layout, zeroed times/reserved fields) —
    equal frame lists give byte-identical files. Layout: ftyp, mdat
    (frames concatenated), moov with full sample tables (one chunk
    per sample, timescale=fps so every sample lasts 1 tick).
    """
    if fps <= 0:
        raise ValueError("fps must be positive")
    n = len(frames)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(frames))
    # absolute file offsets of each sample: ftyp + mdat header(8)
    offs, pos = [], len(ftyp) + 8
    for f in frames:
        offs.append(pos)
        pos += len(f)

    mvhd = _full(b"mvhd", 0, 0, struct.pack(
        ">IIII", 0, 0, fps, n)                 # ctime mtime timescale dur
        + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2))  # next track id
    tkhd = _full(b"tkhd", 0, 7, struct.pack(
        ">IIIII", 0, 0, 1, 0, n) + b"\x00" * 16
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16))
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0))
    hdlr = _full(b"hdlr", 0, 0,
                 struct.pack(">I4s", 0, b"vide") + b"\x00" * 12
                 + b"VideoHandler\x00")
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1)
                 + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    entry = _box(b"jpeg", b"\x00" * 6 + struct.pack(">H", 1)
                 + b"\x00" * 16
                 + struct.pack(">HHIIIH", width, height,
                               0x00480000, 0x00480000, 0, 1)
                 + b"\x05MJPEG" + b"\x00" * 26     # 32-byte compressorname
                 + struct.pack(">Hh", 24, -1))
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(f)) for f in frames))
    stco = _full(b"stco", 0, 0, struct.pack(">I", n)
                 + b"".join(struct.pack(">I", o) for o in offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(buf: bytes, pos: int, end: int, out: dict,
          containers=(b"moov", b"trak", b"mdia", b"minf", b"stbl")) -> None:
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", buf[pos:pos + 4])
        tag = buf[pos + 4:pos + 8]
        body_start = pos + 8
        if size == 1:                       # 64-bit largesize
            (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
            body_start = pos + 16
        elif size == 0:                     # box runs to end of file
            size = end - pos
        box_end = pos + size
        if size < 8 or box_end > end:
            raise ValueError("truncated MP4 box")
        if tag in containers:
            _walk(buf, body_start, box_end, out)
        elif tag in out:
            out[tag].append(buf[body_start:box_end])
        pos = box_end


def decode_mp4(payload: bytes) -> dict:
    """MP4 bytes -> container metadata + raw video sample payloads.

    Returns ``{"width", "height", "n_frames", "timescale", "fps",
    "codec", "frames"}`` where ``frames`` are the video track's sample
    bytes in stsc/stco order (for "jpeg" entries, each a complete JFIF
    image decodable by functions/jpeg.py). Raises ValueError on a
    non-BMFF signature, truncated boxes, or missing sample tables.
    """
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no ftyp box)")
    out = {t: [] for t in (b"mdhd", b"hdlr", b"stsd", b"stts", b"stsc",
                           b"stsz", b"stco", b"co64", b"tkhd")}
    _walk(payload, 0, len(payload), out)
    # pick the video track: hdlr handler_type 'vide' (boxes arrive in
    # document order, one bundle per trak — index the bundles jointly)
    vid = None
    for i, h in enumerate(out[b"hdlr"]):
        if h[8:12] == b"vide":
            vid = i
            break
    if vid is None:
        raise ValueError("no video track (hdlr 'vide') in MP4")

    def track(tag: bytes) -> bytes:
        if len(out[tag]) <= vid:
            raise ValueError(f"video track missing {tag.decode()} box")
        return out[tag][vid]

    stsd = track(b"stsd")
    codec = stsd[12:16].decode("ascii", "replace")
    width, height = struct.unpack(">HH", stsd[40:44])
    mdhd = track(b"mdhd")
    timescale, duration = struct.unpack(">II", mdhd[12:20])
    stts = track(b"stts")
    (n_tt,) = struct.unpack(">I", stts[4:8])
    deltas = []                             # per-sample tick durations
    for i in range(n_tt):
        cnt, dur = struct.unpack(">II", stts[8 + 8 * i:16 + 8 * i])
        deltas.extend([dur] * cnt)
    stsz = track(b"stsz")
    uniform, n_samples = struct.unpack(">II", stsz[4:12])
    sizes = ([uniform] * n_samples if uniform else
             list(struct.unpack(f">{n_samples}I", stsz[12:12 + 4 * n_samples])))
    if out[b"co64"][vid:vid + 1]:
        co = out[b"co64"][vid]
        (n_ch,) = struct.unpack(">I", co[4:8])
        chunk_offs = list(struct.unpack(f">{n_ch}Q", co[8:8 + 8 * n_ch]))
    else:
        co = track(b"stco")
        (n_ch,) = struct.unpack(">I", co[4:8])
        chunk_offs = list(struct.unpack(f">{n_ch}I", co[8:8 + 4 * n_ch]))
    stsc = track(b"stsc")
    (n_sc,) = struct.unpack(">I", stsc[4:8])
    runs = [struct.unpack(">III", stsc[8 + 12 * i:20 + 12 * i])
            for i in range(n_sc)]           # (first_chunk, per_chunk, sdi)

    # resolve absolute sample offsets: expand stsc runs over the chunk
    # list, samples laid consecutively inside each chunk
    frames, si = [], 0
    for ri, (first, per, _sdi) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_ch
        for ch in range(first - 1, last):
            off = chunk_offs[ch]
            for _ in range(per):
                if si >= n_samples:
                    break
                if off + sizes[si] > len(payload):
                    raise ValueError("sample extends past end of MP4")
                frames.append(payload[off:off + sizes[si]])
                off += sizes[si]
                si += 1
    if si != n_samples:
        raise ValueError("sample tables inconsistent "
                         f"({si} resolved != stsz {n_samples})")
    ticks = sum(deltas) or duration or n_samples
    fps = round(timescale * n_samples / ticks) if ticks else 0
    return {"width": width, "height": height, "n_frames": n_samples,
            "timescale": timescale, "fps": fps, "codec": codec,
            "frames": frames}
