"""Pure-stdlib AVI (RIFF) container codec for MJPEG video streams.

The container has no ffmpeg, but AVI is a public format (Microsoft
RIFF/AVI spec, OpenDML extensions) and MJPEG-in-AVI needs no codec
beyond the repo's baseline JPEG (functions/jpeg.py): the container is
little-endian chunked RIFF — `LIST hdrl` (an `avih` main header plus
one `LIST strl` per stream with `strh`/`strf`), `LIST movi` holding
the per-frame `00dc` chunks, and an `idx1` index. The encoder writes
one MJPG video stream; the decoder walks chunks generically, skips
foreign ones (JUNK/INFO/odml), and tolerates a missing idx1 so
externally produced files still parse.

Closes the video-container slot that was a declared stub in rounds
1-3 (multimodal.py): AVI/MJPEG is now a REAL end-to-end path —
container parse here, per-frame pixel decode in functions/jpeg.py.

Reference parity note: the reference stack delegates media handling
entirely (no media pipeline of its own); this module exists for the
LLM-data-pipeline operator family (multimodal columns), not for a
reference operator.
"""

from __future__ import annotations

import struct


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks are word-aligned
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi(frames: list[bytes], width: int, height: int,
               fps: int = 25) -> bytes:
    """JPEG frame payloads -> a minimal single-stream MJPG AVI.

    Deterministic (fixed header layout, zeroed reserved fields) —
    equal frame lists give byte-identical files. ``width``/``height``
    are the container's nominal dims (MJPEG frames may individually
    differ; players use the per-frame JFIF geometry).
    """
    if fps <= 0:
        raise ValueError("fps must be positive")
    us_per_frame = 1_000_000 // fps
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I", us_per_frame, max_bytes * fps, 0, 0x10,  # HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H", b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, len(frames), max_bytes, -1, 0, 0, 0, width, height)
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1 offsets are relative to the start of the movi LIST body
    # (the conventional interpretation: offset of the chunk header
    # counted from the 'movi' fourcc)
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off,
                                       len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> dict:
    """AVI bytes -> container metadata + the raw video frame payloads.

    Returns ``{"width", "height", "n_frames", "us_per_frame", "fps",
    "codec", "frames"}`` where ``frames`` is the list of `00dc`/`00db`
    chunk bodies in stream order (for MJPG, each a complete JFIF
    image decodable by functions/jpeg.py). Raises ValueError on a
    non-AVI signature or a truncated chunk.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF/AVI signature)")
    meta = {"width": 0, "height": 0, "n_frames": 0, "us_per_frame": 0,
            "fps": 0, "codec": "", "frames": []}

    def walk(buf: bytes, pos: int, end: int) -> None:
        while pos + 8 <= end:
            tag = buf[pos:pos + 4]
            (length,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body_start = pos + 8
            body_end = body_start + length
            if body_end > end:
                raise ValueError("truncated AVI chunk")
            if tag == b"LIST":
                kind = buf[body_start:body_start + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(buf, body_start + 4, body_end)
            elif tag == b"avih" and length >= 40:
                f = struct.unpack("<10I", buf[body_start:body_start + 40])
                meta["us_per_frame"] = f[0]
                meta["n_frames"] = f[4]
                meta["width"], meta["height"] = f[8], f[9]
                if f[0]:
                    meta["fps"] = 1_000_000 // f[0]
            elif tag == b"strh" and length >= 8:
                if buf[body_start:body_start + 4] == b"vids":
                    meta["codec"] = buf[body_start + 4:body_start + 8] \
                        .decode("ascii", "replace")
            elif tag[2:4] in (b"dc", b"db") and tag[:2].isdigit():
                meta["frames"].append(buf[body_start:body_end])
            pos = body_end + (length % 2)

    riff_end = 8 + struct.unpack("<I", payload[4:8])[0]
    if riff_end > len(payload):
        raise ValueError("truncated AVI (declared RIFF size exceeds "
                         "payload)")
    walk(payload, 12, riff_end)
    if not meta["n_frames"]:
        meta["n_frames"] = len(meta["frames"])
    return meta
