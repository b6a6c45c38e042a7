"""Pure-stdlib EBML/Matroska (WebM) container codec — metadata level.

WebM is public Matroska (EBML) framing: variable-length-integer
element IDs and sizes, a `Segment` master element holding `Info`
(TimestampScale), `Tracks` (TrackEntry -> TrackType/CodecID/Video ->
PixelWidth/PixelHeight) and `Cluster`s of `SimpleBlock`s (VINT track
number + int16 relative timestamp + flags + frame data). This module
makes the CONTAINER layer real — geometry, codec id, block count,
per-block payload bytes and timestamps all come from an actual EBML
walk — while the VP8/VP9 pixel payloads themselves stay behind the
declared ffmpeg slot in multimodal.py (inter-frame codecs are not
decodable without a video library; contrast riffavi.py/isobmff.py
whose MJPG/jpeg samples ARE fully decoded by functions/jpeg.py).

Reference parity note: the reference stack delegates media handling
entirely (no media pipeline of its own); this module exists for the
LLM-data-pipeline operator family (multimodal columns), not for a
reference operator.
"""

from __future__ import annotations

import struct

# element IDs (with their length marker, as they appear on the wire)
EBML_HEADER = 0x1A45DFA3
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
CLUSTER = 0x1F43B675
CLUSTER_TS = 0xE7
SIMPLE_BLOCK = 0xA3
BLOCK_GROUP = 0xA0
BLOCK = 0xA1

_MASTERS = {SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, CLUSTER,
            BLOCK_GROUP}


def _write_id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _write_size(v: int) -> bytes:
    # minimal-length size VINT: n-byte form carries 7n value bits
    # under a 1<<(8n-n) marker; all-ones (unknown size) is avoided by
    # bumping to the next length when v hits the sentinel
    for n in range(1, 9):
        if v < (1 << (7 * n)) - 1:
            return ((1 << (7 * n)) | v).to_bytes(n, "big")
    raise ValueError("EBML size too large")


def _elem(eid: int, body: bytes) -> bytes:
    return _write_id(eid) + _write_size(len(body)) + body


def _uint(eid: int, v: int) -> bytes:
    return _elem(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def encode_webm(frames: list[bytes], width: int, height: int,
                fps: int = 25, codec: str = "V_VP8") -> bytes:
    """Opaque frame payloads -> a minimal one-video-track WebM.

    Deterministic (fixed element layout) — equal inputs give
    byte-identical files. One Cluster at timestamp 0 holding one
    SimpleBlock per frame with millisecond relative timestamps
    (TimestampScale 1_000_000 ns = 1 ms ticks). The payloads are NOT
    re-encoded — this is container framing only.
    """
    if fps <= 0:
        raise ValueError("fps must be positive")
    header = _elem(EBML_HEADER,
                   _uint(0x4286, 1)            # EBMLVersion
                   + _uint(0x42F7, 1)          # EBMLReadVersion
                   + _elem(0x4282, b"webm")    # DocType
                   + _uint(0x4287, 4)          # DocTypeVersion
                   + _uint(0x4285, 2))         # DocTypeReadVersion
    info = _elem(INFO, _uint(TIMESTAMP_SCALE, 1_000_000))
    video = _elem(VIDEO, _uint(PIXEL_WIDTH, width)
                  + _uint(PIXEL_HEIGHT, height))
    entry = _elem(TRACK_ENTRY,
                  _uint(TRACK_NUMBER, 1) + _uint(TRACK_TYPE, 1)
                  + _elem(CODEC_ID, codec.encode("ascii")) + video)
    tracks = _elem(TRACKS, entry)
    blocks = b""
    for k, f in enumerate(frames):
        rel_ms = k * 1000 // fps
        blocks += _elem(SIMPLE_BLOCK,
                        b"\x81" + struct.pack(">h", rel_ms)
                        + b"\x80" + f)          # track 1, keyframe flag
    cluster = _elem(CLUSTER, _uint(CLUSTER_TS, 0) + blocks)
    return header + _elem(SEGMENT, info + tracks + cluster)


def _read_vint(buf: bytes, pos: int, keep_marker: bool):
    if pos >= len(buf):
        raise ValueError("truncated EBML vint")
    first = buf[pos]
    if first == 0:
        raise ValueError("invalid EBML vint (leading zero byte)")
    n = 1
    while not first & (0x80 >> (n - 1)):
        n += 1
    if pos + n > len(buf):
        raise ValueError("truncated EBML vint")
    v = int.from_bytes(buf[pos:pos + n], "big")
    if not keep_marker:
        marker = 1 << (7 * n)
        v ^= marker
        if v == marker - 1:                    # all value bits set
            return None, pos + n               # unknown size
    return v, pos + n


def decode_webm(payload: bytes) -> dict:
    """WebM/Matroska bytes -> container metadata + raw block payloads.

    Returns ``{"width", "height", "n_frames", "timescale_ns",
    "codec", "frames", "ts_ms"}`` where ``frames`` are the video
    track's Simple/Block payloads in stream order (still codec-coded
    — VP8/VP9 need ffmpeg) and ``ts_ms`` their cluster-absolute
    millisecond timestamps. Tolerates unknown-size Segment/Cluster
    (streamed files). Raises ValueError on a non-EBML signature or a
    truncated element.
    """
    if len(payload) < 4 \
            or int.from_bytes(payload[:4], "big") != EBML_HEADER:
        raise ValueError("not EBML (bad magic; expected a WebM file)")
    meta = {"width": 0, "height": 0, "n_frames": 0,
            "timescale_ns": 1_000_000, "codec": "", "frames": [],
            "ts_ms": []}
    state = {"cluster_ts": 0, "video_track": None, "in_video_entry":
             False}

    def block(body: bytes) -> None:
        tn, p = _read_vint(body, 0, keep_marker=False)
        if state["video_track"] not in (None, tn):
            return
        (rel,) = struct.unpack(">h", body[p:p + 2])
        meta["frames"].append(body[p + 3:])
        meta["ts_ms"].append(state["cluster_ts"] + rel)

    def walk(pos: int, end: int) -> None:
        while pos + 2 <= end:
            eid, pos = _read_vint(payload, pos, keep_marker=True)
            size, pos = _read_vint(payload, pos, keep_marker=False)
            body_end = end if size is None else pos + size
            if body_end > end:
                raise ValueError("truncated EBML element")
            if eid in _MASTERS:
                if eid == TRACK_ENTRY:
                    state["entry"] = {"num": 1, "type": 0, "codec": "",
                                      "w": 0, "h": 0}
                walk(pos, body_end)
                if eid == TRACK_ENTRY:
                    e = state.pop("entry")
                    if e["type"] == 1 and state["video_track"] is None:
                        state["video_track"] = e["num"]
                        meta["codec"] = e["codec"]
                        meta["width"], meta["height"] = e["w"], e["h"]
            elif eid == TIMESTAMP_SCALE:
                meta["timescale_ns"] = int.from_bytes(
                    payload[pos:body_end], "big")
            elif eid == CLUSTER_TS:
                state["cluster_ts"] = int.from_bytes(
                    payload[pos:body_end], "big")
            elif eid in (SIMPLE_BLOCK, BLOCK):
                block(payload[pos:body_end])
            elif "entry" in state:
                e = state["entry"]
                if eid == TRACK_NUMBER:
                    e["num"] = int.from_bytes(payload[pos:body_end], "big")
                elif eid == TRACK_TYPE:
                    e["type"] = int.from_bytes(payload[pos:body_end], "big")
                elif eid == CODEC_ID:
                    e["codec"] = payload[pos:body_end].decode(
                        "ascii", "replace").rstrip("\x00")
                elif eid == PIXEL_WIDTH:
                    e["w"] = int.from_bytes(payload[pos:body_end], "big")
                elif eid == PIXEL_HEIGHT:
                    e["h"] = int.from_bytes(payload[pos:body_end], "big")
            pos = body_end

    walk(0, len(payload))
    meta["n_frames"] = len(meta["frames"])
    return meta
