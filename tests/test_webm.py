"""EBML/Matroska (WebM) container codec + its Ray stages.

WebM's container layer is real (functions/ebml.py: vint framing,
Segment/Info/Tracks/Cluster walk, SimpleBlock parsing); the VP8/VP9
pixel payloads stay coded — pixel decode remains the declared ffmpeg
slot. These tests cover the byte-level container contract (round
trip, vint widths, unknown-size masters, BlockGroup/Block tolerance,
truncation) and the Ray surface that consumes it (decode_stage
mode='real' geometry + size profile)."""

import struct

import pytest

from k_gap_ray.functions.ebml import (BLOCK, BLOCK_GROUP, SEGMENT,
                                      _elem, _write_size, decode_webm,
                                      encode_webm)


def _frames(n=5):
    return [bytes([(19 + 7 * k) % 256]) * (30 + k) for k in range(n)]


def test_webm_roundtrip_bytes_and_meta():
    frames = _frames()
    w = encode_webm(frames, 320, 240, fps=10)
    m = decode_webm(w)
    assert m["frames"] == frames  # byte-identical payloads
    assert (m["codec"], m["n_frames"]) == ("V_VP8", 5)
    assert (m["width"], m["height"]) == (320, 240)
    assert m["ts_ms"] == [0, 100, 200, 300, 400]
    assert m["timescale_ns"] == 1_000_000
    # deterministic encoder: equal inputs -> equal bytes
    assert encode_webm(frames, 320, 240, fps=10) == w


def test_webm_vint_widths():
    # payloads sized to force 1-, 2- and 3-byte size vints, and a
    # 0x7F-byte payload (the 1-byte all-ones sentinel must bump to
    # the 2-byte form, not emit 0xFF = unknown size)
    for n in (10, 0x7F, 0x80, 0x5000, 0x4321F):
        frames = [b"\xaa" * n]
        m = decode_webm(encode_webm(frames, 8, 8))
        assert m["frames"] == frames


def test_webm_unknown_size_segment_and_cluster():
    # streamed files write Segment (and sometimes Cluster) with the
    # all-ones unknown-size vint; the walker must run them to the
    # parent's end
    frames = _frames(3)
    w = encode_webm(frames, 64, 48, fps=25)
    seg_id = SEGMENT.to_bytes(4, "big")
    pos = w.index(seg_id) + 4
    nbytes = 1
    while not w[pos] & (0x80 >> (nbytes - 1)):
        nbytes += 1
    unk = ((1 << (7 * nbytes)) | ((1 << (7 * nbytes)) - 1)) \
        .to_bytes(nbytes, "big")
    m = decode_webm(w[:pos] + unk + w[pos + nbytes:])
    assert m["frames"] == frames


def test_webm_blockgroup_block_tolerance():
    # muxers may wrap frames in BlockGroup/Block instead of
    # SimpleBlock; the walker treats both identically. Rebuild the
    # encoder's file with a BlockGroup-only cluster.
    from k_gap_ray.functions.ebml import CLUSTER, CLUSTER_TS, INFO, _uint

    w = encode_webm(_frames(2), 64, 48)
    header = w[:w.index(SEGMENT.to_bytes(4, "big"))]
    info_at = w.index(INFO.to_bytes(4, "big"))
    cluster_at = w.index(CLUSTER.to_bytes(4, "big"))
    group = _elem(BLOCK_GROUP,
                  _elem(BLOCK, b"\x81" + struct.pack(">h", 999)
                        + b"\x00" + b"zz"))
    body = w[info_at:cluster_at] \
        + _elem(CLUSTER, _uint(CLUSTER_TS, 7) + group)
    rebuilt = header + SEGMENT.to_bytes(4, "big") \
        + _write_size(len(body)) + body
    m = decode_webm(rebuilt)
    assert m["frames"] == [b"zz"]
    assert m["ts_ms"] == [7 + 999]


def test_webm_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="EBML"):
        decode_webm(b"RIFF" + b"\x00" * 20)
    w = encode_webm(_frames(2), 64, 48)
    with pytest.raises(ValueError, match="truncated"):
        decode_webm(w[:40])
    with pytest.raises(ValueError):
        encode_webm(_frames(1), 4, 4, fps=0)


def test_decode_stage_real_webm(ray_session):
    """decode_stage mode='real' reads geometry from the TrackEntry
    and profiles per-block byte sizes without touching the coded
    payloads."""
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.functions.multimodal import decode_stage, docs_as_webm

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([5, 6, 7],
                                                      pa.int64())}))
    out = decode_stage(docs_as_webm(docs), mode="real").take_all()
    assert len(out) == 3
    for r in out:
        mid = r["media_id"]
        assert r["width"] == 64 + (mid * 7) % 192
        assert r["height"] == 48 + (mid * 5) % 144
        assert abs(sum(r["feature"]) - 1.0) < 1e-6
