"""AVI (RIFF) container codec + its Ray stages.

The container-video slot was a declared NotImplementedError stub in
rounds 1-3; functions/riffavi.py closes it for MJPG-in-AVI (the one
video container needing no inter-frame codec). These tests cover the
byte-level container contract (round trip, word alignment, foreign
chunks, missing index, truncation) and the Ray surfaces that consume
it (frame_sample_stage mode='real', decode_stage mode='real')."""

import struct

import numpy as np
import pytest

from k_gap_ray.functions.jpeg import decode_jpeg, encode_jpeg
from k_gap_ray.functions.riffavi import decode_avi, encode_avi


def _frames(n=4):
    return [encode_jpeg(np.full((7 + 2 * k, 9 + 3 * k), 40 * k, np.uint8))
            for k in range(n)]


def test_avi_roundtrip_bytes_and_meta():
    frames = _frames()
    avi = encode_avi(frames, 9, 7, fps=12)
    m = decode_avi(avi)
    assert m["frames"] == frames  # byte-identical payloads
    assert (m["codec"], m["n_frames"], m["fps"]) == ("MJPG", 4, 12)
    assert (m["width"], m["height"]) == (9, 7)
    # deterministic encoder: equal inputs -> equal bytes
    assert encode_avi(frames, 9, 7, fps=12) == avi
    for k, f in enumerate(m["frames"]):
        w, h, _c, _px = decode_jpeg(f)
        assert (w, h) == (9 + 3 * k, 7 + 2 * k)


def test_avi_odd_length_frame_word_alignment():
    # RIFF chunks are word-aligned; an odd-length body gets a pad byte
    # that must NOT leak into the decoded frame
    odd = [b"\xff\xd8xyz\xff\xd9", b"\xff\xd8q\xff\xd9"]
    m = decode_avi(encode_avi(odd, 4, 4))
    assert m["frames"] == odd


def test_avi_tolerates_junk_and_missing_idx1():
    # externally produced files carry JUNK/INFO chunks and may lack
    # idx1 — the walker must skip foreign chunks and survive no index
    frames = _frames(3)
    avi = encode_avi(frames, 9, 7, fps=10)
    chunks = avi[12:]
    chunks = chunks[:chunks.rfind(b"idx1")]
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    body = b"AVI " + junk + chunks
    m = decode_avi(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert m["frames"] == frames
    assert m["fps"] == 10


def test_avi_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi(b"\x89PNG\r\n\x1a\n" + b"\x00" * 20)
    avi = encode_avi(_frames(2), 9, 7)
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(avi[:40])
    with pytest.raises(ValueError):
        encode_avi(_frames(1), 4, 4, fps=0)


def test_frame_sample_real_avi(ray_session):
    """mode='real' walks the RIFF container: picks are evenly spaced
    over the ACTUAL chunk count, ts_sec comes from us_per_frame, and
    each sampled payload decodes at its per-frame geometry."""
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.functions.multimodal import MEDIA, frame_sample_stage

    frames = [encode_jpeg(np.full((8 + k, 10), 60 + 10 * k, np.uint8))
              for k in range(10)]
    media = pa.Table.from_pylist([{
        "media_id": 1, "payload": encode_avi(frames, 10, 8, fps=20),
        "mime": "video/x-msvideo", "source_url": "urn:avi:1"}],
        schema=MEDIA)
    out = frame_sample_stage(rd.from_arrow(media), n_frames=4,
                             mode="real").take_all()
    assert sorted(r["frame_idx"] for r in out) == [0, 2, 5, 7]
    us = 1_000_000 // 20
    for r in out:
        w, h, _c, _px = decode_jpeg(r["payload"])
        assert (w, h) == (10, 8 + r["frame_idx"])
        assert r["ts_sec"] == pytest.approx(r["frame_idx"] * us / 1e6)


def test_decode_stage_real_avi(ray_session):
    """decode_stage mode='real' reads geometry from the avih header
    and profiles per-frame byte sizes without a full pixel decode."""
    import ray.data as rd

    from k_gap_ray.functions.multimodal import decode_stage, docs_as_avi
    import pyarrow as pa

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([5, 6, 7],
                                                      pa.int64())}))
    out = decode_stage(docs_as_avi(docs), mode="real").take_all()
    assert len(out) == 3
    for r in out:
        mid = r["media_id"]
        assert r["width"] == 9 + (mid * 3) % 12
        assert r["height"] == 7 + mid % 9
        assert abs(sum(r["feature"]) - 1.0) < 1e-6
