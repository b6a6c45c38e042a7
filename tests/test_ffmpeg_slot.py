"""ffmpeg-when-present video decode (round-4 verdict item 4): the
`mode="real"` inter-frame-codec slot must USE an ffmpeg binary when one
is on PATH and raise NotImplementedError only when it is genuinely
absent. The container has no ffmpeg, so the plumbing is driven with a
fake `ffmpeg` executable that emits known bytes — proving the
subprocess contract (stdin payload, stdout image stream, arg shape)
without the codec itself — plus real-binary tests that auto-skip."""

import shutil
import stat

import numpy as np
import pytest

from k_gap_ray.functions import multimodal as mm

HAVE_FFMPEG = shutil.which("ffmpeg") is not None


def _fake_ffmpeg(tmp_path, out_file):
    """A stand-in ffmpeg: drains stdin, cats a prepared file to
    stdout (the shape of `ffmpeg -i pipe:0 ... pipe:1`)."""
    script = tmp_path / "ffmpeg"
    script.write_text(
        f"#!/bin/sh\ncat > /dev/null\ncat {out_file}\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return str(script)


@pytest.fixture(autouse=True)
def _reset_ffmpeg_cache():
    mm._FFMPEG_CACHE.clear()
    yield
    mm._FFMPEG_CACHE.clear()


def test_decoder_uses_ffmpeg_from_path(tmp_path, monkeypatch):
    # fake ffmpeg emits an 8x5 PGM (P5) with constant gray 7
    pgm = tmp_path / "frame.pgm"
    pgm.write_bytes(b"P5\n8 5\n255\n" + bytes([7] * 40))
    monkeypatch.setattr(mm, "_ffmpeg_bin",
                        lambda: _fake_ffmpeg(tmp_path, pgm))
    dec = mm.MediaDecoder(mode="real")
    w, h, feat = dec._decode_real(b"\x00\x00\x00\x01fake-h264",
                                  "video/h264")
    assert (w, h) == (8, 5)
    assert feat.shape == (mm.MediaDecoder.FEATURE_DIM,)
    assert feat.sum() == pytest.approx(1.0)


def test_decoder_raises_only_without_ffmpeg(monkeypatch):
    monkeypatch.setattr(mm, "_ffmpeg_bin", lambda: None)
    dec = mm.MediaDecoder(mode="real")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        dec._decode_real(b"\x00\x00\x00\x01fake-h264", "video/h264")


def test_frame_sampler_uses_ffmpeg_from_path(tmp_path, monkeypatch):
    from k_gap_ray.functions.jpeg import encode_jpeg

    # fake ffmpeg emits a 3-frame MJPEG stream (image2pipe/mjpeg shape)
    frames = [encode_jpeg(np.full((8, 8, 3), 40 * (i + 1), np.uint8))
              for i in range(3)]
    mjpeg = tmp_path / "frames.mjpeg"
    mjpeg.write_bytes(b"".join(frames))
    monkeypatch.setattr(mm, "_ffmpeg_bin",
                        lambda: _fake_ffmpeg(tmp_path, mjpeg))
    fs = mm.FrameSampler(n_frames=2, mode="real")
    out = fs._frames_real(b"\x1aE\xdf\xa3fake-webm-vp9")
    assert len(out) == 2
    idxs = [o[0] for o in out]
    assert idxs == sorted(set(idxs))
    for _idx, _ts, fp in out:
        assert fp[:2] == b"\xff\xd8" and fp[-2:] == b"\xff\xd9"


def test_frame_sampler_raises_only_without_ffmpeg(monkeypatch):
    monkeypatch.setattr(mm, "_ffmpeg_bin", lambda: None)
    fs = mm.FrameSampler(n_frames=2, mode="real")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        fs._frames_real(b"\x1aE\xdf\xa3fake-webm-vp9")


@pytest.mark.skipif(not HAVE_FFMPEG, reason="ffmpeg not installed")
def test_real_ffmpeg_decodes_h264():  # pragma: no cover - needs ffmpeg
    import subprocess

    # synthesize a tiny h264 mp4 with the real binary, then decode it
    enc = subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi", "-i",
         "testsrc=size=64x48:rate=5:duration=1", "-c:v", "libx264",
         "-f", "mp4", "-movflags", "frag_keyframe+empty_moov", "pipe:1"],
        capture_output=True, check=True)
    dec = mm.MediaDecoder(mode="real")
    w, h, feat = dec._decode_real(enc.stdout, "video/h264")
    assert (w, h) == (64, 48)
    assert feat.sum() == pytest.approx(1.0)
