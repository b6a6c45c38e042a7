"""Pure-stdlib WAV codec (functions/wav.py) and the real multimodal
decode path it unlocks (mode='real' for audio/wav)."""

import io
import struct
import wave

import numpy as np
import pytest

from k_gap_ray.functions.wav import decode_wav, encode_wav


@pytest.mark.parametrize("channels", [1, 2, 3])
def test_wav_roundtrip(channels):
    rng = np.random.RandomState(channels)
    fr = rng.randint(-32768, 32768, size=(137, channels)).astype(np.int16)
    sr, c, out = decode_wav(encode_wav(fr, 16000))
    assert (sr, c) == (16000, channels)
    assert (out == fr).all()


def test_wav_mono_1d_input():
    fr = np.array([0, 1, -1, 32767, -32768], np.int16)
    sr, c, out = decode_wav(encode_wav(fr, 8000))
    assert (sr, c) == (8000, 1)
    assert (out.ravel() == fr).all()


def test_wav_deterministic():
    fr = np.arange(-64, 64, dtype=np.int16).reshape(-1, 2)
    assert encode_wav(fr, 22050) == encode_wav(fr.copy(), 22050)


def test_wav_stdlib_interop():
    """Our encoder's bytes parse with stdlib `wave`, and wave-written
    bytes parse with our decoder — byte-level cross-validation against
    an independent implementation."""
    fr = np.arange(-50, 50, dtype=np.int16).reshape(-1, 2)
    w = wave.open(io.BytesIO(encode_wav(fr, 8000)))
    assert (w.getnchannels(), w.getframerate(), w.getsampwidth(),
            w.getnframes()) == (2, 8000, 2, 50)
    assert np.frombuffer(w.readframes(50), "<i2").reshape(-1, 2).tolist() \
        == fr.tolist()

    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(1)
    ww.setsampwidth(2)
    ww.setframerate(44100)
    ww.writeframes(np.array([1, -1, 32767, -32768], np.int16).tobytes())
    ww.close()
    sr, c, out = decode_wav(buf.getvalue())
    assert (sr, c) == (44100, 1)
    assert out.ravel().tolist() == [1, -1, 32767, -32768]


def test_wav_decode_8bit_pcm():
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 2, 2, 8)
    payload = (b"RIFF" + struct.pack("<I", 40) + b"WAVE"
               + b"fmt " + struct.pack("<I", 16) + fmt
               + b"data" + struct.pack("<I", 4) + bytes([128, 129, 0, 255]))
    sr, c, out = decode_wav(payload)
    assert (sr, c) == (8000, 2)
    assert out.tolist() == [[0, 256], [-32768, 32512]]


def test_wav_skips_foreign_chunks():
    good = encode_wav(np.array([[5], [6]], np.int16), 8000)
    head, data_chunk = good[:36], good[36:]
    listed = (head + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
              + data_chunk)
    _sr, _c, out = decode_wav(listed)
    assert out.ravel().tolist() == [5, 6]


def test_wav_error_paths():
    good = encode_wav(np.zeros((4, 1), np.int16), 8000)
    with pytest.raises(ValueError, match="signature"):
        decode_wav(b"not a wav")
    with pytest.raises(ValueError, match="fmt"):
        decode_wav(good[:20])  # truncated inside the fmt chunk
    # non-PCM format tag is rejected, not mis-decoded
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    bad = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bad)
    # 24-bit depth is rejected
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
    bad = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", 3) + b"\x00\x00\x00")
    with pytest.raises(ValueError, match="bit depth"):
        decode_wav(bad)


def test_real_decode_stage_wav(ray_session):
    """mode='real' actually decodes WAV payloads inside the actor
    pool: channel/frame counts match the docs_as_wav generator
    formulas and the amplitude histogram matches the known ramp
    content."""
    import ray.data as rd

    from k_gap_ray.functions.multimodal import decode_stage, docs_as_wav

    ids = [0, 1, 7, 192, 4001]
    docs = rd.from_items([{"doc_id": i} for i in ids])
    out = {r["media_id"]: r
           for r in decode_stage(docs_as_wav(docs), mode="real").take_all()}
    assert set(out) == set(ids)
    for mid, r in out.items():
        c, n = 1 + mid % 2, 64 + mid % 193
        assert r["width"] == c  # channels
        assert r["height"] == n  # frames
        i = np.arange(n, dtype=np.int64)[:, None]
        ch = np.arange(c, dtype=np.int64)[None, :]
        frames = (((mid * 31 + i * 7 + ch * 11) % 4001) - 2000)
        hist, _ = np.histogram(frames.astype(np.float32), bins=16,
                               range=(-32768.0, 32768.0))
        np.testing.assert_allclose(
            np.asarray(r["feature"], dtype=np.float32),
            hist.astype(np.float32) / frames.size, rtol=1e-6)


def test_real_decode_stage_mixed_png_wav(ray_session):
    """One actor pool handles a mixed-mime corpus: PNG rows decode via
    functions/png.py, WAV rows via functions/wav.py, in the same
    stage."""
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.functions.multimodal import MEDIA, decode_stage
    from k_gap_ray.functions.png import encode_png

    rows = [
        {"media_id": 1,
         "payload": encode_png(np.full((3, 5), 9, np.uint8)),
         "mime": "image/png", "source_url": "urn:m:1"},
        {"media_id": 2,
         "payload": encode_wav(np.zeros((40, 2), np.int16), 8000),
         "mime": "audio/wav", "source_url": "urn:m:2"},
    ]
    media = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA))
    out = {r["media_id"]: r
           for r in decode_stage(media, mode="real").take_all()}
    assert (out[1]["width"], out[1]["height"]) == (5, 3)
    assert (out[2]["width"], out[2]["height"]) == (2, 40)
