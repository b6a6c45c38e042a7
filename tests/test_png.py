"""Pure-stdlib PNG codec (functions/png.py) and the real multimodal
decode path it unlocks (mode='real' for image/png)."""

import struct
import zlib

import numpy as np
import pytest

from k_gap_ray.functions.png import _SIG, _chunk, decode_png, encode_png


@pytest.mark.parametrize("shape", [(5, 7), (4, 6, 3), (3, 3, 4),
                                   (1, 1), (2, 2, 2), (20, 32, 3)])
def test_png_roundtrip(shape):
    rng = np.random.RandomState(42)
    px = rng.randint(0, 256, size=shape).astype(np.uint8)
    w, h, c, out = decode_png(encode_png(px))
    exp = px[:, :, None] if px.ndim == 2 else px
    assert (w, h, c) == (exp.shape[1], exp.shape[0], exp.shape[2])
    assert (out == exp).all()


def test_png_deterministic():
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert encode_png(px) == encode_png(px.copy())


def _build_filtered(px: np.ndarray, ftype: int) -> bytes:
    """Hand-encode with a non-zero predictor filter on every scanline
    (our encoder only ever writes filter 0) — exercises the decoder's
    Sub/Up/Average/Paeth paths on a foreign PNG."""
    h, w, c = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6, 2: 4}[c],
                       0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * c, np.int64)
    for y in range(h):
        line = px[y].reshape(-1).astype(np.int64)
        raw.append(ftype)
        enc = line.copy()
        for x in range(len(line)):
            a = int(line[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa_ <= pb and pa_ <= pcc else (
                    b if pb <= pcc else cc)
            enc[x] = (line[x] - pred) & 0xFF
        raw += bytes(enc.astype(np.uint8))
        prev = line
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_decode_foreign_filters(ftype):
    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(6, 5, 3)).astype(np.uint8)
    w, h, c, out = decode_png(_build_filtered(px, ftype))
    assert (w, h, c) == (5, 6, 3)
    assert (out == px).all()


def test_png_error_paths():
    px = np.zeros((2, 2), np.uint8)
    good = encode_png(px)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    corrupted = bytearray(good)
    corrupted[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))
    # 16-bit depth is rejected, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    deep = _SIG + _chunk(b"IHDR", ihdr) + _chunk(
        b"IDAT", zlib.compress(b"\x00" * 10)) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="depth"):
        decode_png(deep)


def test_real_decode_stage(ray_session):
    """mode='real' actually decodes PNG payloads inside the actor
    pool: geometry matches the docs_as_png generator formulas and the
    histogram feature matches the known row-gradient content."""
    import ray.data as rd

    from k_gap_ray.functions.multimodal import decode_stage, docs_as_png

    docs = rd.from_items([{"doc_id": i} for i in [0, 5, 29, 200, 1234]])
    out = {r["media_id"]: r
           for r in decode_stage(docs_as_png(docs), mode="real").take_all()}
    assert set(out) == {0, 5, 29, 200, 1234}
    for mid, r in out.items():
        assert r["width"] == 4 + mid % 29
        assert r["height"] == 4 + (mid // 7) % 17
        # row r is filled with (mid + r) % 256: recompute the 16-bin
        # histogram feature
        h, w = r["height"], r["width"]
        gray = ((mid + np.arange(h)) % 256).astype(np.float32)
        hist, _ = np.histogram(np.repeat(gray, w), bins=16,
                               range=(0.0, 256.0))
        np.testing.assert_allclose(
            np.asarray(r["feature"], dtype=np.float32),
            hist.astype(np.float32) / (h * w), rtol=1e-6)


def test_real_decode_non_png_still_raises(ray_session):
    import ray.data as rd

    from k_gap_ray.functions.multimodal import decode_stage, synth_media

    media = rd.from_arrow(synth_media(3))  # jpeg/png/wav fakes
    with pytest.raises(Exception):
        decode_stage(media, mode="real").materialize()
