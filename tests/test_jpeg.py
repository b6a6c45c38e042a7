"""Pure-stdlib baseline JPEG codec (functions/jpeg.py): encoder/
decoder roundtrip error bounds, real-libjpeg-file decode (CPython /
IPython test fixtures, skipped when absent on the host), and the
multimodal mode="real" integration."""

import glob
import os

import numpy as np
import pytest

from k_gap_ray.functions.jpeg import decode_jpeg, encode_jpeg


def test_gray_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    img = np.clip(np.cumsum(rng.randn(24, 31) * 3, axis=1) + 128,
                  0, 255).astype(np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(img))
    assert (w, h, c) == (31, 24, 1)
    rmse = np.sqrt(np.mean((px[:, :, 0].astype(float) - img) ** 2))
    assert rmse < 8.0  # lossy, but a broken IDCT/entropy path is >> 8


def test_color_roundtrip_error_bound():
    yy, xx = np.mgrid[0:20, 0:27]
    rgb = np.stack([(yy * 8) % 256, (xx * 7) % 256,
                    ((xx + yy) * 5) % 256], axis=2).astype(np.uint8)
    w, h, c, px = decode_jpeg(encode_jpeg(rgb))
    assert (w, h, c) == (27, 20, 3)
    rmse = np.sqrt(np.mean((px.astype(float) - rgb) ** 2))
    assert rmse < 8.0


def test_flat_image_is_near_exact():
    img = np.full((16, 16), 128, np.uint8)
    _, _, _, px = decode_jpeg(encode_jpeg(img))
    assert np.abs(px[:, :, 0].astype(int) - 128).max() <= 1


def test_progressive_rejected_with_clear_message():
    # minimal SOF2 skeleton: SOI + SOF2 marker
    import struct

    sof2 = (b"\xff\xd8\xff\xc2" + struct.pack(">H", 11)
            + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(sof2)


_HOST_JPEGS = [p for pat in (
    "/usr/lib/python3*/test/test_email/data/python.jpg",
    "/mnt/*/model_tools_env/*/python/install/lib/python3*/test/"
    "test_email/data/python.jpg",
    "/mnt/*/model_tools_env/*/python/install/lib/python3*/site-packages/"
    "IPython/core/tests/2x2.jpg",
) for p in glob.glob(pat)]


@pytest.mark.skipif(not _HOST_JPEGS,
                    reason="no libjpeg-produced fixtures on this host")
def test_decodes_real_libjpeg_files():
    """Ground-truth check against files produced by a real encoder
    (the CPython/IPython test JPEGs): the decoder must parse the
    markers, consume the entropy stream to completion — python.jpg is
    4:2:0, so chroma upsampling is exercised — and produce in-range
    pixels at the SOF dimensions."""
    for p in _HOST_JPEGS:
        data = open(p, "rb").read()
        w, h, c, px = decode_jpeg(data)
        assert px.shape == (h, w, c)
        assert 1 <= w <= 4096 and 1 <= h <= 4096
        if os.path.basename(p) == "2x2.jpg":
            assert (w, h) == (2, 2)
        if os.path.basename(p) == "python.jpg":
            assert (w, h, c) == (16, 16, 3)
            assert px.std() > 10  # real content, not a flat decode


def test_multimodal_real_jpeg_geometry(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.functions.multimodal import decode_stage, docs_as_jpeg

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([0, 7, 123, 999],
                                                      pa.int64())}))
    out = {r["media_id"]: r for r in
           decode_stage(docs_as_jpeg(docs), mode="real").take_all()}
    for mid in (0, 7, 123, 999):
        assert out[mid]["width"] == 8 + mid % 25
        assert out[mid]["height"] == 8 + (mid // 5) % 21


def test_resize_real_png_and_jpeg(ray_session):
    """resize mode='real' decodes, box-resamples and re-encodes in the
    same format; decoding the output yields the target geometry."""
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.functions.multimodal import (MEDIA, docs_as_jpeg,
                                                docs_as_png, resize_stage)
    from k_gap_ray.functions.png import decode_png

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([3, 44], pa.int64())}))
    for maker, decoder in ((docs_as_jpeg, decode_jpeg),
                           (docs_as_png, decode_png)):
        out = resize_stage(maker(docs), target_w=12, target_h=9,
                           mode="real").take_all()
        assert len(out) == 2
        for r in out:
            w, h, _c, _px = decoder(r["payload"])
            assert (w, h) == (12, 9)


def test_frame_sample_real_mjpeg(ray_session):
    """frame sampling mode='real' splits an MJPEG stream (concatenated
    JFIF frames) and each sampled payload decodes at its frame size."""
    import pyarrow as pa
    import ray.data as rd

    from k_gap_ray.functions.multimodal import (MEDIA, frame_sample_stage,
                                                mjpeg_join)

    frames = []
    for k in range(10):  # 10 frames, each its own size (k decodes back)
        img = np.full((8 + k, 10), 60 + 10 * k, np.uint8)
        frames.append(encode_jpeg(img))
    media = pa.Table.from_pylist([{
        "media_id": 1, "payload": mjpeg_join(frames),
        "mime": "video/x-motion-jpeg", "source_url": "urn:v:1"}],
        schema=MEDIA)
    out = frame_sample_stage(rd.from_arrow(media), n_frames=4,
                             mode="real").take_all()
    assert len(out) == 4
    idxs = sorted(r["frame_idx"] for r in out)
    assert idxs == [0, 2, 5, 7]  # evenly spaced over 10
    for r in out:
        w, h, c, _px = decode_jpeg(r["payload"])
        assert (w, h, c) == (10, 8 + r["frame_idx"], 1)
    # non-MJPEG payloads keep the explicit ffmpeg slot
    import pytest as _pt

    bad = pa.Table.from_pylist([{
        "media_id": 2, "payload": b"\x00\x01\x02" * 50,
        "mime": "video/mp4", "source_url": "urn:v:2"}], schema=MEDIA)
    with _pt.raises(Exception, match="ffmpeg"):
        frame_sample_stage(rd.from_arrow(bad), n_frames=2,
                           mode="real").take_all()
