"""GIF codec (functions/gif.py): real variable-width LZW round-trips
in both encoder modes, the decoder paths a degenerate stream never
exercises (width bumps, KwKwK, the 4096-entry dictionary reset,
multi-sub-block data, 89a extension skipping), and the media-stage
pixel-sum contract."""
import numpy as np
import pyarrow as pa
import pytest


@pytest.mark.parametrize("kind,h,w", [
    ("rand", 5, 7), ("rand", 40, 60), ("rand", 1, 1),
    ("runs", 80, 90), ("grad", 64, 64)])
@pytest.mark.parametrize("clear_interval", [252, None])
def test_gif_roundtrip(kind, h, w, clear_interval):
    from k_gap_ray.functions.gif import decode_gif, encode_gif

    rng = np.random.RandomState(h * 100 + w)
    if kind == "rand":
        img = rng.randint(0, 256, (h, w)).astype(np.uint8)
    elif kind == "runs":
        img = np.repeat(rng.randint(0, 4, (h, w // 10 + 1)), 10,
                        axis=1)[:, :w].astype(np.uint8)
    else:
        img = ((np.arange(h)[:, None] + np.arange(w)[None, :]) % 256
               ).astype(np.uint8)
    data = encode_gif(img, clear_interval=clear_interval)
    dw, dh, idx, gray = decode_gif(data)
    assert (dw, dh) == (w, h)
    assert np.array_equal(idx, img)
    assert np.array_equal(gray, img)     # grayscale palette identity


def test_gif_deep_dictionary_and_reset():
    """A big random image grows the decoder through every width bump
    (9->12) and across the 4096-entry reset; a run-heavy image walks
    the KwKwK self-reference path. Grow mode must also COMPRESS runs
    (the clear-heavy mode cannot)."""
    from k_gap_ray.functions.gif import decode_gif, encode_gif

    rng = np.random.RandomState(9)
    big = rng.randint(0, 256, (200, 220)).astype(np.uint8)
    data = encode_gif(big, clear_interval=None)
    _, _, idx, _ = decode_gif(data)
    assert np.array_equal(idx, big)

    runs = np.repeat(rng.randint(0, 3, (150, 40)), 8,
                     axis=1)[:, :300].astype(np.uint8)
    grown = encode_gif(runs, clear_interval=None)
    degen = encode_gif(runs, clear_interval=252)
    _, _, idx2, _ = decode_gif(grown)
    assert np.array_equal(idx2, runs)
    assert len(grown) < len(degen) // 2


def test_gif_89a_extension_skipping():
    """An 89a graphics-control extension spliced before the image
    descriptor is skipped; the bitmap decodes identically."""
    from k_gap_ray.functions.gif import decode_gif, encode_gif

    img = (np.arange(35, dtype=np.int64) % 256).reshape(5, 7) \
        .astype(np.uint8)
    data = bytearray(encode_gif(img))
    data[3:6] = b"89a"
    # image descriptor sits structurally after header(13) + GCT(768)
    # (searching for 0x2C finds palette bytes first)
    sep = 13 + 256 * 3
    assert data[sep] == 0x2C
    ext = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0])
    data[sep:sep] = ext
    w, h, idx, _ = decode_gif(bytes(data))
    assert (w, h) == (7, 5)
    assert np.array_equal(idx, img)


def test_gif_media_stage_pixel_sums(ray_session):
    """The media-stage contract end-to-end on a tiny docs slice: the
    decoded px_sum equals the synthesis closed form."""
    import ray.data as rd

    from k_gap_ray.functions.multimodal import docs_as_gif, gif_px_stats

    docs = pa.table({"doc_id": pa.array([0, 1, 44, 137], pa.int64())})
    got = {r["media_id"]: r for r in
           gif_px_stats(docs_as_gif(rd.from_arrow(docs))).take_all()}
    for mid in (0, 1, 44, 137):
        w = 6 + mid % 23
        h = 5 + (mid // 3) % 13
        want = int(((mid * 7 + np.arange(h * w, dtype=np.int64) * 13)
                    % 256).sum())
        assert got[mid]["width"] == w
        assert got[mid]["height"] == h
        assert got[mid]["px_sum"] == want


def test_gif_animated_roundtrip_and_frame_stage(ray_session):
    """Animated GIF89a: every frame round-trips through its own LZW
    stream with graphics-control extensions between image blocks;
    decode_gif (single-frame API) still returns frame 0; the frame
    stage emits one verified row per frame."""
    import ray.data as rd

    from k_gap_ray.functions.gif import (decode_gif, decode_gif_frames,
                                         encode_gif_animated)
    from k_gap_ray.functions.multimodal import (docs_as_gif_anim,
                                                gif_frame_stats)

    rng = np.random.RandomState(4)
    frames = [rng.randint(0, 256, (9, 11)).astype(np.uint8)
              for _ in range(4)]
    data = encode_gif_animated(frames)
    w, h, got = decode_gif_frames(data)
    assert (w, h) == (11, 9) and len(got) == 4
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)
    _, _, first, _ = decode_gif(data)
    assert np.array_equal(first, frames[0])

    docs = pa.table({"doc_id": pa.array([3, 10], pa.int64())})
    rows = gif_frame_stats(docs_as_gif_anim(
        rd.from_arrow(docs))).take_all()
    by = {(r["media_id"], r["frame_idx"]): r for r in rows}
    assert len([k for k in by if k[0] == 3]) == 2 + 3 % 4
    mid, fr = 10, 1
    w = 6 + mid % 17
    h = 4 + mid % 9
    i = np.arange(h * w, dtype=np.int64)
    assert by[(mid, fr)]["px_sum"] == int(((mid * 7 + fr * 29 + i * 13)
                                           % 256).sum())
