"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns processed by actor-pool
map_batches stages with SMALL batch sizes (a batch x concurrency of
multi-MB payloads must fit the worker heap — guide: memory-aware
sizing). The heavyweight decode libraries (PIL/ffmpeg/torchaudio) are
NOT in this container; ``mode="real"`` decodes image/png, image/jpeg,
audio/wav and video in MJPEG / AVI-MJPG / MP4-jpeg form through the
repo's pure-stdlib codecs (functions/png.py, functions/jpeg.py — a
full baseline JFIF decoder incl. 4:2:0 subsampling and restart
markers — functions/wav.py, functions/riffavi.py for the RIFF/AVI
container, and functions/isobmff.py for ISO BMFF/MP4 sample tables);
WebM gets a real CONTAINER walk (functions/ebml.py — geometry, block
framing, timestamps) with its VP8/VP9 pixel payloads left coded.
Inter-frame codecs (h264/hevc/vp9) route through an ffmpeg binary
WHEN ONE IS ON PATH (`_ffmpeg_bin`; subprocess over stdin/stdout, one
process per call inside the actor) and raise NotImplementedError only
when ffmpeg is genuinely absent — the exact call site the library
would occupy, with the pure-Python container/codec paths always tried
first. ``mode="fake"`` remains the deterministic byte-level
pseudo-decoder. Schemas, batch sizing, actor signatures and output
layout are real and tested (tests/test_ffmpeg_slot.py drives the
subprocess contract with a stand-in binary; real-ffmpeg tests
auto-skip when absent).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_FFMPEG_CACHE: dict = {}


def _ffmpeg_bin() -> str | None:
    """Path of the ffmpeg binary, or None — resolved once per process
    (each decode actor probes PATH a single time)."""
    if "bin" not in _FFMPEG_CACHE:
        import shutil

        _FFMPEG_CACHE["bin"] = shutil.which("ffmpeg")
    return _FFMPEG_CACHE["bin"]


def _ffmpeg_first_frame_gray(payload: bytes):
    """Decode the first video frame to grayscale via ffmpeg ->
    (width, height, uint8 ndarray). PGM output (image2pipe/pgm) so the
    geometry rides the stream header — no separate ffprobe pass."""
    import subprocess

    bin_ = _ffmpeg_bin()
    out = subprocess.run(
        [bin_, "-v", "error", "-i", "pipe:0", "-frames:v", "1",
         "-vcodec", "pgm", "-f", "image2pipe", "pipe:1"],
        input=payload, capture_output=True, check=True).stdout
    if out[:2] != b"P5":
        raise ValueError("ffmpeg did not emit a PGM frame")
    parts, pos = [], 2
    while len(parts) < 3:  # width, height, maxval tokens
        while pos < len(out) and out[pos:pos + 1].isspace():
            pos += 1
        if out[pos:pos + 1] == b"#":  # comment line
            pos = out.index(b"\n", pos) + 1
            continue
        tok = pos
        while pos < len(out) and not out[pos:pos + 1].isspace():
            pos += 1
        parts.append(int(out[tok:pos]))
    w, h, _maxval = parts
    px = np.frombuffer(out[pos + 1:pos + 1 + w * h], np.uint8)
    return w, h, px.reshape(h, w)


def _ffmpeg_mjpeg_frames(payload: bytes) -> list[bytes]:
    """Transcode every video frame to an MJPEG stream via ffmpeg and
    split it into standalone JFIF frames (same downstream contract as
    the pure-Python container walks: each frame decodable by
    functions/jpeg.py)."""
    import subprocess

    bin_ = _ffmpeg_bin()
    out = subprocess.run(
        [bin_, "-v", "error", "-i", "pipe:0", "-vcodec", "mjpeg",
         "-q:v", "3", "-f", "image2pipe", "pipe:1"],
        input=payload, capture_output=True, check=True).stdout
    return mjpeg_split(out)

MEDIA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("mime", pa.string()),
        pa.field("source_url", pa.string()),
    ]
)

MEDIA_FEATURES = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("mime", pa.string()),
        pa.field("n_bytes", pa.int64()),
        pa.field("sha256", pa.string()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("feature", pa.list_(pa.float32())),
    ]
)

# mode="stat" output: pure integer byte statistics, SQL-expressible —
# the oracle-verified slice of the decode stage (same actor plumbing)
MEDIA_STATS = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("mime", pa.string()),
        pa.field("n_bytes", pa.int64()),
        pa.field("byte_sum", pa.int64()),
        pa.field("width", pa.int64()),
        pa.field("height", pa.int64()),
    ]
)


def docs_as_media(docs_ds):
    """documents -> MEDIA-shaped table: payload = utf-8 text bytes.

    Gives the binary-column plumbing a corpus whose 'decoded' byte
    statistics a SQL oracle can recompute from the text column."""

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t.column("doc_id")
        mimes = pc.binary_join_element_wise(
            pa.array(["media"] * t.num_rows),
            pc.cast(pc.subtract(ids, pc.multiply(
                pc.divide(ids, 3), 3)), pa.string()), "/")
        return pa.table({
            "media_id": ids,
            "payload": pc.cast(t.column("text"), pa.binary()),
            "mime": mimes,
            "source_url": pc.binary_join_element_wise(
                pa.array(["urn:doc:"] * t.num_rows),
                pc.cast(ids, pa.string()), ""),
        })

    return docs_ds.map_batches(f, batch_format="pyarrow",
                               zero_copy_batch=True)


def docs_as_png(docs_ds):
    """documents -> MEDIA table of real PNG payloads with
    deterministic geometry and content per doc_id (width 4+id%29,
    height 4+(id//7)%17, row r filled with (id+r)%256), so a SQL
    oracle can predict the DECODED width/height from the documents
    table while the engine actually round-trips zlib+chunk+filter
    bytes (functions/png.py)."""
    from k_gap_ray.functions.png import encode_png

    def f(t: pa.Table) -> pa.Table:
        rows = []
        for mid in t.column("doc_id").to_pylist():
            w = 4 + mid % 29
            h = 4 + (mid // 7) % 17
            px = ((mid + np.arange(h, dtype=np.int64)) % 256)[:, None] \
                * np.ones((1, w), np.int64)
            rows.append({
                "media_id": mid,
                "payload": encode_png(px.astype(np.uint8)),
                "mime": "image/png",
                "source_url": f"urn:png:{mid}",
            })
        return pa.Table.from_pylist(rows, schema=MEDIA)

    return docs_ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def docs_as_gif(docs_ds):
    """documents -> MEDIA table of real GIF87a payloads with
    deterministic geometry AND pixel content per doc_id (width
    6+id%23, height 5+(id//3)%13, pixel i = (id*7 + i*13) % 256 in
    row-major order over a grayscale palette), so a SQL oracle can
    predict not just the decoded dimensions but the exact PIXEL SUM
    via a generate_series closed form, while the engine round-trips a
    real variable-width LZW stream (functions/gif.py)."""
    from k_gap_ray.functions.gif import encode_gif

    def f(t: pa.Table) -> pa.Table:
        rows = []
        for mid in t.column("doc_id").to_pylist():
            w = 6 + mid % 23
            h = 5 + (mid // 3) % 13
            i = np.arange(h * w, dtype=np.int64)
            px = ((mid * 7 + i * 13) % 256).reshape(h, w)
            rows.append({
                "media_id": mid,
                "payload": encode_gif(px.astype(np.uint8),
                                      clear_interval=None),
                "mime": "image/gif",
                "source_url": f"urn:gif:{mid}",
            })
        return pa.Table.from_pylist(rows, schema=MEDIA)

    return docs_ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def gif_px_stats(media_ds, concurrency=(1, 4), batch_size: int = 64):
    """Actor-pool GIF decode emitting verifiable pixel evidence:
    (media_id, width, height, px_sum) — px_sum is the int64 sum of
    the decoded palette indices, so a value-hash oracle checks the
    ENTIRE decoded bitmap, not just the header geometry (a stricter
    contract than the PNG/JPEG dimension checks)."""
    from k_gap_ray.functions.gif import decode_gif

    class GifStats:
        def __call__(self, t: pa.Table) -> pa.Table:
            ids, ws, hs, sums = [], [], [], []
            for mid, payload in zip(t.column("media_id").to_pylist(),
                                    t.column("payload").to_pylist()):
                w, h, idx, _gray = decode_gif(payload)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                sums.append(int(idx.astype(np.int64).sum()))
            return pa.table({
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "px_sum": pa.array(sums, pa.int64())})

    return media_ds.map_batches(GifStats, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency)


def docs_as_gif_anim(docs_ds):
    """documents -> MEDIA table of ANIMATED GIF89a payloads:
    2 + id%4 frames of width 6+id%17 x height 4+id%9, frame f pixel
    i = (id*7 + f*29 + i*13) % 256 — per-frame closed forms a SQL
    oracle can verify after a real multi-image LZW decode."""
    from k_gap_ray.functions.gif import encode_gif_animated

    def f(t: pa.Table) -> pa.Table:
        rows = []
        for mid in t.column("doc_id").to_pylist():
            w = 6 + mid % 17
            h = 4 + mid % 9
            i = np.arange(h * w, dtype=np.int64)
            frames = [((mid * 7 + fr * 29 + i * 13) % 256)
                      .reshape(h, w).astype(np.uint8)
                      for fr in range(2 + mid % 4)]
            rows.append({
                "media_id": mid,
                "payload": encode_gif_animated(frames),
                "mime": "image/gif",
                "source_url": f"urn:gif-anim:{mid}",
            })
        return pa.Table.from_pylist(rows, schema=MEDIA)

    return docs_ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def gif_frame_stats(media_ds, concurrency=(1, 4), batch_size: int = 64):
    """Actor-pool animated-GIF decode: one row per frame with
    (media_id, frame_idx, width, height, px_sum) — every frame's
    bitmap verified, the animation analogue of the AVI/MP4 frame
    tables."""
    from k_gap_ray.functions.gif import decode_gif_frames

    class GifFrames:
        def __call__(self, t: pa.Table) -> pa.Table:
            ids, fids, ws, hs, sums = [], [], [], [], []
            for mid, payload in zip(t.column("media_id").to_pylist(),
                                    t.column("payload").to_pylist()):
                w, h, frames = decode_gif_frames(payload)
                for fi, fr in enumerate(frames):
                    ids.append(mid)
                    fids.append(fi)
                    ws.append(w)
                    hs.append(h)
                    sums.append(int(fr.astype(np.int64).sum()))
            return pa.table({
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fids, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "px_sum": pa.array(sums, pa.int64())})

    return media_ds.map_batches(GifFrames, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency)


def docs_as_jpeg(docs_ds):
    """documents -> MEDIA table of real baseline JPEG payloads with
    deterministic geometry per doc_id (width 8+id%25, height
    8+(id//5)%21, smooth diagonal gradient content), so a SQL oracle
    predicts the DECODED width/height while the engine exercises the
    full marker/Huffman/dequant/IDCT path (functions/jpeg.py)."""
    from k_gap_ray.functions.jpeg import encode_jpeg

    def f(t: pa.Table) -> pa.Table:
        rows = []
        for mid in t.column("doc_id").to_pylist():
            w = 8 + mid % 25
            h = 8 + (mid // 5) % 21
            yy, xx = np.mgrid[0:h, 0:w]
            px = ((yy * 5 + xx * 3 + mid) % 256).astype(np.uint8)
            rows.append({
                "media_id": mid,
                "payload": encode_jpeg(px),
                "mime": "image/jpeg",
                "source_url": f"urn:jpeg:{mid}",
            })
        return pa.Table.from_pylist(rows, schema=MEDIA)

    return docs_ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def docs_as_mjpeg(docs_ds):
    """documents -> MEDIA table of real MJPEG streams (concatenated
    baseline-JPEG frames) with deterministic per-frame geometry:
    doc_id has 3+id%4 frames; frame k is (8+(id+k)%13) x
    (6+(id*2+k)%11) flat gray — so a SQL oracle predicts which frames
    an even sampler picks AND their decoded dimensions."""
    from k_gap_ray.functions.jpeg import encode_jpeg

    def f(t: pa.Table) -> pa.Table:
        rows = []
        for mid in t.column("doc_id").to_pylist():
            frames = []
            for k in range(3 + mid % 4):
                w = 8 + (mid + k) % 13
                h = 6 + (mid * 2 + k) % 11
                frames.append(encode_jpeg(np.full(
                    (h, w), (mid * 3 + k * 17) % 256, np.uint8)))
            rows.append({
                "media_id": mid,
                "payload": mjpeg_join(frames),
                "mime": "video/x-motion-jpeg",
                "source_url": f"urn:mjpeg:{mid}",
            })
        return pa.Table.from_pylist(rows, schema=MEDIA)

    return docs_ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def docs_as_avi(docs_ds):
    """documents -> MEDIA table of real AVI (RIFF) containers holding
    an MJPG video stream (functions/riffavi.py), with deterministic
    per-frame geometry: doc_id has 2+id%3 frames at 10+id%5 fps;
    frame k is (9+(id*3+k)%12) x (7+(id+2*k)%9) flat gray — so a SQL
    oracle predicts which frames an even sampler picks AND their
    decoded dimensions, while the engine really walks RIFF chunk
    headers and Huffman-decodes the picked frames."""
    from k_gap_ray.functions.jpeg import encode_jpeg
    from k_gap_ray.functions.riffavi import encode_avi

    def f(t: pa.Table) -> pa.Table:
        rows = []
        for mid in t.column("doc_id").to_pylist():
            frames = []
            for k in range(2 + mid % 3):
                w = 9 + (mid * 3 + k) % 12
                h = 7 + (mid + 2 * k) % 9
                frames.append(encode_jpeg(np.full(
                    (h, w), (mid * 7 + k * 29) % 256, np.uint8)))
            rows.append({
                "media_id": mid,
                "payload": encode_avi(frames, 9 + (mid * 3) % 12,
                                      7 + mid % 9, fps=10 + mid % 5),
                "mime": "video/x-msvideo",
                "source_url": f"urn:avi:{mid}",
            })
        return pa.Table.from_pylist(rows, schema=MEDIA)

    return docs_ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def docs_as_mp4(docs_ds):
    """documents -> MEDIA table of real ISO BMFF (MP4) containers
    holding a jpeg-coded video track (functions/isobmff.py), with
    deterministic per-frame geometry: doc_id has 2+(id+1)%3 frames at
    12+id%4 fps; frame k is (8+(id*5+k)%13) x (6+(id*3+k)%7) flat
    gray — so a SQL oracle predicts which frames an even sampler
    picks AND their decoded dimensions, while the engine really
    resolves stsd/stsc/stsz/stco sample tables and Huffman-decodes
    the picked frames."""
    from k_gap_ray.functions.isobmff import encode_mp4
    from k_gap_ray.functions.jpeg import encode_jpeg

    def f(t: pa.Table) -> pa.Table:
        rows = []
        for mid in t.column("doc_id").to_pylist():
            frames = []
            for k in range(2 + (mid + 1) % 3):
                w = 8 + (mid * 5 + k) % 13
                h = 6 + (mid * 3 + k) % 7
                frames.append(encode_jpeg(np.full(
                    (h, w), (mid * 13 + k * 37) % 256, np.uint8)))
            rows.append({
                "media_id": mid,
                "payload": encode_mp4(frames, 8 + (mid * 5) % 13,
                                      6 + (mid * 3) % 7,
                                      fps=12 + mid % 4),
                "mime": "video/mp4",
                "source_url": f"urn:mp4:{mid}",
            })
        return pa.Table.from_pylist(rows, schema=MEDIA)

    return docs_ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def docs_as_webm(docs_ds):
    """documents -> MEDIA table of real WebM (EBML/Matroska)
    containers (functions/ebml.py) holding a VP8-slot video track
    with deterministic container metadata: doc_id has 3+id%4 blocks
    at 10+id%6 fps, geometry (64+(id*7)%192) x (48+(id*5)%144);
    block k is a constant-byte payload of length 30+(id+k)%50 — so a
    SQL oracle predicts the PARSED geometry, block count, total block
    bytes and last block timestamp, while the engine really walks
    EBML vints and SimpleBlock framing. The payloads themselves are
    opaque (VP8 pixel decode stays the declared ffmpeg slot)."""
    from k_gap_ray.functions.ebml import encode_webm

    def f(t: pa.Table) -> pa.Table:
        rows = []
        for mid in t.column("doc_id").to_pylist():
            frames = [bytes([(mid * 19 + k * 7) % 256])
                      * (30 + (mid + k) % 50)
                      for k in range(3 + mid % 4)]
            rows.append({
                "media_id": mid,
                "payload": encode_webm(frames, 64 + (mid * 7) % 192,
                                       48 + (mid * 5) % 144,
                                       fps=10 + mid % 6),
                "mime": "video/webm",
                "source_url": f"urn:webm:{mid}",
            })
        return pa.Table.from_pylist(rows, schema=MEDIA)

    return docs_ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def docs_as_wav(docs_ds):
    """documents -> MEDIA table of real WAV payloads with
    deterministic audio parameters per doc_id (channels 1+id%2,
    n_frames 64+id%193, sample_rate 8000+1000*(id%3), sample[i,ch] =
    ((id*31 + i*7 + ch*11) % 4001) - 2000), so a SQL oracle can
    predict the DECODED channel count, frame count and sample sum
    from the documents table while the engine actually round-trips
    RIFF/fmt/data bytes (functions/wav.py)."""
    from k_gap_ray.functions.wav import encode_wav

    def f(t: pa.Table) -> pa.Table:
        rows = []
        for mid in t.column("doc_id").to_pylist():
            c = 1 + mid % 2
            n = 64 + mid % 193
            i = np.arange(n, dtype=np.int64)[:, None]
            ch = np.arange(c, dtype=np.int64)[None, :]
            frames = ((mid * 31 + i * 7 + ch * 11) % 4001) - 2000
            rows.append({
                "media_id": mid,
                "payload": encode_wav(frames.astype(np.int16),
                                      8000 + 1000 * (mid % 3)),
                "mime": "audio/wav",
                "source_url": f"urn:wav:{mid}",
            })
        return pa.Table.from_pylist(rows, schema=MEDIA)

    return docs_ds.map_batches(f, batch_format="pyarrow", batch_size=256)


def synth_media(n: int, seed: int = 7) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rows = []
    for i in range(n):
        h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
        payload = h * (8 + i % 64)  # variable-size opaque bytes
        rows.append({
            "media_id": i,
            "payload": payload,
            "mime": ["image/jpeg", "image/png", "audio/wav"][i % 3],
            "source_url": f"https://media{i % 10}.example/item/{i}",
        })
    return pa.Table.from_pylist(rows, schema=MEDIA)


class MediaDecoder:
    """Actor-pool decode/feature-extract stage.

    __init__ is where a real model/codec would load (once per actor);
    __call__ handles one Arrow batch of payloads.
    """

    FEATURE_DIM = 16

    def __init__(self, mode: str = "fake") -> None:
        if mode not in ("fake", "real", "stat"):
            raise ValueError(mode)
        self.mode = mode

    def _decode_real(self, payload: bytes, mime: str):
        """Real decode for image/png and audio/wav via the repo's
        pure-stdlib codecs (functions/png.py — zlib chunks, all five
        predictor filters; functions/wav.py — RIFF PCM 8/16-bit);
        other codecs still need PIL/ffmpeg, absent in this container,
        and keep the explicit library slot."""
        if mime == "image/png":
            from k_gap_ray.functions.png import decode_png

            w, h, _c, px = decode_png(payload)
            gray = px.astype(np.float32).mean(axis=2)
            hist, _ = np.histogram(gray, bins=self.FEATURE_DIM,
                                   range=(0.0, 256.0))
            feat = hist.astype(np.float32) / max(1, gray.size)
            return w, h, feat
        if mime == "image/gif":
            from k_gap_ray.functions.gif import decode_gif

            w, h, _idx, gray = decode_gif(payload)
            hist, _ = np.histogram(gray.astype(np.float32),
                                   bins=self.FEATURE_DIM,
                                   range=(0.0, 256.0))
            feat = hist.astype(np.float32) / max(1, gray.size)
            return w, h, feat
        if mime == "image/jpeg":
            from k_gap_ray.functions.jpeg import decode_jpeg

            w, h, _c, px = decode_jpeg(payload)
            gray = px.astype(np.float32).mean(axis=2)
            hist, _ = np.histogram(gray, bins=self.FEATURE_DIM,
                                   range=(0.0, 256.0))
            feat = hist.astype(np.float32) / max(1, gray.size)
            return w, h, feat
        if mime == "audio/wav":
            from k_gap_ray.functions.wav import decode_wav

            _sr, channels, frames = decode_wav(payload)
            # width=channels, height=n_frames: the audio analogue of
            # image geometry; feature = amplitude histogram
            hist, _ = np.histogram(frames.astype(np.float32),
                                   bins=self.FEATURE_DIM,
                                   range=(-32768.0, 32768.0))
            feat = hist.astype(np.float32) / max(1, frames.size)
            return channels, frames.shape[0], feat
        if mime in ("video/x-msvideo", "video/avi", "video/mp4",
                    "video/webm"):
            if mime == "video/mp4":
                from k_gap_ray.functions.isobmff import decode_mp4

                meta = decode_mp4(payload)
            elif mime == "video/webm":
                from k_gap_ray.functions.ebml import decode_webm

                meta = decode_webm(payload)
            else:
                from k_gap_ray.functions.riffavi import decode_avi

                meta = decode_avi(payload)
            # width/height from the container header (avih / stsd);
            # feature = the per-frame byte-size histogram (a cheap
            # stream profile that doesn't pay a pixel decode of every
            # frame)
            sizes = np.array([len(f) for f in meta["frames"]],
                             np.float32)
            hi = float(sizes.max()) + 1.0 if sizes.size else 1.0
            hist, _ = np.histogram(sizes, bins=self.FEATURE_DIM,
                                   range=(0.0, hi))
            feat = hist.astype(np.float32) / max(1, sizes.size)
            return meta["width"], meta["height"], feat
        if _ffmpeg_bin() is not None:
            # inter-frame codecs (h264/hevc/vp9 …): first key frame
            # through the system ffmpeg, same gray-histogram feature
            # as the stdlib image paths
            w, h, gray = _ffmpeg_first_frame_gray(payload)
            hist, _ = np.histogram(gray.astype(np.float32),
                                   bins=self.FEATURE_DIM,
                                   range=(0.0, 256.0))
            feat = hist.astype(np.float32) / max(1, gray.size)
            return w, h, feat
        raise NotImplementedError(
            f"real decode of {mime} requires ffmpeg, which is not on "
            "PATH in this container — install it and this call site "
            "routes through _ffmpeg_first_frame_gray automatically "
            "(png/jpeg/gif/wav/avi/mp4 decode via the repo's stdlib "
            "codecs regardless)")

    def _decode_fake(self, payload: bytes, mime: str):
        """Deterministic pseudo-decode: dims + features from the bytes."""
        d = hashlib.sha256(payload).digest()
        width = 16 + d[0] % 240
        height = 16 + d[1] % 240
        feat = (np.frombuffer(d[:self.FEATURE_DIM], dtype=np.uint8)
                .astype(np.float32) / 255.0)
        return width, height, feat

    def _stats_batch(self, batch: pa.Table) -> pa.Table:
        """mode='stat': vectorized byte statistics (no per-row Python).

        width/height are integer functions of the byte sum — same
        values a SQL oracle derives from codepoints for ASCII payloads.
        """
        import pyarrow.compute as pc

        payload = batch.column("payload")
        flat = payload.combine_chunks() if isinstance(payload, pa.ChunkedArray) \
            else payload
        n = len(flat)
        if n == 0:
            return MEDIA_STATS.empty_table()
        off_dtype = np.int64 if pa.types.is_large_binary(flat.type) else np.int32
        offs = np.frombuffer(flat.buffers()[1], dtype=off_dtype)[
            flat.offset:flat.offset + n + 1].astype(np.int64)
        data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
        n_bytes = offs[1:] - offs[:-1]
        csum = np.concatenate(([0], np.cumsum(
            data[offs[0]:offs[-1]].astype(np.int64))))
        byte_sum = csum[offs[1:] - offs[0]] - csum[offs[:-1] - offs[0]]
        width = 16 + byte_sum % 240
        height = 16 + (byte_sum // 240) % 240
        return pa.table({
            "media_id": pc.cast(batch.column("media_id"), pa.int64()),
            "mime": batch.column("mime"),
            "n_bytes": pa.array(n_bytes, pa.int64()),
            "byte_sum": pa.array(byte_sum, pa.int64()),
            "width": pa.array(width, pa.int64()),
            "height": pa.array(height, pa.int64()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "stat":
            return self._stats_batch(batch)
        ids = batch.column("media_id").to_pylist()
        mimes = batch.column("mime").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows: dict[str, list] = {n: [] for n in MEDIA_FEATURES.names}
        for mid, mime, payload in zip(ids, mimes, payloads):
            decode = self._decode_fake if self.mode == "fake" else self._decode_real
            w, h, feat = decode(payload, mime)
            rows["media_id"].append(mid)
            rows["mime"].append(mime)
            rows["n_bytes"].append(len(payload))
            rows["sha256"].append(hashlib.sha256(payload).hexdigest())
            rows["width"].append(w)
            rows["height"].append(h)
            rows["feature"].append([float(x) for x in feat])
        return pa.Table.from_pydict(rows, schema=MEDIA_FEATURES)


def decode_stage(media_ds, mode: str = "fake", concurrency=(1, 4),
                 batch_size: int = 64, num_cpus: float = 1,
                 ray_remote_args: dict | None = None):
    """Binary payloads -> features; small batches by design (wide
    rows). ``ray_remote_args`` (X5): per-stage runtime_env (container
    image / pip deps for a real codec), num_gpus, memory, resources —
    forwarded verbatim, mirroring the reference's per-component image
    selection (ldes-consumer/app.py:610-611)."""
    extra = dict(ray_remote_args or {})
    return media_ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=extra.pop("concurrency", concurrency),
        num_cpus=extra.pop("num_cpus", num_cpus),
        **extra,
    )


FRAME = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("frame_idx", pa.int32()),
        pa.field("ts_sec", pa.float64()),
        pa.field("payload", pa.binary()),
    ]
)


class MediaResizer:
    """Actor-pool resize stage: payload -> payload at (target_w,
    target_h). Same stub contract as MediaDecoder: ``fake`` is a
    deterministic byte-level pseudo-resize (output length scales with
    the target area, content derived from the input hash so resizing
    is reproducible and testable); ``real`` raises at the exact PIL /
    libvips call site. Output keeps the MEDIA schema so resize chains
    into decode_stage."""

    def __init__(self, target_w: int = 224, target_h: int = 224,
                 mode: str = "fake") -> None:
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode = mode
        self.tw, self.th = int(target_w), int(target_h)

    def _resize_real(self, payload: bytes, mime: str) -> bytes:
        """Real resize for image/png and image/jpeg through the repo's
        stdlib codecs: decode -> box/nearest resample in numpy ->
        re-encode in the SAME format. Other mimes still need
        PIL/libvips and keep the explicit library slot."""
        if mime in ("image/png", "image/jpeg"):
            if mime == "image/png":
                from k_gap_ray.functions.png import decode_png, encode_png

                w, h, c, px = decode_png(payload)
                enc = encode_png
            else:
                from k_gap_ray.functions.jpeg import (decode_jpeg,
                                                      encode_jpeg)

                w, h, c, px = decode_jpeg(payload)
                enc = encode_jpeg
            ys = (np.arange(self.th) * h) // self.th
            xs = (np.arange(self.tw) * w) // self.tw
            res = px[ys][:, xs]
            if c == 1:
                res = res[:, :, 0]
            return enc(res)
        raise NotImplementedError(
            "real resize requires PIL/libvips for this mime, not "
            "available in this container — slot the library call here "
            "(png/jpeg resize via the repo's stdlib codecs)")

    def _resize_fake(self, payload: bytes, mime: str) -> bytes:
        n_out = max(16, (self.tw * self.th) // 64)
        seed = hashlib.sha256(payload).digest()
        reps = n_out // len(seed) + 1
        return (seed * reps)[:n_out]

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = self._resize_fake if self.mode == "fake" else self._resize_real
        out = [fn(p, m) for p, m in zip(batch.column("payload").to_pylist(),
                                        batch.column("mime").to_pylist())]
        return pa.table({
            "media_id": batch.column("media_id"),
            "payload": pa.array(out, pa.binary()),
            "mime": batch.column("mime"),
            "source_url": batch.column("source_url"),
        })


def resize_stage(media_ds, target_w: int = 224, target_h: int = 224,
                 mode: str = "fake", concurrency=(1, 4),
                 batch_size: int = 64, ray_remote_args: dict | None = None):
    return media_ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h,
                               "mode": mode},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **(ray_remote_args or {}))


def mjpeg_split(payload: bytes) -> list[bytes]:
    """Split a concatenated-JFIF MJPEG stream into its frames (each a
    complete SOI..EOI baseline JPEG). Returns [] when the payload
    doesn't start with SOI (not an MJPEG stream)."""
    if payload[:2] != b"\xff\xd8":
        return []
    frames = []
    start = 0
    while start < len(payload):
        if payload[start:start + 2] != b"\xff\xd8":
            break
        end = payload.find(b"\xff\xd9", start + 2)
        if end < 0:
            break
        frames.append(payload[start:end + 2])
        start = end + 2
    return frames


def mjpeg_join(frames: list[bytes]) -> bytes:
    """Concatenate JFIF frames into an MJPEG stream payload."""
    return b"".join(frames)


class FrameSampler:
    """Actor-pool frame-sampling stage: one video row -> ``n_frames``
    evenly spaced frame rows (media_id, frame_idx, ts_sec, payload) —
    the 1->N binary explode a video pipeline needs, with small batch
    sizes so n_frames x payload x concurrency stays in-heap. ``fake``
    slices the payload at evenly spaced offsets with a fake duration
    of n_bytes/1000 s; ``real`` raises at the ffmpeg seek site."""

    def __init__(self, n_frames: int = 4, mode: str = "fake") -> None:
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.n = int(n_frames)
        self.mode = mode

    def _frames_real(self, payload: bytes):
        """Real frame sampling for the video forms decodable without
        ffmpeg: AVI/MJPG containers (RIFF chunk walk via
        functions/riffavi.py; ts_sec from the container's
        us_per_frame), MP4 with jpeg-coded samples (ISO BMFF sample
        tables via functions/isobmff.py; ts_sec from the track
        timescale) and raw MJPEG streams (concatenated JFIF frames
        split on SOI..EOI spans; nominal 25 fps). Picks n evenly
        spaced frames; each emitted payload is itself a valid
        baseline JPEG (decodable by functions/jpeg.py). Inter-frame
        codecs (h264/vp9 in mp4/webm) still need ffmpeg and keep the
        explicit library slot."""
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            from k_gap_ray.functions.riffavi import decode_avi

            meta = decode_avi(payload)
            frames = meta["frames"]
            spf = (meta["us_per_frame"] or 40000) / 1e6
        elif payload[4:8] == b"ftyp":
            from k_gap_ray.functions.isobmff import decode_mp4

            meta = decode_mp4(payload)
            frames = meta["frames"]
            spf = 1 / meta["fps"] if meta["fps"] else 1 / 25.0
        else:
            frames = mjpeg_split(payload)
            spf = 1 / 25.0
        if not frames and _ffmpeg_bin() is not None:
            # inter-frame codecs (webm/vp9, mp4/h264 …): transcode to
            # MJPEG through the system ffmpeg; nominal 25 fps when the
            # container walk couldn't supply a frame duration
            frames = _ffmpeg_mjpeg_frames(payload)
            spf = 1 / 25.0
        if not frames:
            raise NotImplementedError(
                "real frame sampling requires ffmpeg for "
                "non-MJPEG/non-AVI/non-MP4 payloads, and ffmpeg is "
                "not on PATH in this container — install it and this "
                "call site routes through _ffmpeg_mjpeg_frames "
                "automatically")
        n_total = len(frames)
        picks = sorted({(i * n_total) // self.n for i in range(self.n)})
        return [(idx, idx * spf, frames[idx]) for idx in picks]

    def _frames_fake(self, payload: bytes):
        dur = len(payload) / 1000.0
        chunk = max(1, len(payload) // self.n)
        return [(i, i * dur / self.n,
                 payload[i * chunk:(i + 1) * chunk] or b"\x00")
                for i in range(self.n)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = self._frames_fake if self.mode == "fake" else self._frames_real
        rows: dict[str, list] = {n: [] for n in FRAME.names}
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            for idx, ts, fp in fn(payload):
                rows["media_id"].append(mid)
                rows["frame_idx"].append(idx)
                rows["ts_sec"].append(ts)
                rows["payload"].append(fp)
        return pa.Table.from_pydict(rows, schema=FRAME)


def frame_sample_stage(media_ds, n_frames: int = 4, mode: str = "fake",
                       concurrency=(1, 4), batch_size: int = 32,
                       ray_remote_args: dict | None = None):
    return media_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "mode": mode},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **(ray_remote_args or {}))
