"""Pure-stdlib WAV (RIFF PCM) codec: the second REAL decoder behind
the multimodal `mode="real"` slot, next to functions/png.py.

The container has no ffmpeg/torchaudio, but canonical WAV needs
neither — the format is public (RIFF spec / RFC 2361 wave formats):
little-endian chunked RIFF container, `fmt ` chunk carrying PCM
parameters, `data` chunk carrying interleaved frames. Supports
uncompressed integer PCM at 8 bit (unsigned) and 16 bit (signed) —
the slice real web audio corpora overwhelmingly use for raw WAV.
The encoder always writes 16-bit PCM; the decoder also accepts 8-bit
and skips foreign chunks (LIST/INFO/fact) so external files decode.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(frames: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames,) mono or (n_frames, channels) int16 -> WAV bytes.

    Deterministic (no metadata chunks, fixed header layout) — equal
    sample arrays give byte-identical files, so encoded corpora are
    content-addressable."""
    fr = np.ascontiguousarray(frames, dtype=np.int16)
    if fr.ndim == 1:
        fr = fr[:, None]
    n, c = fr.shape
    data = fr.tobytes()  # interleaved little-endian on all our hosts
    if fr.dtype.byteorder == ">":  # pragma: no cover - be-endian hosts
        data = fr.byteswap().tobytes()
    byte_rate = sample_rate * c * 2
    fmt = struct.pack("<HHIIHH", 1, c, sample_rate, byte_rate, c * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, channels, (n_frames, channels) int16).

    8-bit PCM is widened to int16 ((x - 128) << 8). Raises ValueError
    on a non-RIFF/WAVE signature, a non-PCM format tag, an unsupported
    bit depth, or a data chunk that does not divide into whole frames.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE signature)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
        # LIST/INFO/fact/cue chunks are skipped; chunks are word-aligned
        pos += 8 + length + (length & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _rate, _align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format tag {audio_format} "
                         "(only integer PCM)")
    if channels < 1:
        raise ValueError("channel count must be >= 1")
    if bits == 16:
        if len(data) % (2 * channels):
            raise ValueError("data chunk is not whole 16-bit frames")
        fr = np.frombuffer(data, dtype="<i2").astype(np.int16)
    elif bits == 8:
        if len(data) % channels:
            raise ValueError("data chunk is not whole 8-bit frames")
        fr = ((np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128)
              << 8)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return sample_rate, channels, fr.reshape(-1, channels)
