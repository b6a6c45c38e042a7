"""Property tests: the three container codecs round-trip ARBITRARY
frame payloads byte-identically (the container layer never inspects
payload bytes), across frame counts, sizes, odd/even lengths (RIFF
word alignment), and fps values."""

from hypothesis import given, settings
from hypothesis import strategies as st

from k_gap_ray.functions.ebml import decode_webm, encode_webm
from k_gap_ray.functions.isobmff import decode_mp4, encode_mp4
from k_gap_ray.functions.riffavi import decode_avi, encode_avi

_frames = st.lists(st.binary(min_size=1, max_size=300),
                   min_size=1, max_size=8)
_fps = st.integers(min_value=1, max_value=120)
_dim = st.integers(min_value=1, max_value=4096)


@settings(max_examples=60, deadline=None)
@given(_frames, _dim, _dim, _fps)
def test_avi_roundtrip_arbitrary_payloads(frames, w, h, fps):
    m = decode_avi(encode_avi(frames, w, h, fps=fps))
    assert m["frames"] == frames
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, len(frames))


@settings(max_examples=60, deadline=None)
@given(_frames, _dim, _dim, _fps)
def test_mp4_roundtrip_arbitrary_payloads(frames, w, h, fps):
    m = decode_mp4(encode_mp4(frames, w, h, fps=fps))
    assert m["frames"] == frames
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, len(frames))


@settings(max_examples=60, deadline=None)
@given(_frames, _dim, _dim, _fps)
def test_webm_roundtrip_arbitrary_payloads(frames, w, h, fps):
    m = decode_webm(encode_webm(frames, w, h, fps=fps))
    assert m["frames"] == frames
    assert (m["width"], m["height"], m["n_frames"]) == (w, h, len(frames))
    # block timestamps are the encoder's ms schedule
    assert m["ts_ms"] == [k * 1000 // fps for k in range(len(frames))]
