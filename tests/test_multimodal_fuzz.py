"""Property/fuzz tests for the stdlib multimodal codecs
(operators/multimodal.py): round-trips over random geometry (odd
widths exercise BMP row padding), and the decode error CONTRACT —
malformed bytes of any kind either decode or raise ValueError, never
struct.error / wave.Error / IndexError / TypeError, and never return
silently-truncated content. On a 1000-executor cluster a codec that
leaks odd exception types or silently shortens a frame turns one bad
row into an undebuggable job failure (or worse, wrong features).

Pure-Python tests: no SparkSession needed — the same functions run
inside the mapInPandas batches.
"""

from __future__ import annotations


import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


from multi_crm_cross_sell_spark.operators.multimodal import (  # noqa: E402
    decode_bmp,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_wav,
    encode_y4m,
)

DECODE_OK = (ValueError,)


@st.composite
def bmp_args(draw):
    w = draw(st.integers(min_value=1, max_value=13))  # odd widths -> padding
    h = draw(st.integers(min_value=1, max_value=9))
    rgb = draw(st.binary(min_size=w * h * 3, max_size=w * h * 3))
    return w, h, rgb


@st.composite
def wav_args(draw):
    n = draw(st.integers(min_value=0, max_value=64))
    samples = draw(
        st.lists(
            st.integers(min_value=-(2**15), max_value=2**15 - 1),
            min_size=n,
            max_size=n,
        )
    )
    rate = draw(st.sampled_from([8000, 16000, 44100]))
    return np.array(samples, dtype=np.int16), rate


@st.composite
def y4m_args(draw):
    w = draw(st.integers(min_value=1, max_value=6))
    h = draw(st.integers(min_value=1, max_value=6))
    n_frames = draw(st.integers(min_value=0, max_value=3))
    frames = [
        draw(st.binary(min_size=3 * w * h, max_size=3 * w * h))
        for _ in range(n_frames)
    ]
    fps = draw(st.sampled_from([1, 25, 30]))
    return w, h, frames, fps


class TestRoundTrips:
    @given(bmp_args())
    @settings(max_examples=60, deadline=None)
    def test_bmp_round_trip(self, args):
        w, h, rgb = args
        w2, h2, rgb2 = decode_bmp(encode_bmp(w, h, rgb))
        assert (w2, h2, rgb2) == (w, h, rgb)

    @given(wav_args())
    @settings(max_examples=60, deadline=None)
    def test_wav_round_trip(self, args):
        samples, rate = args
        rate2, samples2 = decode_wav(encode_wav(samples, rate))
        assert rate2 == rate
        assert np.array_equal(samples2, samples)

    @given(y4m_args())
    @settings(max_examples=60, deadline=None)
    def test_y4m_round_trip(self, args):
        w, h, frames, fps = args
        w2, h2, fps2, frames2 = decode_y4m(encode_y4m(w, h, frames, fps))
        assert (w2, h2, fps2) == (w, h, fps)
        assert frames2 == frames


def _decode_contract(decode, payload):
    """Decode must either succeed or raise ValueError — nothing else."""
    try:
        decode(payload)
    except DECODE_OK:
        pass
    # any other exception type propagates and fails the test


class TestTruncation:
    """Every strict prefix of a valid payload must raise ValueError —
    in particular none may return a silently shortened result."""

    @given(bmp_args(), st.data())
    @settings(max_examples=60, deadline=None)
    def test_bmp_prefix_rejected(self, args, data):
        payload = encode_bmp(*args)
        cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        with pytest.raises(ValueError):
            decode_bmp(payload[:cut])

    @given(wav_args(), st.data())
    @settings(max_examples=60, deadline=None)
    def test_wav_prefix_rejected(self, args, data):
        samples, rate = args
        payload = encode_wav(samples, rate)
        cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        with pytest.raises(ValueError):
            decode_wav(payload[:cut])

    @given(y4m_args(), st.data())
    @settings(max_examples=60, deadline=None)
    def test_y4m_prefix_rejected(self, args, data):
        w, h, frames, fps = args
        payload = encode_y4m(w, h, frames, fps)
        # a prefix that still ends exactly on a frame boundary IS a
        # valid stream with fewer frames — cut inside the stream body
        header_len = payload.index(b"\n") + 1
        boundaries = {header_len}
        pos = header_len
        for fr in frames:
            pos += 6 + len(fr)  # b"FRAME\n" + payload
            boundaries.add(pos)
        cut = data.draw(
            st.integers(min_value=0, max_value=len(payload) - 1).filter(
                lambda c: c not in boundaries
            )
        )
        with pytest.raises(ValueError):
            decode_y4m(payload[:cut])


class TestByteFlips:
    """Flipping any single byte must never escape the ValueError
    contract (it MAY still decode — flipped pixel bytes are content)."""

    @given(bmp_args(), st.data())
    @settings(max_examples=80, deadline=None)
    def test_bmp_flip(self, args, data):
        payload = bytearray(encode_bmp(*args))
        i = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        payload[i] ^= data.draw(st.integers(min_value=1, max_value=255))
        _decode_contract(decode_bmp, bytes(payload))

    @given(wav_args(), st.data())
    @settings(max_examples=80, deadline=None)
    def test_wav_flip(self, args, data):
        samples, rate = args
        payload = bytearray(encode_wav(samples, rate))
        i = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        payload[i] ^= data.draw(st.integers(min_value=1, max_value=255))
        _decode_contract(decode_wav, bytes(payload))

    @given(y4m_args(), st.data())
    @settings(max_examples=80, deadline=None)
    def test_y4m_flip(self, args, data):
        w, h, frames, fps = args
        payload = bytearray(encode_y4m(w, h, frames, fps))
        i = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
        payload[i] ^= data.draw(st.integers(min_value=1, max_value=255))
        _decode_contract(decode_y4m, bytes(payload))

    @given(st.binary(min_size=0, max_size=200))
    @settings(max_examples=120, deadline=None)
    def test_garbage_bytes(self, payload):
        for decode in (decode_bmp, decode_wav, decode_y4m):
            _decode_contract(decode, payload)
