"""Pure-python WAV codec (multimodal/miniwav.py): round-trip, chunk
walking, PCM8 path, principled gates."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vector_index_spark.multimodal import miniwav as W


def test_roundtrip_pcm16_mono_and_stereo():
    rng = np.random.default_rng(0)
    for shape in [(100,), (50, 2), (7, 3), (1, 1)]:
        x = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
        samples, rate = W.decode(W.encode(x, 16_000))
        want = x if x.ndim == 2 else x[:, None]
        assert rate == 16_000
        assert samples.shape == want.shape and (samples == want).all()


def test_pcm8_recentered():
    x = (np.arange(-128, 128, dtype=np.int16)) << 8
    data = W.encode(x, 8_000, depth=8)
    samples, rate = W.decode(data)
    assert rate == 8_000
    assert (samples[:, 0] == x).all()


def test_extra_chunks_skipped():
    x = np.array([1, -2, 3], dtype=np.int16)
    data = bytearray(W.encode(x, 44_100))
    # splice a LIST chunk (odd length -> pad byte) between fmt and data
    insert = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    fmt_end = 12 + 8 + 16
    data = bytes(data[:fmt_end]) + insert + bytes(data[fmt_end:])
    data = b"RIFF" + struct.pack("<I", len(data) - 8) + data[8:]
    samples, _ = W.decode(data)
    assert (samples[:, 0] == x).all()


def test_gates():
    x = np.array([0, 1], dtype=np.int16)
    data = bytearray(W.encode(x, 8_000))
    data[20] = 3  # format tag -> IEEE float
    with pytest.raises(NotImplementedError, match="format tag"):
        W.decode(bytes(data))
    with pytest.raises(ValueError, match="RIFF"):
        W.decode(b"not audio")
    with pytest.raises(NotImplementedError, match="24-bit"):
        W.encode(x, 8_000, depth=24)
