"""Pure-python WAV (RIFF PCM) codec — closes the AUDIO modality the way
minipng closes images: real decode with only the stdlib (``struct``) and
numpy, per the public RIFF/WAVE format specification (Microsoft/IBM 1991;
the canonical fmt/data chunk layout).

Supported: PCM (format tag 1) at 8-bit unsigned and 16-bit signed, any
channel count and sample rate, arbitrary extra chunks (LIST, fact, ...)
skipped per the RIFF rules (word-aligned chunk walking). IEEE-float
(tag 3), compressed formats, and 24/32-bit depths raise
NotImplementedError — a principled gate, like minipng's for 16-bit PNGs.

Encode writes PCM16 (or PCM8) with a canonical 44-byte header — the
byte-exact round-trip partner for the decoder (tests/test_miniwav.py).
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    return bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WAVE"


def decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes to ``(samples, sample_rate)`` where samples is an
    int16 array of shape (n_frames, n_channels); PCM8 is re-centered to
    int16 range (x - 128 << 8) so downstream math is depth-uniform."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"WAV: truncated {ctype!r} chunk")
        if ctype == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV: truncated fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif ctype == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # RIFF chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("WAV: missing fmt or data chunk")
    tag, n_ch, rate, _byte_rate, _align, depth = fmt
    if tag != 1:
        raise NotImplementedError(f"WAV: format tag {tag} unsupported (PCM=1 only)")
    if depth == 16:
        samples = np.frombuffer(pcm, dtype="<i2")
    elif depth == 8:
        samples = (
            np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128
        ) << 8
    else:
        raise NotImplementedError(f"WAV: {depth}-bit depth unsupported (8/16)")
    if n_ch < 1:
        raise ValueError("WAV: zero channels")
    n_frames = len(samples) // n_ch
    return samples[: n_frames * n_ch].reshape(n_frames, n_ch), rate


def encode(samples: np.ndarray, sample_rate: int, depth: int = 16) -> bytes:
    """Encode an int16 array (n_frames,) or (n_frames, ch) as PCM WAV."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"encode expects (n,) or (n, ch), got {arr.shape}")
    n_ch = arr.shape[1]
    if depth == 16:
        pcm = arr.astype("<i2").tobytes()
    elif depth == 8:
        pcm = ((arr >> 8) + 128).astype(np.uint8).tobytes()
    else:
        raise NotImplementedError(f"WAV: {depth}-bit encode unsupported (8/16)")
    block_align = n_ch * depth // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block_align,
        block_align, depth,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
