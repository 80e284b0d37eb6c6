"""Pure-python PNG codec (multimodal/minipng.py): round-trip, all five
scanline filters, palette expansion, CRC validation, principled gates."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from vector_index_spark.multimodal import minipng as M


def test_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(0)
    for shape in [(5, 7), (5, 7, 2), (5, 7, 3), (4, 4, 4), (1, 1), (3, 1, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = M.decode(M.encode(img))
        want = img if img.ndim == 3 else img[:, :, None]
        assert out.shape == want.shape and (out == want).all()


def _hand_filtered_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Encode with explicit per-scanline filter types (spec math)."""
    h, w, ch = img.shape
    flat = img.reshape(h, w * ch).astype(np.int16)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    lines = bytearray()
    for y, f in enumerate(filters):
        lines.append(f)
        for x in range(w * ch):
            raw = int(flat[y, x])
            left = int(flat[y, x - ch]) if x >= ch else 0
            up = int(flat[y - 1, x]) if y > 0 else 0
            ul = int(flat[y - 1, x - ch]) if (y > 0 and x >= ch) else 0
            v = {
                0: raw,
                1: raw - left,
                2: raw - up,
                3: raw - (left + up) // 2,
                4: raw - paeth(left, up, ul),
            }[f]
            lines.append(v & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        M.PNG_SIGNATURE
        + M._chunk(b"IHDR", ihdr)
        + M._chunk(b"IDAT", zlib.compress(bytes(lines)))
        + M._chunk(b"IEND", b"")
    )


def test_all_five_filters_decode():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    assert (M.decode(_hand_filtered_png(img, [0, 1, 2, 3, 4])) == img).all()


def test_palette_expansion():
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    lines = bytes([0]) + idx[0].tobytes() + bytes([0]) + idx[1].tobytes()
    data = (
        M.PNG_SIGNATURE
        + M._chunk(b"IHDR", ihdr)
        + M._chunk(b"PLTE", pal.tobytes())
        + M._chunk(b"IDAT", zlib.compress(lines))
        + M._chunk(b"IEND", b"")
    )
    assert (M.decode(data) == pal[idx]).all()


def test_crc_corruption_detected():
    data = bytearray(M.encode(np.zeros((2, 2), dtype=np.uint8)))
    data[20] ^= 0xFF  # flip a byte inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        M.decode(bytes(data))


def test_unsupported_features_gate():
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    data = (
        M.PNG_SIGNATURE
        + M._chunk(b"IHDR", ihdr)
        + M._chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + M._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        M.decode(data)
    with pytest.raises(ValueError, match="signature"):
        M.decode(b"not a png at all")


def test_resize_nearest_floor_map():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    r = M.resize_nearest(img, 8, 8)
    for rr in range(8):
        for cc in range(8):
            assert r[rr, cc] == img[2 * rr, 2 * cc]
    up = M.resize_nearest(img, 32, 32)
    assert up.shape == (32, 32) and up[31, 31] == img[15, 15]
