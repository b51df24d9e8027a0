"""Pure-Python PNG codec: round-trips and all five scanline filters."""

import struct
import zlib

import numpy as np
import pytest

from archivesspace_virgo_ray.functions.png import (
    PngFormatError,
    _chunk,
    _SIGNATURE,
    decode_png,
    encode_png,
)


@pytest.mark.parametrize("shape", [(5, 7), (4, 4, 1), (6, 3, 3), (3, 6, 4)])
def test_round_trip(shape):
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(px))
    want = px[:, :, None] if px.ndim == 2 else px
    assert np.array_equal(out, want)


def _filtered_png(px: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG whose scanlines use the GIVEN filter types (the encoder
    itself only emits filter 0, so this exercises the decoder's inverses)."""
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int16)
    raw = bytearray()
    for y, f in enumerate(filters):
        row = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int16)
        enc = np.zeros(stride, dtype=np.int16)
        for x in range(stride):
            left = row[x - c] if x >= c else 0
            up = prev[x]
            ul = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa_ <= pb_ and pa_ <= pc_ else (up if pb_ <= pc_ else ul)
            enc[x] = (row[x] - pred) & 0xFF
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_all_filter_types_decode():
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    data = _filtered_png(px, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), px)


def test_rejects_garbage_and_unsupported():
    with pytest.raises(PngFormatError):
        decode_png(b"not a png at all")
    # 16-bit depth is outside the supported subset
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(PngFormatError):
        decode_png(bad)
