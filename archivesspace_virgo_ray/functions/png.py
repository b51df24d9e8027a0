"""Minimal pure-Python PNG codec (stdlib zlib only — no PIL in this
container), shrinking the multimodal decode stub to the formats PNG can't
express. Supports 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA),
no interlacing — the subset the synthetic media corpus emits.

Spec: the public PNG specification (RFC 2083 / W3C PNG): IHDR/IDAT/IEND
chunk layout, scanline filters 0-4 (None/Sub/Up/Average/Paeth).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


class PngFormatError(ValueError):
    """Not a PNG, or a PNG feature outside the supported subset."""


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) or (h, w, {1,3,4}) uint8 array → PNG bytes (filter 0 rows)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE:
        raise PngFormatError(f"unsupported array shape {a.shape}")
    h, w, c = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    raw = bytearray()
    for row in a.reshape(h, w * c):
        raw.append(0)  # filter type None
        raw += row.tobytes()
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 array."""
    if data[:8] != _SIGNATURE:
        raise PngFormatError("bad PNG signature")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _CHANNELS or interlace:
                raise PngFormatError(
                    f"unsupported PNG: depth={depth} color={color} interlace={interlace}"
                )
            channels = _CHANNELS[color]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise PngFormatError("truncated PNG (no IHDR/IDAT)")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise PngFormatError("scanline payload size mismatch")
    raw = raw.reshape(height, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        line = raw[y, 1:].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        f = filters[y]
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub — recon[x] = Σ raw deltas in its bpp lane mod 256,
            # so a per-lane cumsum vectorizes the whole scanline
            lanes = line.reshape(-1, bpp).astype(np.int64)
            out[y] = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            out[y] = line + prev  # uint8 wraps mod 256
        elif f == 3:  # Average — left is the reconstructed byte, so the scan
            # is inherently sequential; int arithmetic avoids uint8 scalar
            # overflow warnings (& 0xFF supplies the wrap)
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = line
        elif f == 4:  # Paeth — sequential for the same reason
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else np.uint8(0)
                ul = prev[x - bpp] if x >= bpp else np.uint8(0)
                line[x] = (
                    int(line[x]) + int(_paeth(left, prev[x], ul))
                ) & 0xFF
            out[y] = line
        else:
            raise PngFormatError(f"unknown filter {f}")
    return out.reshape(height, width, channels)
