"""Minimal pure-Python WAV (RIFF PCM) codec — stdlib struct only.

Supports 16-bit signed PCM, any channel count / sample rate — the subset
the synthetic media corpus emits. Spec: the public RIFF/WAVE format
(fmt + data chunks, little-endian).
"""

from __future__ import annotations

import struct

import numpy as np


class WavFormatError(ValueError):
    """Not a RIFF/WAVE, or a feature outside the supported subset."""


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 array → WAV bytes."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, (n, channels) int16 array)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavFormatError("bad RIFF/WAVE header")
    pos = 12
    rate = channels = bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt_code, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if fmt_code != 1 or bits != 16:
                raise WavFormatError(
                    f"unsupported WAV: format={fmt_code} bits={bits} (PCM16 only)"
                )
        elif tag == b"data":
            pcm = body
    if rate is None or pcm is None:
        raise WavFormatError("truncated WAV (no fmt/data chunk)")
    a = np.frombuffer(pcm, dtype="<i2")
    if channels > 1:
        a = a[: (len(a) // channels) * channels].reshape(-1, channels)
    else:
        a = a[:, None]
    return int(rate), a.astype(np.int16)
