"""Minimal MJPEG-in-AVI container codec (pure Python, deterministic).

Closes the last ``RealDecodeUnavailable`` media boundary with one REAL
container format: an AVI whose video stream is Motion-JPEG — each frame is
a baseline JPEG (``functions.jpeg``) wrapped in RIFF '00dc' chunks. This is
a genuinely common legacy container (webcams, OpenCV's default fallback),
and the parse here is a real RIFF walk, not a byte-offset hack: unknown
chunks are skipped by their declared size, so AVIs with extra headers
(JUNK, INFO, odd-padded chunks) still decode.

Reference behavior analog: the reference's pipelines treat media as opaque
payloads enriched via IIIF (ASpaceObject.java digital-object handling);
here the decode itself is first-class so frame-level features are testable
end-to-end without external libraries.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


class AviFormatError(ValueError):
    pass


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """uint8 frames (h, w[,1|3]) → MJPEG AVI bytes. All frames must share a
    shape; encoding is deterministic (fixed Huffman/quant tables)."""
    if not frames:
        raise AviFormatError("need at least one frame")
    f0 = np.asarray(frames[0])
    h, w = f0.shape[0], f0.shape[1]
    jpegs = [encode_jpeg(np.asarray(f), quality) for f in frames]
    if any(np.asarray(f).shape[:2] != (h, w) for f in frames):
        raise AviFormatError("all frames must share (h, w)")
    n = len(jpegs)
    max_bytes = max(len(j) for j in jpegs)

    # avih: MicroSecPerFrame, MaxBytesPerSec, Padding, Flags(HASINDEX),
    # TotalFrames, InitialFrames, Streams, SuggestedBufferSize, W, H, rsvd x4
    avih = struct.pack(
        "<14I", 1_000_000 // fps, max_bytes * fps, 0, 0x10, n, 0, 1,
        max_bytes, w, h, 0, 0, 0, 0,
    )
    # strh: fccType 'vids', fccHandler 'MJPG', flags, prio+lang, InitialFrames,
    # Scale, Rate, Start, Length, SuggestedBufferSize, Quality, SampleSize,
    # rcFrame (4 x int16)
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n, max_bytes, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    # strf: BITMAPINFOHEADER with biCompression 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    strl = _list(
        b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)

    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)

    # idx1: one entry per frame — offset is relative to the 'movi' fourcc
    idx_entries = []
    off = 4  # first chunk starts right after the 'movi' list type
    for j in jpegs:
        idx_entries.append(
            b"00dc" + struct.pack("<3I", 0x10, off, len(j))  # AVIIF_KEYFRAME
        )
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len); skips pad bytes."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def extract_mjpeg_payloads(data: bytes) -> list[bytes]:
    """RIFF walk → the raw JPEG bytes of every video ('..dc') chunk in every
    'movi' list, in stream order."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviFormatError("not a RIFF/AVI payload")
    out: list[bytes] = []

    def walk_list(start: int, end: int) -> None:
        for fourcc, p, size in _walk_chunks(data, start, end):
            if fourcc == b"LIST":
                ltype = data[p : p + 4]
                if ltype in (b"movi", b"hdrl", b"rec "):
                    walk_list(p + 4, p + size)
            elif fourcc[2:4] == b"dc":
                out.append(bytes(data[p : p + size]))

    walk_list(12, len(data))
    if not out:
        raise AviFormatError("no video chunks found")
    return out


def decode_avi_mjpeg(data: bytes) -> list[np.ndarray]:
    """MJPEG AVI bytes → list of decoded (h, w, c) uint8 frames."""
    return [decode_jpeg(j) for j in extract_mjpeg_payloads(data)]
