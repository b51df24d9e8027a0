"""Pure-python/numpy baseline JPEG codec (encoder + decoder).

Closes the ``RealDecodeUnavailable`` boundary for ``image/jpeg`` payloads in
this container (no PIL/libjpeg). Scope — baseline sequential DCT, 8-bit,
grayscale or YCbCr 4:4:4 (no chroma subsampling), no restart markers,
Huffman tables read from the stream (so any compliant baseline file with
h/v sampling factors of 1 decodes, not just our own output). Progressive,
subsampled, arithmetic-coded, or 12-bit streams raise ``JpegFormatError``
loudly — a documented boundary, not a silent wrong answer.

The encoder emits fixed CUSTOM canonical Huffman tables (all AC symbols at
9 bits, one at 16; DC categories at 4 bits). They ride in the DHT segment
like any other tables, so the output is standard baseline JPEG — just not
entropy-optimal, which is irrelevant for the codec-plumbing role this
fills. Quantization uses the Annex-K-style luma/chroma matrices scaled by
the libjpeg quality formula.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegFormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

_QY = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)

_QC = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIGZAG = np.argsort(_ZIGZAG)

# orthonormal 8x8 DCT-II basis: coef = D @ block @ D.T
_D = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = np.sqrt(0.5) if _u == 0 else 1.0
        _D[_u, _x] = _c * 0.5 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# encoder Huffman tables (canonical; see module docstring)
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 1]
_AC_VALS = list(range(256))


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """-> {symbol: (code, length)} per the JPEG canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = _canonical_codes(_DC_BITS, _DC_VALS)
_ENC_AC = _canonical_codes(_AC_BITS, _AC_VALS)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def sc(tbl):
        t = np.floor((tbl * scale + 50) / 100)
        return np.clip(t, 1, 255)
    return sc(_QY), sc(_QC)


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                raise JpegFormatError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(px: np.ndarray) -> np.ndarray:
    y, cb, cr = px[..., 0], px[..., 1], px[..., 2]
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([r, g, b], axis=-1)


def _blocks_of(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """edge-replicated 8x8 tiling -> (n_by, n_bx, 8, 8) float array."""
    h, w = plane.shape
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((bh, bw), dtype=np.float64)
    padded[:h, :w] = plane
    if bw > w:
        padded[:h, w:] = plane[:, -1:]
    if bh > h:
        padded[h:, :] = padded[h - 1 : h, :]
    blocks = padded.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
    return blocks, bh // 8, bw // 8


def encode_jpeg(px: np.ndarray, quality: int = 90) -> bytes:
    """(h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 -> baseline JPEG."""
    px = np.asarray(px)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.dtype != np.uint8 or px.ndim != 3 or px.shape[2] not in (1, 3):
        raise JpegFormatError("encode_jpeg wants uint8 (h,w[,1|3])")
    h, w, ncomp = px.shape
    qy, qc = _quality_tables(quality)
    planes = (
        [px[:, :, 0].astype(np.float64)]
        if ncomp == 1
        else list(np.moveaxis(_rgb_to_ycbcr(px.astype(np.float64)), -1, 0))
    )
    qtabs = [qy] + ([qc, qc] if ncomp == 3 else [])

    # quantized coefficient blocks per component (vectorized DCT)
    comp_coefs = []
    for plane, q in zip(planes, qtabs):
        blocks, nby, nbx = _blocks_of(plane - 128.0)
        coefs = np.einsum("ux,byxv,wv->byuw", _D, blocks, _D, optimize=True)
        # np.round half-to-even vs libjpeg's half-away matters only for
        # exact-libjpeg parity, not for self-consistent roundtrips
        comp_coefs.append(np.round(coefs / q).astype(np.int64))

    # ---- headers --------------------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    def seg(marker: int, body: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    for tid, q in enumerate([qy] + ([qc] if ncomp == 3 else [])):
        zz = q.reshape(-1)[_ZIGZAG].astype(np.uint8)
        seg(0xDB, bytes([tid]) + zz.tobytes())  # DQT
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # h=v=1
    seg(0xC0, sof)  # SOF0 baseline
    for tc_th, bits, vals in [
        (0x00, _DC_BITS, _DC_VALS), (0x10, _AC_BITS, _AC_VALS),
        (0x01, _DC_BITS, _DC_VALS), (0x11, _AC_BITS, _AC_VALS),
    ][: 4 if ncomp == 3 else 2]:
        seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))  # DHT
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)  # SOS

    # ---- entropy-coded scan (interleaved MCUs = one block per comp) -----
    bw_ = _BitWriter()
    nby, nbx = comp_coefs[0].shape[:2]
    prev_dc = [0] * ncomp
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                block = comp_coefs[ci][by, bx]
                zz = block.reshape(-1)[_ZIGZAG]
                diff = int(zz[0]) - prev_dc[ci]
                prev_dc[ci] = int(zz[0])
                t = _category(diff)
                code, ln = _ENC_DC[t]
                bw_.write(code, ln)
                if t:
                    bw_.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                nz = np.flatnonzero(zz[1:]) + 1
                last = nz[-1] if len(nz) else 0
                for i in range(1, last + 1):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = _ENC_AC[0xF0]
                        bw_.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = _ENC_AC[(run << 4) | s]
                    bw_.write(code, ln)
                    bw_.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 63:
                    code, ln = _ENC_AC[0x00]  # EOB
                    bw_.write(code, ln)
    bw_.flush()
    out.extend(bw_.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _HuffTable:
    def __init__(self, bits: list[int], vals: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise JpegFormatError("invalid Huffman code in scan")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, ncomp) uint8 (ncomp 1 or 3, RGB order)."""
    if data[:2] != b"\xff\xd8":
        raise JpegFormatError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}
    h = w = None
    comps: list[tuple[int, int, int]] = []  # (comp_id, sampling, qtab_id)
    scan_comps: list[tuple[int, int, int]] = []  # (comp_id, dc_tab, ac_tab)
    scan_pos = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at {pos}")
        # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them instead of misreading the marker byte
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + length]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                tbl = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8).astype(
                    np.float64
                )[_UNZIGZAG].reshape(8, 8)
                qtabs[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htabs[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegFormatError("only 8-bit baseline supported")
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise JpegFormatError(
                        "chroma subsampling unsupported (sampling factors must be 1x1)"
                    )
                comps.append((cid, samp, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegFormatError(f"unsupported SOF type 0x{marker:02X} (not baseline)")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for si in range(ns):
                cid = body[1 + 2 * si]
                tabs = body[2 + 2 * si]
                scan_comps.append((cid, tabs >> 4, tabs & 0xF))
            scan_pos = pos + length
            break
        pos += length
    if h is None or scan_pos is None or not comps:
        raise JpegFormatError("truncated JPEG (no SOF/SOS)")
    if len(scan_comps) != len(comps):
        raise JpegFormatError("progressive/multi-scan JPEG unsupported")

    ncomp = len(comps)
    nby, nbx = -(-h // 8), -(-w // 8)
    coefs = [np.zeros((nby, nbx, 8, 8), dtype=np.float64) for _ in range(ncomp)]
    br = _BitReader(data, scan_pos)
    prev_dc = [0] * ncomp
    comp_q = {cid: qtabs[tq] for cid, _s, tq in comps}
    for by in range(nby):
        for bx in range(nbx):
            for ci, (cid, dct, act) in enumerate(scan_comps):
                zz = np.zeros(64, dtype=np.float64)
                t = htabs[(0, dct)].decode(br)
                diff = _extend(br.read_bits(t), t) if t else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                i = 1
                while i < 64:
                    sym = htabs[(1, act)].decode(br)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    run, s = sym >> 4, sym & 0xF
                    i += run
                    if i > 63:
                        raise JpegFormatError("AC run past block end")
                    zz[i] = _extend(br.read_bits(s), s)
                    i += 1
                coefs[ci][by, bx] = (zz[_UNZIGZAG].reshape(8, 8)) * comp_q[cid]

    planes = []
    for ci in range(ncomp):
        px = np.einsum("xu,byuv,vw->byxw", _D.T, coefs[ci], _D, optimize=True)
        full = px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8) + 128.0
        planes.append(full[:h, :w])
    if ncomp == 1:
        out = planes[0][:, :, None]
    else:
        out = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
