"""H.264 Annex-B bitstream STRUCTURE parsing — the headers-only slice of the
codec a 100-TB video-ingest pipeline needs before any pixel ever decodes:

- NAL unit segmentation (start-code scan) and type classification;
- SPS parsing (Exp-Golomb) for profile / level / coded dimensions including
  frame cropping — the metadata a catalog or a frame-sampling planner reads;
- keyframe (IDR) indexing with byte offsets — what a seek index or a
  "sample one keyframe per clip" stage consumes.

PIXEL decode of inter-frame codecs stays behind ``RealDecodeUnavailable``
(``pipelines.multimodal``): motion compensation needs a real codec library
this container doesn't have, and a fake would be dishonest. Everything in
THIS module is a complete, real implementation of the bitstream layer
(ITU-T H.264 §7.3.2.1 seq_parameter_set_rbsp, §B.1 byte stream NAL units).

``encode_annexb_skeleton`` writes a syntactically valid headers-only stream
(SPS + PPS + empty IDR/non-IDR NALs) so tests and synthetic corpora can
round-trip the parser deterministically without a real encoder.
"""

from __future__ import annotations

import numpy as np

NAL_NON_IDR = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134,
                  135}


class H264FormatError(ValueError):
    pass


# ---------------------------------------------------------------------------
# bit I/O over RBSP (emulation-prevention stripped)
# ---------------------------------------------------------------------------

def strip_emulation_prevention(nal_payload: bytes) -> bytes:
    """00 00 03 -> 00 00 (§7.4.1.1); the 03 byte exists only so start codes
    can't appear inside a NAL."""
    out = bytearray()
    zeros = 0
    for b in nal_payload:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue  # drop the emulation-prevention byte
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise H264FormatError("SPS truncated")
            bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
            v = (v << 1) | bit
            self.pos += 1
        return v

    def ue(self) -> int:  # Exp-Golomb unsigned (§9.1)
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise H264FormatError("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:  # Exp-Golomb signed (§9.1.1)
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def rbsp_bytes(self) -> bytes:
        bits = list(self.bits)
        bits.append(1)  # rbsp_stop_one_bit
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


# ---------------------------------------------------------------------------
# NAL segmentation
# ---------------------------------------------------------------------------

def split_nal_units(data: bytes) -> list[tuple[int, int, bytes]]:
    """Annex-B byte stream -> [(nal_type, byte_offset, payload)], where
    payload includes the NAL header byte and byte_offset points at the
    START CODE (what a seek index stores)."""
    starts = []  # (start_code_pos, payload_pos)
    i = 0
    n = len(data)
    while i + 2 < n:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                sc = i - 1 if i > 0 and data[i - 1] == 0 else i
                starts.append((sc, i + 3))
                i += 3
                continue
        i += 1
    out = []
    for k, (sc, pp) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else n
        payload = data[pp:end]
        if not payload:
            raise H264FormatError("empty NAL unit")
        if payload[0] & 0x80:
            raise H264FormatError("forbidden_zero_bit set")
        out.append((payload[0] & 0x1F, sc, payload))
    if not out:
        raise H264FormatError("no NAL units (not an Annex-B stream?)")
    return out


# ---------------------------------------------------------------------------
# SPS
# ---------------------------------------------------------------------------

def parse_sps(nal_payload: bytes) -> dict:
    """NAL payload (header byte included) -> profile/level/dimensions.
    Supports the profiles whose SPS this engine will meet in practice
    (baseline/main/extended + the high family with 4:2:0/4:0:0 chroma);
    scaling matrices are skipped structurally."""
    if (nal_payload[0] & 0x1F) != NAL_SPS:
        raise H264FormatError("not an SPS NAL")
    r = _BitReader(strip_emulation_prevention(nal_payload[1:]))
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):  # seq_scaling_list_present_flag[i]
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + r.se() + 256) % 256
                        last = nxt if nxt else last
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # crop units (§7.4.2.1.1): 4:2:0 -> x2; 4:0:0 (monochrome) -> x1
    cw = 2 if chroma_format_idc in (1, 2) else 1
    ch = (2 if chroma_format_idc == 1 else 1) * (2 - frame_mbs_only)
    width = pic_width_in_mbs * 16 - cw * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * pic_height_in_map_units * 16 \
        - ch * (crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "chroma_format_idc": chroma_format_idc,
        "width": width,
        "height": height,
        "frame_mbs_only": bool(frame_mbs_only),
    }


def h264_stream_index(data: bytes) -> dict:
    """One Annex-B stream -> the catalog/seek record: dimensions from the
    FIRST SPS, NAL counts, IDR keyframe count + byte offsets."""
    nals = split_nal_units(data)
    sps = None
    kf_offsets = []
    counts = {"sps": 0, "pps": 0, "idr": 0, "non_idr": 0, "sei": 0,
              "other": 0}
    for t, off, payload in nals:
        if t == NAL_SPS:
            counts["sps"] += 1
            if sps is None:
                sps = parse_sps(payload)
        elif t == NAL_PPS:
            counts["pps"] += 1
        elif t == NAL_IDR:
            counts["idr"] += 1
            kf_offsets.append(off)
        elif t == NAL_NON_IDR:
            counts["non_idr"] += 1
        elif t == NAL_SEI:
            counts["sei"] += 1
        else:
            counts["other"] += 1
    if sps is None:
        raise H264FormatError("stream has no SPS")
    return {
        **sps,
        "n_nal_units": len(nals),
        "n_keyframes": counts["idr"],
        "keyframe_offsets": np.asarray(kf_offsets, dtype=np.int64),
        "nal_counts": counts,
    }


def decode_h264_frames(data: bytes):
    """Pixel decode — NOT implemented here (inter-frame motion compensation
    needs a real codec library; see pipelines.multimodal)."""
    from ..pipelines.multimodal import RealDecodeUnavailable

    raise RealDecodeUnavailable(
        "H.264 pixel decode needs a real codec library; this engine parses "
        "the bitstream structure (NALs, SPS, keyframe index) only")


# ---------------------------------------------------------------------------
# headers-only encoder (tests + synthetic corpora)
# ---------------------------------------------------------------------------

def write_sps(width: int, height: int, profile_idc: int = 66,
              level_idc: int = 30) -> bytes:
    """A minimal, spec-valid SPS NAL for a progressive 4:2:0 stream of the
    given dimensions (crop encodes non-multiple-of-16 sizes)."""
    if width <= 0 or height <= 0:
        raise H264FormatError("bad dimensions")
    w_mbs = (width + 15) // 16
    h_mbs = (height + 15) // 16
    crop_r = (w_mbs * 16 - width)
    crop_b = (h_mbs * 16 - height)
    if crop_r % 2 or crop_b % 2:
        raise H264FormatError("4:2:0 crop must be even (dims must be even)")
    w = _BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)           # constraint flags
    w.u(level_idc, 8)
    w.ue(0)             # sps id
    if profile_idc in _HIGH_PROFILES:
        w.ue(1)         # chroma_format_idc 4:2:0
        w.ue(0)         # bit_depth_luma_minus8
        w.ue(0)         # bit_depth_chroma_minus8
        w.u(0, 1)       # qpprime
        w.u(0, 1)       # no scaling matrix
    w.ue(0)             # log2_max_frame_num_minus4
    w.ue(2)             # pic_order_cnt_type 2 (no extra fields)
    w.ue(1)             # max_num_ref_frames
    w.u(0, 1)           # gaps flag
    w.ue(w_mbs - 1)
    w.ue(h_mbs - 1)
    w.u(1, 1)           # frame_mbs_only
    w.u(1, 1)           # direct_8x8_inference
    if crop_r or crop_b:
        w.u(1, 1)
        w.ue(0)
        w.ue(crop_r // 2)
        w.ue(0)
        w.ue(crop_b // 2)
    else:
        w.u(0, 1)
    w.u(0, 1)           # vui_parameters_present_flag
    return bytes([NAL_SPS | 0x60]) + w.rbsp_bytes()


def encode_annexb_skeleton(width: int, height: int, n_keyframes: int,
                           inter_per_gop: int = 2,
                           profile_idc: int = 66) -> bytes:
    """Headers-only Annex-B stream: SPS, PPS, then ``n_keyframes`` GOPs of
    one IDR + ``inter_per_gop`` non-IDR NALs (slice payloads are stub bytes
    — structure is real, pixels are not; pair with ``h264_stream_index``)."""
    sc = b"\x00\x00\x00\x01"
    pps = bytes([NAL_PPS | 0x60]) + _BitWriter().rbsp_bytes()
    out = bytearray()
    out += sc + write_sps(width, height, profile_idc)
    out += sc + pps
    for g in range(n_keyframes):
        out += sc + bytes([NAL_IDR | 0x60, 0x80 | (g & 0x3F), 0x10])
        for j in range(inter_per_gop):
            out += sc + bytes([NAL_NON_IDR | 0x20, (g * 7 + j) & 0x7F, 0x22])
    return bytes(out)
