"""H.264 Annex-B structure layer: NAL segmentation, SPS Exp-Golomb parse
(crop + high-profile branches), keyframe indexing, honest decode boundary."""

import numpy as np
import pytest

from archivesspace_virgo_ray.functions.h264 import (
    H264FormatError,
    NAL_IDR,
    NAL_PPS,
    NAL_SPS,
    decode_h264_frames,
    encode_annexb_skeleton,
    h264_stream_index,
    parse_sps,
    split_nal_units,
    strip_emulation_prevention,
    write_sps,
)


@pytest.mark.parametrize("w,h,profile", [
    (64, 48, 66),       # exact macroblock multiples, baseline
    (100, 60, 66),      # width crop
    (64, 50, 66),       # height crop
    (1918, 1080, 100),  # high profile + crop (chroma branch)
    (2, 2, 100),        # degenerate tiny
])
def test_sps_roundtrip(w, h, profile):
    sps = write_sps(w, h, profile)
    got = parse_sps(sps)
    assert (got["width"], got["height"]) == (w, h)
    assert got["profile_idc"] == profile
    assert got["frame_mbs_only"] is True


def test_emulation_prevention_strip():
    assert strip_emulation_prevention(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert strip_emulation_prevention(b"\x00\x00\x03\x03") == b"\x00\x00\x03"
    assert strip_emulation_prevention(b"\x01\x02\x03") == b"\x01\x02\x03"


def test_stream_index_and_offsets():
    data = encode_annexb_skeleton(100, 60, n_keyframes=3, inter_per_gop=2)
    ix = h264_stream_index(data)
    assert (ix["width"], ix["height"]) == (100, 60)
    assert ix["n_keyframes"] == 3
    assert ix["n_nal_units"] == 2 + 3 * 3
    # every keyframe offset points at a start code followed by an IDR NAL
    for off in ix["keyframe_offsets"]:
        off = int(off)
        assert data[off:off + 4] == b"\x00\x00\x00\x01"
        assert data[off + 4] & 0x1F == NAL_IDR
    # 3-byte start codes parse too
    data3 = data.replace(b"\x00\x00\x00\x01", b"\x00\x00\x01")
    types = [t for t, _, _ in split_nal_units(data3)]
    assert types[:2] == [NAL_SPS, NAL_PPS] and types.count(NAL_IDR) == 3


def test_malformed_and_decode_boundary():
    from archivesspace_virgo_ray.pipelines.multimodal import (
        RealDecodeUnavailable,
    )

    with pytest.raises(H264FormatError):
        split_nal_units(b"not a bitstream at all")
    with pytest.raises(H264FormatError):
        parse_sps(bytes([NAL_SPS | 0x60]) + b"\x42")  # truncated SPS
    with pytest.raises(H264FormatError):
        write_sps(101, 60)  # odd crop impossible at 4:2:0
    with pytest.raises(RealDecodeUnavailable):
        decode_h264_frames(encode_annexb_skeleton(64, 48, 1))


def test_stage_over_dataset(ray_session):
    import ray.data

    from archivesspace_virgo_ray.pipelines.multimodal import (
        index_h264_streams,
        synthesize_h264_table,
    )

    tbl = synthesize_h264_table(12)
    out = index_h264_streams(ray.data.from_arrow(tbl)).to_pandas()
    assert len(out) == 12
    merged = out.merge(tbl.to_pandas()[["item_id", "width", "height",
                                        "n_keyframes"]],
                       on="item_id", suffixes=("", "_want"))
    assert (merged["width"] == merged["width_want"]).all()
    assert (merged["height"] == merged["height_want"]).all()
    assert (merged["n_keyframes"] == merged["n_keyframes_want"]).all()
