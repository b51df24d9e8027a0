"""MJPEG-in-AVI container codec: round-trip, RIFF robustness, video stage."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from archivesspace_virgo_ray.functions.avi import (
    AviFormatError,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
    extract_mjpeg_payloads,
)


def _frames(k=4, h=24, w=32, shift=7):
    y, x = np.mgrid[0:h, 0:w]
    return [
        np.stack(
            [(x * 3 + i * shift) % 256, (y * 5) % 256, ((x + y) * 2) % 256],
            axis=-1,
        ).astype(np.uint8)
        for i in range(k)
    ]


def test_roundtrip_frame_count_order_and_pixels():
    frames = _frames(5)
    avi = encode_avi_mjpeg(frames, fps=10)
    dec = decode_avi_mjpeg(avi)
    assert len(dec) == 5
    for a, b in zip(frames, dec):
        assert b.shape == a.shape
        # JPEG is lossy but smooth gradients reconstruct closely
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 5
    # frame ORDER: each frame differs by its shift — nearest-frame match
    for i, b in enumerate(dec):
        errs = [np.abs(f.astype(int) - b.astype(int)).mean() for f in frames]
        assert int(np.argmin(errs)) == i


def test_encode_deterministic():
    frames = _frames(3)
    assert encode_avi_mjpeg(frames, fps=5) == encode_avi_mjpeg(frames, fps=5)


def test_decode_skips_unknown_chunks():
    frames = _frames(2)
    avi = bytearray(encode_avi_mjpeg(frames))
    # splice a JUNK chunk right after the AVI fourcc (common in real files)
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    patched = bytes(avi[:12]) + junk + bytes(avi[12:])
    patched = b"RIFF" + struct.pack("<I", len(patched) - 8) + patched[8:]
    dec = decode_avi_mjpeg(patched)
    assert len(dec) == 2


def test_rejects_non_avi():
    with pytest.raises(AviFormatError):
        extract_mjpeg_payloads(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(AviFormatError):
        extract_mjpeg_payloads(b"not riff at all")


def test_video_stage_over_dataset(ray_session):
    from archivesspace_virgo_ray.pipelines.multimodal import (
        VideoFrameStage,
        extract_video_features,
        synthesize_video_table,
    )

    tbl = synthesize_video_table(12)
    out = extract_video_features(
        __import__("ray").data.from_arrow(tbl), concurrency=2, batch_size=4
    ).to_pandas().sort_values("item_id", ignore_index=True)
    assert len(out) == 12
    assert (out["n_frames_decoded"].to_numpy() ==
            tbl["n_frames"].to_numpy()).all()
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (12, VideoFrameStage.FEATURE_DIM)
    assert np.isfinite(feats).all()
    # in-process replay matches the distributed stage exactly
    stage = VideoFrameStage()
    local = stage(tbl.select(["item_id", "payload", "media_type"]))
    lf = np.stack([np.asarray(f) for f in local["feature"].to_pylist()])
    np.testing.assert_allclose(lf, feats, rtol=0, atol=0)


def test_unknown_codec_raises(ray_session):
    from archivesspace_virgo_ray.pipelines.multimodal import (
        RealDecodeUnavailable,
        VideoFrameStage,
    )

    stage = VideoFrameStage()
    batch = pa.table({
        "item_id": pa.array([0], pa.int64()),
        "payload": pa.array([b"\x00" * 16], pa.binary()),
        "media_type": pa.array(["video/mp4"], pa.string()),
    })
    with pytest.raises(RealDecodeUnavailable):
        stage(batch)
