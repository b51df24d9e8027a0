"""Baseline JPEG codec: roundtrip quality, format edges, stage integration."""

import numpy as np
import pyarrow as pa
import pytest

from archivesspace_virgo_ray.functions.jpeg import (
    JpegFormatError,
    decode_jpeg,
    encode_jpeg,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)


def test_rgb_gradient_roundtrip_quality_ladder():
    img = _gradient(40, 56)
    prev_err = -1.0
    for q in (100, 90, 60):
        dec = decode_jpeg(encode_jpeg(img, q))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() <= {100: 0.1, 90: 1.0, 60: 2.5}[q]
        assert err.mean() >= prev_err  # lossier as quality drops
        prev_err = err.mean()


def test_quality_100_near_lossless_on_noise():
    rng = np.random.default_rng(0)
    g = rng.integers(0, 256, size=(23, 17), dtype=np.uint8)  # odd dims
    dec = decode_jpeg(encode_jpeg(g, 100))
    assert dec.shape == (23, 17, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 2


def test_flat_image_exact_and_tiny_sizes():
    flat = np.full((8, 8, 3), 77, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, 90)) == flat).all()
    one = np.array([[[200]]], dtype=np.uint8)  # 1x1 gray, needs edge padding
    dec = decode_jpeg(encode_jpeg(one, 95))
    assert dec.shape == (1, 1, 1)
    assert abs(int(dec[0, 0, 0]) - 200) <= 3


def test_marker_structure_and_errors():
    data = encode_jpeg(_gradient(16, 16), 90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    with pytest.raises(JpegFormatError):
        decode_jpeg(b"\x00\x01not a jpeg")
    # flipping SOF0 to SOF2 (progressive) must refuse loudly, not mis-decode
    idx = data.find(b"\xff\xc0")
    broken = data[:idx] + b"\xff\xc2" + data[idx + 2 :]
    with pytest.raises(JpegFormatError, match="baseline"):
        decode_jpeg(broken)


def test_image_stage_decodes_jpeg_for_real(ray_session):
    import ray.data

    from archivesspace_virgo_ray.pipelines.multimodal import (
        ImageFeatureStage,
        _pixel_summary,
        extract_image_features,
    )

    rng = np.random.default_rng(9)
    imgs = [_gradient(24, 24), _gradient(17, 31)]
    payloads = [encode_jpeg(im, 95) for im in imgs]
    tbl = pa.table(
        {
            "item_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/jpeg"] * 2, pa.string()),
        }
    )
    out = extract_image_features(
        ray.data.from_arrow(tbl), concurrency=1, batch_size=2
    ).to_pandas()
    assert len(out) == 2
    # features equal the summary of the DECODED pixels through the shared
    # projection — verifies the stage routed through the real jpeg codec
    stage = ImageFeatureStage()
    for i, p in enumerate(payloads):
        expect = _pixel_summary(decode_jpeg(p)) @ stage.proj
        got = np.asarray(out.loc[out["item_id"] == i, "feature"].iloc[0])
        assert np.allclose(got, expect)


def test_fill_bytes_before_markers_decode():
    """ITU T.81 B.1.1.2 permits 0xFF fill bytes before any marker."""
    img = _gradient(16, 16)
    data = encode_jpeg(img, 90)
    # inject fill bytes before the SOF0 and DHT markers
    for marker in (b"\xff\xc0", b"\xff\xc4"):
        idx = data.find(marker)
        data = data[:idx] + b"\xff\xff" + data[idx:]
    dec = decode_jpeg(data)
    assert (dec == decode_jpeg(encode_jpeg(img, 90))).all()
