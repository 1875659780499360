"""Round-trip tests for the pure-stdlib baseline JPEG codec.

Same strategy as test_multimodal_real_codecs.py: the codec pair is
self-hosting (encode -> decode) and the decoded plane must approximate
the source within quantization error; structural variants (color 4:2:0,
restart intervals, odd dimensions) exercise the decoder paths a real
corpus hits.
"""

from __future__ import annotations

import numpy as np
import pytest

from email_address_parser_ray.stages.jpeg import decode_jpeg, encode_jpeg
from email_address_parser_ray.stages.multimodal import ImageResizer, MediaDecoder


def _gradient(h: int, w: int) -> np.ndarray:
    """Smooth test image in [0,1] — low-frequency so high-quality JPEG
    reconstruction error stays within the quantization bound."""
    y, x = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    return 0.5 + 0.25 * np.sin(2 * np.pi * x) * np.cos(2 * np.pi * y)


def test_gray_roundtrip_q95():
    img = _gradient(64, 48)
    payload = encode_jpeg(img, quality=95)
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    out = decode_jpeg(payload)
    assert out.shape == (64, 48)
    assert np.abs(out - img).mean() < 0.01
    assert np.abs(out - img).max() < 0.06


def test_gray_odd_dimensions_cropped():
    img = _gradient(33, 17)  # forces edge padding + crop on decode
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (33, 17)
    assert np.abs(out - img).mean() < 0.015


def test_quality_monotonic():
    img = _gradient(40, 40)
    err = [
        np.abs(decode_jpeg(encode_jpeg(img, quality=q)) - img).mean()
        for q in (25, 75, 95)
    ]
    assert err[0] > err[1] > err[2]


def test_color_420_luma_matches():
    rng = np.random.default_rng(7)
    base = _gradient(48, 32)
    rgb = np.stack(
        [
            np.clip(base + 0.1 * rng.standard_normal() , 0, 1),
            base,
            np.clip(1.0 - base, 0, 1),
        ],
        axis=2,
    )
    payload = encode_jpeg(rgb, quality=95, subsample="420")
    out = decode_jpeg(payload)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert out.shape == (48, 32)
    assert np.abs(out - luma).mean() < 0.01


def test_color_444_luma_matches():
    base = _gradient(24, 40)
    rgb = np.stack([base, 1 - base, base * base], axis=2)
    out = decode_jpeg(encode_jpeg(rgb, quality=95, subsample="444"))
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert np.abs(out - luma).mean() < 0.01


def test_restart_intervals_identical():
    img = _gradient(64, 64)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    with_rst = encode_jpeg(img, quality=90, restart_interval=3)
    assert b"\xff\xd0" in with_rst  # RST0 actually present
    assert np.array_equal(decode_jpeg(with_rst), plain)


def test_color_restart_intervals_identical():
    base = _gradient(48, 48)
    rgb = np.stack([base, base**2, 1 - base], axis=2)
    plain = decode_jpeg(encode_jpeg(rgb, quality=90))
    rst = decode_jpeg(encode_jpeg(rgb, quality=90, restart_interval=2))
    assert np.array_equal(rst, plain)


def test_non_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"BM not a jpeg")
    with pytest.raises(NotImplementedError):
        encode_jpeg(np.zeros((8, 8, 4)))


def test_media_decoder_jpeg_features_match_source():
    """MediaDecoder's real image path over a JPEG payload produces the
    same band-mean features as the source plane, within codec error."""
    import pyarrow as pa

    img = _gradient(32, 64)
    dec = MediaDecoder(fake=False, feature_dim=8)
    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([encode_jpeg(img, quality=95)], pa.binary()),
        }
    )
    feats = np.array(dec(batch)["features"].to_pylist()[0])
    expected = np.array([b.mean() for b in np.array_split(img, 8, axis=1)])
    assert np.abs(feats - expected).max() < 0.01


def test_image_resizer_jpeg_roundtrip():
    import pyarrow as pa

    img = _gradient(64, 64)
    rz = ImageResizer(target_w=16, target_h=16, fake=False)
    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([encode_jpeg(img, quality=95)], pa.binary()),
            "width": pa.array([64], pa.int32()),
            "height": pa.array([64], pa.int32()),
        }
    )
    out = rz._resize_real(batch)
    resized = decode_jpeg(out["payload"].to_pylist()[0])
    assert resized.shape == (16, 16)
    # nearest-neighbor of a smooth gradient stays close to the source grid
    ri = np.minimum((np.arange(16) * 64) // 16, 63)
    assert np.abs(resized - img[np.ix_(ri, ri)]).mean() < 0.02
