"""Round-trip tests for the pure-stdlib GIF codec (LZW + interlace)."""

from __future__ import annotations

import numpy as np
import pytest

from email_address_parser_ray.stages.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from email_address_parser_ray.stages.multimodal import ImageResizer, MediaDecoder


def _gradient(h, w):
    y, x = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    return 0.5 + 0.4 * np.sin(3 * x) * np.cos(2 * y)


def test_lzw_roundtrip_with_dictionary_reset():
    """Random noise forces thousands of table entries, crossing every
    width bump (9..12 bits) and the 4096-entry clear/reset."""
    rng = np.random.default_rng(0)
    idx = rng.integers(0, 256, size=40_000, dtype=np.uint8)
    enc = _lzw_encode(idx, 8)
    dec = _lzw_decode(enc, 8, len(idx))
    assert np.array_equal(dec, idx)


def test_lzw_roundtrip_small_alphabet():
    """2-bit alphabet exercises the low min-code-size path and the
    KwKwK (code == next_code) case via long runs."""
    idx = np.array([0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 0, 0, 0] * 50, dtype=np.uint8)
    enc = _lzw_encode(idx, 2)
    assert np.array_equal(_lzw_decode(enc, 2, len(idx)), idx)


def test_gray_roundtrip_exact_on_palette_grid():
    img = _gradient(47, 61)
    out = decode_gif(encode_gif(img))
    assert out.shape == (47, 61)
    # palette-based: exact up to the 1/255 quantization
    assert np.abs(out - img).max() <= (0.5 / 255) + 1e-12


def test_interlaced_roundtrip_identical():
    img = _gradient(33, 20)
    plain = decode_gif(encode_gif(img, interlace=False))
    inter = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(plain, inter)


def test_extension_blocks_skipped():
    """Graphic-control + comment extensions before the frame must be
    skipped via their sub-block framing."""
    img = _gradient(9, 11)
    payload = bytearray(encode_gif(img))
    # splice extensions right after header+LSD+GCT (13 + 768 bytes)
    at = 13 + 768
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    com = b"\x21\xfe\x05hello\x00"
    spliced = bytes(payload[:at]) + gce + com + bytes(payload[at:])
    assert np.array_equal(decode_gif(spliced), decode_gif(bytes(payload)))


def test_single_pixel_and_errors():
    one = decode_gif(encode_gif(np.array([[0.5]])))
    assert one.shape == (1, 1)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError):
        encode_gif(np.zeros((0, 4)))


def test_media_decoder_and_resizer_gif():
    import pyarrow as pa

    img = _gradient(24, 48)
    payload = encode_gif(img)
    dec = MediaDecoder(fake=False, feature_dim=6)
    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([payload], pa.binary()),
        }
    )
    feats = np.array(dec(batch)["features"].to_pylist()[0])
    expected = np.array([b.mean() for b in np.array_split(img, 6, axis=1)])
    assert np.abs(feats - expected).max() < 0.01

    rz = ImageResizer(target_w=12, target_h=8, fake=False)
    rbatch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["image"]),
            "payload": pa.array([payload], pa.binary()),
            "width": pa.array([48], pa.int32()),
            "height": pa.array([24], pa.int32()),
        }
    )
    out = rz._resize_real(rbatch)["payload"].to_pylist()[0]
    assert out[:4] == b"GIF8"
    assert decode_gif(out).shape == (8, 12)
