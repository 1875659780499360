"""Real (non-fake) image and video codec paths — pure-numpy BMP and
YUV4MPEG2 decoders, driven end-to-end through the actor-pool stages.
With these, all three media kinds have dependency-free real decode."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from email_address_parser_ray.stages.multimodal import (
    FrameSampler,
    ImageResizer,
    MediaDecoder,
    decode_bmp,
    demux_y4m,
    encode_bmp,
    encode_y4m,
)


def _gradient(h, w):
    return np.linspace(0.0, 1.0, h * w).reshape(h, w)


def _media_table(kind, payloads):
    n = len(payloads)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array([kind] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.zeros(n, np.int32)),
            "height": pa.array(np.zeros(n, np.int32)),
            "sample_rate": pa.array(np.zeros(n, np.int32)),
        }
    )


# --- BMP codec ------------------------------------------------------------


def test_bmp_roundtrip_exact():
    g = _gradient(13, 17)  # odd width exercises the 4-byte row padding
    out = decode_bmp(encode_bmp(g))
    assert out.shape == (13, 17)
    # round-trip is exact up to the 8-bit quantization
    assert np.abs(out - g).max() <= 1.0 / 255.0 + 1e-12


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG not a bmp at all" + b"\x00" * 64)


def test_bmp_top_down_negative_height():
    g = _gradient(4, 6)
    payload = bytearray(encode_bmp(g))
    # flip to top-down: negate height, reverse stored row order
    payload[22:26] = (-4).to_bytes(4, "little", signed=True)
    off = int.from_bytes(payload[10:14], "little")
    stride = (6 * 3 + 3) & ~3
    rows = [bytes(payload[off + i * stride : off + (i + 1) * stride]) for i in range(4)]
    payload[off:] = b"".join(reversed(rows))
    assert np.abs(decode_bmp(bytes(payload)) - g).max() <= 1.0 / 255.0 + 1e-12


def test_image_features_through_actor_pool(ray_session):
    g1 = np.zeros((8, 16))
    g1[:, 8:] = 1.0  # left half black, right half white
    payloads = [encode_bmp(g1), encode_bmp(_gradient(10, 10))]
    ds = rd.from_arrow(_media_table("image", payloads))
    out = (
        ds.map_batches(lambda t: MediaDecoder(fake=False)(t), batch_format="pyarrow")
        .to_pandas()
        .sort_values("media_id")
    )
    feats = np.stack(out["features"].to_numpy())
    assert feats.shape == (2, 8)
    assert np.allclose(feats[0][:4], 0.0, atol=1e-6)
    assert np.allclose(feats[0][4:], 1.0, atol=0.01)


def test_image_resizer_real_bmp(ray_session):
    g = _gradient(32, 32)
    ds = rd.from_arrow(_media_table("image", [encode_bmp(g)]))
    out = ds.map_batches(
        lambda t: ImageResizer(target_w=8, target_h=8, fake=False)(t),
        batch_format="pyarrow",
    ).take_all()
    resized = decode_bmp(out[0]["payload"])
    assert resized.shape == (8, 8)
    # nearest-neighbor of a smooth gradient keeps the corner ordering
    assert resized[0, 0] < resized[-1, -1]


# --- Y4M codec --------------------------------------------------------------


def _y4m(n_frames=10, h=6, w=8):
    frames = [np.full((h, w), 10 * i, np.uint8) for i in range(n_frames)]
    return encode_y4m(frames), frames


def test_y4m_roundtrip():
    payload, frames = _y4m()
    w, h, out = demux_y4m(payload)
    assert (w, h, len(out)) == (8, 6, 10)
    for a, b in zip(out, frames):
        assert np.array_equal(a, b)


def test_y4m_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        demux_y4m(b"RIFF this is not y4m")
    payload, _ = _y4m(n_frames=2)
    with pytest.raises(ValueError):
        demux_y4m(payload[:-5])


def test_video_features_through_actor_pool(ray_session):
    payload, frames = _y4m(n_frames=8)
    ds = rd.from_arrow(_media_table("video", [payload]))
    out = ds.map_batches(
        lambda t: MediaDecoder(fake=False)(t), batch_format="pyarrow"
    ).take_all()
    feats = np.array(out[0]["features"])
    expect = np.array([f.mean() / 255.0 for f in frames])
    assert np.allclose(feats, np.round(expect, 6), atol=1e-6)


def test_frame_sampler_real_emits_bmp_frames(ray_session):
    payload, frames = _y4m(n_frames=9)
    ds = rd.from_arrow(_media_table("video", [payload]))
    out = (
        ds.map_batches(
            lambda t: FrameSampler(n_frames=3, fake=False)(t), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("frame_idx")
    )
    assert list(out["frame_idx"]) == [0, 3, 6]
    for _, row in out.iterrows():
        plane = decode_bmp(row["frame_payload"])
        assert plane.shape == (6, 8)
        want = frames[row["frame_idx"]].astype(np.float64) / 255.0
        assert np.abs(plane - want).max() <= 1.0 / 255.0 + 1e-12


def test_unknown_compressed_format_fails_honestly():
    dec = MediaDecoder(fake=False)
    if dec.pil is None:
        with pytest.raises((NotImplementedError, ValueError)):
            dec._decode(b"\xff\xd8\xff\xe0 jpeg-ish bytes", "image")
