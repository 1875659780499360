"""MJPEG-in-AVI video path — RIFF demux/mux (stages/avi.py) composed
with the in-repo baseline JPEG codec, driven end-to-end through the
actor-pool video stages.  This is the engine's real COMPRESSED video
format (every frame an independent baseline JPEG), complementing the
raw-plane Y4M path."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from email_address_parser_ray.stages.avi import demux_avi_mjpeg, mux_avi_mjpeg
from email_address_parser_ray.stages.jpeg import decode_jpeg, encode_jpeg
from email_address_parser_ray.stages.multimodal import (
    FrameSampler,
    MediaDecoder,
    decode_bmp,
)


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


def _mjpeg_avi(n_frames=6, h=16, w=16, quality=95):
    """AVI payload whose frames are flat-gray JPEGs of increasing level."""
    levels = [0.1 + 0.12 * i for i in range(n_frames)]
    jpegs = [encode_jpeg(np.full((h, w), lv), quality=quality) for lv in levels]
    return mux_avi_mjpeg(jpegs, w, h), jpegs, levels


def test_avi_roundtrip_byte_exact():
    payload, jpegs, _ = _mjpeg_avi()
    w, h, out = demux_avi_mjpeg(payload)
    assert (w, h, len(out)) == (16, 16, 6)
    for a, b in zip(out, jpegs):
        assert a == b  # the container never touches the codec bytes


def test_avi_rejects_non_avi_and_empty():
    with pytest.raises(ValueError):
        demux_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        mux_avi_mjpeg([], 8, 8)


def test_avi_ignores_non_jpeg_stream_chunks():
    payload, jpegs, _ = _mjpeg_avi(n_frames=2)
    # splice a non-JPEG data chunk into the movi list: demux must skip it
    import struct

    extra = b"01db" + struct.pack("<I", 4) + b"\x00\x01\x02\x03"
    movi_at = payload.index(b"movi")
    patched = bytearray(payload)
    patched[movi_at + 4 : movi_at + 4] = extra
    # fix the two enclosing sizes (RIFF at 4, movi LIST just before the tag)
    list_at = payload.rindex(b"LIST", 0, movi_at)
    for at in (4, list_at + 4):
        old = struct.unpack_from("<I", patched, at)[0]
        struct.pack_into("<I", patched, at, old + len(extra))
    _, _, out = demux_avi_mjpeg(bytes(patched))
    assert out == jpegs


def test_avi_video_features_through_actor_pool(ray_session):
    payload, jpegs, _ = _mjpeg_avi(n_frames=8)
    ds = rd.from_arrow(_media_table("video", [payload]))
    out = ds.map_batches(
        lambda t: MediaDecoder(fake=False)(t), batch_format="pyarrow"
    ).take_all()
    feats = np.array(out[0]["features"])
    expect = np.array([float(decode_jpeg(j).mean()) for j in jpegs])
    assert np.allclose(feats, np.round(expect, 6), atol=1e-6)
    # and the decoded means track the authored brightness ramp
    assert np.all(np.diff(expect) > 0)


def test_frame_sampler_real_avi_emits_bmp_frames(ray_session):
    payload, jpegs, levels = _mjpeg_avi(n_frames=9)
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
        assert plane.shape == (16, 16)
        # flat-gray JPEG at q=95 is near-lossless; BMP re-encode adds 1/255
        assert abs(float(plane.mean()) - levels[row["frame_idx"]]) < 0.02
