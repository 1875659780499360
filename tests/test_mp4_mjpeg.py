"""MJPEG-in-MP4/MOV video path — ISO-BMFF demux/mux (stages/mp4.py)
composed with the in-repo JPEG codec: byte-exact round-trip, the real
sample-table shapes (multi-chunk stsc runs, co64 offsets), the
actor-pool stages, and cross-container near-dup pairing (MP4 vs AVI
of the same frames must hash together)."""

import struct

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from email_address_parser_ray.stages.avi import mux_avi_mjpeg
from email_address_parser_ray.stages.jpeg import decode_jpeg, encode_jpeg
from email_address_parser_ray.stages.mp4 import (
    _box,
    _full,
    demux_mp4_mjpeg,
    is_isobmff,
    mux_mp4_mjpeg,
)
from email_address_parser_ray.stages.multimodal import FrameSampler, MediaDecoder


def _jpeg_ramp(n_frames=6, h=16, w=16, quality=95):
    levels = [0.1 + 0.12 * i for i in range(n_frames)]
    return [encode_jpeg(np.full((h, w), lv), quality=quality) for lv in levels], levels


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


def test_mp4_roundtrip_byte_exact():
    jpegs, _ = _jpeg_ramp()
    payload = mux_mp4_mjpeg(jpegs, 16, 16)
    assert is_isobmff(payload)
    w, h, out = demux_mp4_mjpeg(payload)
    assert (w, h, len(out)) == (16, 16, 6)
    for a, b in zip(out, jpegs):
        assert a == b  # the container never touches the codec bytes


def test_mp4_rejects_non_bmff_and_empty():
    with pytest.raises(ValueError):
        demux_mp4_mjpeg(b"RIFF\x08\x00\x00\x00AVI LIST")
    with pytest.raises(ValueError):
        mux_mp4_mjpeg([], 8, 8)
    # a valid container with a non-MJPEG track fourcc must refuse
    jpegs, _ = _jpeg_ramp(2)
    payload = bytearray(mux_mp4_mjpeg(jpegs, 16, 16))
    at = payload.index(b"jpeg", payload.index(b"stsd"))
    payload[at : at + 4] = b"avc1"
    with pytest.raises(ValueError, match="no MJPEG video trak"):
        demux_mp4_mjpeg(bytes(payload))


def test_mp4_multichunk_stsc_and_co64():
    """Hand-build the sample table the simple muxer never emits: 3
    frames split 2+1 across two chunks, offsets in co64."""
    jpegs, _ = _jpeg_ramp(3)
    ftyp = _box(b"ftyp", b"qt  " + struct.pack(">I", 0) + b"qt  ")
    gap = b"\xde\xad"  # chunks need not be contiguous
    mdat = _box(b"mdat", jpegs[0] + jpegs[1] + gap + jpegs[2])
    c1 = len(ftyp) + 8
    c2 = c1 + len(jpegs[0]) + len(jpegs[1]) + len(gap)

    entry = (
        struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", 16, 16)
        + struct.pack(">II", 0x00480000, 0x00480000) + b"\x00" * 4
        + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stsc = _full(
        b"stsc", 0, 0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 2, 1, 1),
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, 3)
        + b"".join(struct.pack(">I", len(f)) for f in jpegs),
    )
    co64 = _full(b"co64", 0, 0, struct.pack(">I", 2) + struct.pack(">QQ", c1, c2))
    stbl = _box(b"stbl", stsd + stsc + stsz + co64)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    tkhd = _full(b"tkhd", 0, 7, b"\x00" * 72 + struct.pack(">II", 16 << 16, 16 << 16))
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", trak)
    _, _, out = demux_mp4_mjpeg(ftyp + mdat + moov)
    assert out == jpegs


def test_mp4_video_features_match_avi(ray_session):
    jpegs, _ = _jpeg_ramp(8)
    mp4 = mux_mp4_mjpeg(jpegs, 16, 16)
    avi = mux_avi_mjpeg(jpegs, 16, 16)
    outs = {}
    for name, payload in (("mp4", mp4), ("avi", avi)):
        ds = rd.from_arrow(_media_table("video", [payload]))
        rows = ds.map_batches(
            lambda t: MediaDecoder(fake=False)(t), batch_format="pyarrow"
        ).take_all()
        outs[name] = list(rows[0]["features"])
    assert outs["mp4"] == outs["avi"]  # identical JPEG bytes → identical features


def test_frame_sampler_real_mp4(ray_session):
    jpegs, levels = _jpeg_ramp(9)
    ds = rd.from_arrow(_media_table("video", [mux_mp4_mjpeg(jpegs, 16, 16)]))
    out = (
        ds.map_batches(
            lambda t: FrameSampler(n_frames=3, fake=False)(t), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("frame_idx")
    )
    assert list(out["frame_idx"]) == [0, 3, 6]


def test_cross_container_near_dup_pairs(ray_session):
    """The verdict's done-criterion: MP4 and AVI of the SAME frames
    must come out as a near-dup pair; an unrelated video must not."""
    from email_address_parser_ray.stages.imagehash import media_near_dup_pairs

    rng = np.random.RandomState(5)
    frames = []
    for i in range(80):
        level = 0.5 + 0.4 * np.sin(2 * np.pi * i / 20)
        frames.append(np.clip(level + rng.randn(32, 48) * 0.015, 0, 1))
    jpegs = [encode_jpeg(f, quality=90) for f in frames]
    other = [
        encode_jpeg(np.full((32, 48), ((i * 37) % 255) / 255.0), quality=90)
        for i in range(80)
    ]
    rows = [
        (0, mux_mp4_mjpeg(jpegs, 48, 32)),
        (1, mux_avi_mjpeg(jpegs, 48, 32)),
        (2, mux_mp4_mjpeg(other, 48, 32)),
    ]
    t = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array(["video"] * 3, pa.string()),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )
    pairs = media_near_dup_pairs(rd.from_arrow(t)).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["media_a"], pairs["media_b"])}
    assert (0, 1) in got
    assert (0, 2) not in got and (1, 2) not in got
