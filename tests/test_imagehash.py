"""Perceptual image near-dedup: dHash must be invariant to resizing
and re-encoding across the in-repo codecs (BMP/PNG/JPEG/GIF), distinct
pictures must not collide, and image_near_dup_pairs must find exactly
the planted duplicate groups through the actor-pool + banding
pipeline."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from email_address_parser_ray.stages.imagehash import (
    dhash64,
    image_near_dup_pairs,
)
from email_address_parser_ray.stages.multimodal import encode_bmp, encode_png


def _picture(seed: int, h: int = 96, w: int = 128) -> np.ndarray:
    """Smooth random 'photo': blurred low-frequency noise → gradients
    survive downsampling (flat or pure-noise images are degenerate for
    any perceptual hash)."""
    rng = np.random.RandomState(seed)
    base = rng.rand(8, 10)
    ri = np.minimum((np.arange(h) * 8) // h, 7)
    ci = np.minimum((np.arange(w) * 10) // w, 9)
    img = base[np.ix_(ri, ci)]
    return np.clip(img + rng.rand(h, w) * 0.02, 0.0, 1.0)


def _resize(gray: np.ndarray, h: int, w: int) -> np.ndarray:
    oh, ow = gray.shape
    ri = np.minimum((np.arange(h) * oh) // h, oh - 1)
    ci = np.minimum((np.arange(w) * ow) // w, ow - 1)
    return gray[np.ix_(ri, ci)]


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_dhash_invariant_to_resize_and_reencode():
    img = _picture(1)
    h0 = dhash64(img)
    assert _ham(h0, dhash64(_resize(img, 48, 64))) <= 3
    assert _ham(h0, dhash64(_resize(img, 192, 256))) <= 3
    # re-encode round trips (bmp/png are exact at 8 bits; jpeg is lossy)
    from email_address_parser_ray.stages.jpeg import decode_jpeg, encode_jpeg
    from email_address_parser_ray.stages.multimodal import decode_bmp, decode_png

    assert _ham(h0, dhash64(decode_bmp(encode_bmp(img)))) <= 1
    assert _ham(h0, dhash64(decode_png(encode_png(img)))) <= 1
    assert _ham(h0, dhash64(decode_jpeg(encode_jpeg(img, quality=90)))) <= 3


def test_dhash_separates_distinct_pictures():
    hashes = [dhash64(_picture(s)) for s in range(20)]
    for i in range(20):
        for j in range(i + 1, 20):
            assert _ham(hashes[i], hashes[j]) > 10, (i, j)


def _media_table(rows):
    n = len(rows)
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array(["image"] * n, pa.string()),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
            "width": pa.array(np.zeros(n, np.int32)),
            "height": pa.array(np.zeros(n, np.int32)),
            "sample_rate": pa.array(np.zeros(n, np.int32)),
        }
    )


def test_image_near_dup_pipeline(ray_session):
    from email_address_parser_ray.stages.jpeg import encode_jpeg

    rows = []
    # group A: one picture as BMP, PNG, JPEG, and a resize (ids 0-3)
    a = _picture(7)
    rows.append((0, encode_bmp(a)))
    rows.append((1, encode_png(a)))
    rows.append((2, encode_jpeg(a, quality=90)))
    rows.append((3, encode_png(_resize(a, 48, 64))))
    # group B: another picture twice (ids 10, 11)
    b = _picture(8)
    rows.append((10, encode_bmp(b)))
    rows.append((11, encode_png(_resize(b, 192, 256))))
    # distinct singles (ids 20..24)
    for i, s in enumerate(range(20, 25)):
        rows.append((s, encode_bmp(_picture(100 + i))))

    ds = rd.from_arrow(_media_table(rows)).repartition(3)
    got = image_near_dup_pairs(ds, max_hamming=3).to_pandas()
    pairs = {tuple(p) for p in got[["media_a", "media_b"]].to_numpy()}
    want_a = {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    want_b = {(10, 11)}
    assert want_b <= pairs
    # group A: all six pairs within the hamming budget (jpeg/resize may
    # drift a bit — require at least the clique to be CONNECTED)
    import itertools

    found_a = {p for p in pairs if p[0] < 10 and p[1] < 10}
    assert found_a, "group A produced no pairs at all"
    # connectivity check over ids 0-3
    comp = {i: i for i in range(4)}

    def find(x):
        while comp[x] != x:
            comp[x] = comp[comp[x]]
            x = comp[x]
        return x

    for x, y in found_a:
        comp[find(x)] = find(y)
    assert len({find(i) for i in range(4)}) == 1, found_a
    # no cross-group or singleton pairs
    for x, y in pairs:
        assert (x < 10 and y < 10) or {x, y} == {10, 11}, (x, y)


def test_image_near_dup_partition_invariance(ray_session):
    a = _picture(3)
    rows = [(0, encode_bmp(a)), (1, encode_png(a)),
            (2, encode_bmp(_picture(4)))]
    p1 = image_near_dup_pairs(rd.from_arrow(_media_table(rows)).repartition(1)).to_pandas()
    p2 = image_near_dup_pairs(rd.from_arrow(_media_table(rows)).repartition(3)).to_pandas()
    k1 = sorted(map(tuple, p1[["media_a", "media_b", "hamming"]].to_numpy()))
    k2 = sorted(map(tuple, p2[["media_a", "media_b", "hamming"]].to_numpy()))
    assert k1 == k2


# --- audio / video envelope hashes ----------------------------------------------


def _audio_wav(pcm, rate=16000):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.astype("<i2").tobytes())
    return buf.getvalue()


def _song(seed, n=40000):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    envelope = np.abs(np.sin(2 * np.pi * t / (n / (3 + seed % 4))))
    carrier = np.sin(2 * np.pi * 440 * t / 16000)
    return (envelope * carrier * 20000 + rng.randint(-50, 51, n)).astype(np.int64)


def test_audio_hash_wav_equals_flac_and_separates(ray_session):
    from email_address_parser_ray.stages.flac import encode_flac
    from email_address_parser_ray.stages.imagehash import MediaHasher

    hasher = MediaHasher()
    a = _song(1)
    h_wav = hasher._hash_one("audio", _audio_wav(a))
    h_flac = hasher._hash_one("audio", encode_flac(a.reshape(-1, 1), 16000))
    assert h_wav == h_flac  # both decodes are exact → identical envelope
    h_other = hasher._hash_one("audio", _audio_wav(_song(2)))
    assert _ham(h_wav, h_other) > 8


def test_audio_hash_survives_ulaw(ray_session):
    from email_address_parser_ray.stages.imagehash import MediaHasher
    from email_address_parser_ray.stages.wav import encode_ulaw

    import struct

    a = _song(3)
    codes = encode_ulaw(a.astype(np.int16)).tobytes()
    ulaw = (
        b"RIFF" + struct.pack("<I", 36 + len(codes)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 7, 1, 16000, 16000, 1, 8)
        + b"data" + struct.pack("<I", len(codes)) + codes
    )
    hasher = MediaHasher()
    assert _ham(hasher._hash_one("audio", _audio_wav(a)),
                hasher._hash_one("audio", ulaw)) <= 3


def test_video_hash_y4m_vs_mjpeg(ray_session):
    from email_address_parser_ray.stages.avi import mux_avi_mjpeg
    from email_address_parser_ray.stages.imagehash import MediaHasher
    from email_address_parser_ray.stages.jpeg import encode_jpeg
    from email_address_parser_ray.stages.multimodal import encode_y4m

    rng = np.random.RandomState(5)
    # 80 frames whose mean luma follows a smooth trend
    frames = []
    for i in range(80):
        level = 0.5 + 0.4 * np.sin(2 * np.pi * i / 20)
        frames.append(
            np.clip(level * 255 + rng.randn(32, 48) * 4, 0, 255).astype(np.uint8)
        )
    y4m = encode_y4m(frames)
    jpegs = [encode_jpeg(f.astype(np.float64) / 255.0, quality=90) for f in frames]
    avi = mux_avi_mjpeg(jpegs, 48, 32)
    hasher = MediaHasher()
    h1 = hasher._hash_one("video", y4m)
    h2 = hasher._hash_one("video", avi)
    assert _ham(h1, h2) <= 3
    other = encode_y4m([np.full((32, 48), (i * 3) % 255, np.uint8) for i in range(80)])
    assert _ham(h1, hasher._hash_one("video", other)) > 8


def test_mixed_media_near_dup_pipeline(ray_session):
    from email_address_parser_ray.stages.flac import encode_flac
    from email_address_parser_ray.stages.imagehash import media_near_dup_pairs

    img = _picture(9)
    a = _song(4)
    rows = [
        (0, "image", encode_bmp(img)),
        (1, "image", encode_png(img)),
        (10, "audio", _audio_wav(a)),
        (11, "audio", encode_flac(a.reshape(-1, 1), 16000)),
        (20, "image", encode_bmp(_picture(10))),
        (21, "audio", _audio_wav(_song(5))),
    ]
    t = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
            "width": pa.array(np.zeros(len(rows), np.int32)),
            "height": pa.array(np.zeros(len(rows), np.int32)),
            "sample_rate": pa.array(np.zeros(len(rows), np.int32)),
        }
    )
    got = media_near_dup_pairs(rd.from_arrow(t).repartition(2)).to_pandas()
    pairs = {tuple(p) for p in got[["media_a", "media_b"]].to_numpy()}
    assert (0, 1) in pairs
    assert (10, 11) in pairs
    # never across modalities, never the distinct singles
    assert pairs == {(0, 1), (10, 11)}
