"""Real (non-fake) audio codec path: stdlib wave PCM decode through the
MediaDecoder actor pool — the component's graduation from 'partial'."""

import io
import wave

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from email_address_parser_ray.stages.multimodal import MediaDecoder, media_features


def _wav_bytes(freq: float, n: int = 1600, rate: int = 16000, width: int = 2) -> bytes:
    t = np.arange(n) / rate
    x = np.sin(2 * np.pi * freq * t)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            w.writeframes((x * 32767).astype("<i2").tobytes())
        else:
            w.writeframes(((x * 127) + 128).astype(np.uint8).tobytes())
    return buf.getvalue()


def _media_table(payloads):
    n = len(payloads)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(["audio"] * n, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.zeros(n, np.int32)),
            "height": pa.array(np.zeros(n, np.int32)),
            "sample_rate": pa.array(np.full(n, 16000, np.int32)),
        }
    )


def test_wav_decode_through_actor_pool(ray_session):
    payloads = [_wav_bytes(440.0), _wav_bytes(880.0), _wav_bytes(100.0, width=1)]
    ds = rd.from_arrow(_media_table(payloads))
    out = (
        ds.map_batches(
            lambda t: MediaDecoder(fake=False)(t), batch_format="pyarrow"
        )
        .to_pandas()
        .sort_values("media_id")
    )
    assert len(out) == 3
    feats = np.stack(out["features"].to_numpy())
    assert feats.shape == (3, 8)
    # a full-scale sine has RMS ~ 1/sqrt(2) in every segment
    assert np.allclose(feats[0], 1 / np.sqrt(2), atol=0.02)
    # distributed result equals a local decode exactly
    local = MediaDecoder(fake=False)._decode_wav(payloads[1])
    assert np.allclose(feats[1], np.round(local, 6))


def test_wav_decode_matches_stereo_downmix(ray_session):
    # stereo with L = -R downmixes to silence
    t = np.arange(800)
    x = np.sin(2 * np.pi * 440 * t / 16000)
    inter = np.empty(2 * len(x))
    inter[0::2] = x
    inter[1::2] = -x
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((inter * 32767).astype("<i2").tobytes())
    feats = MediaDecoder(fake=False)._decode_wav(buf.getvalue())
    assert np.all(feats < 1e-4)


def test_non_wav_bytes_fail_honestly(ray_session):
    with pytest.raises(wave.Error):
        MediaDecoder(fake=False)._decode_wav(b"\x00\x01\x02 not a wav")


def test_media_features_pipeline_still_fake_by_default(ray_session):
    from email_address_parser_ray.stages.multimodal import ensure_media_parquet

    media = rd.read_parquet(ensure_media_parquet(64))
    out = media_features(media).to_pandas()
    assert len(out) == 64  # md5 pseudo-feature plumbing unchanged


def test_flac_decode_through_actor_pool(ray_session):
    """FLAC payloads ride the same MediaDecoder actor pool as WAV, and
    a FLAC and a WAV encoding of the SAME samples produce the same RMS
    features (the dispatch is by magic bytes, the features by value)."""
    from email_address_parser_ray.stages.flac import encode_flac

    rng = np.random.RandomState(11)
    pcm = np.cumsum(rng.randint(-150, 151, size=4000)).clip(-30000, 30000)
    flac_payload = encode_flac(pcm.reshape(-1, 1), 16000)

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.astype("<i2").tobytes())
    wav_payload = buf.getvalue()

    ds = rd.from_arrow(_media_table([flac_payload, wav_payload]))
    out = media_features(ds, concurrency=1, batch_size=2)
    df = out.to_pandas()  # fake=True default — so drive fake=False directly:
    feats = MediaDecoder(fake=False)(_media_table([flac_payload, wav_payload]))
    f = feats["features"].to_pylist()
    assert np.allclose(f[0], f[1], atol=1e-9)
    assert len(df) == 2  # plumbing still intact for the default path
