"""Compressed audio codecs — G.711 µ-law/A-law companding and IMA/DVI
ADPCM inside the pure-numpy RIFF-WAVE parser (stages/wav.py), driven
through the MediaDecoder actor pool.  With these, audio has real
COMPRESSED decode paths to match JPEG/GIF (image) and MJPEG (video)."""

import wave

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from email_address_parser_ray.stages.multimodal import MediaDecoder
from email_address_parser_ray.stages.wav import (
    decode_alaw,
    decode_ima_adpcm,
    decode_ulaw,
    encode_alaw,
    encode_ima_adpcm,
    encode_ulaw,
    encode_wav,
    parse_wav,
)


def _sine(n=4000, freq=440.0, rate=16000, amp=0.7):
    return amp * np.sin(2 * np.pi * freq * np.arange(n) / rate)


def _snr_db(ref, out):
    noise = ref - out
    return 10 * np.log10(float((ref**2).sum()) / max(float((noise**2).sum()), 1e-30))


# --- G.711 codebook exactness ------------------------------------------------


def test_ulaw_codebook_idempotent():
    codes = np.arange(256, dtype=np.uint8)
    dec = decode_ulaw(codes)
    # re-encoding every decoded value must land back on a code with the
    # SAME decoded value (0x7F/0xFF both decode to 0 — negative zero)
    assert np.array_equal(decode_ulaw(encode_ulaw(dec)), dec)
    # and all codes except negative zero survive byte-exactly
    redec = encode_ulaw(dec)
    mism = np.nonzero(redec != codes)[0]
    assert all(decode_ulaw(codes[mism]) == 0 for _ in [0]) and np.all(dec[mism] == 0)
    # published extreme: code 0x80 is the most negative step (-31100 region)
    assert dec[0] == -32124 and dec[0xFF] == 0


def test_alaw_codebook_idempotent():
    codes = np.arange(256, dtype=np.uint8)
    dec = decode_alaw(codes)
    assert np.array_equal(decode_alaw(encode_alaw(dec)), dec)
    # A-law has no negative zero: full byte-exact idempotence
    assert np.array_equal(encode_alaw(dec), codes)
    # published extremes of the A-law table (±(0xFFF<<4 region))
    assert dec.min() == -32256 and dec.max() == 32256


def test_g711_sine_snr():
    x = _sine()
    pcm = np.round(x * 32767).astype(np.int16)
    for enc, dec, floor in ((encode_ulaw, decode_ulaw, 35.0), (encode_alaw, decode_alaw, 35.0)):
        out = dec(enc(pcm)).astype(np.float64) / 32768.0
        assert _snr_db(x, out) > floor  # G.711 holds ~38 dB SNR on speech-band sines


# --- IMA ADPCM ---------------------------------------------------------------


def test_ima_roundtrip_snr_and_trim():
    x = _sine(n=2000)
    pcm = np.round(x * 32767).astype(np.int16)
    body = encode_ima_adpcm(pcm, samples_per_block=505)
    block_align = 4 + (505 - 1) // 2
    out = decode_ima_adpcm(body, 1, block_align, total_samples=len(pcm))
    assert out.shape == (2000, 1)  # fact-chunk trim removes the pad tail
    assert _snr_db(x, out[:, 0].astype(np.float64) / 32768.0) > 22.0


def test_ima_decode_is_blockwise_vectorized_consistent():
    # two independent blocks decoded together == decoded one at a time
    rng = np.random.RandomState(7)
    pcm = (rng.randn(1009 * 2) * 8000).clip(-32768, 32767).astype(np.int16)
    body = encode_ima_adpcm(pcm, samples_per_block=1009)
    ba = 4 + (1009 - 1) // 2
    both = decode_ima_adpcm(body, 1, ba)
    one = np.concatenate(
        [decode_ima_adpcm(body[:ba], 1, ba), decode_ima_adpcm(body[ba:], 1, ba)]
    )
    assert np.array_equal(both, one)


def test_ima_stereo_channel_deinterleave():
    # build a stereo block by hand: ch0 a rising ramp, ch1 silence
    l = _sine(n=505, amp=0.5)
    pcm_l = np.round(l * 32767).astype(np.int16)
    pcm_r = np.zeros(505, np.int16)
    b_l = encode_ima_adpcm(pcm_l, samples_per_block=505)
    b_r = encode_ima_adpcm(pcm_r, samples_per_block=505)
    # interleave: both 4-byte headers, then alternating 4-byte groups
    groups_l, groups_r = b_l[4:], b_r[4:]
    body = b_l[:4] + b_r[:4] + b"".join(
        groups_l[i : i + 4] + groups_r[i : i + 4] for i in range(0, len(groups_l), 4)
    )
    ba = 2 * (4 + (505 - 1) // 2)
    out = decode_ima_adpcm(body, 2, ba)
    assert out.shape == (505, 2)
    assert np.array_equal(out[:, 0], decode_ima_adpcm(b_l, 1, ba // 2)[:, 0])
    assert np.all(out[:, 1] == 0)


# --- container dispatch -------------------------------------------------------


@pytest.mark.parametrize("codec,floor", [("ulaw", 35.0), ("alaw", 35.0), ("ima", 22.0)])
def test_parse_wav_compressed_codecs(codec, floor):
    x = _sine()
    rate, frames = parse_wav(encode_wav(x, rate=8000, codec=codec))
    assert rate == 8000 and frames.shape == (len(x), 1)
    assert _snr_db(x, frames[:, 0]) > floor


def test_parse_wav_pcm_matches_stdlib_convention():
    x = _sine(n=800)
    rate, frames = parse_wav(encode_wav(x, codec="pcm16"))
    assert rate == 16000
    want = np.round(x * 32767) / 32768.0
    assert np.allclose(frames[:, 0], want, atol=1e-12)


def test_parse_wav_rejects_garbage_with_wave_error():
    with pytest.raises(wave.Error):
        parse_wav(b"\x00\x01\x02 not a wav")
    with pytest.raises(wave.Error):
        parse_wav(b"RIFF\x04\x00\x00\x00AVI ")  # right container, wrong form


def test_compressed_audio_through_actor_pool(ray_session):
    x = _sine()
    payloads = [encode_wav(x, codec=c) for c in ("ulaw", "alaw", "ima", "pcm16")]
    t = pa.table(
        {
            "media_id": pa.array(np.arange(4), pa.int64()),
            "kind": pa.array(["audio"] * 4, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.zeros(4, np.int32)),
            "height": pa.array(np.zeros(4, np.int32)),
            "sample_rate": pa.array(np.full(4, 16000, np.int32)),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(lambda b: MediaDecoder(fake=False)(b), batch_format="pyarrow")
        .to_pandas()
        .sort_values("media_id")
    )
    feats = np.stack(out["features"].to_numpy())
    # a 0.7-amplitude sine has RMS 0.7/sqrt(2) in every segment; all four
    # codecs must agree with the PCM reference within companding error
    assert np.allclose(feats, 0.7 / np.sqrt(2), atol=0.02)
    assert np.allclose(feats[:3], feats[3], atol=0.01)
