"""FLAC codec round-trips — every parse_flac branch is exercised by
the in-repo encoder: subframe kinds (constant/verbatim/fixed/LPC),
Rice vs escape residuals, partition orders, wasted bits, stereo
decorrelation modes, multi-frame streams with a short tail block, and
the MediaDecoder audio dispatch."""

import numpy as np
import pyarrow as pa
import pytest
from wave import Error as WavError

from email_address_parser_ray.stages.flac import (
    crc8,
    crc16,
    encode_flac,
    parse_flac,
)


def _smooth(n, seed=3, scale=200):
    rng = np.random.RandomState(seed)
    return np.cumsum(rng.randint(-scale, scale + 1, size=n)).clip(-30000, 30000)


def _stereo(n, seed=5):
    return np.stack([_smooth(n, seed), _smooth(n, seed + 1)], axis=1)


def _roundtrip(pcm, rate=16000, **kw):
    payload = encode_flac(pcm, rate, **kw)
    got_rate, frames = parse_flac(payload)
    assert got_rate == rate
    pcm2 = np.asarray(pcm)
    if pcm2.ndim == 1:
        pcm2 = pcm2.reshape(-1, 1)
    back = np.round(frames * (1 << 15)).astype(np.int64)
    assert back.shape == pcm2.shape
    assert np.array_equal(back, pcm2), (
        f"mismatch at {np.flatnonzero((back != pcm2).any(axis=1))[:5]}"
    )
    return payload


def test_verbatim_roundtrip():
    rng = np.random.RandomState(1)
    _roundtrip(rng.randint(-32768, 32767, size=(3000, 1)), subframe="verbatim")


def test_fixed_orders_roundtrip():
    for order in (0, 1, 2):
        _roundtrip(_smooth(5000).reshape(-1, 1), subframe=f"fixed{order}")


def test_lpc_roundtrip():
    for order in (1, 2):
        _roundtrip(_smooth(4000).reshape(-1, 1), subframe=f"lpc{order}")


def test_constant_blocks():
    pcm = np.full((8192, 1), -1234, np.int64)
    _roundtrip(pcm, subframe="fixed2")  # constant autodetected per block


def test_stereo_decorrelation_modes():
    pcm = _stereo(6000)
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        _roundtrip(pcm, channel_mode=mode)


def test_escape_residuals():
    _roundtrip(_smooth(3000).reshape(-1, 1), subframe="fixed2", escape=True)


def test_partition_orders():
    for po in (1, 2, 3):
        _roundtrip(_stereo(4096), partition_order=po, channel_mode="mid_side")


def test_wasted_bits():
    pcm = (_smooth(2500) << 3).clip(-32768, 32760).reshape(-1, 1)
    pcm = (pcm >> 3) << 3  # guarantee 3 zero low bits after the clip
    _roundtrip(pcm, subframe="fixed1", wasted=3)


def test_multi_frame_with_short_tail():
    # 3 full frames of 1000 + a 337-sample tail frame
    _roundtrip(_stereo(3337), block_size=1000, channel_mode="left_side")


def test_small_block_sizes_use_8bit_code():
    _roundtrip(_smooth(500).reshape(-1, 1), block_size=200)


def test_not_flac_raises():
    with pytest.raises(WavError):
        parse_flac(b"RIFF....WAVE")
    with pytest.raises(WavError):
        parse_flac(b"fLaC" + b"\x00" * 10)  # truncated STREAMINFO


def test_truncated_stream_raises():
    payload = _roundtrip(_smooth(2000).reshape(-1, 1))
    with pytest.raises(WavError):
        parse_flac(payload[: len(payload) - 40])


def test_crc_vectors():
    # spot values computed from the generator polynomials by hand
    assert crc8(b"") == 0
    assert crc16(b"") == 0
    assert crc8(b"\x00") == 0
    assert crc8(b"123456789") == 0xF4  # standard CRC-8/ATM check value
    assert crc16(b"123456789") == 0xFEE8  # CRC-16/UMTS (BUYPASS) check value


def test_media_decoder_flac_dispatch():
    """The audio actor stage decodes FLAC payloads through the same
    RMS feature path as WAV, and both agree on the same samples."""
    from email_address_parser_ray.stages.multimodal import MediaDecoder

    pcm = _smooth(8000).reshape(-1, 1)
    flac_payload = encode_flac(pcm, 16000)

    import struct

    data = pcm.astype("<i2").tobytes()
    wav_payload = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    dec = MediaDecoder(fake=False)
    f_flac = dec._decode_wav(flac_payload)
    f_wav = dec._decode_wav(wav_payload)
    assert np.allclose(f_flac, f_wav, atol=1e-9)
    assert (f_flac > 0).any()


def test_short_tail_block_with_partition_order():
    """A tail block shorter than 2^po * order must fall back to one
    partition (partition 0 holds blocksize>>po - order samples, which
    would go negative)."""
    pcm = _smooth(132).reshape(-1, 1)  # 128-block + 4-sample tail
    _roundtrip(pcm, block_size=128, subframe="fixed2", partition_order=2)
