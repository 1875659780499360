"""Pure-numpy RIFF-WAVE parser with COMPRESSED codec support.

The stdlib ``wave`` module only reads integer PCM.  This parser walks
the RIFF chunks itself and decodes the classic telephony/container
codecs from their public specs, all vectorized:

* format 1 — integer PCM, 8/16/24/32-bit;
* format 3 — IEEE float, 32/64-bit;
* format 6 — G.711 A-law (ITU-T G.711, segment + mantissa companding);
* format 7 — G.711 µ-law (bias-0x84 companding);
* format 0x11 — IMA/DVI ADPCM (block-structured 4-bit differential;
  decoded with the step/index tables from the IMA ADPCM reference,
  vectorized ACROSS blocks — the per-sample recurrence runs once per
  nibble position over all blocks at once, so a 1-hour file is ~1000
  numpy ops, not 30M Python iterations);
* format 0xFFFE — WAVE_FORMAT_EXTENSIBLE (sub-format GUID unwrapped).

G.711 decode/encode follow the ITU segment layout (the same tables as
the public-domain Sun ``g711.c``); IMA follows the IMA Digital Audio
Focus Group recommendation as used by the WAV ``0x11`` format.  Errors
raise ``wave.Error`` so callers keep a single honest-failure exception
type for "not decodable audio" regardless of which parser ran.

Engine-addition multimodal surface (the reference has no media path).
"""

from __future__ import annotations

import struct
from wave import Error as WavError

import numpy as np

# --- G.711 companding -------------------------------------------------------

_SEG_ENDS = np.array(
    [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], np.int32
)


def decode_ulaw(codes: np.ndarray) -> np.ndarray:
    """uint8 µ-law codes → int16 linear samples (vectorized)."""
    u = (~codes.astype(np.uint8)).astype(np.int32)
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def encode_ulaw(pcm: np.ndarray) -> np.ndarray:
    """int16 linear samples → uint8 µ-law codes (vectorized)."""
    x = pcm.astype(np.int32)
    mask = np.where(x < 0, 0x7F, 0xFF)
    p = np.minimum(np.abs(x), 32635) + 0x84
    seg = np.searchsorted(_SEG_ENDS, p)
    uval = (seg << 4) | ((p >> (seg + 3)) & 0x0F)
    return (uval ^ mask).astype(np.uint8)


def decode_alaw(codes: np.ndarray) -> np.ndarray:
    """uint8 A-law codes → int16 linear samples (vectorized)."""
    a = codes.astype(np.int32) ^ 0x55
    seg = (a >> 4) & 0x07
    t = ((a & 0x0F) << 4) + np.where(seg == 0, 8, 0x108)
    t = t << np.maximum(seg - 1, 0)
    return np.where(a & 0x80, t, -t).astype(np.int16)


def encode_alaw(pcm: np.ndarray) -> np.ndarray:
    """int16 linear samples → uint8 A-law codes (vectorized)."""
    x = pcm.astype(np.int32)
    p = np.minimum(np.abs(x), 0x7FFF)
    seg = np.searchsorted(_SEG_ENDS, p)
    mant = (p >> np.maximum(seg + 3, 4)) & 0x0F
    aval = np.where(x >= 0, 0x80, 0) | (seg << 4) | mant
    return (aval ^ 0x55).astype(np.uint8)


# --- IMA/DVI ADPCM -----------------------------------------------------------

_IMA_STEPS = np.array(
    [7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
     41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
     190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
     724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
     2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
     6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
     16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int32
)
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], np.int32
)


def _ima_decode_nibbles(nibs: np.ndarray, pred0: np.ndarray, idx0: np.ndarray):
    """(B, n_nib) uint8 nibbles + per-block seeds → (B, n_nib+1) int16.

    The recurrence is sequential per block, so the loop runs over
    NIBBLE POSITION (vector over all blocks per step)."""
    n_blocks, n_nib = nibs.shape
    out = np.empty((n_blocks, n_nib + 1), np.int16)
    pred = pred0.astype(np.int32)
    idx = np.clip(idx0.astype(np.int32), 0, 88)
    out[:, 0] = pred
    for j in range(n_nib):
        nib = nibs[:, j].astype(np.int32)
        step = _IMA_STEPS[idx]
        diff = (
            (step >> 3)
            + np.where(nib & 1, step >> 2, 0)
            + np.where(nib & 2, step >> 1, 0)
            + np.where(nib & 4, step, 0)
        )
        pred = np.clip(np.where(nib & 8, pred - diff, pred + diff), -32768, 32767)
        idx = np.clip(idx + _IMA_INDEX[nib], 0, 88)
        out[:, j + 1] = pred
    return out


def _bytes_to_nibbles(b: np.ndarray) -> np.ndarray:
    """(..., n) uint8 → (..., 2n) nibbles, LOW nibble first (WAV order)."""
    out = np.empty(b.shape[:-1] + (2 * b.shape[-1],), np.uint8)
    out[..., 0::2] = b & 0x0F
    out[..., 1::2] = b >> 4
    return out


def decode_ima_adpcm(
    data: bytes, channels: int, block_align: int, total_samples: int | None = None
) -> np.ndarray:
    """WAV format-0x11 data chunk → (n, channels) int16.

    Block = per-channel 4-byte header (int16 predictor, uint8 step
    index, reserved) then 4-byte channel-interleaved nibble groups.
    ``total_samples`` (from the ``fact`` chunk) trims the final block.
    """
    if block_align <= 4 * channels or block_align % 4:
        raise WavError(f"bad IMA ADPCM block align {block_align}")
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return np.zeros((0, channels), np.int16)
    raw = np.frombuffer(data[: n_blocks * block_align], np.uint8).reshape(
        n_blocks, block_align
    )
    hdr = raw[:, : 4 * channels].reshape(n_blocks, channels, 4)
    pred0 = (
        hdr[:, :, 0].astype(np.int32) | (hdr[:, :, 1].astype(np.int32) << 8)
    ).astype(np.int16)
    idx0 = hdr[:, :, 2]
    body = raw[:, 4 * channels :].reshape(n_blocks, -1, channels, 4)
    # concatenate each channel's 4-byte groups → its in-block byte stream
    per_ch = body.transpose(0, 2, 1, 3).reshape(n_blocks, channels, -1)
    spb = 1 + 2 * per_ch.shape[2]  # samples per block per channel
    out = np.empty((n_blocks, channels, spb), np.int16)
    for c in range(channels):
        out[:, c, :] = _ima_decode_nibbles(
            _bytes_to_nibbles(per_ch[:, c, :]), pred0[:, c], idx0[:, c]
        )
    frames = out.transpose(0, 2, 1).reshape(-1, channels)
    if total_samples is not None:
        frames = frames[:total_samples]
    return frames


def encode_ima_adpcm(pcm: np.ndarray, samples_per_block: int = 505) -> bytes:
    """Mono int16 → format-0x11 block stream (reference scalar encoder,
    test-scale; the decode path is the production surface)."""
    if samples_per_block % 2 == 0:
        raise WavError("IMA samples_per_block must be odd (header seeds one)")
    x = pcm.astype(np.int32)
    blocks = []
    idx = 0
    for at in range(0, len(x), samples_per_block):
        chunk = x[at : at + samples_per_block]
        if len(chunk) < samples_per_block:  # zero-pad the tail block
            chunk = np.concatenate([chunk, np.zeros(samples_per_block - len(chunk), np.int32)])
        pred = int(chunk[0])
        blocks.append(struct.pack("<hBB", pred, idx, 0))
        nibs = bytearray()
        cur = None
        for s in chunk[1:]:
            step = int(_IMA_STEPS[idx])
            diff = int(s) - pred
            nib = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # reconstruct exactly as the decoder will
            step_full = int(_IMA_STEPS[idx])
            d = step_full >> 3
            if nib & 1:
                d += step_full >> 2
            if nib & 2:
                d += step_full >> 1
            if nib & 4:
                d += step_full
            pred = int(np.clip(pred - d if nib & 8 else pred + d, -32768, 32767))
            idx = int(np.clip(idx + int(_IMA_INDEX[nib]), 0, 88))
            if cur is None:
                cur = nib
            else:
                nibs.append(cur | (nib << 4))
                cur = None
        if cur is not None:
            nibs.append(cur)
        blocks.append(bytes(nibs))
    return b"".join(blocks)


# --- RIFF-WAVE container ------------------------------------------------------

_TAG_PCM, _TAG_FLOAT, _TAG_ALAW, _TAG_ULAW, _TAG_IMA, _TAG_EXT = (
    1, 3, 6, 7, 0x11, 0xFFFE,
)


def parse_wav(payload: bytes):
    """WAV bytes → (sample_rate, float64 array (n, channels) in [-1, 1]).

    Raises ``wave.Error`` on anything that is not decodable audio."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavError("file does not start with RIFF id or not a WAVE file")
    fmt = None
    data = None
    fact_samples = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact" and size >= 4:
            (fact_samples,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    tag, channels, rate, _, block_align, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == _TAG_EXT:
        if len(fmt) < 26:
            raise WavError("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk")
        (tag,) = struct.unpack_from("<H", fmt, 24)  # SubFormat GUID leads with the tag
    if channels < 1:
        raise WavError("bad channel count")

    if tag == _TAG_PCM:
        if bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data[: (len(data) // 3) * 3], np.uint8).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v & 0x800000, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float64) / float(1 << 31)
        else:
            raise WavError(f"{bits}-bit PCM not supported")
    elif tag == _TAG_FLOAT:
        if bits == 32:
            x = np.frombuffer(data, "<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, "<f8").astype(np.float64)
        else:
            raise WavError(f"{bits}-bit float not supported")
    elif tag == _TAG_ULAW:
        x = decode_ulaw(np.frombuffer(data, np.uint8)).astype(np.float64) / 32768.0
    elif tag == _TAG_ALAW:
        x = decode_alaw(np.frombuffer(data, np.uint8)).astype(np.float64) / 32768.0
    elif tag == _TAG_IMA:
        frames = decode_ima_adpcm(data, channels, block_align, fact_samples)
        return rate, frames.astype(np.float64) / 32768.0
    else:
        raise WavError(f"unknown format: {tag}")
    n = (len(x) // channels) * channels
    return rate, x[:n].reshape(-1, channels)


def encode_wav(
    samples: np.ndarray, rate: int = 16000, codec: str = "pcm16",
    samples_per_block: int = 505,
) -> bytes:
    """float64 mono samples in [-1, 1] → WAV bytes in the given codec
    (``pcm16`` | ``ulaw`` | ``alaw`` | ``ima``).  Test-support muxer for
    the compressed decode paths, mono only."""
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype(np.int16)
    if codec == "pcm16":
        tag, bits, body, block_align = _TAG_PCM, 16, pcm.astype("<i2").tobytes(), 2
        extra = b""
    elif codec == "ulaw":
        tag, bits, body, block_align = _TAG_ULAW, 8, encode_ulaw(pcm).tobytes(), 1
        extra = struct.pack("<H", 0)
    elif codec == "alaw":
        tag, bits, body, block_align = _TAG_ALAW, 8, encode_alaw(pcm).tobytes(), 1
        extra = struct.pack("<H", 0)
    elif codec == "ima":
        body = encode_ima_adpcm(pcm, samples_per_block)
        tag, bits = _TAG_IMA, 4
        block_align = 4 + (samples_per_block - 1) // 2
        extra = struct.pack("<HH", 2, samples_per_block)  # cbSize, wSamplesPerBlock
    else:
        raise WavError(f"unknown codec {codec!r}")
    fmt = struct.pack(
        "<HHIIHH", tag, 1, rate, rate * block_align, block_align, bits
    ) + extra

    def chunk(cid: bytes, b: bytes) -> bytes:
        return cid + struct.pack("<I", len(b)) + b + (b"\x00" if len(b) & 1 else b"")

    parts = chunk(b"fmt ", fmt)
    if tag != _TAG_PCM:
        parts += chunk(b"fact", struct.pack("<I", len(pcm)))
    parts += chunk(b"data", body)
    return b"RIFF" + struct.pack("<I", 4 + len(parts)) + b"WAVE" + parts
