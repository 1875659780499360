"""Decoder interop tests: streams with structural choices our own
encoder never emits — 4:2:2 sampling, 16-bit (Pq=1) quant tables, all
four Huffman tables merged into one DHT segment, APP0/COM markers, and
the extended-sequential SOF1 marker.  A "foreign" encoder built from
the module's primitives produces them; the decoder must read every
table and geometry from the file itself.
"""

from __future__ import annotations

import struct

import numpy as np
from hypothesis import given, settings, strategies as st

from email_address_parser_ray.stages.jpeg import (
    AC_CHROMA_SPEC,
    AC_LUMA_SPEC,
    DC_CHROMA_SPEC,
    DC_LUMA_SPEC,
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    _BitWriter,
    _canonical_codes,
    _encode_block,
    _pad_edge,
    _quantized_zigzag,
    _scaled_quant,
    decode_jpeg,
    encode_jpeg,
)


def _foreign_422_jpeg(rgb: np.ndarray, quality: int = 95) -> bytes:
    """YCbCr 4:2:2 baseline stream with 16-bit DQT, merged DHT, APP0+COM,
    and SOF1 — every structural axis different from ``encode_jpeg``."""
    arr = np.clip(rgb, 0.0, 1.0) * 255.0
    h, w = arr.shape[:2]
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    # MCU = 16x8: Y is h=2,v=1; chroma halved horizontally only.
    y = _pad_edge(y, 1)
    ypad = np.pad(
        y, ((0, (-h) % 8), (0, (-w) % 16)), mode="edge"
    )
    cbp = np.pad(cb, ((0, (-h) % 8), (0, (-w) % 16)), mode="edge")
    crp = np.pad(cr, ((0, (-h) % 8), (0, (-w) % 16)), mode="edge")
    cbp = cbp.reshape(cbp.shape[0], cbp.shape[1] // 2, 2).mean(axis=2)
    crp = crp.reshape(crp.shape[0], crp.shape[1] // 2, 2).mean(axis=2)

    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    def seg(tag: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body

    # 16-bit DQT (Pq=1), both tables in ONE segment.
    def dqt16(tid: int, q: np.ndarray) -> bytes:
        vals = q.reshape(64)[ZIGZAG].astype(">u2").tobytes()
        return bytes([(1 << 4) | tid]) + vals

    # all four Huffman tables in ONE DHT segment
    def dht(cls: int, tid: int, spec) -> bytes:
        counts, symbols = spec
        return bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols)

    head = [
        b"\xff\xd8",
        seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"),
        seg(0xFE, b"foreign encoder interop probe"),
        seg(0xDB, dqt16(0, ql) + dqt16(1, qc)),
        seg(  # SOF1 (extended sequential — same entropy layout as SOF0)
            0xC1,
            struct.pack(">BHHB", 8, h, w, 3)
            + bytes([1, 0x21, 0])  # Y: h=2,v=1
            + bytes([2, 0x11, 1])
            + bytes([3, 0x11, 1]),
        ),
        seg(
            0xC4,
            dht(0, 0, DC_LUMA_SPEC)
            + dht(1, 0, AC_LUMA_SPEC)
            + dht(0, 1, DC_CHROMA_SPEC)
            + dht(1, 1, AC_CHROMA_SPEC),
        ),
        seg(0xDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00"),
    ]

    planes = [(ypad, ql, (2, 1)), (cbp, qc, (1, 1)), (crp, qc, (1, 1))]
    zzs = [_quantized_zigzag(p, q) for p, q, _ in planes]
    widths = [p.shape[1] // 8 for p, _, _ in planes]
    dct_tabs = [
        _canonical_codes(*DC_LUMA_SPEC),
        _canonical_codes(*DC_CHROMA_SPEC),
        _canonical_codes(*DC_CHROMA_SPEC),
    ]
    act_tabs = [
        _canonical_codes(*AC_LUMA_SPEC),
        _canonical_codes(*AC_CHROMA_SPEC),
        _canonical_codes(*AC_CHROMA_SPEC),
    ]
    mcux = ypad.shape[1] // 16
    mcuy = ypad.shape[0] // 8
    writer = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (_, _, (sh, sv)) in enumerate(planes):
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * widths[ci] + (mx * sh + bx)
                        preds[ci] = _encode_block(
                            writer, zzs[ci][bi], preds[ci], dct_tabs[ci], act_tabs[ci]
                        )
    writer.flush()
    return b"".join(head) + bytes(writer.out) + b"\xff\xd9"


def test_foreign_422_stream_decodes():
    base_y, base_x = np.meshgrid(
        np.linspace(0, 1, 40), np.linspace(0, 1, 56), indexing="ij"
    )
    base = 0.5 + 0.3 * np.sin(2 * np.pi * base_x) * np.cos(np.pi * base_y)
    rgb = np.stack([base, 1 - base, base**2], axis=2)
    payload = _foreign_422_jpeg(rgb, quality=95)
    out = decode_jpeg(payload)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert out.shape == (40, 56)
    assert np.abs(out - luma).mean() < 0.01


def test_foreign_odd_width_422():
    rng = np.random.default_rng(3)
    rgb = np.clip(
        0.5 + 0.1 * rng.standard_normal((19, 21, 3)).cumsum(axis=1) / 4, 0, 1
    )
    out = decode_jpeg(_foreign_422_jpeg(rgb, quality=95))
    assert out.shape == (19, 21)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_quality100_near_lossless(h, w, seed):
    """At quality 100 every quant step is 1, so reconstruction error is
    bounded by DCT rounding — a property that holds for ARBITRARY
    images, not just smooth ones."""
    rng = np.random.default_rng(seed)
    img = rng.random((h, w))
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (h, w)
    assert np.abs(out - img).max() < 0.02
