"""Pure-stdlib baseline JPEG codec (ITU-T T.81, public spec).

Dependency-free real compressed-image path for the multimodal stages,
alongside the PNG codec: numpy does the DCT/IDCT and plane math, the
entropy coder is plain Python over the (small) per-image bitstream.

Decoder: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
arbitrary sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart
markers (DRI/RSTn), multi-table DQT/DHT segments.  All quant and
Huffman tables are read from the file (DQT/DHT) per the spec, so
decoding does not depend on the Annex-K constants below.  Returns the
luma plane as float64 HxW in [0, 1], matching ``decode_bmp`` /
``decode_png`` conventions (JPEG's Y channel IS BT.601 luma, the same
quantity the BMP path computes from RGB).

Encoder: baseline grayscale (single component) or YCbCr 4:2:0 color,
Annex-K-style quant tables scaled by the libjpeg quality convention,
standard-style Huffman tables, optional restart intervals.  Progressive
(SOF2), arithmetic coding and 12-bit precision raise
``NotImplementedError`` at the exact call site.

Reference parity note: the reference repo has no media path at all —
this module is part of the engine-addition multimodal surface the brief
mandates (opaque binary columns + real decode stages).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constants.  ZIGZAG is generated (anti-diagonal traversal, even diagonals
# run row-decreasing) rather than hardcoded; quant/Huffman constants follow
# the Annex-K shapes but correctness never depends on them — every file
# carries its own DQT/DHT and the decoder honors those.
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Index i -> flat (row*8+col) position of the i-th zigzag coefficient."""
    coords = []
    for s in range(15):
        rng = range(min(s, 7), max(0, s - 7) - 1, -1)  # row decreasing
        if s % 2 == 1:
            rng = reversed(list(rng))  # odd diagonals: row increasing
        coords.extend((r, s - r) for r in rng)
    return np.array([r * 8 + c for r, c in coords], dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)  # flat position -> zigzag index

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

# Huffman specs as (counts per code length 1..16, symbols in order).
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8x8 type-II DCT basis: pixels P -> coefficients C @ P @ C.T."""
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    m = np.cos((2 * x + 1) * u * np.pi / 16.0) / 2.0
    m[0, :] /= np.sqrt(2.0)
    return m


DCT = _dct_matrix()


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, bit length) via JPEG canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(counts: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """(bit length, code) -> symbol, for the bit-walking decoder."""
    return {(l, c): s for s, (c, l) in _canonical_codes(counts, symbols).items()}


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality convention: 50 = base table, 100 = all-ones."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category size, amplitude bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    w: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc: dict[int, tuple[int, int]],
    ac: dict[int, tuple[int, int]],
) -> int:
    """Huffman-encode one zigzagged quantized block; returns its DC value."""
    dcv = int(zz[0])
    size, bits = _magnitude(dcv - pred)
    code, length = dc[size]
    w.put(code, length)
    if size:
        w.put(bits, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac[0xF0]  # ZRL: 16 zeros
            w.put(code, length)
            run -= 16
        size, bits = _magnitude(v)
        code, length = ac[(run << 4) | size]
        w.put(code, length)
        w.put(bits, size)
        run = 0
    if last < 63:
        code, length = ac[0x00]  # EOB
        w.put(code, length)
    return dcv


def _blockify(plane: np.ndarray) -> np.ndarray:
    """HxW (multiples of 8) -> (n_blocks, 8, 8) in raster block order."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _quantized_zigzag(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Level-shift, DCT and quantize every 8x8 block; returns (n, 64) int32
    in zigzag order.  Fully vectorized; only entropy coding loops."""
    blocks = _blockify(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,njk,lk->nil", DCT, blocks, DCT)
    q = np.round(coef / qtab).astype(np.int32).reshape(-1, 64)
    return q[:, ZIGZAG]


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(body) + 2) + body


def _dqt_segment(tid: int, qtab: np.ndarray) -> bytes:
    return _marker(
        0xDB, bytes([tid]) + bytes(qtab.reshape(64)[ZIGZAG].astype(np.uint8))
    )


def _dht_segment(cls: int, tid: int, spec: tuple[list[int], list[int]]) -> bytes:
    counts, symbols = spec
    return _marker(0xC4, bytes([(cls << 4) | tid]) + bytes(counts) + bytes(symbols))


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    subsample: str = "420",
) -> bytes:
    """float64 image in [0,1] -> baseline JPEG bytes.

    2-D input encodes single-component grayscale; HxWx3 input encodes
    YCbCr color, 4:2:0 (``subsample="420"``) or 4:4:4 (``"444"``).
    ``restart_interval`` > 0 inserts RSTn markers every that many MCUs.
    """
    arr = np.clip(np.asarray(img, dtype=np.float64), 0.0, 1.0) * 255.0
    color = arr.ndim == 3
    if color and arr.shape[2] != 3:
        raise NotImplementedError("only 1- or 3-channel images supported")
    if subsample not in ("420", "444"):
        raise NotImplementedError(f"subsample {subsample!r} not supported")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    ql = _scaled_quant(QUANT_LUMA, quality)

    head = [b"\xff\xd8", _dqt_segment(0, ql)]
    if color:
        qc = _scaled_quant(QUANT_CHROMA, quality)
        head.append(_dqt_segment(1, qc))
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "420":
            sx = sy = 2
            y = _pad_edge(y, 16)
            cb = _pad_edge(cb, 16)
            cr = _pad_edge(cr, 16)
            # 2x2 mean subsample of the padded chroma planes
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
        else:
            sx = sy = 1
            y, cb, cr = _pad_edge(y, 8), _pad_edge(cb, 8), _pad_edge(cr, 8)
        planes = [
            (y, ql, 0, (sx, sy)),
            (cb, qc, 1, (1, 1)),
            (cr, qc, 1, (1, 1)),
        ]
        comp_spec = b"".join(
            bytes([cid + 1, (p[3][0] << 4) | p[3][1], p[2]])
            for cid, p in enumerate(planes)
        )
        head.append(
            _marker(0xC0, struct.pack(">BHHB", 8, h, w, 3) + comp_spec)
        )
        head += [
            _dht_segment(0, 0, DC_LUMA_SPEC),
            _dht_segment(1, 0, AC_LUMA_SPEC),
            _dht_segment(0, 1, DC_CHROMA_SPEC),
            _dht_segment(1, 1, AC_CHROMA_SPEC),
        ]
        scan_comp = b"\x01\x00\x02\x11\x03\x11"
        nscan = 3
    else:
        planes = [(_pad_edge(arr, 8), ql, 0, (1, 1))]
        head.append(
            _marker(0xC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
        )
        head += [_dht_segment(0, 0, DC_LUMA_SPEC), _dht_segment(1, 0, AC_LUMA_SPEC)]
        scan_comp = b"\x01\x00"
        nscan = 1
    if restart_interval:
        head.append(_marker(0xDD, struct.pack(">H", restart_interval)))
    head.append(_marker(0xDA, bytes([nscan]) + scan_comp + b"\x00\x3f\x00"))

    # Per-component zigzagged quantized blocks in raster block order.
    zzs = [_quantized_zigzag(p, q) for p, q, _, _ in planes]
    widths = [p.shape[1] // 8 for p, _, _, _ in planes]
    dc_tabs = [
        _canonical_codes(*(DC_LUMA_SPEC if tid == 0 else DC_CHROMA_SPEC))
        for _, _, tid, _ in planes
    ]
    ac_tabs = [
        _canonical_codes(*(AC_LUMA_SPEC if tid == 0 else AC_CHROMA_SPEC))
        for _, _, tid, _ in planes
    ]
    hmax = max(p[3][0] for p in planes)
    vmax = max(p[3][1] for p in planes)
    mcux = planes[0][0].shape[1] // (8 * hmax)
    mcuy = planes[0][0].shape[0] // (8 * vmax)

    writer = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    done_mcus = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and done_mcus and done_mcus % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci, (_, _, _, (sh, sv)) in enumerate(planes):
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * widths[ci] + (mx * sh + bx)
                        preds[ci] = _encode_block(
                            writer, zzs[ci][bi], preds[ci], dc_tabs[ci], ac_tabs[ci]
                        )
            done_mcus += 1
    writer.flush()
    return b"".join(head) + bytes(writer.out) + b"\xff\xd9"


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over one unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            return 0  # spec allows padding past the last coded bit
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _split_entropy(buf: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff the scan's entropy data from ``start``; split on RSTn.
    Returns (segments, index of the terminating marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = buf[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> float64 grayscale (luma plane) HxW in [0,1].

    Chroma coefficients are entropy-decoded (the bitstream interleaves
    them) but only the Y plane is inverse-transformed — the multimodal
    feature path consumes luma, same as the BMP/PNG decoders.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    height = width = 0
    restart_interval = 0
    i = 2
    n = len(payload)
    scan: list[tuple[int, int, int]] | None = None
    entropy_segs: list[bytes] = []
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError(f"marker expected at offset {i}")
        m = payload[i + 1]
        if m == 0xFF:  # fill byte before a marker
            i += 1
            continue
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:  # standalone
            i += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, i + 2)
        body = payload[i + 4 : i + 2 + seglen]
        i += 2 + seglen
        if m == 0xDB:  # DQT — possibly several tables per segment
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                j += 1
                if pq == 0:
                    vals = np.frombuffer(body[j : j + 64], dtype=np.uint8)
                    j += 64
                else:
                    vals = np.frombuffer(body[j : j + 128], dtype=">u2")
                    j += 128
                tab = np.zeros(64, dtype=np.float64)
                tab[ZIGZAG] = vals.astype(np.float64)
                qtabs[tq] = tab.reshape(8, 8)
        elif m == 0xC4:  # DHT — possibly several tables per segment
            j = 0
            while j < len(body):
                cls, tid = body[j] >> 4, body[j] & 0x0F
                counts = list(body[j + 1 : j + 17])
                nsym = sum(counts)
                symbols = list(body[j + 17 : j + 17 + nsym])
                htabs[(cls, tid)] = _decode_table(counts, symbols)
                j += 17 + nsym
        elif m == 0xC0 or m == 0xC1:  # baseline / extended sequential SOF
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{m:02X}) not supported"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif m == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                ci = next(k for k, cm in enumerate(comps) if cm["id"] == cid)
                scan.append((ci, tabs >> 4, tabs & 0x0F))
            entropy_segs, i = _split_entropy(payload, i)
        # APPn/COM/unknown: skipped via seglen
        if scan is not None:
            break
    if scan is None or not comps:
        raise ValueError("JPEG missing SOF/SOS")
    if len(scan) != len(comps):
        raise NotImplementedError("multi-scan (non-interleaved) JPEG not supported")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    for ci, c in enumerate(comps):
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.float64)

    seg_idx = 0
    reader = _BitReader(entropy_segs[0] if entropy_segs else b"")
    preds = [0] * len(comps)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(entropy_segs):
                raise ValueError("JPEG truncated: missing restart segment")
            reader = _BitReader(entropy_segs[seg_idx])
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, dct, act in scan:
            c = comps[ci]
            dc_tab = htabs[(0, dct)]
            ac_tab = htabs[(1, act)]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    size = reader.read_symbol(dc_tab)
                    preds[ci] += _extend(reader.read_bits(size), size)
                    block = c["coef"][(my * c["v"] + by) * c["bw"] + mx * c["h"] + bx]
                    block[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = reader.read_symbol(ac_tab)
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        size = rs & 0x0F
                        block[k] = _extend(reader.read_bits(size), size)
                        k += 1

    # Inverse-transform the luma component only, fully vectorized.
    y = comps[0]
    qt = qtabs[y["tq"]]
    coef = np.zeros((y["bh"] * y["bw"], 64), dtype=np.float64)
    coef[:, ZIGZAG] = y["coef"]
    blocks = coef.reshape(-1, 8, 8) * qt
    pix = np.einsum("ji,njk,kl->nil", DCT, blocks, DCT) + 128.0
    plane = (
        pix.reshape(y["bh"], y["bw"], 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(y["bh"] * 8, y["bw"] * 8)
    )
    # Luma plane spans ceil(H/8/vmax*v)... crop via the component's own
    # sample grid: component resolution is ceil(dim * v / vmax).
    ch = -(-height * y["v"] // vmax)
    cw = -(-width * y["h"] // hmax)
    plane = plane[:ch, :cw]
    if y["v"] != vmax or y["h"] != hmax:
        # Upsample luma to full resolution (unusual but legal).
        ri = np.minimum((np.arange(height) * ch) // height, ch - 1)
        ci2 = np.minimum((np.arange(width) * cw) // width, cw - 1)
        plane = plane[np.ix_(ri, ci2)]
    else:
        plane = plane[:height, :width]
    return np.clip(plane, 0.0, 255.0) / 255.0
