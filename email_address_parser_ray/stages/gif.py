"""Pure-stdlib GIF codec (GIF89a, public spec) — third dependency-free
compressed image format for the multimodal stages, after PNG and JPEG.

Decoder: header + logical screen descriptor, global/local color
tables, extension blocks skipped via their sub-block framing, full
variable-width LZW decompression (clear/end codes, 12-bit cap), and
4-pass interlace de-scrambling.  Returns the FIRST image frame as
float64 grayscale HxW in [0, 1] (palette mapped through BT.601 luma),
matching the BMP/PNG/JPEG decoder conventions.

Encoder: single-frame GIF89a with a 256-entry grayscale global color
table and real LZW compression (dictionary rebuilt on clear, codes
LSB-first packed into <=255-byte sub-blocks), optional interlacing —
enough surface for round-trip tests and resized re-encodes.  GIF is
palette-based, so the gray round-trip is exact to 1/255.

Like stages/jpeg.py this is engine-addition multimodal surface; the
reference repo has no media path.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row output order of an interlaced frame (spec appendix E)."""
    return np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    ).astype(np.int64)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Variable-width GIF LZW -> uint8 index stream of n_pixels."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    npix = 0
    # dictionary as (prefix_code, last_byte); roots are implicit
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    next_code = end + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev = -1
    buf = np.empty(4096, dtype=np.uint8)  # reversed-expansion scratch

    def expand(code: int) -> np.ndarray:
        k = 0
        c = code
        while c >= clear:
            buf[k] = suffix[c]
            c = prefix[c]
            k += 1
        buf[k] = c
        return buf[: k + 1][::-1]

    while npix < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code = end + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("GIF LZW: first code not a root")
            out[npix] = code
            npix += 1
            prev = code
            continue
        if code < next_code:
            seq = expand(code)
        elif code == next_code:
            # KwKwK case: prev's expansion + its own first byte
            p = expand(prev)
            seq = np.concatenate([p, p[:1]])
        else:
            raise ValueError("GIF LZW: code out of range")
        take = min(len(seq), n_pixels - npix)
        out[npix : npix + take] = seq[:take]
        npix += take
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = seq[0]
            next_code += 1
            if next_code < 4096 and next_code == (1 << width):
                width += 1
        prev = code
    if npix < n_pixels:
        raise ValueError("GIF LZW: pixel data short")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 index stream -> GIF LZW bytes (dictionary reset on fill)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    put(clear)
    prev = -1
    for b in indices.tolist():
        if prev < 0:
            prev = b
            continue
        key = (prev, b)
        cur = table.get(key)
        if cur is not None:
            prev = cur
            continue
        put(prev)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            put(clear)
            table.clear()
            next_code = end + 1
            width = min_code_size + 1
        prev = b
    if prev >= 0:
        put(prev)
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> float64 grayscale HxW in [0,1] (first frame)."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
        i += 3 * n
    while i < len(payload):
        b = payload[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while payload[i] != 0:
                i += 1 + payload[i]
            i += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unknown GIF block 0x{b:02X} at {i}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, i + 1)
        i += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(payload[i : i + 3 * n], dtype=np.uint8).reshape(n, 3)
            i += 3 * n
        if ct is None:
            raise ValueError("GIF image has no color table")
        mcs = payload[i]
        i += 1
        chunks = []
        while payload[i] != 0:
            ln = payload[i]
            chunks.append(payload[i + 1 : i + 1 + ln])
            i += 1 + ln
        i += 1
        idx = _lzw_decode(b"".join(chunks), mcs, w * h).reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows were stored in pass order
            rows = np.empty(h, dtype=np.int64)
            rows[_interlace_order(h)] = np.arange(h)
            idx = idx[rows]
        pal = ct.astype(np.float64)
        luma = 0.299 * pal[:, 0] + 0.587 * pal[:, 1] + 0.114 * pal[:, 2]
        return np.clip(luma[idx], 0.0, 255.0) / 255.0
    raise ValueError("GIF contains no image frame")


def encode_gif(gray: np.ndarray, interlace: bool = False) -> bytes:
    """float64 grayscale in [0,1] -> single-frame GIF89a with a
    256-entry grayscale palette.  Round-trips ``decode_gif`` exactly to
    the 1/255 palette grid."""
    arr = np.clip(np.asarray(gray, dtype=np.float64), 0.0, 1.0)
    if arr.ndim != 2 or arr.size == 0:
        raise ValueError("encode_gif expects a non-empty 2-D grayscale array")
    h, w = arr.shape
    idx = np.round(arr * 255.0).astype(np.uint8)
    if interlace:
        idx = idx[_interlace_order(h)]
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3).tobytes()
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x07, 0, 0)  # GCT, 256 entries
    out += pal
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00
    )
    out.append(8)  # LZW min code size
    lzw = _lzw_encode(idx.reshape(-1), 8)
    for j in range(0, len(lzw), 255):
        chunk = lzw[j : j + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
