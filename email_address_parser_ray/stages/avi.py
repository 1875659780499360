"""Minimal AVI (RIFF) demuxer/muxer for MJPEG — real COMPRESSED video.

Motion-JPEG in an AVI container is the simplest widely-used compressed
video format: every frame is an independent baseline JPEG, so the
in-repo ``stages/jpeg.py`` decoder handles the codec work and this
module only needs the RIFF container framing (public spec: Microsoft
'AVI RIFF File Reference').

Demux: walks RIFF chunks (word-aligned), reads frame size from the
``avih`` main header, collects ``##dc``/``##db`` stream-data chunks
whose payload starts with an SOI marker.  Mux: single-video-stream
AVI with ``MJPG`` fourcc — enough for round-trip tests and resampled
re-encodes; it is NOT a general AVI writer.

Engine-addition multimodal surface (the reference has no media path);
used by MediaDecoder/FrameSampler for ``video`` payloads alongside the
uncompressed Y4M path.
"""

from __future__ import annotations

import struct

import numpy as np


def demux_avi_mjpeg(payload: bytes) -> tuple[int, int, list[bytes]]:
    """AVI bytes -> (width, height, [jpeg bytes per frame])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    width = height = 0
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height
        i = start
        while i + 8 <= end:
            cid = payload[i : i + 4]
            (size,) = struct.unpack_from("<I", payload, i + 4)
            body_at = i + 8
            if cid in (b"RIFF", b"LIST"):
                walk(body_at + 4, body_at + size)  # skip the list type fourcc
            elif cid == b"avih":
                # dwWidth/dwHeight at offsets 32/36 of the main header
                width, height = struct.unpack_from("<II", payload, body_at + 32)
            elif cid[2:4] in (b"dc", b"db"):
                data = payload[body_at : body_at + size]
                if data[:2] == b"\xff\xd8":
                    frames.append(data)
            i = body_at + size + (size & 1)  # chunks are word-aligned

    walk(0, len(payload))
    if not frames:
        raise ValueError("AVI contains no MJPEG frames")
    return int(width), int(height), frames


def mux_avi_mjpeg(jpeg_frames: list[bytes], width: int, height: int) -> bytes:
    """[jpeg bytes] -> single-stream MJPG AVI (25 fps nominal)."""
    if not jpeg_frames:
        raise ValueError("mux_avi_mjpeg: no frames")

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    n = len(jpeg_frames)
    max_bytes = max(len(f) for f in jpeg_frames)
    avih = struct.pack(
        "<14I",
        40_000,  # dwMicroSecPerFrame (25 fps)
        max_bytes * 25,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX off, AVIF_WASCAPTUREFILE off (0x10 = trust ckType)
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII4h", 0, 0, 0, 0, 1, 25, 0, n, max_bytes, 0, 0,
                      0, 0, np.int16(width), np.int16(height))
    )
    # BITMAPINFOHEADER with biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
