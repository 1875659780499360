"""Minimal ISO-BMFF (MP4/MOV) demuxer/muxer for MJPEG video.

Motion-JPEG inside an MP4/QuickTime container (public spec: ISO/IEC
14496-12 box structure; the ``jpeg`` visual sample entry is the
QuickTime-lineage MJPEG carriage): every sample is an independent
baseline JPEG, so — exactly like ``stages/avi.py`` for RIFF — the
in-repo ``stages/jpeg.py`` decoder does the codec work and this module
only needs the container framing:

* demux — walk the box tree, find the video ``trak`` whose ``stsd``
  sample entry is an MJPEG fourcc, and resolve the real sample table:
  ``stsz`` sizes x ``stsc`` samples-per-chunk runs x ``stco``/``co64``
  chunk offsets → absolute byte ranges into the payload.
* mux — one video track, all samples in one chunk (trivial ``stsc``,
  one ``stco`` entry), ``mdat`` before ``moov`` so offsets are exact.
  Round-trips through the demuxer and cross-pairs with the same
  frames in an AVI container (tests/test_mp4_mjpeg.py).

Engine-addition multimodal surface (the reference is a string parser,
rust-lib/src/email_address.rs:79-82 — no media path)."""

from __future__ import annotations

import struct

_MJPEG_FOURCC = {b"jpeg", b"mjpa", b"mjpb", b"MJPG", b"AVDJ"}
_CONTAINERS = {
    b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf", b"edts", b"udta",
}


def _boxes(payload: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in a range."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, i)
        btype = payload[i + 4 : i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", payload, i + 8)
            body = i + 16
        elif size == 0:  # to end of enclosing box
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError("malformed ISO-BMFF box")
        yield btype, body, i + size
        i += size


def _find(payload: bytes, start: int, end: int, path: tuple) -> list:
    """All body ranges matching a box path, depth-first."""
    head, rest = path[0], path[1:]
    out = []
    for btype, b0, b1 in _boxes(payload, start, end):
        if btype != head:
            continue
        if not rest:
            out.append((b0, b1))
        else:
            out.extend(_find(payload, b0, b1, rest))
    return out


def is_isobmff(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] in (b"ftyp", b"moov", b"mdat", b"wide", b"skip")


def demux_mp4_mjpeg(payload: bytes) -> tuple[int, int, list[bytes]]:
    """MP4/MOV bytes -> (width, height, [jpeg bytes per frame])."""
    if not is_isobmff(payload):
        raise ValueError("not an ISO-BMFF payload")
    n = len(payload)
    for trak0, trak1 in _find(payload, 0, n, (b"moov", b"trak")):
        stbl = _find(payload, trak0, trak1, (b"mdia", b"minf", b"stbl"))
        if not stbl:
            continue
        s0, s1 = stbl[0]

        def box(name, lo=s0, hi=s1):
            got = _find(payload, lo, hi, (name,))
            return got[0] if got else None

        stsd = box(b"stsd")
        if stsd is None:
            continue
        # stsd: full box header (4) + entry_count (4), first entry =
        # size (4) + fourcc (4)
        fourcc = payload[stsd[0] + 12 : stsd[0] + 16]
        if fourcc not in _MJPEG_FOURCC:
            continue
        # VisualSampleEntry width/height: 24 bytes of entry header
        # (reserved/dri/pre_defined) after the fourcc
        w, h = struct.unpack_from(">HH", payload, stsd[0] + 16 + 24)

        stsz = box(b"stsz")
        if stsz is None:
            raise ValueError("MJPEG trak without stsz")
        fixed, count = struct.unpack_from(">II", payload, stsz[0] + 4)
        if fixed:
            sizes = [fixed] * count
        else:
            sizes = list(
                struct.unpack_from(f">{count}I", payload, stsz[0] + 12)
            )

        co = box(b"stco")
        if co is not None:
            (n_chunks,) = struct.unpack_from(">I", payload, co[0] + 4)
            offsets = list(struct.unpack_from(f">{n_chunks}I", payload, co[0] + 8))
        else:
            co = box(b"co64")
            if co is None:
                raise ValueError("MJPEG trak without stco/co64")
            (n_chunks,) = struct.unpack_from(">I", payload, co[0] + 4)
            offsets = list(struct.unpack_from(f">{n_chunks}Q", payload, co[0] + 8))

        stsc = box(b"stsc")
        if stsc is None:
            raise ValueError("MJPEG trak without stsc")
        (n_runs,) = struct.unpack_from(">I", payload, stsc[0] + 4)
        runs = [
            struct.unpack_from(">III", payload, stsc[0] + 8 + 12 * r)
            for r in range(n_runs)
        ]  # (first_chunk 1-based, samples_per_chunk, sample_description_index)

        # resolve per-sample absolute offsets chunk by chunk
        frames: list[bytes] = []
        si = 0
        for ci in range(n_chunks):
            spc = 0
            for first, per, _sdi in runs:
                if first <= ci + 1:
                    spc = per
                else:
                    break
            at = offsets[ci]
            for _ in range(spc):
                if si >= count:
                    break
                data = payload[at : at + sizes[si]]
                if data[:2] == b"\xff\xd8":
                    frames.append(data)
                at += sizes[si]
                si += 1
        if not frames:
            raise ValueError("MJPEG trak contains no JPEG samples")
        return int(w), int(h), frames
    raise ValueError("no MJPEG video trak in ISO-BMFF payload")


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + body)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def mux_mp4_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """[jpeg bytes] -> single-video-track MP4 with a ``jpeg`` sample
    entry; all samples in one chunk.  NOT a general MP4 writer."""
    if not jpeg_frames:
        raise ValueError("mux_mp4_mjpeg: no frames")
    n = len(jpeg_frames)
    timescale = fps * 100
    duration = n * 100

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mdat = _box(b"mdat", b"".join(jpeg_frames))
    first_sample_at = len(ftyp) + 8  # mdat body start

    entry = (
        struct.pack(">I", 86)  # VisualSampleEntry fixed size (no extensions)
        + b"jpeg"
        + b"\x00" * 6            # reserved
        + struct.pack(">H", 1)   # data_reference_index
        + b"\x00" * 16           # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4            # reserved
        + struct.pack(">H", 1)   # frame_count
        + b"\x00" * 32           # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 100))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in jpeg_frames),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_sample_at))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"MJPEG\x00",
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
