"""Perceptual image near-deduplication — dHash over the real decoders
plus the engine's SimHash banding machinery.

Re-encoding (PNG↔BMP↔JPEG quality changes) and resizing leave image
BYTES completely different while the picture is the same, so
byte-exact and text-style dedup both miss image duplicates.  The
standard public answer is a perceptual hash; this module implements
**dHash** (difference hash): downsample the decoded grayscale to 9×8
by index sampling (the ImageResizer kernel), set bit (r, c) when
pixel (r, c) is brighter than pixel (r, c+1).  The 64-bit sketch
depends only on the coarse luminance GRADIENT field, so it is
invariant to resizing and robust to recompression; distinct pictures
land ~32 bits apart.

The same idea extends to the other modalities with
``envelope_hash64``: audio hashes the sign pattern of its 65-bucket
RMS-energy envelope (a WAV and a FLAC of the same samples hash
IDENTICALLY — both decodes are exact — and lossy G.711/ADPCM
re-encodes land a few bits away), video hashes its per-frame
mean-luma trend (Y4M vs an MJPEG re-encode of the same frames).

``media_near_dup_pairs`` then runs the exact pipeline shape of
``simhash_near_dups`` (stages/dedup.py): actor-pool decode+hash (the
codec work is the stateful stage), 16-bit pigeonhole bands
(recall-COMPLETE for hamming < 4 — re-encodes of the same media
measure 0-3 bits apart because the coarse envelope absorbs codec
noise) with the kind id folded into the band key so modalities never
cross-pair, coarse-bucket shuffle of 16 B band rows (never the
payloads), per-bucket vectorized popcount verify with the shared
``_segment_pairs`` closed form, and a ``sorted_pair_dedup`` cross-band
fold.  All the scale policies the text family established apply
unchanged — with this module every modality the engine carries (text,
embeddings, image, audio, video) has a near-dup pipeline.

Engine-addition multimodal surface (the reference has no media path);
dHash itself is a public algorithm (widely documented, e.g. the
"Kind of Like That" dHash description)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _add_key_bucket, _simhash_pairs, sorted_pair_dedup


def dhash64(gray: np.ndarray) -> int:
    """float grayscale HxW in [0, 1] → 64-bit difference hash.

    9×8 index-sampled downsample (same nearest-neighbor kernel as
    ImageResizer), bit r*8+c = (cell[r, c] > cell[r, c+1])."""
    h, w = gray.shape
    ri = np.minimum((np.arange(8) * h) // 8, h - 1)
    ci = np.minimum((np.arange(9) * w) // 9, w - 1)
    g = gray[np.ix_(ri, ci)]
    bits = (g[:, :-1] > g[:, 1:]).astype(np.uint64).ravel()
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def envelope_hash64(x: np.ndarray) -> int:
    """1-D signal → 64-bit difference hash over its 65-bucket envelope:
    bucket means by index-sampled segments (exact when len(x) < 65),
    bit i = bucket[i] > bucket[i+1].  The audio/video analog of dHash:
    codec-invariant because it depends only on the coarse energy/luma
    TREND, not sample values."""
    n = len(x)
    if n == 0:
        return 0
    bounds = (np.arange(66) * n) // 65
    bounds = np.minimum(bounds, n)
    sums = np.concatenate([[0.0], np.cumsum(x.astype(np.float64))])
    cnt = np.maximum(bounds[1:] - bounds[:-1], 1)
    env = (sums[bounds[1:]] - sums[bounds[:-1]]) / cnt
    # empty buckets (n < 65) inherit the previous bucket's value
    empty = (bounds[1:] - bounds[:-1]) == 0
    for i in np.flatnonzero(empty):
        env[i] = env[i - 1] if i else 0.0
    bits = (env[:-1] > env[1:]).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


_KIND_IDS = {"image": 0, "audio": 1, "video": 2}


class MediaHasher:
    """Actor-pool decode+hash stage over a mixed media table: one
    (media_id, kind, phash) row per payload.  image → dHash over the
    decoded grayscale; audio → envelope hash over per-segment RMS
    energy (WAV and FLAC of the same samples hash identically — the
    decode is exact); video → envelope hash over per-frame mean luma
    (Y4M and an MJPEG re-encode land within a few bits).  Codec
    dispatch is the MediaDecoder's; decode state binds in __init__."""

    def __init__(self, kinds=("image", "audio", "video")):
        from .multimodal import MediaDecoder

        self._dec = MediaDecoder(fake=False)
        self.kinds = set(kinds)

    def _hash_one(self, kind: str, payload: bytes) -> int:
        if kind == "image":
            return dhash64(self._dec._decode_gray(payload))
        if kind == "audio":
            if payload[:4] == b"fLaC":
                from .flac import parse_flac as parse
            else:
                from .wav import parse_wav as parse
            _, frames = parse(payload)
            mono = frames.mean(axis=1) if frames.shape[1] > 1 else frames[:, 0]
            # RMS energy per 256-sample window → the envelope signal
            n = (len(mono) // 256) * 256
            if n == 0:
                return envelope_hash64(np.abs(mono))
            rms = np.sqrt((mono[:n].reshape(-1, 256) ** 2).mean(axis=1))
            return envelope_hash64(rms)
        if kind == "video":
            return envelope_hash64(self._dec._frame_luma(payload))
        raise ValueError(f"unknown media kind {kind!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, hashes = [], [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind not in self.kinds:
                continue
            ids.append(mid)
            kinds.append(kind)
            hashes.append(self._hash_one(kind, payload))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "phash": pa.array(np.array(hashes, np.uint64)),
            }
        )


def _band(batch: pa.Table) -> pa.Table:
    """(media_id, kind, phash) → 4x 16-bit pigeonhole band rows in the
    ``_simhash_batch`` layout (shared verify kernel).  The kind id is
    folded into the band key so pairs never form across modalities."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "band_key": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "simhash": pa.array([], pa.uint64()),
            }
        )
    ids = batch["media_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    hs = batch["phash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    kid = np.array([_KIND_IDS[k] for k in batch["kind"].to_pylist()], np.int64)
    n_bands = 4
    shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(16)).reshape(1, -1)
    keys = ((hs.reshape(-1, 1) >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
    keys |= np.arange(n_bands, dtype=np.int64).reshape(1, -1) << 16
    keys |= (kid << 20).reshape(-1, 1)
    return pa.table(
        {
            "band_key": pa.array(keys.ravel(), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
            "simhash": pa.array(np.repeat(hs, n_bands)),
        }
    )


def media_near_dup_pairs(media_ds, max_hamming: int = 3,
                         kinds=("image", "audio", "video"),
                         concurrency: int = 4, batch_size: int = 32):
    """Near-duplicate media pairs over a mixed media table (the
    ``MEDIA_SCHEMA`` layout), ACROSS ENCODINGS within each modality:
    decode+perceptual-hash in an actor pool (small batches — payloads
    are large), then the SimHash band/verify/dedup pipeline over the
    64-bit sketches, kind-tagged so image/audio/video never
    cross-pair.  Returns (media_a, media_b, hamming); recall-complete
    for pairs within ``max_hamming`` < 4 by the 4×16-bit pigeonhole."""
    hashed = media_ds.map_batches(
        MediaHasher,
        fn_constructor_kwargs={"kinds": tuple(kinds)},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency) if isinstance(concurrency, int) else concurrency,
        num_cpus=1,
    )
    banded = hashed.map_batches(_band, batch_format="pyarrow").map_batches(
        _add_key_bucket, batch_format="pyarrow"
    )
    pairs = banded.groupby("bucket").map_groups(
        lambda g: _simhash_pairs(g, max_hamming), batch_format="pandas"
    )
    deduped = sorted_pair_dedup(pairs, ["doc_a", "doc_b"], [("hamming", "min")])
    return deduped.map_batches(
        lambda t: pa.table(
            {
                "media_a": t["doc_a"],
                "media_b": t["doc_b"],
                "hamming": t["hamming"],
            }
        ),
        batch_format="pyarrow",
    )


def image_near_dup_pairs(media_ds, max_hamming: int = 3,
                         concurrency: int = 4, batch_size: int = 32):
    """Image-only view of ``media_near_dup_pairs`` (kept as the named
    entry point for the dHash pipeline)."""
    return media_near_dup_pairs(
        media_ds, max_hamming, kinds=("image",),
        concurrency=concurrency, batch_size=batch_size,
    )
