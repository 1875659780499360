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

``image_near_dup_pairs`` then runs the exact pipeline shape of
``simhash_near_dups`` (stages/dedup.py): actor-pool decode+hash (the
codec work is the stateful stage), 16-bit pigeonhole bands
(recall-COMPLETE for hamming < 4 — re-encodes of the same image
measure 0-2 bits apart because the 9×8 downsample absorbs pixel
noise), coarse-bucket shuffle of 16 B band rows (never the payloads),
per-bucket vectorized popcount verify with the shared
``_segment_pairs`` closed form, and a ``sorted_pair_dedup`` cross-band
fold.  All the scale policies the text family established apply
unchanged.

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


class ImageHasher:
    """Actor-pool decode+hash stage: one (media_id, dhash) row per image
    payload.  Codec dispatch is the MediaDecoder's (BMP/PNG/JPEG/GIF
    pure-stdlib decoders, PIL when installed); non-image rows pass
    through silently so the stage runs on mixed media tables."""

    def __init__(self):
        from .multimodal import MediaDecoder

        self._dec = MediaDecoder(fake=False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for mid, kind, payload in zip(
            batch["media_id"].to_pylist(),
            batch["kind"].to_pylist(),
            batch["payload"].to_pylist(),
        ):
            if kind != "image":
                continue
            gray = self._dec._decode_gray(payload)
            ids.append(mid)
            hashes.append(dhash64(gray))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "dhash": pa.array(np.array(hashes, np.uint64)),
            }
        )


def _band(batch: pa.Table) -> pa.Table:
    """(media_id, dhash) → 4x 16-bit pigeonhole band rows — the
    ``_simhash_batch`` layout so the verify kernel is shared."""
    ids = batch["media_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    hs = batch["dhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
    n_bands = 4
    shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(16)).reshape(1, -1)
    keys = ((hs.reshape(-1, 1) >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
    keys |= np.arange(n_bands, dtype=np.int64).reshape(1, -1) << 16
    return pa.table(
        {
            "band_key": pa.array(keys.ravel(), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
            "simhash": pa.array(np.repeat(hs, n_bands)),
        }
    )


def image_near_dup_pairs(media_ds, max_hamming: int = 3,
                         concurrency: int = 4, batch_size: int = 32):
    """Near-duplicate image pairs over a media table (the
    ``MEDIA_SCHEMA`` layout): decode+dHash in an actor pool (small
    batches — payloads are large), then the SimHash band/verify/dedup
    pipeline over the 64-bit sketches.  Returns
    (media_a, media_b, hamming); recall-complete for pairs within
    ``max_hamming`` < 4 by the 4×16-bit pigeonhole."""
    hashed = media_ds.map_batches(
        ImageHasher,
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
