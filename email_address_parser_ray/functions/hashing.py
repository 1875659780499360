"""Stable content-hash / sketch primitives for the dedup family.

Everything here must be deterministic across processes and machines
(cluster-safe): no Python builtin ``hash`` (PYTHONHASHSEED), no
``Date``-style nondeterminism.  zlib.crc32 (C speed, stable) seeds the
shingle universe; MinHash permutations are fixed affine maps mod a
Mersenne prime; SimHash projects md5 token bits (``md5_number_lower``
byte order, so DuckDB can replay every vote).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import List, Sequence

import numpy as np

_MERSENNE = (1 << 61) - 1


def mix64(h):
    """splitmix64 finalizer (public domain constant set): decorrelates the
    linear CRC32 bit structure so SimHash votes / MinHash inputs are
    uniform.  Accepts int or numpy uint64 array."""
    h = np.uint64(h) if not isinstance(h, np.ndarray) else h.astype(np.uint64)
    with np.errstate(over="ignore"):
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = h ^ (h >> np.uint64(31))
    return h
_RNG = np.random.RandomState(0xE5EED)
N_PERM = 128
_A = _RNG.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
_B = _RNG.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """crc32 of each k-word shingle → uint64 array (deduped)."""
    toks = text.split()
    if len(toks) < k:
        joined = " ".join(toks)
        return mix64(np.array([zlib.crc32(joined.encode())], dtype=np.uint64))
    out = {
        zlib.crc32(" ".join(toks[i : i + k]).encode())
        for i in range(len(toks) - k + 1)
    }
    return mix64(np.fromiter(out, dtype=np.uint64, count=len(out)))


def word_shingle_set(text: str, k: int = 3) -> set:
    """Exact k-word shingle STRING set (no hashing — collision-free, and
    reproducible in SQL via list_transform/array_to_string).  Same
    tokenization and short-doc rule as ``word_shingles``."""
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def minhash_signature(shingle_hashes: np.ndarray) -> np.ndarray:
    """(N_PERM,) uint64 MinHash signature via affine permutations."""
    # (n_shingles, n_perm) too big? n_shingles is tens-to-hundreds → fine.
    h = shingle_hashes.reshape(-1, 1)
    vals = (h * _A.reshape(1, -1) + _B.reshape(1, -1)) % _MERSENNE
    return vals.min(axis=0).astype(np.uint64)


def band_keys(sig: np.ndarray, bands: int = 64) -> List[int]:
    """Split the signature into ``bands`` row-groups; crc each group."""
    rows = len(sig) // bands
    out = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows]
        out.append(zlib.crc32(chunk.tobytes()) ^ (b << 32))
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens.

    Token hash = md5 digest bytes 8:16 little-endian — bit-identical to
    DuckDB's ``md5_number_lower`` — so the whole sketch is replayable in
    SQL (the simhash_pairs oracle recomputes every vote).  Bit ``i`` of
    the result is 1 iff the sum over tokens of ±1 votes on
    ``(token_hash >> i) & 1`` is positive; duplicate tokens vote once
    each, empty texts hash to 0."""
    toks = text.split()
    if not toks:
        return 0
    hs = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[8:16], "little")
            for t in toks
        ),
        dtype=np.uint64,
        count=len(toks),
    )
    # bits[:, i] == (h >> i) & 1 (little-endian byte view + LSB-first bits)
    bits = np.unpackbits(
        hs.view(np.uint8).reshape(len(hs), 8), axis=1, bitorder="little"
    ).astype(np.int64)
    acc = (bits * 2 - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_bands(h: int, bands: int = 4) -> List[int]:
    """Split 64 bits into ``bands`` 16-bit keys: two near hashes with
    hamming distance < bands share at least one band (pigeonhole)."""
    return [((h >> (16 * b)) & 0xFFFF) | (b << 16) for b in range(bands)]
