"""Stable content-hash / sketch primitives for the dedup family.

Everything here must be deterministic across processes and machines
(cluster-safe): no Python builtin ``hash`` (PYTHONHASHSEED), no
``Date``-style nondeterminism.  zlib.crc32 (C speed, stable) seeds the
shingle universe; MinHash permutations are fixed affine maps mod a
Mersenne prime; SimHash projects token crc bits.
"""

from __future__ import annotations

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


def band_keys(sig: np.ndarray, bands: int = 32) -> List[int]:
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
    """64-bit SimHash over whitespace tokens (crc32-pair → 64 bits)."""
    toks = text.split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = int(mix64(np.uint64(zlib.crc32(t.encode()))))
        bits = np.unpackbits(
            np.frombuffer(np.uint64(h).tobytes(), dtype=np.uint8)
        ).astype(np.int64)
        acc += bits * 2 - 1
    out = np.packbits((acc > 0).astype(np.uint8))
    return int(np.frombuffer(out.tobytes(), dtype=np.uint64)[0])


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_bands(h: int, bands: int = 4) -> List[int]:
    """Split 64 bits into ``bands`` 16-bit keys: two near hashes with
    hamming distance < bands share at least one band (pigeonhole)."""
    return [((h >> (16 * b)) & 0xFFFF) | (b << 16) for b in range(bands)]
