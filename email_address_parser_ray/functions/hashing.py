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


_SHINGLE_SEED = np.uint64(0x9E3779B97F4A7C15)


def word_shingles_flat(texts: Sequence[str], k: int = 3):
    """Vectorized k-word shingle hashing for a WHOLE batch: returns
    ``(flat, lens)`` — one uint64 hash per shingle occurrence,
    concatenated in doc order, plus per-doc shingle counts.

    Token hashes are computed once per UNIQUE token (fixed-key
    siphash → mix64, full 64-bit; the vocab repeats heavily, same
    unique-token trick as ``simhash64_batch``), then
    each k-window's hash is a mix64 chain fold over its token hashes,
    computed for every window position in ONE shifted-numpy pass.
    Docs with < k tokens get a single fold over all their tokens
    (empty docs fold the bare seed) — the same short-doc RULE as
    ``word_shingles``.

    The hash IDENTITY deliberately differs from per-doc
    ``word_shingles`` (which crc32s each joined shingle string):
    MinHash only needs a deterministic uniform hash of shingle
    identity — candidate recall is governed by the banding math either
    way and membership is decided by the exact string-set verify.
    Unlike ``word_shingles`` the flat rows are NOT per-doc deduped;
    duplicate shingles cannot change a min, so signatures are
    unaffected."""
    tok_rows = [t.split() for t in texts]
    tlens = np.fromiter((len(r) for r in tok_rows), np.int64, len(tok_rows))
    n_tok = int(tlens.sum())
    slens = np.where(tlens >= k, tlens - k + 1, 1).astype(np.int64)
    total = int(slens.sum())
    out = np.empty(total, np.uint64)
    if n_tok:
        flat_toks = np.array([w for r in tok_rows for w in r], dtype=object)
        uniq, inv = np.unique(flat_toks, return_inverse=True)
        # full-64-bit token hash (pandas fixed-key siphash): the chain
        # fold accumulates entropy across tokens, but a SUB-WINDOW doc
        # folds as few as ONE token — with a crc32 seed that is 32
        # bits of entropy, and corpus-wide window counts birthday-
        # collide from ~10^5 distinct short docs (the lines.py lesson)
        import pandas as pd

        uh = mix64(
            pd.util.hash_pandas_object(
                pd.Series(uniq, dtype=object), index=False
            ).to_numpy().astype(np.uint64)
        )
        th = uh[inv]
    else:
        th = np.empty(0, np.uint64)
    # chain_j[i] = fold of tokens [i, i+j) — chain_k's rows at positions
    # that do not cross a doc boundary ARE the full-width shingles, and
    # chain_1/chain_2 rows at doc starts are the short-doc folds
    chains = []
    c = mix64(_SHINGLE_SEED ^ th)
    chains.append(c)
    for j in range(1, k):
        c = mix64(c[: len(th) - j] ^ th[j:])
        chains.append(c)
    soffs = np.cumsum(slens) - slens
    toffs = np.cumsum(tlens) - tlens
    # long docs: vectorized segment copy chain_k[toffs+i] -> out[soffs+i]
    longm = tlens >= k
    if longm.any():
        ls, lt, lo = slens[longm], toffs[longm], soffs[longm]
        tot = int(ls.sum())
        offs = np.cumsum(ls) - ls
        within = np.arange(tot) - np.repeat(offs, ls)
        out[np.repeat(lo, ls) + within] = chains[k - 1][np.repeat(lt, ls) + within]
    # short docs: one fold of width tlen (empty docs fold the bare seed)
    for w in range(k):
        m = tlens == w
        if m.any():
            if w == 0:
                out[soffs[m]] = mix64(_SHINGLE_SEED)
            else:
                out[soffs[m]] = chains[w - 1][toffs[m]]
    return out, slens


def word_shingle_counts(texts: Sequence[str], k: int = 3) -> np.ndarray:
    """Per-doc shingle COUNTS only — exactly the ``slens`` that
    ``word_shingles_flat`` returns, without computing any hashes
    (same tokenization, same short-doc rule: docs with < k tokens
    count 1).  For callers that need window totals but not window
    identities (e.g. ``dup_window_stats``' totals pass)."""
    tlens = np.fromiter((len(t.split()) for t in texts), np.int64, len(texts))
    return np.where(tlens >= k, tlens - k + 1, 1).astype(np.int64)


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


def minhash_signature_batch(
    shingle_rows: Sequence[np.ndarray], chunk: int = 65536
) -> np.ndarray:
    """(n_docs, N_PERM) uint64 signatures for a whole batch in flat numpy
    passes: concatenate every doc's shingle hashes, apply the affine
    permutations chunk-wise (bounding peak memory to ``chunk`` x N_PERM
    x 8 B), and fold per-doc minima with ``np.minimum.reduceat``.

    Bit-identical to per-doc ``minhash_signature`` (same uint64 wrap +
    mod arithmetic, element-wise); the batch layout removes the per-doc
    Python/numpy call overhead that dominated the sketch stage."""
    lens = np.fromiter((len(a) for a in shingle_rows), np.int64, len(shingle_rows))
    if len(lens) == 0:
        return np.empty((0, N_PERM), np.uint64)
    return minhash_signature_flat(np.concatenate(shingle_rows).astype(np.uint64), lens, chunk)


def minhash_signature_flat(
    flat: np.ndarray, lens: np.ndarray, chunk: int = 65536
) -> np.ndarray:
    """Core of ``minhash_signature_batch`` over an already-flat shingle
    hash array + per-doc counts (every count ≥ 1 — the short-doc rule
    guarantees one shingle per doc), e.g. straight from
    ``word_shingles_flat``."""
    n_docs = len(lens)
    out = np.empty((n_docs, N_PERM), np.uint64)
    if n_docs == 0:
        return out
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    ends = offsets + lens
    # chunk along doc boundaries: each chunk's docs fit whole
    doc_lo = 0
    while doc_lo < n_docs:
        doc_hi = doc_lo
        base = offsets[doc_lo]
        while doc_hi < n_docs and ends[doc_hi] - base <= chunk:
            doc_hi += 1
        if doc_hi == doc_lo:  # one pathological doc larger than chunk
            doc_hi = doc_lo + 1
        seg = flat[base : ends[doc_hi - 1]]
        with np.errstate(over="ignore"):
            vals = (seg.reshape(-1, 1) * _A.reshape(1, -1) + _B.reshape(1, -1)) % _MERSENNE
        out[doc_lo:doc_hi] = np.minimum.reduceat(
            vals, offsets[doc_lo:doc_hi] - base, axis=0
        )
        doc_lo = doc_hi
    return out


_BAND_SALT = mix64(np.arange(4096, dtype=np.uint64) ^ np.uint64(0xBADC0FFEE))


def band_keys_batch(sigs: np.ndarray, bands: int = 64) -> np.ndarray:
    """(n_docs, bands) int64 band keys for two-row bands, fully
    vectorized: each band's two signature rows are combined with the
    splitmix64 finalizer plus a per-band salt.  Key equality ⇔ equal
    (sig[2b], sig[2b+1]) pairs up to a ~2^-64 collision rate, and a
    collision can only ADD a candidate pair (the exact verify filters
    precision) — same contract as the crc32 per-doc ``band_keys``, at
    numpy speed."""
    rows = sigs.shape[1] // bands
    assert rows == 2, "band_keys_batch is specialized for two-row bands"
    combined = mix64(sigs[:, 0::2] ^ mix64(sigs[:, 1::2])) ^ _BAND_SALT[:bands]
    return mix64(combined).view(np.int64)


def simhash64_batch(texts: Sequence[str]) -> np.ndarray:
    """(n_docs,) uint64 SimHash for a whole batch: one flat token pass,
    md5 computed once per UNIQUE token string (the vocab repeats
    heavily), per-doc vote sums via ``np.add.reduceat``.  Bit-identical
    to per-doc ``simhash64`` — duplicate tokens still vote once per
    occurrence, empty texts hash to 0 — so the DuckDB
    ``md5_number_lower`` replay oracle is unaffected."""
    tok_rows = [t.split() for t in texts]
    lens = np.fromiter((len(r) for r in tok_rows), np.int64, len(tok_rows))
    out = np.zeros(len(texts), np.uint64)
    nz = lens > 0
    if not nz.any():
        return out
    flat = np.array([w for r in tok_rows for w in r], dtype=object)
    uniq, inv = np.unique(flat, return_inverse=True)
    uh = np.fromiter(
        (
            int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[8:16], "little")
            for u in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    hs = uh[inv]
    bits = np.unpackbits(
        hs.view(np.uint8).reshape(len(hs), 8), axis=1, bitorder="little"
    ).astype(np.int64)
    votes = bits * 2 - 1
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    acc = np.add.reduceat(votes, offsets[nz], axis=0)
    out[nz] = ((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(axis=1)
    return out


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
    SQL (the docs_near_pairs oracle recomputes every vote).  Bit ``i`` of
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
