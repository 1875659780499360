"""Batched string-similarity kernels for the pair-scoring stage.

The reference library has no similarity logic (its identity is exact
string equality — rust-lib/src/email_address.rs:78); these kernels are the
engine's *addition* for near-duplicate identity resolution (north rule:
"batched Jaro-Winkler/Levenshtein similarity over zero-copy Arrow string
arrays").

Design for the hot path: the scorer actor first applies vectorized numpy
prefilters (length deltas, equality) so the per-pair Python kernels below
run only on the short, bounded candidate tail inside each block.  Each
kernel is O(len) or O(len^2) on strings that are local-parts (tens of
bytes), invoked from an actor-pool ``map_batches`` stage.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def levenshtein_leq(a: str, b: str, k: int = 1) -> bool:
    """Banded edit distance: True iff lev(a, b) <= k. O(k*max(len)) time."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    if a == b:
        return True
    if k == 0:
        return False
    # banded DP, band width 2k+1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        lo = max(1, i - k)
        hi = min(lb, i + k)
        cur = [k + 1] * (lb + 1)
        cur[lo - 1] = prev[lo - 1] + 1 if lo - 1 >= i - k else k + 1
        if i - k <= 0:
            cur[0] = i
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[lb] <= k


def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ma = [False] * la
    mb = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and b[j] == ca:
                ma[i] = mb[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    j = jaro(a, b)
    if j <= 0.7:
        return j
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= max_prefix:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def batch_jaro_winkler(a: Sequence[str], b: Sequence[str]) -> np.ndarray:
    """Per-pair JW over two aligned string sequences (candidate pairs)."""
    return np.fromiter(
        (jaro_winkler(x, y) for x, y in zip(a, b)), dtype=np.float64, count=len(a)
    )


def _byte_matrix(strs: np.ndarray, width: int) -> np.ndarray:
    """(n, width) uint8 matrix of UTF-8 bytes, zero-padded."""
    out = np.zeros((len(strs), width), dtype=np.uint8)
    for i, s in enumerate(strs):
        b = s.encode("utf-8")[:width]
        out[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return out


def batch_lev_leq1_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Fully vectorized lev(a,b) <= 1 over aligned pair arrays.

    Characterization (over UTF-8 bytes): lev<=1 iff a==b, or lengths are
    equal and common_prefix+common_suffix >= len-1 (one substitution), or
    lengths differ by 1 and common_prefix+common_suffix >= min_len (one
    insertion/deletion).  Byte-level edits upper-bound char-level edits
    for the multi-byte case, so this is conservative-safe for matching.
    """
    n = len(a)
    la = np.fromiter((len(x.encode("utf-8")) for x in a), dtype=np.int64, count=n)
    lb = np.fromiter((len(x.encode("utf-8")) for x in b), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=bool)
    ldiff = np.abs(la - lb)
    cand = ldiff <= 1
    if not cand.any():
        return out
    width = int(max(la.max(initial=0), lb.max(initial=0)))
    if width == 0:
        return cand
    A = _byte_matrix(a, width)
    B = _byte_matrix(b, width)
    eq_fwd = A == B
    # common prefix length: index of first mismatch
    cp = np.where(eq_fwd.all(axis=1), width, eq_fwd.argmin(axis=1))
    # common suffix: align ends, compare reversed with per-row shifts
    idx = np.arange(width)
    Ar = A[np.arange(n)[:, None], np.maximum(la[:, None] - 1 - idx, 0)]
    Br = B[np.arange(n)[:, None], np.maximum(lb[:, None] - 1 - idx, 0)]
    eq_rev = Ar == Br
    cs = np.where(eq_rev.all(axis=1), width, eq_rev.argmin(axis=1))
    minlen = np.minimum(la, lb)
    cp_c = np.minimum(cp, minlen)
    cs_c = np.minimum(cs, minlen)
    same_len_ok = (ldiff == 0) & (cp_c + cs_c >= la - 1)
    off_one_ok = (ldiff == 1) & (cp_c + cs_c >= minlen)
    out = (la == lb) & (cp == width)  # identical
    return out | same_len_ok | off_one_ok


def batch_lev_leq(a: Sequence[str], b: Sequence[str], k: int = 1) -> np.ndarray:
    """Batched lev <= k: fully vectorized byte-matrix path for k == 1 (the
    hot case), banded-DP per pair otherwise."""
    a_arr = np.asarray(a, dtype=object)
    b_arr = np.asarray(b, dtype=object)
    if k == 1:
        return batch_lev_leq1_vec(a_arr, b_arr)
    n = len(a_arr)
    la = np.fromiter((len(x) for x in a_arr), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in b_arr), dtype=np.int64, count=n)
    out = np.zeros(n, dtype=bool)
    eq = a_arr == b_arr
    out[eq] = True
    cand = np.flatnonzero(~eq & (np.abs(la - lb) <= k))
    for i in cand:
        out[i] = levenshtein_leq(a_arr[i], b_arr[i], k)
    return out
