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


def batch_lev_leq(a: Sequence[str], b: Sequence[str], k: int = 1) -> np.ndarray:
    """Vectorized-prefiltered banded Levenshtein: numpy length/equality
    prefilter, per-pair band DP only on survivors."""
    a_arr = np.asarray(a, dtype=object)
    b_arr = np.asarray(b, dtype=object)
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
