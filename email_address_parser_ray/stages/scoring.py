"""Pair scoring — stateful actor-pool stage over candidate pairs.

North-rule stage: "within each block, stateful actor-pool workers compute
batched Jaro-Winkler/Levenshtein similarity over zero-copy Arrow string
arrays".  ``PairScorer`` is a callable class → Ray actor pool
(``map_batches(PairScorer, concurrency=N, batch_format="pyarrow")``);
thresholds/config bind once per actor in ``__init__``, each ``__call__``
scores one Arrow batch of pairs with vectorized prefilters and the
bounded per-pair kernels from :mod:`..functions.similarity`.

Accept rules (ordered, first match wins; designed so precision is
guarded by the same-domain requirement plus a minimum-length gate):

1. ``exact_canonical`` — canonical keys equal (case/WSP/quoting variants);
2. ``dotless_equal``  — same domain + same dot-stripped local (both
                         locals >= min_len: short locals are too
                         ambiguous for dot-folding);
3. ``lev1``           — same domain + both dotless locals >= min_len and
                         banded Levenshtein distance <= lev_k (typos).

The reference itself accepts only rule 0 (verbatim equality,
email_address.rs:78); rules 1-3 are the engine's near-dup extension and
the gold synthesizer plants exactly these perturbation families.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.similarity import batch_jaro_winkler, batch_lev_leq


class PairScorer:
    def __init__(self, lev_k: int = 1, min_len: int = 6, jw_floor: float = 0.80):
        self.lev_k = lev_k
        self.min_len = min_len
        self.jw_floor = jw_floor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _empty_scored()
        ck_a = np.asarray(batch["canonical_key_a"].to_pylist(), dtype=object)
        ck_b = np.asarray(batch["canonical_key_b"].to_pylist(), dtype=object)
        dot_a = np.asarray(batch["dotless_a"].to_pylist(), dtype=object)
        dot_b = np.asarray(batch["dotless_b"].to_pylist(), dtype=object)
        dom_a = np.asarray(batch["domain_key_a"].to_pylist(), dtype=object)
        dom_b = np.asarray(batch["domain_key_b"].to_pylist(), dtype=object)

        exact = ck_a == ck_b
        same_dom = dom_a == dom_b
        len_a = np.fromiter((len(x) for x in dot_a), dtype=np.int64, count=n)
        len_b = np.fromiter((len(x) for x in dot_b), dtype=np.int64, count=n)
        # dot-insensitivity only for locals long enough to be unambiguous:
        # short corpus locals like "te.st"/"test" are distinct identities
        long_enough = (len_a >= self.min_len) & (len_b >= self.min_len)
        dotless_eq = same_dom & (dot_a == dot_b) & ~exact & long_enough
        fuzz_cand = (
            same_dom
            & ~exact
            & ~dotless_eq
            & long_enough
            & (np.abs(len_a - len_b) <= self.lev_k)
        )
        lev_ok = np.zeros(n, dtype=bool)
        idx = np.flatnonzero(fuzz_cand)
        if len(idx):
            lev_ok[idx] = batch_lev_leq(dot_a[idx], dot_b[idx], self.lev_k)

        score = np.zeros(n, dtype=np.float64)
        rule = np.full(n, "", dtype=object)
        score[exact] = 1.0
        rule[exact] = "exact_canonical"
        score[dotless_eq] = 0.98
        rule[dotless_eq] = "dotless_equal"
        lidx = np.flatnonzero(lev_ok)
        if len(lidx):
            jw = batch_jaro_winkler(dot_a[lidx], dot_b[lidx])
            good = jw >= self.jw_floor
            keep = lidx[good]
            score[keep] = jw[good]
            rule[keep] = "lev1"
        accept = score > 0.0
        out = pa.table(
            {
                "addr_a": batch["address_a"].combine_chunks()
                if isinstance(batch["address_a"], pa.ChunkedArray)
                else batch["address_a"],
                "addr_b": batch["address_b"].combine_chunks()
                if isinstance(batch["address_b"], pa.ChunkedArray)
                else batch["address_b"],
                "score": pa.array(score, pa.float64()),
                "rule": pa.array(list(rule), pa.string()),
            }
        )
        return out.filter(pa.array(accept))


def _empty_scored() -> pa.Table:
    return pa.table(
        {
            "addr_a": pa.array([], pa.string()),
            "addr_b": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
            "rule": pa.array([], pa.string()),
        }
    )


def score_pairs(pairs_ds, concurrency=(1, 4), batch_size: int = 32768):
    """Candidate pairs → accepted match edges via the scorer actor pool.

    ``concurrency`` defaults to an autoscaling (min, max) pool so the
    stage never reserves every CPU on a small cluster (a fixed pool the
    size of the machine starves the upstream read/shuffle stages)."""
    if isinstance(concurrency, int):
        concurrency = (1, concurrency)
    return pairs_ds.map_batches(
        PairScorer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
