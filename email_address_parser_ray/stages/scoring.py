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

    def _derive_features(self, batch: pa.Table):
        """Re-derive (canonical_key, dotless, domain_key) per side from
        the batch's UNIQUE surfaces via the vectorized tokenizer — same
        kernels that computed them during blocking, so values are
        bit-identical; pairs inside a bucket share most surfaces, so the
        unique set is far smaller than 2 x pairs."""
        import pyarrow.compute as pc

        from ..functions.fastpath import tokenize_batch

        a = batch["address_a"].combine_chunks() if isinstance(
            batch["address_a"], pa.ChunkedArray) else batch["address_a"]
        b = batch["address_b"].combine_chunks() if isinstance(
            batch["address_b"], pa.ChunkedArray) else batch["address_b"]
        uniq = pc.unique(pa.concat_arrays([a, b]))
        tok = tokenize_batch(pa.table({"address": uniq}), "address", is_lax=True)
        dotless_u = pc.replace_substring(tok["local_canon"], ".", "")
        domkey_u = pc.utf8_lower(tok["domain_canon"])
        canon_u = tok["canonical_key"]
        ia = pc.index_in(a, value_set=uniq)
        ib = pc.index_in(b, value_set=uniq)
        return {
            "canonical_key_a": pc.take(canon_u, ia),
            "canonical_key_b": pc.take(canon_u, ib),
            "dotless_a": pc.take(dotless_u, ia),
            "dotless_b": pc.take(dotless_u, ib),
            "domain_key_a": pc.take(domkey_u, ia),
            "domain_key_b": pc.take(domkey_u, ib),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        if n == 0:
            return _empty_scored()
        f = self._derive_features(batch)

        def _np(mask):
            return np.asarray(
                pc.fill_null(mask, False).to_numpy(zero_copy_only=False), dtype=bool
            )

        # all prefilters are zero-copy Arrow kernels; per-pair Python runs
        # only on the (rare) fuzzy candidates below
        exact = _np(pc.equal(f["canonical_key_a"], f["canonical_key_b"]))
        same_dom = _np(pc.equal(f["domain_key_a"], f["domain_key_b"]))
        dot_eq = _np(pc.equal(f["dotless_a"], f["dotless_b"]))
        len_a = pc.utf8_length(f["dotless_a"]).to_numpy(zero_copy_only=False)
        len_b = pc.utf8_length(f["dotless_b"]).to_numpy(zero_copy_only=False)
        # dot-insensitivity only for locals long enough to be unambiguous:
        # short corpus locals like "te.st"/"test" are distinct identities
        long_enough = (len_a >= self.min_len) & (len_b >= self.min_len)
        dotless_eq = same_dom & dot_eq & ~exact & long_enough
        fuzz_cand = (
            same_dom
            & ~exact
            & ~dotless_eq
            & long_enough
            & (np.abs(len_a - len_b) <= self.lev_k)
        )
        lev_ok = np.zeros(n, dtype=bool)
        idx = np.flatnonzero(fuzz_cand)
        score = np.zeros(n, dtype=np.float64)
        rule = np.full(n, "", dtype=object)
        if len(idx):
            take = pa.array(idx)
            dot_a = np.asarray(
                pc.take(f["dotless_a"], take).to_pylist(), dtype=object
            )
            dot_b = np.asarray(
                pc.take(f["dotless_b"], take).to_pylist(), dtype=object
            )
            sub_ok = batch_lev_leq(dot_a, dot_b, self.lev_k)
            lev_ok[idx] = sub_ok
            if sub_ok.any():
                jw = batch_jaro_winkler(dot_a[sub_ok], dot_b[sub_ok])
                good = jw >= self.jw_floor
                keep = idx[sub_ok][good]
                score[keep] = jw[good]
                rule[keep] = "lev1"
        score[exact] = 1.0
        rule[exact] = "exact_canonical"
        score[dotless_eq] = 0.98
        rule[dotless_eq] = "dotless_equal"
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


# below this many partially-deduped edge rows the global dedup happens
# on the driver (one concat + one Arrow group_by, a few MB of strings)
# instead of paying a Ray sort-shuffle's fixed barrier; matches the
# connected-components short-circuit philosophy (clustering.py)
SMALL_EDGE_LIMIT = 1_000_000


def dedupe_edges(edges_ds):
    """Normalize accepted edges (addr_a < addr_b) and dedupe pairs
    co-emitted by multiple blocking passes: per-batch partial dedup so
    at most one row per (pair, batch) survives the map side, then a
    size-gated global dedup — driver-side Arrow group_by under
    ``SMALL_EDGE_LIMIT`` (edges are a tiny fraction of input at the
    100-TB design point, but the gate keeps the distributed path for
    adversarial edge densities), ``sorted_pair_dedup`` above — Ray's
    native groupby collapses at millions of GROUPS, and the edge table
    is nearly all unique keys (see stages/dedup.py for the measured
    230 s → 3.6 s comparison at the 100k-doc stress).

    The scorer is deterministic per pair, so duplicates agree on rule
    and score (Min/Max are tiebreak no-ops).  Running this inside
    ``resolve`` makes the edge stage's checkpoint manifest count the
    LOGICAL match-pair count (SQL-derivable — the pipeline_counters
    oracle restates it) and shrinks the connected-components input."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    def norm(t: pa.Table) -> pa.Table:
        lt = pc.less(t["addr_a"], t["addr_b"])
        lo = pc.if_else(lt, t["addr_a"], t["addr_b"])
        hi = pc.if_else(lt, t["addr_b"], t["addr_a"])
        out = pa.table(
            {"addr_a": lo, "addr_b": hi, "score": t["score"], "rule": t["rule"]}
        )
        return (
            out.group_by(["addr_a", "addr_b"])
            .aggregate([("rule", "min"), ("score", "max")])
            .rename_columns(["addr_a", "addr_b", "rule", "score"])
        )

    partial = edges_ds.map_batches(norm, batch_format="pyarrow").materialize()
    if partial.count() <= SMALL_EDGE_LIMIT:
        tabs = [t for t in ray.get(partial.to_arrow_refs()) if t.num_columns]
        if not tabs:
            return partial
        folded = (
            pa.concat_tables(tabs)
            .group_by(["addr_a", "addr_b"])
            .aggregate([("rule", "min"), ("score", "max")])
            .rename_columns(["addr_a", "addr_b", "rule", "score"])
        )
        return rd.from_arrow(folded)
    from .dedup import sorted_pair_dedup

    return sorted_pair_dedup(
        partial, ["addr_a", "addr_b"], [("rule", "min"), ("score", "max")]
    )


def score_pairs(pairs_ds, concurrency=None, batch_size: int = 32768):
    """Candidate pairs → accepted match edges via the scorer actor pool.

    ``concurrency`` defaults to an autoscaling (cpus//2, cpus) pool.
    Ray fuses the upstream pair-emission map into this actor pool, so
    the POOL is the stage's parallelism cap and its ramp-up is on the
    critical path: measured at sf3.0/32 CPUs, floor cpus//4 ran the
    88 s of emit+score remote work at effective width ~6 (24.8 s wall)
    while floor cpus//2 reached 16.3 s.  A FIXED pool of exactly
    ``cpus`` is far worse — it reserves every CPU slot and starves the
    upstream repartition/sort tasks (measured: the stage stalls
    >150 s) — so the floor keeps headroom below the machine size.

    CONSTRAINT: at most one scorer pool may be live per executing DAG.
    Two lazy ``score_pairs`` branches under one ``union`` reserve
    2 × cpus//2 = every CPU and deadlock the streaming executor
    (observed at sf0.01/16 CPUs in incremental_resolve before it
    materialized the delta edges) — materialize one branch first."""
    from .pools import autoscaling_pool

    concurrency = autoscaling_pool(concurrency)
    return pairs_ds.map_batches(
        PairScorer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
