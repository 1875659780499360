"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS, arXiv:2302.03169): pick raw-corpus documents whose hashed
n-gram distribution looks like a small TARGET corpus, by importance
weight log w(x) = sum_f c_f(x) * (log p_target[f] - log q_raw[f])
over m hash-bucketed unigram+bigram features, then sample k docs
without replacement proportionally to w (Gumbel top-k — the paper's
sampled-without-replacement selection, deterministic here via
content-keyed noise).

Distributed shape (the 100-TB story):

* each feature-distribution fit is ONE streaming pass — per-block
  int64[m] count partials, driver sum-folds O(m) state (m defaults to
  8192: 64 KB per block partial, the HLL-register discipline); the
  raw corpus is never materialized;
* ``log_ratio`` (m float64 = 64 KB) is broadcast once via the closure;
  per-doc weights are one vectorized ``np.add.at`` scatter per batch;
* selection reuses ``sketches.weighted_sample_k`` in its log-weight
  (Gumbel) form — per-block partial top-k, O(k) driver fold.

All stages are partition-invariant: count partials sum-merge, the
Gumbel noise is keyed on doc content ids, ties break on priority then
block order of equal keys (exact equality pinned in
tests/test_dsir.py against a numpy reference).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import mix64

_TOK_SEED = np.uint64(0x9E3779B97F4A7C15)


def _feature_ids(texts, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Hashed unigram+bigram feature ids for a WHOLE batch: returns
    (flat feature ids < m, doc index per occurrence).  Token hashes
    are crc32→mix64 per UNIQUE token (the ``word_shingles_flat``
    trick); bigram ids chain-fold two neighbouring token hashes, with
    pairs that straddle a doc boundary masked out.  A doc with t
    tokens emits t unigram + max(t-1, 0) bigram occurrences."""
    import zlib

    tok_rows = [t.split() for t in texts]
    tlens = np.fromiter((len(r) for r in tok_rows), np.int64, len(tok_rows))
    n_tok = int(tlens.sum())
    if n_tok == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    flat = np.array([w for r in tok_rows for w in r], dtype=object)
    uniq, inv = np.unique(flat, return_inverse=True)
    uh = mix64(
        np.fromiter(
            (zlib.crc32(u.encode("utf-8")) for u in uniq), np.uint64, len(uniq)
        )
    )
    th = uh[inv]
    uni = (th % np.uint64(m)).astype(np.int64)
    doc_of_tok = np.repeat(np.arange(len(texts), dtype=np.int64), tlens)
    if n_tok > 1:
        big = (
            mix64(mix64(_TOK_SEED ^ th[:-1]) ^ th[1:]) % np.uint64(m)
        ).astype(np.int64)
        # keep pair (j, j+1) only when both tokens share a doc
        keep = doc_of_tok[:-1] == doc_of_tok[1:]
        big = big[keep]
        big_doc = doc_of_tok[:-1][keep]
    else:
        big = np.empty(0, np.int64)
        big_doc = np.empty(0, np.int64)
    return (
        np.concatenate([uni, big]),
        np.concatenate([doc_of_tok, big_doc]),
    )


def hashed_ngram_counts(ds, m: int = 8192, text_col: str = "text") -> np.ndarray:
    """Corpus-wide hashed-ngram feature counts: ONE streaming pass,
    int64[m] per-block partials, driver sum-fold (O(m) state)."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        c = np.zeros(m, np.int64)
        if t.num_rows:
            ids, _ = _feature_ids(t[text_col].to_pylist(), m)
            np.add.at(c, ids, 1)
        return pa.table({"c": pa.array([c.tobytes()], pa.binary())})

    total = np.zeros(m, np.int64)
    for ref in ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        # zero-row upstream blocks pass through map_batches unprocessed
        # and surface schema-less — they carry no counts by definition
        if "c" not in t.schema.names:
            continue
        for buf in t["c"].to_pylist():
            total += np.frombuffer(buf, np.int64)
    return total


def dsir_log_ratio(target_counts: np.ndarray, raw_counts: np.ndarray,
                   alpha: float = 0.5) -> np.ndarray:
    """log p_target - log q_raw with add-alpha smoothing on both sides
    (unseen buckets stay finite; alpha=0.5 = Jeffreys)."""
    m = len(target_counts)
    p = (target_counts + alpha) / (target_counts.sum() + alpha * m)
    q = (raw_counts + alpha) / (raw_counts.sum() + alpha * m)
    return np.log(p) - np.log(q)


def append_dsir_log_weight(ds, log_ratio: np.ndarray, m: int,
                           text_col: str = "text",
                           out_col: str = "dsir_logw"):
    """Vectorized per-doc importance log-weight: one scatter-add of the
    broadcast log-ratio vector per batch."""
    lr = np.asarray(log_ratio, np.float64)

    def add_w(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        ids, doc_idx = _feature_ids(t[text_col].to_pylist(), m)
        w = np.zeros(t.num_rows, np.float64)
        np.add.at(w, doc_idx, lr[ids])
        return t.append_column(out_col, pa.array(w, pa.float64()))

    return ds.map_batches(add_w, batch_format="pyarrow")


def dsir_select_k(raw_ds, target_ds, k: int, m: int = 8192,
                  alpha: float = 0.5, seed: int = 7,
                  key_col: str = "doc_id", text_col: str = "text"):
    """End-to-end DSIR: fit target + raw hashed-ngram distributions
    (one streaming pass each), weight every raw doc, Gumbel-top-k
    sample k docs without replacement proportional to the importance
    weight.  Returns a pyarrow Table of the selected raw rows with the
    ``dsir_logw`` column attached."""
    from .sketches import weighted_sample_k

    tc = hashed_ngram_counts(target_ds, m, text_col)
    rc = hashed_ngram_counts(raw_ds, m, text_col)
    lr = dsir_log_ratio(tc, rc, alpha)
    weighted = append_dsir_log_weight(raw_ds, lr, m, text_col)
    return weighted_sample_k(
        weighted, key_col=key_col, weight_col="dsir_logw", k=k, seed=seed,
        log_weights=True,
    )
