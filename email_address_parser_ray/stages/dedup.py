"""Deduplication operators over the ``documents`` table.

Each operator is a Ray-Data-first composition (map_batches sketching →
band/bucket groupby shuffle → per-bucket candidate pairs → vectorized
verify → shared connected-components), mirroring the guide's
shingle→minhash→band→bucket pattern.  Exact dedup pre-aggregates per
batch before its single shuffle.

Scale notes: sketches are fixed-size per doc (128×8 B MinHash, 8 B
SimHash), so the shuffled band tables are tiny relative to the corpus;
bucket groups are capped (``MAX_BUCKET``) with deterministic trimming so
a degenerate key (e.g. empty docs) cannot go quadratic.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (
    band_keys,
    hamming64,
    jaccard,
    minhash_signature,
    simhash64,
    simhash_bands,
    word_shingles,
)

MAX_BUCKET = 64


# --- exact dedup -----------------------------------------------------------

def _content_hash_batch(batch: pa.Table) -> pa.Table:
    fps = [
        hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()
    ]
    return pa.table(
        {"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.string())}
    )


def _exact_partial(batch: pa.Table) -> pa.Table:
    return batch.group_by("fp").aggregate(
        [("doc_id", "min"), ("doc_id", "count")]
    ).rename_columns(["fp", "doc_id", "n_copies"])


def _exact_merge(g: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": [g["doc_id"].min()], "n_copies": [g["n_copies"].sum()]}
    )


def exact_dedup(docs_ds):
    """Hash-partition on content hash, keep first doc per group.

    Per-batch partial aggregate → one groupby(fp) shuffle (SURVEY §2.d,
    A9 Eq/Hash semantics generalized to documents)."""
    return (
        docs_ds.map_batches(_content_hash_batch, batch_format="pyarrow")
        .map_batches(_exact_partial, batch_format="pyarrow")
        .groupby("fp")
        .map_groups(_exact_merge, batch_format="pandas")
    )


# --- MinHash + LSH near-dedup ---------------------------------------------

class MinHashSketcher:
    """Actor-pool stage: text → (band_key, doc_id, signature bytes)."""

    def __init__(self, shingle_k: int = 3, bands: int = 32):
        self.k = shingle_k
        self.bands = bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        o_band: List[int] = []
        o_doc: List[int] = []
        o_sig: List[bytes] = []
        for did, t in zip(doc_ids, texts):
            sig = minhash_signature(word_shingles(t, self.k))
            sb = sig.tobytes()
            for bk in band_keys(sig, self.bands):
                o_band.append(bk)
                o_doc.append(did)
                o_sig.append(sb)
        return pa.table(
            {
                "band_key": pa.array(o_band, pa.int64()),
                "doc_id": pa.array(o_doc, pa.int64()),
                "sig": pa.array(o_sig, pa.binary()),
            }
        )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    g = g.drop_duplicates("doc_id").sort_values("doc_id").reset_index(drop=True)
    n = len(g)
    if n < 2:
        return pd.DataFrame({"doc_a": [], "doc_b": [], "sig_a": [], "sig_b": []})
    if n > MAX_BUCKET:  # degenerate bucket guard (deterministic trim)
        g = g.head(MAX_BUCKET)
        n = MAX_BUCKET
    ia, ib = np.triu_indices(n, k=1)
    return pd.DataFrame(
        {
            "doc_a": g["doc_id"].to_numpy()[ia],
            "doc_b": g["doc_id"].to_numpy()[ib],
            "sig_a": g["sig"].to_numpy()[ia],
            "sig_b": g["sig"].to_numpy()[ib],
        }
    )


class MinHashVerifier:
    """Actor-pool stage: estimate Jaccard from full signatures; keep pairs
    >= threshold.  (Signature agreement is an unbiased Jaccard estimate;
    the ngram_jaccard_pairs query does the exact-verify variant.)"""

    def __init__(self, threshold: float = 0.7):
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        sa = batch["sig_a"].to_pylist()
        sb = batch["sig_b"].to_pylist()
        est = np.empty(len(sa), dtype=np.float64)
        for i, (x, y) in enumerate(zip(sa, sb)):
            xa = np.frombuffer(x, dtype=np.uint64)
            ya = np.frombuffer(y, dtype=np.uint64)
            est[i] = float((xa == ya).mean())
        keep = est >= self.threshold
        out = pa.table(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "jaccard_est": pa.array(np.round(est, 6), pa.float64()),
            }
        )
        return out.filter(pa.array(keep))


def minhash_candidate_pairs(docs_ds, threshold: float = 0.7, concurrency: int = 4):
    """documents → near-dup candidate pairs (deduped) with Jaccard estimates."""
    banded = docs_ds.map_batches(
        MinHashSketcher, batch_format="pyarrow", concurrency=(1, concurrency)
    )
    pairs = banded.groupby("band_key").map_groups(_bucket_pairs, batch_format="pandas")
    verified = pairs.map_batches(
        MinHashVerifier,
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        fn_constructor_kwargs={"threshold": threshold},
    )
    # cross-band dedup of surviving pairs (small): one groupby shuffle
    return (
        verified.groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )


def minhash_dedup_clusters(docs_ds, threshold: float = 0.7):
    """Full near-dedup: candidate pairs → connected components → one row
    per doc with its cluster id (min doc_id of the component)."""
    from .clustering import connected_components

    pairs = minhash_candidate_pairs(docs_ds, threshold)

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "addr_a": pa.compute.cast(t["doc_a"], pa.string()),
                "addr_b": pa.compute.cast(t["doc_b"], pa.string()),
            }
        )

    def to_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"address": pa.compute.cast(t["doc_id"], pa.string())})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")
    nodes = docs_ds.map_batches(to_nodes, batch_format="pyarrow")
    cc = connected_components(nodes, edges)
    return cc.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pa.compute.cast(t["address"], pa.int64()),
                "cluster_id": pa.compute.cast(t["cluster_id"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


# --- exact n-gram Jaccard verify ------------------------------------------

class JaccardVerifier:
    """Exact k-word-shingle Jaccard for candidate pairs (needs both texts)."""

    def __init__(self, shingle_k: int = 3):
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        vals = np.empty(len(ta), dtype=np.float64)
        for i, (x, y) in enumerate(zip(ta, tb)):
            vals[i] = jaccard(
                np.sort(word_shingles(x, self.k)), np.sort(word_shingles(y, self.k))
            )
        return batch.drop_columns(["text_a", "text_b"]).append_column(
            "jaccard", pa.array(np.round(vals, 6), pa.float64())
        )


# --- SimHash ---------------------------------------------------------------

def _simhash_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    hs = [simhash64(t) for t in texts]
    o_band, o_doc, o_h = [], [], []
    for did, h in zip(batch["doc_id"].to_pylist(), hs):
        for bk in simhash_bands(h):
            o_band.append(bk)
            o_doc.append(did)
            o_h.append(h)
    return pa.table(
        {
            "band_key": pa.array(o_band, pa.int64()),
            "doc_id": pa.array(o_doc, pa.int64()),
            "simhash": pa.array(np.array(o_h, dtype=np.uint64)),
        }
    )


def _simhash_pairs(g: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    g = g.drop_duplicates("doc_id").sort_values("doc_id").reset_index(drop=True)
    n = len(g)
    out_a, out_b, out_d = [], [], []
    if 2 <= n <= MAX_BUCKET:
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy()
        for i in range(n):
            for j in range(i + 1, n):
                d = hamming64(int(hs[i]), int(hs[j]))
                if d <= max_hamming:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    out_d.append(d)
    return pd.DataFrame(
        {
            "doc_a": pd.Series(out_a, dtype="int64"),
            "doc_b": pd.Series(out_b, dtype="int64"),
            "hamming": pd.Series(out_d, dtype="int64"),
        }
    )


def simhash_near_dups(docs_ds, max_hamming: int = 3):
    """SimHash near-dup pairs: 16-bit band bucketing (pigeonhole-complete
    for hamming<4) → per-bucket hamming verify → cross-band dedup."""
    banded = docs_ds.map_batches(_simhash_batch, batch_format="pyarrow")
    pairs = banded.groupby("band_key").map_groups(
        lambda g: _simhash_pairs(g, max_hamming), batch_format="pandas"
    )
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
