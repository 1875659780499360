"""Incrementality for the near-dedup family: minhash_retract_clusters
(retract(add(X)) == never-added on pairs AND clusters, including the
cluster-split and label-rename cases) and minhash_incremental_clusters
(add == fresh recompute, including the cluster-MERGE case, with old-old
pairs never re-verified) — the dedup mirrors of the resolve pipeline's
incremental tests."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from email_address_parser_ray.stages.dedup import (
    minhash_dedup_clusters,
    minhash_incremental_clusters,
    minhash_retract_clusters,
    minhash_verified_pairs,
)

TOKS = [f"tok{i:04d}" for i in range(300)]


def _chain_corpus():
    """Docs 0-1 exact-ish near-dups (label-rename case), docs 10-11-12 a
    Jaccard chain A~B~C where only A-B and B-C clear the 0.5 threshold
    (removing B splits the cluster), plus distinct fillers."""
    texts = {
        0: " ".join(f"pair{i}" for i in range(120)),
        1: " ".join(f"pair{i}" if i != 3 else "pairX" for i in range(120)),
        10: " ".join(TOKS[0:200]),  # A
        11: " ".join(TOKS[50:250]),  # B — J(A,B) ≈ 0.6
        12: " ".join(TOKS[100:300]),  # C — J(B,C) ≈ 0.6, J(A,C) ≈ 0.33
        13: " ".join(TOKS[100:300]).replace("tok0200", "tokYYYY", 1),  # D ~ C
        20: "totally different content about distributed dataflow engines",
        21: "another unrelated piece mentioning shuffles and actor pools",
        22: "final document closing out the tiny corpus with neutral words",
    }
    ids = sorted(texts)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([texts[i] for i in ids], pa.string()),
        }
    )


def _cluster_map(ds):
    df = ds.to_pandas()
    return dict(zip(df["doc_id"], df["cluster_id"]))


def _pair_set(ds):
    return {(r["doc_a"], r["doc_b"]) for r in ds.take_all()}


def test_retract_equals_never_added(ray_session):
    docs = _chain_corpus()
    full = rd.from_arrow(docs)
    pairs = minhash_verified_pairs(full, threshold=0.5).materialize()
    clusters = minhash_dedup_clusters(full, threshold=0.5).materialize()
    # preconditions: rename pair clustered together, chain is one cluster
    cl0 = _cluster_map(clusters)
    assert cl0[0] == cl0[1]
    assert cl0[10] == cl0[11] == cl0[12] == cl0[13]

    removed = rd.from_arrow(pa.table({"doc_id": pa.array([1, 11], pa.int64())}))
    out = minhash_retract_clusters(pairs, clusters, removed)

    keep = docs.filter(
        pa.compute.invert(pa.compute.is_in(docs["doc_id"], value_set=pa.array([1, 11])))
    )
    fresh_pairs = minhash_verified_pairs(rd.from_arrow(keep), threshold=0.5)
    fresh_clusters = minhash_dedup_clusters(rd.from_arrow(keep), threshold=0.5)

    assert _pair_set(out["pairs"]) == _pair_set(fresh_pairs)
    got, want = _cluster_map(out["clusters"]), _cluster_map(fresh_clusters)
    assert got == want
    # split: A is cut from {C, D}; rename: 0 now labels itself; and the
    # surviving C-D pair kept its edge and cluster through the GC
    assert got[10] != got[12]
    assert got[12] == got[13] == 12
    assert got[0] == 0
    assert (12, 13) in _pair_set(out["pairs"])


def test_retract_untouched_clusters_keep_labels(ray_session):
    docs = _chain_corpus()
    full = rd.from_arrow(docs)
    pairs = minhash_verified_pairs(full, threshold=0.5).materialize()
    clusters = minhash_dedup_clusters(full, threshold=0.5).materialize()
    before = _cluster_map(clusters)

    removed = rd.from_arrow(pa.table({"doc_id": pa.array([20], pa.int64())}))
    out = minhash_retract_clusters(pairs, clusters, removed)
    after = _cluster_map(out["clusters"])
    assert 20 not in after
    for d, c in after.items():
        assert before[d] == c  # singleton removal touches nothing else


def _split_corpus(docs, new_ids):
    new_mask = pa.compute.is_in(docs["doc_id"], value_set=pa.array(new_ids, pa.int64()))
    return docs.filter(pa.compute.invert(new_mask)), docs.filter(new_mask)


def test_incremental_add_equals_fresh_and_merges(ray_session):
    """Adding doc 11 (the chain's middle) must MERGE the old {10} and
    {12, 13} clusters, and the whole state must equal a fresh run."""
    docs = _chain_corpus()
    old_docs, new_docs = _split_corpus(docs, [11])
    old_pairs = minhash_verified_pairs(rd.from_arrow(old_docs), threshold=0.5).materialize()
    old_clusters = minhash_dedup_clusters(rd.from_arrow(old_docs), threshold=0.5)
    before = _cluster_map(old_clusters)
    assert before[10] != before[12]  # pre-merge: A separate from {C, D}

    out = minhash_incremental_clusters(
        rd.from_arrow(old_docs), old_pairs, rd.from_arrow(new_docs), threshold=0.5
    )
    fresh_pairs = minhash_verified_pairs(rd.from_arrow(docs), threshold=0.5)
    fresh_clusters = minhash_dedup_clusters(rd.from_arrow(docs), threshold=0.5)
    assert _pair_set(out["pairs"]) == _pair_set(fresh_pairs)
    got = _cluster_map(out["clusters"])
    assert got == _cluster_map(fresh_clusters)
    assert got[10] == got[11] == got[12] == got[13] == 10  # merged


def test_incremental_add_then_retract_roundtrip(ray_session):
    docs = _chain_corpus()
    old_docs, new_docs = _split_corpus(docs, [11, 13])
    old_pairs = minhash_verified_pairs(rd.from_arrow(old_docs), threshold=0.5).materialize()
    old_clusters = minhash_dedup_clusters(
        rd.from_arrow(old_docs), threshold=0.5
    ).materialize()

    added = minhash_incremental_clusters(
        rd.from_arrow(old_docs), old_pairs, rd.from_arrow(new_docs), threshold=0.5
    )
    back = minhash_retract_clusters(
        added["pairs"],
        added["clusters"],
        rd.from_arrow(pa.table({"doc_id": pa.array([11, 13], pa.int64())})),
    )
    assert _pair_set(back["pairs"]) == _pair_set(old_pairs)
    assert _cluster_map(back["clusters"]) == _cluster_map(old_clusters)


def test_incremental_add_nothing_new_near(ray_session):
    """Adding an unrelated doc leaves every old pair and label intact
    and gives the newcomer a singleton cluster."""
    docs = _chain_corpus()
    old_docs, new_docs = _split_corpus(docs, [22])
    old_pairs = minhash_verified_pairs(rd.from_arrow(old_docs), threshold=0.5).materialize()
    old_clusters = minhash_dedup_clusters(rd.from_arrow(old_docs), threshold=0.5)
    out = minhash_incremental_clusters(
        rd.from_arrow(old_docs), old_pairs, rd.from_arrow(new_docs), threshold=0.5
    )
    assert _pair_set(out["pairs"]) == _pair_set(old_pairs)
    got = _cluster_map(out["clusters"])
    assert got[22] == 22
    for d, c in _cluster_map(old_clusters).items():
        assert got[d] == c


def test_retract_noop_and_unknown_id(ray_session):
    docs = _chain_corpus()
    full = rd.from_arrow(docs)
    pairs = minhash_verified_pairs(full, threshold=0.5).materialize()
    clusters = minhash_dedup_clusters(full, threshold=0.5).materialize()

    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
    out = minhash_retract_clusters(pairs, clusters, empty)
    assert _cluster_map(out["clusters"]) == _cluster_map(clusters)

    ghost = rd.from_arrow(pa.table({"doc_id": pa.array([999], pa.int64())}))
    out2 = minhash_retract_clusters(pairs, clusters, ghost)
    assert _cluster_map(out2["clusters"]) == _cluster_map(clusters)
    assert _pair_set(out2["pairs"]) == _pair_set(pairs)
