"""Branch equality for the retract families' AT-SCALE path (the
Bloom-prefiltered exact GC behind the broadcast gates): each gate is
forced to 0 so the over-gate branch runs on the same fixtures the
broadcast-path tests use, and the results must be identical.

This is the same gate-flip discipline as the near-dup fold regime
tests — both sides of every size gate get a value check."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _pair_set(ds):
    return {(r["doc_a"], r["doc_b"]) for r in ds.take_all()}


def test_dedup_retract_scale_branch_equals_broadcast(ray_session, monkeypatch):
    import email_address_parser_ray.stages.dedup as dd
    from tests.test_dedup_retract import _chain_corpus, _cluster_map

    docs = _chain_corpus()
    full = rd.from_arrow(docs)
    pairs = dd.minhash_verified_pairs(full, threshold=0.5).materialize()
    clusters = dd.minhash_dedup_clusters(full, threshold=0.5).materialize()
    removed = rd.from_arrow(pa.table({"doc_id": pa.array([1, 11], pa.int64())}))

    broadcast = dd.minhash_retract_clusters(pairs, clusters, removed)
    monkeypatch.setattr(dd, "DEDUP_RETRACT_BROADCAST_LIMIT", 0)
    scale = dd.minhash_retract_clusters(pairs, clusters, removed)

    assert _pair_set(scale["pairs"]) == _pair_set(broadcast["pairs"])
    assert _cluster_map(scale["clusters"]) == _cluster_map(broadcast["clusters"])


def test_embedding_retract_scale_branch_equals_broadcast(ray_session, monkeypatch):
    import email_address_parser_ray.stages.ann as ann

    rng = np.random.RandomState(2)
    base = rng.randn(40, 16).astype(np.float32)
    base[1] = base[0] + 0.001  # a near-dup pair
    base[7] = base[6] + 0.001
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(40), pa.int64()),
                "embedding": pa.array([r.tolist() for r in base],
                                      pa.list_(pa.float32())),
            }
        )
    ).repartition(3)
    pairs = ann.embedding_near_dup_pairs(emb, d=16, threshold=0.98).materialize()
    removed = rd.from_arrow(pa.table({"vec_id": pa.array([0], pa.int64())}))

    broadcast = ann.embedding_retract_pairs(pairs, removed)
    monkeypatch.setattr(ann, "EMB_RETRACT_BROADCAST_LIMIT", 0)
    scale = ann.embedding_retract_pairs(pairs, removed)

    def pset(ds):
        return {(r["vec_a"], r["vec_b"]) for r in ds.take_all()}

    assert pset(scale) == pset(broadcast)
    assert all(0 not in p for p in pset(scale))
    assert (6, 7) in pset(scale)


def _bridge_fixture():
    a, b, c = "aaa@x.example", "bridge@x.example", "ccc@x.example"
    d, e = "ddd@y.example", "eee@y.example"
    nodes = rd.from_arrow(pa.table({
        "address": pa.array([a, b, c, d, e], pa.string()),
        "n_mentions": pa.array([2, 1, 2, 1, 1], pa.int64()),
    }))
    edges = rd.from_arrow(pa.table({
        "addr_a": pa.array([a, b, d], pa.string()),
        "addr_b": pa.array([b, c, e], pa.string()),
        "score": pa.array([900, 900, 900], pa.int64()),
        "rule": pa.array(["t", "t", "t"], pa.string()),
    }))
    clusters = rd.from_arrow(pa.table({
        "address": pa.array([a, b, c, d, e], pa.string()),
        "cluster_id": pa.array([a, a, a, d, d], pa.string()),
    }))
    removed = rd.from_arrow(pa.table({"address": pa.array([b], pa.string())}))
    return nodes, edges, clusters, removed


def test_resolve_retract_scale_branch_equals_broadcast(ray_session, monkeypatch):
    import email_address_parser_ray.pipelines.incremental as inc

    nodes, edges, clusters, removed = _bridge_fixture()
    broadcast = inc.incremental_retract(nodes, edges, removed,
                                        old_clusters_ds=clusters)
    monkeypatch.setattr(inc, "RETRACT_BROADCAST_LIMIT", 0)
    scale = inc.incremental_retract(nodes, edges, removed,
                                    old_clusters_ds=clusters)

    def cmap(ds):
        df = ds.to_pandas()
        return dict(zip(df["address"], df["cluster_id"]))

    def eset(ds):
        return {(r["addr_a"], r["addr_b"]) for r in ds.take_all()}

    assert cmap(scale["clusters"]) == cmap(broadcast["clusters"])
    assert eset(scale["edges"]) == eset(broadcast["edges"])
    # the bridge's edges are gone on both paths
    assert all("bridge@" not in x for p in eset(scale["edges"]) for x in p)
