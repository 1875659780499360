"""Integer PageRank parity with a pure-Python reference (same integer
arithmetic replayed per node), plus partition invariance."""

import collections

import numpy as np
import pyarrow as pa

from email_address_parser_ray.stages.graph import (
    DAMP_DEN, DAMP_NUM, SCALE, pagerank_integer,
)


def _reference(edges, iters=2):
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    r = {v: SCALE for v in adj}
    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    for _ in range(iters):
        s = collections.defaultdict(int)
        for v, ns in adj.items():
            c = r[v] // deg[v]
            for u in ns:
                s[u] += c
        r = {v: base + (DAMP_NUM * s[v]) // DAMP_DEN for v in adj}
    return r


def test_pagerank_matches_reference_and_partitioning(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(33)
    edges = sorted(
        {
            (f"u{a}", f"v{b}")
            for a, b in zip(rng.randint(0, 40, 300), rng.randint(0, 12, 300))
        }
    )
    want = _reference(edges)
    t = pa.table(
        {
            "src": pa.array([a for a, _ in edges]),
            "dst": pa.array([b for _, b in edges]),
        }
    )
    for blocks in (1, 9):
        got = (
            pagerank_integer(rd.from_arrow(t).repartition(blocks), iters=2)
            .to_pandas()
        )
        got_map = dict(zip(got["node"], got["r"]))
        assert got_map == want, blocks


def test_pagerank_small_and_distributed_paths_agree(ray_session, monkeypatch):
    """The driver-folded small-graph path and the hash-join rounds must
    produce identical int64 ranks (forcing the distributed path by
    zeroing the node gate)."""
    import ray.data as rd

    from email_address_parser_ray.stages import graph as g

    rng = np.random.RandomState(7)
    edges = sorted(
        {
            (f"a{a}", f"b{b}")
            for a, b in zip(rng.randint(0, 25, 160), rng.randint(0, 9, 160))
        }
    )
    t = pa.table(
        {
            "src": pa.array([a for a, _ in edges]),
            "dst": pa.array([b for _, b in edges]),
        }
    )
    small = pagerank_integer(rd.from_arrow(t).repartition(5), iters=2).to_pandas()
    monkeypatch.setattr(g, "PAGERANK_SMALL_NODES", 0)
    dist = g.pagerank_integer(rd.from_arrow(t).repartition(5), iters=2).to_pandas()
    assert dict(zip(small["node"], small["r"])) == dict(zip(dist["node"], dist["r"]))
    assert dict(zip(small["node"], small["r"])) == _reference(edges)
