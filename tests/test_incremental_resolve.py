"""Incremental resolve must equal a full recompute: folding the second
half of the corpus into a resolution of the first half yields exactly
the clusters a from-scratch run over everything produces (blocking keys
are per-node deterministic, so old-old co-blocking is invariant and the
carried-forward edges are exactly the full run's old-old edges)."""

import pyarrow as pa
import pyarrow.compute as pc


def _split(mentions_ds):
    """Deterministic half-split of the mention stream by conv_id tail."""

    def part(keep_even):
        def f(t: pa.Table) -> pa.Table:
            import numpy as np

            # parity of the last conv_id character's codepoint
            par = np.array(
                [ord(s[-1]) % 2 == 0 for s in t["conv_id"].to_pylist()], dtype=bool
            )
            mask = pa.array(par if keep_even else ~par)
            return t.filter(mask)

        return f

    a = mentions_ds.map_batches(part(True), batch_format="pyarrow")
    b = mentions_ds.map_batches(part(False), batch_format="pyarrow")
    return a, b


def _cluster_map(clusters_ds):
    df = clusters_ds.to_pandas()
    return dict(zip(df["address"], df["cluster_id"]))


def test_incremental_equals_full_recompute(ray_session):
    from email_address_parser_ray.pipelines.incremental import incremental_resolve
    from email_address_parser_ray.pipelines.resolve import (
        extract_mentions, read_transcripts,
    )
    from email_address_parser_ray.sources.transcripts import ensure_transcripts
    from email_address_parser_ray.stages.blocking import build_nodes, candidate_pairs
    from email_address_parser_ray.stages.clustering import connected_components
    from email_address_parser_ray.stages.scoring import score_pairs

    root = ensure_transcripts("/root/testdata/sf0.001")
    mentions = extract_mentions(read_transcripts(f"{root}/transcripts"))
    m_old, m_new = _split(mentions)

    # day 1: resolve the first half from scratch
    nodes_old = build_nodes(m_old).materialize()
    edges_old = score_pairs(candidate_pairs(nodes_old)).materialize()

    # day 2: fold in the second half incrementally
    inc = incremental_resolve(nodes_old, edges_old, m_new)
    got = _cluster_map(inc["clusters"])

    # reference: full recompute over everything
    nodes_full = build_nodes(mentions).materialize()
    edges_full = score_pairs(candidate_pairs(nodes_full)).materialize()
    want = _cluster_map(connected_components(nodes_full, edges_full))

    assert got == want

    # the delta scoring really did skip old-old pairs: carried edges +
    # delta edges partition the full edge set
    n_edges_inc = inc["edges"].count()
    assert n_edges_inc == edges_full.count()


def test_retract_of_added_half_equals_never_added(ray_session):
    """retract(add(X)) == never-added: resolving everything then
    retracting the second half's mentions reproduces the from-scratch
    resolution of the first half — nodes, edge set and clusters."""
    from email_address_parser_ray.pipelines.incremental import incremental_retract
    from email_address_parser_ray.pipelines.resolve import (
        extract_mentions, read_transcripts,
    )
    from email_address_parser_ray.sources.transcripts import ensure_transcripts
    from email_address_parser_ray.stages.blocking import build_nodes, candidate_pairs
    from email_address_parser_ray.stages.clustering import connected_components
    from email_address_parser_ray.stages.scoring import score_pairs

    root = ensure_transcripts("/root/testdata/sf0.001")
    mentions = extract_mentions(read_transcripts(f"{root}/transcripts"))
    m_old, m_new = _split(mentions)

    # resolve EVERYTHING, then retract the second half
    nodes_full = build_nodes(mentions).materialize()
    edges_full = score_pairs(candidate_pairs(nodes_full)).materialize()
    clusters_full = connected_components(nodes_full, edges_full).materialize()
    ret = incremental_retract(
        nodes_full, edges_full, m_new, old_clusters_ds=clusters_full
    )
    got = _cluster_map(ret["clusters"])

    # reference: the first half resolved from scratch
    nodes_want = build_nodes(m_old).materialize()
    edges_want = score_pairs(candidate_pairs(nodes_want)).materialize()
    want = _cluster_map(connected_components(nodes_want, edges_want))
    assert got == want

    # node tables match exactly (address -> decremented count)
    nw = nodes_want.to_pandas().set_index("address")["n_mentions"].to_dict()
    ng = ret["nodes"].to_pandas().set_index("address")["n_mentions"].to_dict()
    assert ng == nw

    # edge sets match exactly
    def edge_set(ds):
        df = ds.to_pandas()
        return set(zip(df["addr_a"], df["addr_b"]))

    assert edge_set(ret["edges"]) == edge_set(edges_want)


def test_retract_splits_bridged_cluster(ray_session):
    """Dropping a bridge node splits its cluster; untouched clusters keep
    their labels verbatim (scoped re-CC path)."""
    import pyarrow as pa
    import ray.data as rd
    from email_address_parser_ray.pipelines.incremental import incremental_retract

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

    ret = incremental_retract(nodes, edges, removed, old_clusters_ds=clusters)
    got = _cluster_map(ret["clusters"])
    # the bridge is gone: a and c split into singletons; d-e untouched
    assert got == {a: a, c: c, d: d, e: d}
    assert ret["edges"].count() == 1  # only the d-e edge survives
    counts = dict(
        zip(*[ret["nodes"].to_pandas()[k] for k in ("address", "n_mentions")])
    )
    assert counts == {a: 2, c: 2, d: 1, e: 1}


def test_retract_partial_counts_keep_clusters(ray_session):
    """Retracting SOME mentions of a surface (count stays > 0) changes
    counts only — edges and clusters are untouched; retracting an
    unknown address is a no-op."""
    import pyarrow as pa
    import ray.data as rd
    from email_address_parser_ray.pipelines.incremental import incremental_retract

    a, b = "aaa@x.example", "aab@x.example"
    nodes = rd.from_arrow(pa.table({
        "address": pa.array([a, b], pa.string()),
        "n_mentions": pa.array([3, 1], pa.int64()),
    }))
    edges = rd.from_arrow(pa.table({
        "addr_a": pa.array([a], pa.string()),
        "addr_b": pa.array([b], pa.string()),
        "score": pa.array([900], pa.int64()),
        "rule": pa.array(["t"], pa.string()),
    }))
    clusters = rd.from_arrow(pa.table({
        "address": pa.array([a, b], pa.string()),
        "cluster_id": pa.array([a, a], pa.string()),
    }))
    removed = rd.from_arrow(pa.table({
        "address": pa.array([a, a, "never@z.example"], pa.string()),
    }))
    ret = incremental_retract(nodes, edges, removed, old_clusters_ds=clusters)
    assert _cluster_map(ret["clusters"]) == {a: a, b: a}
    assert ret["edges"].count() == 1
    counts = dict(
        zip(*[ret["nodes"].to_pandas()[k] for k in ("address", "n_mentions")])
    )
    assert counts == {a: 1, b: 1}
