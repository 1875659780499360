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
