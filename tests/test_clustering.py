"""Connected-components parity: the driver union-find short-circuit and
the distributed min-label propagation rounds must produce identical
(address, cluster_id) assignments on the same graph."""

import pandas as pd
import pyarrow as pa
import pytest


def _toy_graph():
    # two multi-node components (one a chain, one a star), two singletons
    nodes = ["a", "b", "c", "d", "m", "n", "o", "x", "z"]
    edges = [("b", "a"), ("c", "b"), ("d", "c"), ("m", "n"), ("m", "o")]
    return nodes, edges


def _expected():
    return {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "m": "m", "n": "m", "o": "m",
        "x": "x", "z": "z",
    }


def _run_cc(ray_session, monkeypatch, small_limit):
    import ray.data as rd
    from email_address_parser_ray.stages import clustering

    monkeypatch.setattr(clustering, "SMALL_CC_LIMIT", small_limit)
    nodes, edges = _toy_graph()
    nodes_ds = rd.from_arrow(pa.table({"address": pa.array(nodes, pa.string())}))
    edges_ds = rd.from_arrow(
        pa.table(
            {
                "addr_a": pa.array([e[0] for e in edges], pa.string()),
                "addr_b": pa.array([e[1] for e in edges], pa.string()),
            }
        )
    )
    out = clustering.connected_components(nodes_ds, edges_ds).to_pandas()
    return dict(zip(out["address"], out["cluster_id"]))


def test_driver_shortcircuit_components(ray_session, monkeypatch):
    assert _run_cc(ray_session, monkeypatch, 10**6) == _expected()


def test_distributed_rounds_components(ray_session, monkeypatch):
    # force the distributed label-propagation path on the same graph
    assert _run_cc(ray_session, monkeypatch, 0) == _expected()


def test_paths_agree_on_resolve_graph(ray_session, monkeypatch):
    """Both regimes on the real sf0.001 node/edge tables agree exactly."""
    from email_address_parser_ray.pipelines.resolve import (
        extract_mentions, read_transcripts,
    )
    from email_address_parser_ray.sources.transcripts import ensure_transcripts
    from email_address_parser_ray.stages import clustering
    from email_address_parser_ray.stages.blocking import build_nodes, candidate_pairs
    from email_address_parser_ray.stages.scoring import score_pairs

    root = ensure_transcripts("/root/testdata/sf0.001")
    nodes = build_nodes(
        extract_mentions(read_transcripts(f"{root}/transcripts"))
    ).materialize()
    edges = score_pairs(candidate_pairs(nodes)).materialize()

    monkeypatch.setattr(clustering, "SMALL_CC_LIMIT", 10**9)
    fast = clustering.connected_components(nodes, edges).to_pandas()
    monkeypatch.setattr(clustering, "SMALL_CC_LIMIT", 0)
    slow = clustering.connected_components(nodes, edges).to_pandas()

    fast = fast.sort_values("address").reset_index(drop=True)
    slow = slow.sort_values("address").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)


def test_byte_budget_gate_forces_distributed(ray_session, monkeypatch):
    """A graph under the row-count gate but over the byte budget must take
    the distributed rounds (and still produce the exact assignment)."""
    from email_address_parser_ray.stages import clustering

    monkeypatch.setattr(clustering, "SMALL_CC_BYTE_LIMIT", 1)  # 1 byte
    assert _run_cc(ray_session, monkeypatch, 10**6) == _expected()
