"""Incremental entity resolution: fold a NEW batch of transcripts into
an already-resolved corpus without re-scoring the old pairs.

The 100-TB operating mode: a daily shard arrives, and re-running the
full pipeline would re-score ~all pairs ever seen.  Because blocking
keys are a deterministic function of each node alone, a pair of OLD
addresses is co-blocked after the update iff it was co-blocked before —
its score is already in the edge table.  So the incremental update

1. merges the old node table with the new mentions' partial aggregates
   (one hash shuffle over (address, count, src) — the same slim payload
   as ``build_nodes``), marking surfaces never seen before as ``is_new``;
2. re-runs blocking over ALL nodes but emits only pairs with >=1 new
   side (the ``is_new`` filter inside ``emit_pairs_bucket``), so scoring
   cost is proportional to the DELTA's block neighborhoods, not the
   corpus;
3. unions the new edges with the carried-forward edge table (disjoint
   by construction: old-old pairs never leave the incremental emit) and
   re-runs connected components.

Exactness: for triu-emitted blocks (<= MAX_BLOCK_SIZE) the resulting
edge set is IDENTICAL to a full recompute, hence identical clusters
(CC labels are deterministic lexicographic minima).  For oversize
blocks the sorted-neighborhood window shifts as members arrive, so the
incremental edge set may differ there (recall-preserving in both
directions only within the window cap) — same approximation the full
pipeline already makes for skew-hot blocks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowutil import from_pandas_clean
from ..stages.blocking import (
    N_PAIR_BUCKETS,
    _add_addr_bucket,
    _rederive_node_columns,
    candidate_pairs,
    partial_node_agg,
)
from ..stages.clustering import connected_components
from ..stages.scoring import score_pairs


def _merge_bucket(df: pd.DataFrame) -> pa.Table:
    g = df.groupby("address", as_index=False, sort=False).agg(
        n_mentions=("n_mentions", "sum"), src=("src", "min")
    )
    return from_pandas_clean(
        pd.DataFrame(
            {
                "address": g["address"],
                "n_mentions": g["n_mentions"].astype(np.int64),
                # never present in the old node table => genuinely new
                "is_new": (g["src"] == 1).astype(np.int8),
            }
        )
    )


def merge_nodes(old_nodes_ds, new_mentions_ds, n_buckets: int = N_PAIR_BUCKETS):
    """(old node table, new mention stream) → merged node table with an
    ``is_new`` marker on surfaces absent from the old table.  Same
    slim-payload shape as ``build_nodes``: only (address, count, src)
    crosses the shuffle; canonical columns are re-derived after."""
    old_slim = old_nodes_ds.map_batches(
        lambda t: pa.table(
            {
                "address": t["address"],
                "n_mentions": pc.cast(t["n_mentions"], pa.int64()),
                "src": pa.array(np.zeros(len(t), dtype=np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    new_slim = new_mentions_ds.map_batches(
        partial_node_agg, batch_format="pyarrow"
    ).map_batches(
        lambda t: pa.table(
            {
                "address": t["address"],
                "n_mentions": pc.cast(t["n_mentions"], pa.int64()),
                "src": pa.array(np.ones(len(t), dtype=np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    import ray

    # size the pre-shuffle coalesce to the cluster (a fixed 16 caps
    # merge parallelism at scale); still coarse enough that the sort
    # shuffle never sees O(maps x reduces) tiny objects
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (
        old_slim.union(new_slim)
        .map_batches(lambda t: _add_addr_bucket(t, n_buckets), batch_format="pyarrow")
        .repartition(max(8, cpus))
        .groupby("bucket")
        .map_groups(_merge_bucket, batch_format="pandas")
        .map_batches(_rederive_node_columns, batch_format="pyarrow")
    )


def incremental_resolve(
    old_nodes_ds,
    old_edges_ds,
    new_mentions_ds,
    scorer_concurrency=None,
    max_rounds: int = 16,
):
    """Fold a new mention stream into an existing resolution.  Returns
    {"nodes", "edges", "clusters"} where edges = carried-forward old
    edges ∪ newly scored delta edges.

    The delta edges are materialized here (they are the slim
    (addr_a, addr_b, score) table, tiny next to mentions) so that at
    most ONE ``PairScorer`` actor pool is live per executing DAG: the
    pool's autoscaling floor is ``cpus//2`` (stages/scoring.py), and if
    ``old_edges_ds`` is itself a lazy scored pipeline, materializing
    their union in ``connected_components`` would otherwise put two
    pools (= all CPUs) in one DAG and starve the upstream sort tasks —
    a deadlock, not just slowness."""
    nodes = merge_nodes(old_nodes_ds, new_mentions_ds).materialize()
    delta_pairs = candidate_pairs(nodes)
    new_edges = score_pairs(delta_pairs, concurrency=scorer_concurrency).materialize()
    edges = old_edges_ds.union(new_edges)
    clusters = connected_components(nodes, edges, max_rounds)
    return {"nodes": nodes, "edges": edges, "clusters": clusters}
