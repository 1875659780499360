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


RETRACT_BROADCAST_LIMIT = 2_000_000  # dropped / affected addresses above this


def _signed_count_bucket(df: pd.DataFrame) -> pa.Table:
    g = df.groupby("address", as_index=False, sort=False)["n_mentions"].sum()
    return from_pandas_clean(g)


def retract_nodes(old_nodes_ds, removed_mentions_ds, n_buckets: int = N_PAIR_BUCKETS):
    """(old node table, removed mention stream) → (address, n_mentions)
    with DECREMENTED counts, INCLUDING non-positive rows — callers split
    survivors (> 0) from dropped (<= 0).  Same slim shuffle as
    ``merge_nodes``: removed mentions fold per batch to (address, count)
    and enter the shuffle NEGATED, so one signed sum per bucket does the
    decrement.  Retracting an address never seen yields a negative row
    (it lands in the dropped set, where it is a no-op)."""
    import ray

    old_slim = old_nodes_ds.map_batches(
        lambda t: pa.table(
            {
                "address": t["address"],
                "n_mentions": pc.cast(t["n_mentions"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    rem_slim = removed_mentions_ds.map_batches(
        partial_node_agg, batch_format="pyarrow"
    ).map_batches(
        lambda t: pa.table(
            {
                "address": t["address"],
                "n_mentions": pc.multiply(
                    pc.cast(t["n_mentions"], pa.int64()), pa.scalar(-1, pa.int64())
                ),
            }
        ),
        batch_format="pyarrow",
    )
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (
        old_slim.union(rem_slim)
        .map_batches(lambda t: _add_addr_bucket(t, n_buckets), batch_format="pyarrow")
        .repartition(max(8, cpus))
        .groupby("bucket")
        .map_groups(_signed_count_bucket, batch_format="pandas")
    )


def _addr_array(mat, col: str = "address") -> pa.Array:
    import ray

    parts = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.array([], pa.string())
    return pa.concat_tables([t.select([col]) for t in parts])[col].combine_chunks()


def incremental_retract(
    old_nodes_ds,
    old_edges_ds,
    removed_mentions_ds,
    old_clusters_ds=None,
    max_rounds: int = 16,
):
    """Retract a mention stream (the deletion / right-to-be-forgotten
    path): decrement per-surface counts, DROP surfaces whose count
    reaches zero, garbage-collect their edges, and re-label clusters.
    Returns {"nodes", "edges", "clusters"} — the exact mirror of
    ``incremental_resolve``'s contract.

    Exactness: blocking keys are per-node, so the retained edge table
    restricted to surviving nodes equals a full recompute over the
    reduced corpus for triu-emitted blocks (pair scores depend only on
    the two surfaces, never on counts or corpus context); dropping a
    node removes exactly its edges.  ``retract(add(X)) == never-added``
    therefore holds on the edge set and the clusters.  Oversize
    (sorted-neighborhood) blocks carry the same window-shift caveat as
    the add path, in reverse.

    Removing a node can SPLIT its cluster.  With ``old_clusters_ds``
    supplied (and a delta under ``RETRACT_BROADCAST_LIMIT``), the re-CC
    runs ONLY on components that lost a member: an untouched
    component's membership and edges are untouched, so its label (the
    lexicographic-min member) cannot change, and edges never cross old
    components — re-labelling the affected induced subgraph is exact.
    Without old labels (or over the gate) it falls back to a full CC
    over the surviving graph — same result, more work.
    """
    import ray
    import ray.data as rd

    counts = retract_nodes(old_nodes_ds, removed_mentions_ds).materialize()
    nodes = (
        counts.filter(expr="n_mentions > 0")
        .map_batches(_rederive_node_columns, batch_format="pyarrow")
        .materialize()
    )
    dropped_mat = counts.filter(expr="n_mentions <= 0").materialize()
    n_drop = dropped_mat.count()

    if n_drop == 0:
        edges = old_edges_ds.materialize()
        clusters = (
            old_clusters_ds
            if old_clusters_ds is not None
            else connected_components(nodes, edges, max_rounds)
        )
        return {"nodes": nodes, "edges": edges, "clusters": clusters}

    if n_drop <= RETRACT_BROADCAST_LIMIT:
        drop_ref = ray.put(_addr_array(dropped_mat))

        def gc(t: pa.Table) -> pa.Table:
            da = ray.get(drop_ref)
            bad = pc.or_(
                pc.is_in(t["addr_a"], value_set=da),
                pc.is_in(t["addr_b"], value_set=da),
            )
            return t.filter(pc.invert(bad))

        edges = old_edges_ds.map_batches(gc, batch_format="pyarrow").materialize()
    else:
        # the true at-scale path: Bloom-prefiltered exact GC — one
        # filter over the dropped addresses, definite-miss edges (the
        # overwhelming majority) bypass the shuffle entirely, only the
        # maybe sliver runs the twin anti joins (sketches.bloom_pair_gc
        # itself falls back to plain twin joins above its byte budget)
        from ..stages.sketches import bloom_pair_gc

        edges = bloom_pair_gc(
            old_edges_ds, dropped_mat, "addr_a", "addr_b", "address", n_drop
        ).materialize()

    if old_clusters_ds is None or n_drop > RETRACT_BROADCAST_LIMIT:
        clusters = connected_components(nodes, edges, max_rounds)
        return {"nodes": nodes, "edges": edges, "clusters": clusters}

    # scoped re-CC: only components that lost a member
    old_cl_mat = old_clusters_ds.materialize()
    drop_ref = ray.put(_addr_array(dropped_mat))

    def pick_affected_ids(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.is_in(t["address"], value_set=ray.get(drop_ref)))
        return pa.table({"cluster_id": pc.unique(hit["cluster_id"])})

    id_parts = ray.get(
        old_cl_mat.map_batches(pick_affected_ids, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    aff_ids = pa.concat_tables([p for p in id_parts if p.num_rows])[
        "cluster_id"
    ].combine_chunks().unique() if any(p.num_rows for p in id_parts) else pa.array(
        [], pa.string()
    )
    aff_ref = ray.put(aff_ids)

    untouched = old_cl_mat.map_batches(
        lambda t: t.select(["address", "cluster_id"]).filter(
            pc.invert(pc.is_in(t["cluster_id"], value_set=ray.get(aff_ref)))
        ),
        batch_format="pyarrow",
    ).materialize()

    # affected member addresses (bounded by the biggest touched cluster;
    # over the gate the exact fallback is a full CC)
    aff_addr_mat = old_cl_mat.map_batches(
        lambda t: t.select(["address"]).filter(
            pc.is_in(t["cluster_id"], value_set=ray.get(aff_ref))
        ),
        batch_format="pyarrow",
    ).materialize()
    if aff_addr_mat.count() > RETRACT_BROADCAST_LIMIT:
        clusters = connected_components(nodes, edges, max_rounds)
        return {"nodes": nodes, "edges": edges, "clusters": clusters}
    aff_addr_ref = ray.put(_addr_array(aff_addr_mat))

    sub_nodes = nodes.map_batches(
        lambda t: t.filter(pc.is_in(t["address"], value_set=ray.get(aff_addr_ref))),
        batch_format="pyarrow",
    )
    # any edge's endpoints share an old component, so one side decides
    sub_edges = edges.map_batches(
        lambda t: t.filter(pc.is_in(t["addr_a"], value_set=ray.get(aff_addr_ref))),
        batch_format="pyarrow",
    )
    relabeled = connected_components(sub_nodes, sub_edges, max_rounds)
    clusters = untouched.union(relabeled)
    return {"nodes": nodes, "edges": edges, "clusters": clusters}


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
