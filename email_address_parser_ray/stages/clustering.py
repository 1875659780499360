"""Transitive clustering — distributed min-label propagation (union-find).

Connected components over the accepted match edges, expressed purely in
Ray Data primitives (no driver-side union-find: the node set is assumed
too large for one heap at the 10^12-turn design point):

* node ids and labels are the surface address strings; the component
  label converges to the lexicographic minimum address of the component
  — fully deterministic across retries/partitionings (the north rule's
  determinism requirement);
* one round = two hash shuffles: (1) ``groupby(node)`` over the union of
  the label table and the symmetrized edge list to route each node's
  current label to its neighbors, (2) ``groupby(node).min(payload)`` to
  fold incoming labels;
* rounds iterate until a fixpoint (label multiset hash stable), bounded
  by ``max_rounds``; expected O(log diameter) rounds — the engine's
  clusters are shallow stars (variants of one base address), so 3-4
  rounds in practice;
* each round materializes the (small) label table — and checkpoints it
  to Parquet when a checkpoint dir is provided — so a failed run resumes
  from the last completed round instead of restarting propagation.

cf. SURVEY.md §3.5 "shuffle 2..k" and PAPERS.md (hash-partitioned
iterative connected components).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Min

MAX_ROUNDS = 16


def _symmetrize(batch: pa.Table) -> pa.Table:
    fwd = pa.table({"node": batch["addr_a"], "payload": batch["addr_b"]})
    rev = pa.table({"node": batch["addr_b"], "payload": batch["addr_a"]})
    return pa.concat_tables([fwd, rev])


def _route_labels(group: pd.DataFrame) -> pd.DataFrame:
    """groupby(node) over labels ∪ edges: send my label to every neighbor
    (and keep it myself)."""
    lbl_rows = group[group["is_label"]]
    if len(lbl_rows) == 0:
        # edge endpoint that somehow lacks a label row: label = own id
        label = group["node"].iat[0]
    else:
        label = lbl_rows["payload"].min()
    nbrs = group.loc[~group["is_label"], "payload"]
    nodes = [group["node"].iat[0]]
    nodes.extend(nbrs.tolist())
    return pd.DataFrame({"node": nodes, "payload": [label] * len(nodes)})


def _label_checksum(labels_ds) -> int:
    def part(batch: pa.Table) -> pa.Table:
        joined = pc.binary_join_element_wise(batch["node"], batch["payload"], "\x1f")
        h = pd.util.hash_pandas_object(joined.to_pandas(), index=False).sum()
        return pa.table({"h": pa.array([int(h) & 0xFFFFFFFFFFFFFFFF], pa.uint64())})

    parts = labels_ds.map_batches(part, batch_format="pyarrow").take_all()
    return sum(p["h"] for p in parts) & 0xFFFFFFFFFFFFFFFF


def _round_dir(checkpoint_dir: str, rnd: int) -> str:
    return f"{checkpoint_dir}/labels_round_{rnd:02d}"


def _write_round(folded, checkpoint_dir: str, rnd: int, checksum_holder: list):
    """Atomic per-round checkpoint: temp dir → rename, with a _COMPLETE
    marker carrying the label checksum (resume metadata)."""
    import os
    import shutil

    import ray.data as rd

    out = _round_dir(checkpoint_dir, rnd)
    tmp = out + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    folded.write_parquet(tmp)
    cs = _label_checksum(rd.read_parquet(tmp))  # executes before the rename
    shutil.rmtree(out, ignore_errors=True)
    try:
        os.remove(out + "._COMPLETE")
    except OSError:
        pass
    os.rename(tmp, out)
    # marker lives NEXT TO the dir so read_parquet(out) only sees parquet
    with open(out + "._COMPLETE", "w") as f:
        f.write(str(cs))
    checksum_holder.append(cs)
    return rd.read_parquet(out)


def _find_resumable_round(checkpoint_dir: str, max_rounds: int):
    """Latest round with a _COMPLETE marker, or None."""
    import os

    best = None
    for rnd in range(max_rounds):
        marker = _round_dir(checkpoint_dir, rnd) + "._COMPLETE"
        if os.path.exists(marker):
            with open(marker) as f:
                best = (rnd, int(f.read().strip()))
    return best


def connected_components(
    nodes_ds,
    edges_ds,
    max_rounds: int = MAX_ROUNDS,
    checkpoint_dir: Optional[str] = None,
):
    """Return a Dataset (address, cluster_id) assigning every node the
    lexicographic-min address of its connected component."""
    import ray.data as rd

    labels = nodes_ds.map_batches(
        lambda t: pa.table({"node": t["address"], "payload": t["address"]}),
        batch_format="pyarrow",
    ).materialize()
    edges = (
        edges_ds.map_batches(_symmetrize, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column("is_label", pa.array([False] * t.num_rows)),
            batch_format="pyarrow",
        )
        .materialize()
    )

    start_round = 0
    prev_sum = _label_checksum(labels)
    if checkpoint_dir is not None:
        resumable = _find_resumable_round(checkpoint_dir, max_rounds)
        if resumable is not None:
            rnd, cs = resumable
            labels = rd.read_parquet(_round_dir(checkpoint_dir, rnd)).materialize()
            start_round = rnd + 1
            prev_sum = cs

    for rnd in range(start_round, max_rounds):
        tagged = labels.map_batches(
            lambda t: t.append_column("is_label", pa.array([True] * t.num_rows)),
            batch_format="pyarrow",
        )
        msgs = tagged.union(edges).groupby("node").map_groups(
            _route_labels, batch_format="pandas"
        )
        folded = msgs.groupby("node").aggregate(Min("payload", alias_name="payload"))
        if checkpoint_dir is not None:
            holder: list = []
            labels = _write_round(folded, checkpoint_dir, rnd, holder)
            cur_sum = holder[0]
        else:
            labels = folded.materialize()
            cur_sum = _label_checksum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda t: pa.table({"address": t["node"], "cluster_id": t["payload"]}),
        batch_format="pyarrow",
    )
