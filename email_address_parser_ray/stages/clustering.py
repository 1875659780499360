"""Transitive clustering — distributed min-label propagation (union-find).

Connected components over the accepted match edges.  Two regimes:

* graphs under ``SMALL_CC_LIMIT`` nodes+edges short-circuit to an exact
  driver-side union-find (identical deterministic min-label output) —
  the per-round shuffle machinery costs seconds of fixed overhead that
  dwarfs small graphs;
* larger graphs run hash-partitioned min-label propagation in Ray Data
  primitives (the node set is assumed too large for one heap at the
  10^12-turn design point):

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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.arrowutil import concat_nonempty, from_pandas_clean

MAX_ROUNDS = 16


N_CC_BUCKETS = 64

# Below this edge/node count the distributed label-propagation machinery
# (two shuffles + a checksum pass PER ROUND) costs far more in fixed
# executor overhead than the graph itself; a driver-side union-find is
# exact, deterministic and ~instant (measured: 1.05M 12-char edges in
# ~3 s driver-side vs 15.7 s distributed at the 100k-doc dedup stress).
# Above it, the hash-partitioned rounds take over (the 100-TB path).
# The BYTE budget below is the real memory guard; this row gate only
# bounds the O(n log n) driver sort/union-find time.
SMALL_CC_LIMIT = 4_000_000
# ... but long addresses can blow the row-count gate (1M edges of 100-B
# surfaces ≈ 200 MB of driver heap), so the short-circuit ALSO requires
# the materialized blocks to fit a byte budget (round-2 verdict): above
# it the distributed rounds run even when the row count is small.
SMALL_CC_BYTE_LIMIT = 256 * 1024 * 1024


def minlabel_components(n: int, ca: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """Vectorized min-label propagation with pointer jumping over an
    edge list on integer node ids [0, n): each round relaxes every edge
    (np.minimum.at) then halves chains (lab[lab]), converging in
    O(log n) rounds — ~10ms/round at 1M edges vs seconds for a
    per-edge Python union-find loop.  Returns the component label
    (min member index) per node.  Shared by the driver CC fold and
    the per-cell SemDeDup grouping (``ann.semantic_dedup``)."""
    lab = np.arange(n, dtype=np.int64)
    for _ in range(64):  # 2^64 nodes worth of halving — never binds
        new = lab.copy()
        if len(ca):
            np.minimum.at(new, ca, lab[cb])
            np.minimum.at(new, cb, lab[ca])
        new = np.minimum(new, new[new])  # pointer jumping
        if np.array_equal(new, lab):
            break
        lab = new
    return lab


def _driver_components(addresses: np.ndarray, ea: np.ndarray, eb: np.ndarray) -> pa.Table:
    """Union-find on the driver: exact connected components with the same
    deterministic labeling as the distributed rounds (component label =
    lexicographic-min member address).  `order` is sorted, so the min
    INDEX of a component is its lex-min address."""
    order = np.sort(np.asarray(addresses, dtype=object))
    index = pd.Index(order)
    ca = index.get_indexer(ea)
    cb = index.get_indexer(eb)
    ok = (ca >= 0) & (cb >= 0)  # defensive: drop edges outside the node set
    lab = minlabel_components(len(order), ca[ok], cb[ok])
    return pa.table(
        {
            "address": pa.array(order, pa.string()),
            "cluster_id": pa.array(order[lab], pa.string()),
        }
    )


def _symmetrize(batch: pa.Table) -> pa.Table:
    fwd = pa.table({"node": batch["addr_a"], "payload": batch["addr_b"]})
    rev = pa.table({"node": batch["addr_b"], "payload": batch["addr_a"]})
    return pa.concat_tables([fwd, rev])


def _add_node_bucket(batch: pa.Table, is_label: bool, n_buckets: int) -> pa.Table:
    h = pd.util.hash_pandas_object(batch["node"].to_pandas(), index=False)
    return batch.append_column(
        "bucket", pa.array((h % n_buckets).astype(np.int64).to_numpy(), pa.int64())
    ).append_column("is_label", pa.array(np.full(batch.num_rows, is_label)))


def _route_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One bucket of the partitioned hash join labels⋈edges: attach each
    edge-source's current label and emit it to the neighbor (plus each
    node's own label).  Vectorized pandas merge — no per-node Python."""
    lbl = df.loc[df["is_label"], ["node", "payload"]]
    edg = df.loc[~df["is_label"], ["node", "payload"]]
    if len(edg) == 0:
        return from_pandas_clean(lbl.reset_index(drop=True))
    m = edg.merge(lbl, on="node", how="left", suffixes=("_nbr", "_lab"))
    lab = m["payload_lab"].fillna(m["node"])
    msgs = pd.DataFrame({"node": m["payload_nbr"].to_numpy(), "payload": lab.to_numpy()})
    return from_pandas_clean(pd.concat([lbl, msgs], ignore_index=True))


def _fold_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Fold incoming labels per node with a C-speed pandas groupby.min
    (Ray's native string Min aggregate is orders slower at this shape)."""
    return from_pandas_clean(df.groupby("node", as_index=False)["payload"].min())


def _label_checksum(labels_mat) -> int:
    """Order-independent label-multiset hash of a MATERIALIZED label
    table: one tiny remote task per existing block, folded on the
    driver.  Piggybacks on the fold pass's blocks — the previous shape
    (a ``map_batches().take_all()`` dataset execution per round) paid a
    ~1-3 s streaming-executor barrier per CC round just to hash what
    was already sitting in the object store."""
    import ray

    @ray.remote
    def block_sum(t: pa.Table) -> int:
        if t.num_rows == 0:
            return 0
        joined = pc.binary_join_element_wise(t["node"], t["payload"], "\x1f")
        h = pd.util.hash_pandas_object(joined.to_pandas(), index=False).sum()
        return int(h) & 0xFFFFFFFFFFFFFFFF

    sums = ray.get([block_sum.remote(r) for r in labels_mat.to_arrow_refs()])
    return sum(sums) & 0xFFFFFFFFFFFFFFFF


def _round_dir(checkpoint_dir: str, rnd: int) -> str:
    return f"{checkpoint_dir}/labels_round_{rnd:02d}"


def _write_round(folded, checkpoint_dir: str, rnd: int, checksum_holder: list):
    """Atomic per-round checkpoint: temp dir → rename, with a _COMPLETE
    marker carrying the label checksum (resume metadata).  The round is
    materialized ONCE: the write streams the materialized blocks and the
    checksum folds the same blocks (a failed write raises before the
    rename publishes anything), so no per-round re-read execution."""
    import os
    import shutil

    out = _round_dir(checkpoint_dir, rnd)
    tmp = out + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    folded_mat = folded.materialize()
    folded_mat.write_parquet(tmp)
    cs = _label_checksum(folded_mat)
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
    return folded_mat


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
    import ray
    import ray.data as rd

    # --- small-graph short-circuit (driver union-find) -------------------
    edges_mat = edges_ds.materialize()
    n_edges = edges_mat.count()
    if n_edges <= SMALL_CC_LIMIT and (
        edges_mat.size_bytes() or 0
    ) <= SMALL_CC_BYTE_LIMIT:
        nodes_mat = nodes_ds.materialize()
        n_nodes = nodes_mat.count()
        if n_nodes <= SMALL_CC_LIMIT and (
            nodes_mat.size_bytes() or 0
        ) <= SMALL_CC_BYTE_LIMIT:
            # column selection happens driver-side on the pulled blocks:
            # a select_columns() here would spin a whole extra streaming
            # execution (a ~1-3s barrier) just to drop columns
            edge_schema = pa.schema(
                [("addr_a", pa.string()), ("addr_b", pa.string())]
            )
            nt = concat_nonempty(
                [
                    t.select(["address"]) if t.num_columns else t
                    for t in ray.get(nodes_mat.to_arrow_refs())
                ],
                pa.schema([("address", pa.string())]),
            )
            et = (
                concat_nonempty(
                    [
                        t.select(["addr_a", "addr_b"]) if t.num_columns else t
                        for t in ray.get(edges_mat.to_arrow_refs())
                    ],
                    edge_schema,
                )
                if n_edges
                else edge_schema.empty_table()
            )
            out = _driver_components(
                nt["address"].to_numpy(zero_copy_only=False),
                et["addr_a"].to_numpy(zero_copy_only=False),
                et["addr_b"].to_numpy(zero_copy_only=False),
            )
            return rd.from_arrow(out)

    labels = nodes_ds.map_batches(
        lambda t: pa.table({"node": t["address"], "payload": t["address"]}),
        batch_format="pyarrow",
    ).materialize()
    edges = (
        edges_mat.map_batches(_symmetrize, batch_format="pyarrow")
        .map_batches(
            lambda t: _add_node_bucket(t, False, N_CC_BUCKETS),
            batch_format="pyarrow",
        )
        .materialize()
    )
    # Compact both iteration tables: label-prop rounds shuffle these every
    # iteration, and hundreds of tiny blocks cost far more in task
    # scheduling than the actual data movement — but too FEW blocks caps
    # the per-round sort/groupby parallelism, so target one block per
    # core (bounded by ~500k rows/block).
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    nb = max(4, min(cpus, labels.count() // 50_000 + 4, 256))
    if abs(labels.num_blocks() - nb) > nb:
        labels = labels.repartition(nb).materialize()
    if abs(edges.num_blocks() - nb) > nb:
        edges = edges.repartition(nb).materialize()

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
            lambda t: _add_node_bucket(
                t.select(["node", "payload"]), True, N_CC_BUCKETS
            ),
            batch_format="pyarrow",
        )
        msgs = tagged.union(edges).groupby("bucket").map_groups(
            _route_bucket, batch_format="pandas"
        )
        folded = (
            msgs.map_batches(
                lambda t: _add_node_bucket(t, True, N_CC_BUCKETS).drop_columns(
                    ["is_label"]
                ),
                batch_format="pyarrow",
            )
            .groupby("bucket")
            .map_groups(_fold_bucket, batch_format="pandas")
        )
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
