"""Iterative graph compute beyond connected components: integer-exact
PageRank by distributed message passing.

Each iteration is one round of the classic shape: every node's rank is
split integerly among its neighbors (``r // deg``, C-style division on
positive int64), contributions are summed per destination (a single
hash shuffle on dst — partial per-batch combine first), and the damped
update ``r' = (scale * (den-num)) // den + (num * contrib_sum) // den``
is applied.  All arithmetic is int64-exact and order-independent, so a
DuckDB chained-CTE replay hashes identically (same validation pattern
as the k-means oracle).

Scale notes: the rank table is node-sized and the join of ranks onto
edges is hash-partitioned (``stages/joins.py``) — no broadcast of a
growing table; contributions pre-combine per batch before the dst
shuffle.  Iterations are a fixed small count (rounds of shuffles), the
same execution shape as the CC label-propagation rounds.

Small-graph gate (same design as clustering.py's SMALL_CC_LIMIT and the
byte-gated broadcast-vs-join verifies): when the NODE table is small
(<= PAGERANK_SMALL_NODES), the node-sized state (deg, rank vector)
lives on the driver and is broadcast once per iteration with
``ray.put``; edges stay distributed and each iteration is a single
map_batches pass emitting per-block (dst_idx, partial_sum) tables that
the driver folds with np.add.at — no per-iteration shuffle join or
sort, int64 arithmetic identical to the distributed path.  Above the
gate the hash-join rounds below run unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import sorted_group_agg
from .joins import hash_join

SCALE = 1_000_000
DAMP_NUM = 85
DAMP_DEN = 100

# Node-count gate for the driver-folded fast path.  2M nodes = a 16 MB
# int64 rank vector broadcast per iteration — comfortably object-store
# small; beyond it the hash-join rounds keep everything distributed.
PAGERANK_SMALL_NODES = 2_000_000


def _partial_sum(col_in: str, col_out: str, key: str):
    def f(t: pa.Table) -> pa.Table:
        return (
            t.select([key, col_in])
            .group_by(key)
            .aggregate([(col_in, "sum")])
            .rename_columns([key, col_out])
        )

    return f


def pagerank_integer(edges_ds, iters: int = 2):
    """edges_ds: one row per UNDIRECTED edge as (src, dst) strings —
    symmetrized internally.  Returns (node, r) with the integer rank
    after ``iters`` damped iterations from the uniform start r0=SCALE.

    Assumes every node appears in the edge table (true for any graph
    built FROM an edge list); isolated nodes would need a left join +
    zero fill on the contribution sum."""

    def symmetrize(t: pa.Table) -> pa.Table:
        fwd = pa.table({"src": t["src"], "dst": t["dst"]})
        rev = pa.table({"src": t["dst"], "dst": t["src"]})
        return pa.concat_tables([fwd, rev])

    e = edges_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()

    # one pass of per-block partial degree counts feeds EITHER path
    partials = e.map_batches(
        lambda t: t.group_by("src")
        .aggregate([("src", "count")])
        .rename_columns(["src", "p_d"]),
        batch_format="pyarrow",
    ).materialize()
    # partial-row count bounds node count from above, so it is a safe
    # (conservative) gate decision without a distinct-count pass
    if partials.count() <= PAGERANK_SMALL_NODES:
        return _pagerank_small(e, partials, iters)

    # node cardinality grows with the graph: sorted_group_agg, not the
    # native groupby (stages/dedup.py policy note)
    deg = sorted_group_agg(
        partials,
        ["src"],
        [("p_d", "sum")],
    ).map_batches(
        lambda t: pa.table(
            {"node": t["src"], "d": pc.cast(t["p_d"], pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    # r0: uniform integer rank over the node set (= deg's key set)
    r = deg.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "r": pa.array([SCALE] * len(t), pa.int64()),
                "d": t["d"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    for _ in range(iters):
        sends = hash_join(e, r, on="src", right_on="node").map_batches(
            lambda t: pa.table(
                {
                    "dst": t["dst"],
                    "contrib": pc.divide(t["r"], t["d"]),
                }
            ),
            batch_format="pyarrow",
        )
        sums = sorted_group_agg(
            sends.map_batches(
                _partial_sum("contrib", "p_s", "dst"), batch_format="pyarrow"
            ),
            ["dst"],
            [("p_s", "sum")],
        ).map_batches(
            lambda t: pa.table({"dst": t["dst"], "s": t["p_s"]}),
            batch_format="pyarrow",
        )
        r = (
            hash_join(sums, deg, on="dst", right_on="node")
            .map_batches(
                lambda t: pa.table(
                    {
                        "node": t["dst"],
                        "r": pc.add(
                            pa.scalar(base, pa.int64()),
                            pc.divide(
                                pc.multiply(
                                    pa.scalar(DAMP_NUM, pa.int64()),
                                    pc.cast(t["s"], pa.int64()),
                                ),
                                pa.scalar(DAMP_DEN, pa.int64()),
                            ),
                        ),
                        "d": pc.cast(t["d"], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return r.map_batches(
        lambda t: pa.table({"node": t["node"], "r": t["r"]}),
        batch_format="pyarrow",
    )


def _pagerank_small(e, partials, iters: int):
    """Driver-folded fast path under PAGERANK_SMALL_NODES: node-sized
    state on the driver, edges distributed, one map_batches pass per
    iteration (no shuffle join / sort rounds).  Arithmetic is identical
    int64 (per-block bincount sums stay < 2^53 for any block under 9e9
    rows, so the float64 accumulator is exact before the int64 cast)."""
    import pandas as pd
    import ray

    # fold the partial degree counts on the driver (node-sized by gate)
    pdf = pa.concat_tables(ray.get(partials.to_arrow_refs())).to_pandas()
    deg_s = pdf.groupby("src", sort=True)["p_d"].sum()
    nodes = deg_s.index.to_numpy()
    d = deg_s.to_numpy().astype(np.int64)
    n = len(nodes)
    index_ref = ray.put(pd.Index(nodes))

    def to_idx(t: pa.Table) -> pa.Table:
        ix = ray.get(index_ref)
        si = ix.get_indexer(t["src"].to_pandas())
        di = ix.get_indexer(t["dst"].to_pandas())
        if (si < 0).any() or (di < 0).any():
            raise RuntimeError("pagerank: edge endpoint missing from node set")
        return pa.table(
            {"si": pa.array(si, pa.int64()), "di": pa.array(di, pa.int64())}
        )

    eidx = e.map_batches(to_idx, batch_format="pyarrow").materialize()

    r = np.full(n, SCALE, dtype=np.int64)
    base = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    for _ in range(iters):
        contrib_ref = ray.put(r // d)  # node-sized, broadcast ONCE

        def block_sums(t: pa.Table, cref=contrib_ref, nn=n) -> pa.Table:
            c = ray.get(cref)
            si = t["si"].to_numpy()
            di = t["di"].to_numpy()
            acc = np.bincount(
                di, weights=c[si].astype(np.float64), minlength=nn
            ).astype(np.int64)
            nz = np.nonzero(acc)[0]
            return pa.table(
                {"i": pa.array(nz, pa.int64()), "s": pa.array(acc[nz], pa.int64())}
            )

        s = np.zeros(n, dtype=np.int64)
        folded = eidx.map_batches(
            block_sums, batch_format="pyarrow", batch_size=None
        ).materialize()
        for blk in ray.get(folded.to_arrow_refs()):
            np.add.at(s, blk["i"].to_numpy(), blk["s"].to_numpy())
        r = base + (DAMP_NUM * s) // DAMP_DEN

    import ray.data as rd

    return rd.from_arrow(
        pa.table({"node": pa.array(nodes), "r": pa.array(r, pa.int64())})
    )
