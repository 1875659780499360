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
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .dedup import sorted_group_agg
from .joins import hash_join

SCALE = 1_000_000
DAMP_NUM = 85
DAMP_DEN = 100


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

    # node cardinality grows with the graph: sorted_group_agg, not the
    # native groupby (stages/dedup.py policy note)
    deg = sorted_group_agg(
        e.map_batches(
            lambda t: t.group_by("src")
            .aggregate([("src", "count")])
            .rename_columns(["src", "p_d"]),
            batch_format="pyarrow",
        ),
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
