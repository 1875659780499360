"""Distributed k-means (Lloyd) over the ``embeddings`` table.

Iterative algorithms are usually written off as non-oracle-able (float
accumulation order changes with block layout), so this one is built
integer-exact: centroids live on a 1e-6 grid (``floor(x * 1e6)`` int64
components, truncating integer division for the mean — the same
arithmetic as ``embedding_centroids``), which makes a fixed iteration
count bit-reproducible across any block layout AND mirrorable in SQL as
chained CTEs.  The driver's DuckDB oracle runs the identical Lloyd
iterations and hash-matches the final assignment.

Ray shape (per iteration = ONE streaming pass):

* centroids (k x d int64, tiny) are broadcast once via ``ray.put``;
* each ``map_batches`` task assigns its rows (one numpy matmul) and
  emits only k rows of (cell, count, d int64 partial sums);
* a remote pairwise TREE fold sums the per-block partials in the
  cluster; the driver receives ONE k x (2 + d) table per iteration —
  O(k*d) driver state and bandwidth, independent of block count —
  and updates the grid centroids.

The input is ``materialize()``-d once so iterations re-read object-store
blocks instead of re-running the parquet scan; at 100 TB fit on a
seeded hash-sample (``sample_mod``) — the standard sketch-then-assign
k-means — and the full table is only streamed for the final one-pass
assignment.

Used by ``ivf_topk``-style cell routing: at scale these cells are what
the table is written partitioned by.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .ann import _batch_matrix

GRID = 1_000_000  # centroid quantization grid (1e-6), matches embedding_centroids


def _assign_cells(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Argmin squared-L2 cell per row; ties break to the lowest cell id
    (np.argmin first-hit == the oracle's ORDER BY dist, cell)."""
    d2 = (
        (m * m).sum(axis=1)[:, None]
        - 2.0 * (m @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    return d2.argmin(axis=1)


def _trunc_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Truncating integer division (DuckDB ``//`` on BIGINT)."""
    return np.sign(s) * (np.abs(s) // n)


def _seed_rows(embeddings_ds, k: int) -> pa.Table:
    """The k smallest-vec_id rows, by per-block bottom-k partials with
    a running driver cap (~4k rows held, never the table).  Ids need
    NOT be contiguous or start at 0 — any id set works (a
    survivor-filtered table is the common caller)."""
    import ray

    sort_keys = [("vec_id", "ascending")]

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.take(pc.sort_indices(t, sort_keys=sort_keys)[:k])

    parts, acc = [], 0
    for ref in (
        embeddings_ds.select_columns(["vec_id", "embedding"])
        .map_batches(part, batch_format="pyarrow", batch_size=None)
        .to_arrow_refs()
    ):
        t = ray.get(ref)
        if "vec_id" in t.schema.names and t.num_rows:
            t = t.select(["vec_id", "embedding"])
            if parts and not t.schema.equals(parts[0].schema):
                t = t.cast(parts[0].schema)  # mixed list child field names
            parts.append(t)
            acc += t.num_rows
            if acc > 4 * k:
                merged = pa.concat_tables(parts).combine_chunks()
                merged = merged.take(pc.sort_indices(merged, sort_keys=sort_keys)[:k])
                parts, acc = [merged], merged.num_rows
    if not parts:
        raise ValueError("kmeans_fit: empty embeddings table")
    all_t = pa.concat_tables(parts).combine_chunks()
    out = all_t.take(pc.sort_indices(all_t, sort_keys=sort_keys)[:k])
    if out.num_rows != k:
        raise ValueError(
            f"kmeans_fit: k={k} but the table has only {out.num_rows} vectors"
        )
    return out


def kmeans_fit(embeddings_ds, k: int = 8, iters: int = 2, sample_mod: int | None = None):
    """Fit k centroids with ``iters`` Lloyd updates; returns (k, d) int64
    centroid components on the 1e-6 grid.

    Seeds are the embeddings of the k SMALLEST PRESENT vec_ids
    (deterministic, no RNG; ids need not be contiguous — cell label i
    is the i-th seed in ascending vec_id order).  ``sample_mod``: fit
    on the seeded hash-sample ``vec_id % sample_mod == 0`` (plus the
    seeds) instead of the full table — the 100-TB path.
    """
    import ray

    seed_t = _seed_rows(embeddings_ds, k)
    seed_ids = pc.cast(seed_t["vec_id"], pa.int64()).combine_chunks()
    emb = embeddings_ds
    if sample_mod is not None:

        def keep_sample(t: pa.Table) -> pa.Table:
            v = pc.cast(t["vec_id"], pa.int64())
            mod = pc.subtract(v, pc.multiply(pc.divide(v, sample_mod), sample_mod))
            return t.filter(
                pc.or_(pc.equal(mod, 0), pc.is_in(v, value_set=seed_ids))
            )

        emb = emb.map_batches(keep_sample, batch_format="pyarrow")
    emb = emb.materialize()

    seed_m = _batch_matrix(seed_t)
    cents_e6 = np.floor(seed_m * GRID).astype(np.int64)
    d = cents_e6.shape[1]

    for _ in range(iters):
        cent_ref = ray.put(cents_e6)

        def partial(batch: pa.Table) -> pa.Table:
            ce6 = ray.get(cent_ref)
            m = _batch_matrix(batch)
            cell = _assign_cells(m, ce6.astype(np.float64) / GRID)
            q = np.floor(m * GRID).astype(np.int64)
            sums = np.zeros((k, d), np.int64)
            np.add.at(sums, cell, q)
            cnts = np.bincount(cell, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cell": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
                    "cnt": pa.array(cnts, pa.int64()),
                    "psum": pa.array(list(sums)),
                }
            )

        # remote TREE fold of the per-block partials: pairwise sums run
        # in the cluster, the driver receives exactly ONE k x (2 + d)
        # table per iteration — driver state and bandwidth are O(k*d),
        # independent of the block count (the hll_merge shape; the old
        # driver-side .to_pandas() fold pulled O(blocks*k*d) rows)
        @ray.remote
        def fold2(a: pa.Table, b: pa.Table) -> pa.Table:
            for t, o in ((a, b), (b, a)):
                if "cell" not in t.schema.names or t.num_rows == 0:
                    return o
            cnts = np.zeros(k, np.int64)
            sums = np.zeros((k, d), np.int64)
            for t in (a, b):
                c = t["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
                np.add.at(cnts, c, t["cnt"].to_numpy(zero_copy_only=False))
                np.add.at(sums, c, np.stack(t["psum"].to_pylist()))
            return pa.table(
                {
                    "cell": pa.array(np.arange(k, dtype=np.int64), pa.int64()),
                    "cnt": pa.array(cnts, pa.int64()),
                    "psum": pa.array(list(sums)),
                }
            )

        refs = list(
            emb.map_batches(
                partial, batch_format="pyarrow", batch_size=None
            ).to_arrow_refs()
        )
        while len(refs) > 1:
            nxt = [
                fold2.remote(refs[i], refs[i + 1])
                for i in range(0, len(refs) - 1, 2)
            ]
            if len(refs) % 2:
                nxt.append(refs[-1])
            refs = nxt
        final = ray.get(refs[0])
        cnts = np.zeros(k, np.int64)
        sums = np.zeros((k, d), np.int64)
        if "cell" in final.schema.names and final.num_rows:
            c = final["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
            np.add.at(cnts, c, final["cnt"].to_numpy(zero_copy_only=False))
            np.add.at(sums, c, np.stack(final["psum"].to_pylist()))
        updated = _trunc_div(sums, np.maximum(cnts, 1)[:, None])
        cents_e6 = np.where(cnts[:, None] > 0, updated, cents_e6).astype(np.int64)

    return cents_e6


def kmeans_assign(embeddings_ds, cents_e6: np.ndarray):
    """One-pass assignment of every vector to its nearest grid centroid.

    Returns a Dataset of (vec_id, cell), both int64.  The centroid
    matrix is broadcast once via ``ray.put``.
    """
    import ray

    cent_ref = ray.put(np.asarray(cents_e6, dtype=np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        ce6 = ray.get(cent_ref)
        m = _batch_matrix(batch)
        cell = _assign_cells(m, ce6.astype(np.float64) / GRID)
        return pa.table(
            {
                "vec_id": pc.cast(batch["vec_id"], pa.int64()),
                "cell": pa.array(cell.astype(np.int64), pa.int64()),
            }
        )

    return embeddings_ds.map_batches(assign, batch_format="pyarrow")


def kmeans_cells(embeddings_ds, k: int = 8, iters: int = 2, sample_mod: int | None = None):
    """Fit + assign: the (vec_id, cell) routing table an IVF layout is
    partitioned by."""
    cents = kmeans_fit(embeddings_ds, k=k, iters=iters, sample_mod=sample_mod)
    return kmeans_assign(embeddings_ds, cents)
