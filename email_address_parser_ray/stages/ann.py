"""Similarity search over the ``embeddings`` table (vec_id, embedding:
list<float>, label).

Two paths per the brief:

* ``brute_force_topk`` — baseline: the query matrix is broadcast ONCE via
  ``ray.put`` (never re-shipped per batch); each batch computes a numpy
  matmul against zero-copy Arrow list data, emits only its per-batch
  top-k, and a final tiny sort/limit folds the partials.  Shuffle-free.
* ``lsh_topk`` — scale path: signed-random-projection bucketing; vectors
  are bucketed once (map_batches), the query probes only matching
  buckets (multi-probe on nearby signs).  At 10^12 rows only the probed
  buckets are read when the bucketed table is written partitioned by
  bucket key.
* ``embedding_near_dup_pairs`` — near-duplicate vectors via the same LSH
  buckets → per-bucket cosine verify (used as the embedding-cosine
  near-dup query).
"""

from __future__ import annotations

from typing import List, Optional

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrowutil import from_pandas_clean

_PROJ_RNG_SEED = 0xA55EED
N_PLANES = 12
MAX_BUCKET = 512
EXACT_PAIRS_MAX_ROWS = 200_000  # guard: exact all-pairs is a baseline, not a path


def _batch_matrix(batch: pa.Table) -> np.ndarray:
    """Arrow list<float> column → (n, d) float64 matrix (zero-copy flatten)."""
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    n = len(col)
    return flat.reshape(n, -1).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(embeddings_ds, query: np.ndarray, k: int = 10):
    """Top-k rows by cosine similarity to ``query`` (1-D vector).

    Per-batch partial top-k (matmul against the broadcast query) → final
    sort+limit over ~k rows per block.  Returns (vec_id, cos_e4) where
    cos_e4 = round(cosine * 1e4) as int64 (stable for oracle hashing).
    """
    import ray

    qn = query.astype(np.float64)
    qn = qn / (np.linalg.norm(qn) or 1.0)
    q_ref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch))
        cos = m @ q
        if len(cos) > k:
            idx = np.argpartition(-cos, k)[:k]
        else:
            idx = np.arange(len(cos))
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)[idx]
        return pa.table(
            {
                "vec_id": pa.array(vec_ids, pa.int64()),
                "cos_e4": pa.array(
                    np.round(cos[idx] * 10_000).astype(np.int64), pa.int64()
                ),
            }
        )

    return embeddings_ds.map_batches(partial, batch_format="pyarrow").sort(
        ["cos_e4", "vec_id"], descending=[True, False]
    ).limit(k)


def cosine_pairs_exact(embeddings_ds, threshold: float = 0.40):
    """Exact all-pairs cosine similarity >= ``threshold``.

    The normalized (id, matrix) side is built once and broadcast via
    ``ray.put`` (never re-shipped per batch); each ``map_batches`` task
    computes one block-row of the n x n similarity matrix with a single
    numpy matmul and keeps only ``vec_a < vec_b`` pairs.  Exact by
    construction, O(n^2 / blocks) per task — this is the value-checked
    baseline for the approximate LSH path (``embedding_near_dup_pairs``),
    which is the path to use when n^2 work is infeasible.  Broadcast-side
    assumption: the (vec_id, embedding) matrix fits in a worker's heap
    (fine for the candidate sets this validates; at 10^12 rows use the
    LSH path and verify sampled buckets with this one).

    Returns (vec_a, vec_b, cos_e3) with cos_e3 = round(cos * 1e3) as
    int64 — stable for oracle hashing (float32 inputs keep DuckDB/numpy
    within ~1e-7, far inside the e3 rounding cell).
    """
    import ray

    n = embeddings_ds.count()
    if n > EXACT_PAIRS_MAX_ROWS:
        raise ValueError(
            f"cosine_pairs_exact is the O(n^2) validation baseline and "
            f"broadcasts the whole matrix; refusing n={n} > "
            f"{EXACT_PAIRS_MAX_ROWS}. Use embedding_near_dup_pairs (banded "
            f"LSH + exact verify) at this scale."
        )
    side = pa.concat_tables(
        ray.get(embeddings_ds.select_columns(["vec_id", "embedding"]).to_arrow_refs())
    )
    ids_all = side["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m_all = _normalize(_batch_matrix(side))
    side_ref = ray.put((ids_all, m_all))

    def block_row(batch: pa.Table) -> pa.Table:
        ids_b, m_b = ray.get(side_ref)
        mb = _normalize(_batch_matrix(batch))
        vb = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = mb @ m_b.T
        bi, ai = np.nonzero(sims >= threshold)
        va, vc, cos = vb[bi], ids_b[ai], sims[bi, ai]
        keep = va < vc
        return pa.table(
            {
                "vec_a": pa.array(va[keep], pa.int64()),
                "vec_b": pa.array(vc[keep], pa.int64()),
                "cos_e3": pa.array(
                    np.round(cos[keep] * 1_000).astype(np.int64), pa.int64()
                ),
            }
        )

    return embeddings_ds.map_batches(block_row, batch_format="pyarrow")


def embedding_centroids(embeddings_ds):
    """Per-label centroid of the embedding column, in exact integer
    arithmetic (floor-quantize each component to 1e-6, integer partial
    sums per batch, one small groupby, truncating division) so the
    DuckDB unnest/aggregate oracle reproduces it bit-for-bit — the
    vector-column aggregation pattern (partial combine per batch, tiny
    shuffle payload: labels x dims rows per batch, never the vectors).

    Returns (label, dim, centroid_e6) with dim 1-based to match SQL
    ``generate_subscripts``.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch)  # (n, d) float64 from float32 (exact)
        q = np.floor(m * 1_000_000.0).astype(np.int64)
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.unique(labels)
        d = q.shape[1]
        out_label = np.repeat(uniq, d)
        out_dim = np.tile(np.arange(1, d + 1, dtype=np.int64), len(uniq))
        sums = np.stack([q[labels == u].sum(axis=0) for u in uniq])
        cnts = np.array([(labels == u).sum() for u in uniq], dtype=np.int64)
        return pa.table(
            {
                "label": pa.array(out_label, pa.int64()),
                "dim": pa.array(out_dim, pa.int64()),
                "p_sum": pa.array(sums.reshape(-1), pa.int64()),
                "p_cnt": pa.array(np.repeat(cnts, d), pa.int64()),
            }
        )

    agg = (
        embeddings_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("p_sum", alias_name="s"), Sum("p_cnt", alias_name="c"))
    )

    def finish(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        cent = np.sign(s) * (np.abs(s) // c)  # truncating div = DuckDB //
        return pa.table(
            {
                "label": pa.compute.cast(t["label"], pa.int64()),
                "dim": pa.compute.cast(t["dim"], pa.int64()),
                "centroid_e6": pa.array(cent, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def ivf_topk(embeddings_ds, query: np.ndarray, k: int = 10, nprobe: int = 3):
    """IVF-style ANN over a PRE-LABELED table: coarse inverted cells
    from the table's ``label`` column, probe the ``nprobe`` cells
    whose centroid is nearest the query, brute-force only inside
    them.  This variant still SCANS the table to filter by label; the
    end-to-end persisted layout — k-means cells → cell-partitioned
    parquet → filesystem-pruned probe — is ``ivf_build`` +
    ``ivf_probe_topk`` below.

    Centroids are computed distributively (``embedding_centroids``
    partial-sum machinery); only labels×dims integers reach the driver.
    Approximate by design — ``brute_force_topk`` is the oracle; recall
    is pinned by a test, not a SQL hash.
    """
    import ray

    cent = embedding_centroids(embeddings_ds).to_pandas()
    piv = cent.pivot(index="label", columns="dim", values="centroid_e6").sort_index()
    c = _normalize(piv.to_numpy(dtype=np.float64))
    qn = query.astype(np.float64)
    qn = qn / (np.linalg.norm(qn) or 1.0)
    order = np.argsort(-(c @ qn), kind="stable")
    probe_labels = pa.array(
        sorted(int(piv.index[i]) for i in order[:nprobe]), pa.int64()
    )

    probed = embeddings_ds.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(pa.compute.cast(t["label"], pa.int64()), value_set=probe_labels)
        ),
        batch_format="pyarrow",
    )
    return brute_force_topk(probed, query, k)


PLANE_Q = 10_000  # hyperplane weights quantized to 1e-4 grid
EMB_Q = 1_000_000  # embedding components quantized to 1e-6 grid


def _planes(d: int, n_planes: int = N_PLANES) -> np.ndarray:
    rng = np.random.RandomState(_PROJ_RNG_SEED)
    return rng.normal(size=(n_planes, d))


def _planes_q(d: int, n_planes: int = N_PLANES) -> np.ndarray:
    """Integer hyperplanes: floor(plane * 1e4) as int64.  The bucket key
    is a sign pattern of INTEGER dot products (floor-1e6 embedding ×
    floor-1e4 plane), so it is bit-reproducible in any engine — the
    DuckDB oracle replays these exact literals.  Sign of the dot is
    invariant under positive scaling, so skipping normalization loses
    nothing; magnitudes stay < 2^42, exact even in a float64 SUM."""
    return np.floor(_planes(d, n_planes) * PLANE_Q).astype(np.int64)


def _quantize_emb(m: np.ndarray) -> np.ndarray:
    return np.floor(m * EMB_Q).astype(np.int64)


def _sign_key(m: np.ndarray, planes_q: np.ndarray) -> np.ndarray:
    """Bucket key from RAW (unnormalized) embedding rows via exact
    integer dot products against the quantized hyperplanes."""
    bits = (_quantize_emb(m) @ planes_q.T) > 0
    return (bits * (1 << np.arange(planes_q.shape[0]))).sum(axis=1).astype(np.int64)


def bucket_embeddings(embeddings_ds, d: int, n_planes: int = N_PLANES):
    """Add a signed-random-projection bucket key (one pass, stateless)."""
    planes_q = _planes_q(d, n_planes)

    def add_key(batch: pa.Table) -> pa.Table:
        m = _batch_matrix(batch)
        return batch.append_column("bucket", pa.array(_sign_key(m, planes_q), pa.int64()))

    return embeddings_ds.map_batches(add_key, batch_format="pyarrow")


def lsh_probe_keys(
    query: np.ndarray, d: int, probes: int = 4, n_planes: int = N_PLANES
) -> List[int]:
    """Deterministic probe set for ``lsh_topk``: the query's own bucket
    plus single-bit flips of the ``probes`` lowest-|margin| planes.
    Exposed so the SQL oracle can embed the exact keys as literals."""
    planes_q = _planes_q(d, n_planes)
    qq = _quantize_emb(query.astype(np.float64).reshape(1, -1))
    dots = (qq @ planes_q.T)[0]
    base = int(((dots > 0) * (1 << np.arange(n_planes))).sum())
    flip_order = np.argsort(np.abs(dots), kind="stable")[:probes]
    return sorted({base} | {base ^ (1 << int(b)) for b in flip_order})


def lsh_topk(
    embeddings_ds,
    query: np.ndarray,
    k: int = 10,
    probes: int = 4,
    n_planes: int = N_PLANES,
):
    """ANN top-k: probe the query's bucket plus ``probes`` single-bit flips.

    The bucketing is integer-exact (see ``_planes_q``), so the probed
    candidate set — and therefore the whole result — is reproduced
    bit-for-bit by the DuckDB oracle replaying the quantized planes.
    ``n_planes`` sizes the table so buckets hold ~n/2^planes vectors:
    12 planes for web-scale tables, fewer at small n so the probe set
    still holds a real candidate pool.
    """
    d = len(query)
    probe_keys = lsh_probe_keys(query, d, probes, n_planes)

    bucketed = bucket_embeddings(embeddings_ds, d, n_planes)
    probed = bucketed.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["bucket"], value_set=pa.array(sorted(probe_keys)))
        ),
        batch_format="pyarrow",
    )
    return brute_force_topk(probed, query, k)


NEARDUP_MAX_SEGMENT = 4096  # per-band bucket cap (triu head + logged chain tail)
NEARDUP_SMALL_CAND_LIMIT = 500_000  # candidate pairs below which a driver fold wins
NEARDUP_BROADCAST_BYTE_LIMIT = 256 * 1024 * 1024  # byte gate on the needed vectors


NEARDUP_SMALL_INPUT_BYTES = 64 * 1024 * 1024  # driver-fold gate on the input table
NEARDUP_GRAM_MAX_ROWS = 20_000  # blocked-gram fold branch cap (n² scan)
NEARDUP_FOLD_MAX_PAIRS = 50_000_000  # candidate-branch cap; above → distributed
_GRAM_CHUNK = 4096


def _near_dup_pairs_driver(
    tbl: pa.Table,
    planes: np.ndarray,
    n_bands: int,
    planes_per_band: int,
    threshold: float,
    out_schema: pa.Schema,
):
    """Driver fold of the banded SRP-LSH near-dup search — value-identical
    to the distributed path, collapsed to one numpy pass (the PageRank
    small-graph precedent, stages/graph.py).  Returns ``None`` to decline
    (caller falls back to the distributed shape).

    Two branches, both reproducing the distributed semantics exactly:

    * **gram scan** (n ≤ ``NEARDUP_GRAM_MAX_ROWS`` AND no band segment
      over the ``NEARDUP_MAX_SEGMENT`` cap): with the default loose
      bands (b=2, L=24) nearly every pair collides somewhere, so
      materializing candidates is the cost, not the recall — instead a
      blocked ``lookup @ lookup.T`` finds cos ≥ θ pairs directly (with a
      1e-9 guard band), refilters them by "collides in ≥1 band" (the
      no-cap candidate condition), and recomputes the survivors' cosines
      with the SAME einsum-gather formula the distributed verify uses so
      the e3 rounding can't diverge by a BLAS summation-order ULP.
    * **capped-candidate scan** otherwise: the distributed pipeline's own
      ``_segment_pairs`` emission (cap semantics included) over the
      (band_key, vec_id) sort, dense-key ``np.unique`` dedup, chunked
      einsum verify — declined above ``NEARDUP_FOLD_MAX_PAIRS``.

    Assumes ``vec_id`` is unique in the table (it is the table's key).
    """
    from .dedup import _segment_pairs

    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = _normalize(_batch_matrix(tbl))
    weights = 1 << np.arange(planes_per_band)
    bits = (m @ planes.T) > 0
    n = len(m)
    keys = np.empty((n, n_bands), dtype=np.int64)
    for band in range(n_bands):
        seg = bits[:, band * planes_per_band : (band + 1) * planes_per_band]
        keys[:, band] = (seg * weights).sum(axis=1) + (band << 32)
    order_ids = np.argsort(ids, kind="stable")
    ids_sorted = ids[order_ids]
    lookup = m[order_ids]

    # band segment sizes decide the branch: the gram scan is only valid
    # when the cap never fires (candidates == "collides in >=1 band")
    band_key = keys.reshape(-1)
    vec_id = np.repeat(ids, n_bands)
    order = np.lexsort((vec_id, band_key))
    band_key = band_key[order]
    starts = np.flatnonzero(np.r_[True, band_key[1:] != band_key[:-1]])
    sizes = np.r_[starts[1:], len(band_key)] - starts

    if n <= NEARDUP_GRAM_MAX_ROWS and not (sizes > NEARDUP_MAX_SEGMENT).any():
        keys_dense = keys[order_ids]  # (n, L), aligned with lookup rows
        parts = []
        for c0 in range(0, n, _GRAM_CHUNK):
            c1 = min(c0 + _GRAM_CHUNK, n)
            cosb = lookup[c0:c1] @ lookup.T  # (chunk, n)
            ii, jj = np.nonzero(cosb >= threshold - 1e-9)
            gi = ii + c0
            up = jj > gi  # upper triangle == vec_a < vec_b in id order
            gi, jj = gi[up], jj[up]
            if len(gi) == 0:
                continue
            collide = (keys_dense[gi] == keys_dense[jj]).any(axis=1)
            gi, jj = gi[collide], jj[collide]
            if len(gi) == 0:
                continue
            # exact same float formula as the distributed verify
            cos = np.einsum("ij,ij->i", lookup[gi], lookup[jj])
            keep = cos >= threshold
            parts.append((ids_sorted[gi[keep]], ids_sorted[jj[keep]], cos[keep]))
        if not parts:
            return out_schema.empty_table()
        va = np.concatenate([p[0] for p in parts])
        vb = np.concatenate([p[1] for p in parts])
        cos = np.concatenate([p[2] for p in parts])
    else:
        # closed-form pair-count estimate (capped triu + chain tail)
        heads = np.minimum(sizes, NEARDUP_MAX_SEGMENT)
        est = int((heads * (heads - 1) // 2).sum() + (sizes - heads).sum())
        if est > NEARDUP_FOLD_MAX_PAIRS:
            return None
        vec_id = vec_id[order]
        ia, ib = _segment_pairs(band_key, NEARDUP_MAX_SEGMENT)
        if len(ia) == 0:
            return out_schema.empty_table()
        a_d = np.searchsorted(ids_sorted, vec_id[ia])
        b_d = np.searchsorted(ids_sorted, vec_id[ib])
        uniq = np.unique(a_d * n + b_d)
        a_d, b_d = uniq // n, uniq % n
        cos_parts, keep_parts = [], []
        for c0 in range(0, len(a_d), 4_000_000):
            c1 = min(c0 + 4_000_000, len(a_d))
            cos_parts.append(
                np.einsum("ij,ij->i", lookup[a_d[c0:c1]], lookup[b_d[c0:c1]])
            )
        cos = np.concatenate(cos_parts)
        keep = cos >= threshold
        va, vb, cos = ids_sorted[a_d[keep]], ids_sorted[b_d[keep]], cos[keep]
    return pa.table(
        {
            "vec_a": pa.array(va, pa.int64()),
            "vec_b": pa.array(vb, pa.int64()),
            "cos_e3": pa.array(np.round(cos * 1_000).astype(np.int64), pa.int64()),
        }
    )


def embedding_near_dup_pairs(
    embeddings_ds,
    d: int,
    threshold: float = 0.45,
    planes_per_band: int = 2,
    n_bands: int = 24,
    input_bytes_hint: int | None = None,
):
    """Near-duplicate vector pairs via banded SRP-LSH + exact verify.

    ``n_bands`` independent signed-random-projection tables of
    ``planes_per_band`` hyperplanes each; a pair is a candidate when it
    collides in ANY band, and candidates are verified with the exact
    cosine — so precision is exact and recall is
    1 - (1 - p^b)^L with p = 1 - θ/π.  Tune (b, L) to the threshold:
    the defaults (b=2, L=24) give per-pair miss < 1e-5 down to
    cos ≥ 0.45 (θ ≈ 1.1 rad); for a true near-dup threshold (≥0.9) use
    e.g. b=8, L=8, which keeps buckets tiny at scale.

    Scale shape mirrors the text near-dup family
    (``minhash_verified_pairs``, stages/dedup.py):

    * band rows are VECTOR-FREE — (band_key, vec_id) is 16 B/band
      through the shuffle, vs the 8·d-byte vector × L bands the naive
      shape ships (~1500× more at d=64, L=24);
    * per-bucket pair emission is the closed-form ``_segment_pairs``
      (full triu up to ``NEARDUP_MAX_SEGMENT`` + a logged predecessor
      chain over over-cap tails — degenerate buckets stay connected,
      never quadratic);
    * cross-band dedup is a driver fold below
      ``NEARDUP_SMALL_CAND_LIMIT`` else ``sorted_pair_dedup`` — the
      engine's high-cardinality groupby policy (native Ray groupby on
      an all-unique pair key measured 230 s vs 3.6 s at 2.6M groups);
    * the exact-cosine verify fetches only the vectors candidates
      actually touch: one streaming ``is_in`` pass over the table,
      broadcast ONCE as (ids, matrix) when they fit
      ``NEARDUP_BROADCAST_BYTE_LIMIT``, else twin hash joins (the true
      100-TB path where no single heap holds the touched vectors).

    Returns (vec_a, vec_b, cos_e3) like ``cosine_pairs_exact``, whose
    SQL self-join is also this operator's oracle.

    ``input_bytes_hint`` — caller-supplied estimate of the input table's
    in-memory size (e.g. the parquet file size; callers that don't know
    pass None).  At or below ``NEARDUP_SMALL_INPUT_BYTES`` the whole
    search runs as a driver fold (``_near_dup_pairs_driver``): the
    distributed shape costs 4+ executions of pure fixed overhead when
    the table fits one heap.  The gate is an explicit hint, never a
    blind ``size_bytes()`` probe, so a 100-TB input can never trigger a
    driver-side pull by accident.
    """
    import ray
    import ray.data as rd

    from ..functions.arrowutil import concat_nonempty
    from .dedup import _add_key_bucket, _segment_pairs, sorted_pair_dedup
    from .joins import hash_join

    rng = np.random.RandomState(_PROJ_RNG_SEED + 7)
    planes = rng.normal(size=(n_bands * planes_per_band, d))
    weights = 1 << np.arange(planes_per_band)

    out_schema_early = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cos_e3", pa.int64())]
    )
    if input_bytes_hint is not None and input_bytes_hint <= NEARDUP_SMALL_INPUT_BYTES:
        parts = [
            t
            for t in ray.get(
                embeddings_ds.select_columns(["vec_id", "embedding"]).to_arrow_refs()
            )
            if t.num_rows
        ]
        if not parts:
            return rd.from_arrow(out_schema_early.empty_table())
        tbl = pa.concat_tables(parts).combine_chunks()
        folded = _near_dup_pairs_driver(
            tbl, planes, n_bands, planes_per_band, threshold, out_schema_early
        )
        if folded is not None:
            return rd.from_arrow(folded)
        # fold declined (too many capped candidates for one heap):
        # fall through to the distributed shape below

    def add_bands(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch))
        bits = (m @ planes.T) > 0  # (n, L*b)
        n = len(m)
        keys = np.empty((n, n_bands), dtype=np.int64)
        for band in range(n_bands):
            seg = bits[:, band * planes_per_band : (band + 1) * planes_per_band]
            keys[:, band] = (seg * weights).sum(axis=1) + (band << 32)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1), pa.int64()),
                "vec_id": pa.array(np.repeat(vec_ids, n_bands), pa.int64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
        )
        g = (
            g.drop_duplicates(["band_key", "vec_id"])
            .sort_values(["band_key", "vec_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        ia, ib = _segment_pairs(g["band_key"].to_numpy(), NEARDUP_MAX_SEGMENT)
        if len(ia) == 0:
            return empty
        ids = g["vec_id"].to_numpy()
        # sorted by vec_id within each band segment, so ids[ia] < ids[ib]
        df = pd.DataFrame({"vec_a": ids[ia], "vec_b": ids[ib]}).drop_duplicates()
        return from_pandas_clean(df)

    pair_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
    out_schema = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cos_e3", pa.int64())]
    )
    cands = (
        embeddings_ds.map_batches(add_bands, batch_format="pyarrow")
        .map_batches(_add_key_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .materialize()
    )
    n_cand = cands.count()
    if n_cand == 0:
        return rd.from_arrow(out_schema.empty_table())
    if n_cand <= NEARDUP_SMALL_CAND_LIMIT:
        tbl = concat_nonempty(ray.get(cands.to_arrow_refs()), pair_schema)
        cand_mat = rd.from_arrow(tbl.group_by(["vec_a", "vec_b"]).aggregate([]))
    else:
        cand_mat = sorted_pair_dedup(cands, ["vec_a", "vec_b"])
    return _verify_vec_pairs(cand_mat.materialize(), embeddings_ds, d, threshold)


def _verify_vec_pairs(cand_mat, embeddings_ds, d: int, threshold: float):
    """Exact-cosine verify of a MATERIALIZED (vec_a, vec_b) candidate
    dataset against the embeddings source — the gated broadcast /
    twin-hash-join stage shared by ``embedding_near_dup_pairs`` and the
    incremental add path (gate rationale in that function's docstring)."""
    import ray
    import ray.data as rd

    from .joins import hash_join

    out_schema = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cos_e3", pa.int64())]
    )
    if cand_mat.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    # unique touched ids computed DISTRIBUTED (per-batch partial unique);
    # only the id partials reach the driver, never the pair table
    def batch_ids(t: pa.Table) -> pa.Table:
        ids = np.unique(
            np.concatenate(
                [
                    t["vec_a"].to_numpy(zero_copy_only=False),
                    t["vec_b"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"vec_id": pa.array(ids, pa.int64())})

    id_parts = ray.get(
        cand_mat.map_batches(batch_ids, batch_format="pyarrow", batch_size=None).to_arrow_refs()
    )
    ids = np.unique(
        np.concatenate(
            [p["vec_id"].to_numpy(zero_copy_only=False) for p in id_parts if p.num_rows]
        )
    )
    ids_ref = ray.put(pa.array(ids, pa.int64()))

    def fetch_needed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["vec_id"], value_set=ray.get(ids_ref)))

    needed_mat = (
        embeddings_ds.select_columns(["vec_id", "embedding"])
        .map_batches(fetch_needed, batch_format="pyarrow")
        .materialize()
    )
    if (needed_mat.size_bytes() or 0) <= NEARDUP_BROADCAST_BYTE_LIMIT:
        needed = pa.concat_tables(
            [t for t in ray.get(needed_mat.to_arrow_refs()) if t.num_rows]
        ).combine_chunks()
        ids_sorted = needed["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids_sorted, kind="stable")
        side_ref = ray.put(
            (ids_sorted[order], _normalize(_batch_matrix(needed))[order])
        )

        def verify(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return out_schema.empty_table()
            ids_b, m_b = ray.get(side_ref)
            va = t["vec_a"].to_numpy(zero_copy_only=False)
            vb = t["vec_b"].to_numpy(zero_copy_only=False)
            cos = np.einsum(
                "ij,ij->i",
                m_b[np.searchsorted(ids_b, va)],
                m_b[np.searchsorted(ids_b, vb)],
            )
            keep = cos >= threshold
            return pa.table(
                {
                    "vec_a": pa.array(va[keep], pa.int64()),
                    "vec_b": pa.array(vb[keep], pa.int64()),
                    "cos_e3": pa.array(
                        np.round(cos[keep] * 1_000).astype(np.int64), pa.int64()
                    ),
                }
            )

        return cand_mat.map_batches(verify, batch_format="pyarrow", batch_size=None)

    # join path: attach each side's vector with a hash join (candidates
    # only — the embeddings table is never re-shuffled per band).  The
    # vector travels as d scalar float columns: Acero's hash join does
    # not accept list<float> payload columns, and d fixed-width floats
    # reassemble with one np.column_stack
    def explode_side(side: str):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = _batch_matrix(t)
            cols = {f"vec_{side}": pc.cast(t["vec_id"], pa.int64())}
            for j in range(m.shape[1]):
                cols[f"{side}{j}"] = pa.array(m[:, j], pa.float64())
            return pa.table(cols)

        return f

    ea = embeddings_ds.map_batches(explode_side("a"), batch_format="pyarrow")
    eb = embeddings_ds.map_batches(explode_side("b"), batch_format="pyarrow")
    joined = hash_join(hash_join(cand_mat, ea, on="vec_a"), eb, on="vec_b")

    def _side_matrix(t: pa.Table, side: str) -> np.ndarray:
        return np.column_stack(
            [t[f"{side}{j}"].to_numpy(zero_copy_only=False) for j in range(d)]
        )

    def verify_joined(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ma = _normalize(_side_matrix(t, "a"))
        mb = _normalize(_side_matrix(t, "b"))
        cos = np.einsum("ij,ij->i", ma, mb)
        keep = cos >= threshold
        va = t["vec_a"].to_numpy(zero_copy_only=False)[keep]
        vb = t["vec_b"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "vec_a": pa.array(va, pa.int64()),
                "vec_b": pa.array(vb, pa.int64()),
                "cos_e3": pa.array(
                    np.round(cos[keep] * 1_000).astype(np.int64), pa.int64()
                ),
            }
        )

    return joined.map_batches(verify_joined, batch_format="pyarrow", batch_size=None)


def embedding_incremental_pairs(
    old_embeddings_ds,
    old_pairs_ds,
    new_embeddings_ds,
    d: int,
    threshold: float = 0.45,
    planes_per_band: int = 2,
    n_bands: int = 24,
):
    """Fold a new vector stream into an existing near-dup pair state —
    the embedding mirror of ``minhash_incremental_clusters``'s pair
    stage (the daily-append path).  Band keys are deterministic
    functions of the vector, so candidates with BOTH sides old are
    exactly the pairs the previous run verified: they are suppressed
    inside the band buckets and the exact-cosine verify — the stage
    that touches vectors again — runs only on new-new and new-old
    pairs.  ``add(X) == fresh recompute`` on un-capped corpora (the
    ``_segment_pairs`` over-cap chain caveat applies, as everywhere in
    the near-dup family).  Returns old ∪ delta verified pairs."""
    import ray.data as rd

    from .dedup import _add_key_bucket, _segment_pairs, sorted_pair_dedup
    from ..functions.arrowutil import concat_nonempty

    rng = np.random.RandomState(_PROJ_RNG_SEED + 7)
    planes = rng.normal(size=(n_bands * planes_per_band, d))
    weights = 1 << np.arange(planes_per_band)

    def flag(v: int):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "vec_id": pc.cast(t["vec_id"], pa.int64()),
                    "embedding": t["embedding"],
                    "is_new": pa.array(np.full(t.num_rows, v, np.int8), pa.int8()),
                }
            )

        return f

    emb_flagged = old_embeddings_ds.map_batches(
        flag(0), batch_format="pyarrow"
    ).union(new_embeddings_ds.map_batches(flag(1), batch_format="pyarrow"))

    def add_bands(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch))
        bits = (m @ planes.T) > 0
        n = len(m)
        keys = np.empty((n, n_bands), dtype=np.int64)
        for band in range(n_bands):
            seg = bits[:, band * planes_per_band : (band + 1) * planes_per_band]
            keys[:, band] = (seg * weights).sum(axis=1) + (band << 32)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flags = batch["is_new"].to_numpy(zero_copy_only=False).astype(np.int8)
        return pa.table(
            {
                "band_key": pa.array(keys.reshape(-1), pa.int64()),
                "vec_id": pa.array(np.repeat(vec_ids, n_bands), pa.int64()),
                "is_new": pa.array(np.repeat(flags, n_bands), pa.int8()),
            }
        )

    def bucket_delta_pairs(g: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {"vec_a": pa.array([], pa.int64()), "vec_b": pa.array([], pa.int64())}
        )
        g = (
            g.drop_duplicates(["band_key", "vec_id"])
            .sort_values(["band_key", "vec_id"], kind="mergesort")
            .reset_index(drop=True)
        )
        ia, ib = _segment_pairs(g["band_key"].to_numpy(), NEARDUP_MAX_SEGMENT)
        if len(ia) == 0:
            return empty
        flags = g["is_new"].to_numpy().astype(bool)
        keep = flags[ia] | flags[ib]  # suppress old-old (already verified)
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return empty
        ids = g["vec_id"].to_numpy()
        df = pd.DataFrame({"vec_a": ids[ia], "vec_b": ids[ib]}).drop_duplicates()
        return from_pandas_clean(df)

    pair_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64())])
    cands = (
        emb_flagged.map_batches(add_bands, batch_format="pyarrow")
        .map_batches(_add_key_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_delta_pairs, batch_format="pandas")
        .materialize()
    )
    import ray

    if cands.count() <= NEARDUP_SMALL_CAND_LIMIT:
        tbl = concat_nonempty(ray.get(cands.to_arrow_refs()), pair_schema)
        cand_mat = rd.from_arrow(tbl.group_by(["vec_a", "vec_b"]).aggregate([]))
    else:
        cand_mat = sorted_pair_dedup(cands, ["vec_a", "vec_b"])
    emb_all = emb_flagged.map_batches(
        lambda t: t.select(["vec_id", "embedding"]), batch_format="pyarrow"
    )
    delta = _verify_vec_pairs(cand_mat.materialize(), emb_all, d, threshold)
    return old_pairs_ds.union(delta.materialize()).materialize()


EMB_RETRACT_BROADCAST_LIMIT = 2_000_000  # removed ids above this → anti joins


def embedding_retract_pairs(old_pairs_ds, removed_ids_ds):
    """Retraction for the embedding near-dup pair state: drop every pair
    touching a removed ``vec_id``.  A verified pair depends only on its
    two vectors, so on un-capped corpora the result equals a fresh
    ``embedding_near_dup_pairs`` over the reduced table — the embedding
    mirror of ``minhash_retract_clusters``'s pair GC."""
    import ray

    rem_mat = removed_ids_ds.map_batches(
        lambda t: pa.table({"vec_id": pa.compute.cast(t["vec_id"], pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    n_rem = rem_mat.count()
    if n_rem == 0:
        return old_pairs_ds.materialize()
    if n_rem <= EMB_RETRACT_BROADCAST_LIMIT:
        parts = [t for t in ray.get(rem_mat.to_arrow_refs()) if t.num_rows]
        rem_ref = ray.put(
            pa.concat_tables(parts)["vec_id"].combine_chunks()
        )

        def gc(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            rids = ray.get(rem_ref)
            bad = pc.or_(
                pc.is_in(t["vec_a"], value_set=rids),
                pc.is_in(t["vec_b"], value_set=rids),
            )
            return t.filter(pc.invert(bad))

        return old_pairs_ds.map_batches(gc, batch_format="pyarrow").materialize()
    # at-scale path: Bloom-prefiltered exact GC (definite-miss pairs
    # bypass the shuffle; see sketches.bloom_pair_gc for the fallback)
    from .sketches import bloom_pair_gc

    return bloom_pair_gc(
        old_pairs_ds, rem_mat, "vec_a", "vec_b", "vec_id", n_rem
    ).materialize()


# ---------------------------------------------------------------------------
# SemDeDup: k-means cells → per-cell cosine duplicate groups → keep rule
# ---------------------------------------------------------------------------

SEMDEDUP_MAX_CELL_ROWS = 100_000  # per-cell O(n_c^2) guard — raise k instead

_CELL_DIR_RE = re.compile(r"^cell=(\d+)$")


def _live_cells(index_dir: str):
    """Cell ids of an IVF layout by directory listing, tolerating
    swap intermediates (``cell=N.pre-<tag>`` from a crashed
    ``ivf_retract``) and any other non-cell entries."""
    import glob
    import os

    out = []
    for p in glob.glob(os.path.join(index_dir, "cell=*")):
        m = _CELL_DIR_RE.match(os.path.basename(p))
        if m and os.path.isdir(p):
            out.append(int(m.group(1)))
    return sorted(out)


_SEMDEDUP_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("cell", pa.int64()),
        ("cent_sim_e6", pa.int64()),
        ("keep", pa.bool_()),
    ]
)


SEMDEDUP_PAIR_CHUNK = 1024  # rows per pairwise block: memory O(chunk·n)
SEMDEDUP_MAX_EDGES = 50_000_000  # duplicate-pair budget per cell


def _semdedup_resolve(ids, sims_c, mn, thr: float):
    """Keep mask for ONE cell: pairwise-cosine duplicate groups via
    ``minlabel_components``, keep the (cent_sim_e6, vec_id)-min member
    per group.  Shared by the in-memory and the persisted-IVF paths —
    their semantics must stay identical.

    The n×n similarity scan runs in row CHUNKS (a full float64 n×n at
    the 100k guard would be ~80 GB — the guard must be reachable
    before the allocation kills the worker), and the edge list is
    budgeted: a degenerate cell of near-identical vectors has ~n²/2
    edges, which no downstream pass should eat silently."""
    from .clustering import minlabel_components

    n = len(ids)
    keep = np.ones(n, bool)
    if n <= 1:
        return keep
    ia_parts, ib_parts, n_edges = [], [], 0
    for s in range(0, n, SEMDEDUP_PAIR_CHUNK):
        e = min(s + SEMDEDUP_PAIR_CHUNK, n)
        sims = mn[s:e] @ mn.T  # (chunk, n)
        li, gj = np.nonzero(sims >= thr)
        gi = li + s
        m = gi < gj  # strict upper triangle only
        if m.any():
            ia_parts.append(gi[m])
            ib_parts.append(gj[m])
            n_edges += int(m.sum())
            if n_edges > SEMDEDUP_MAX_EDGES:
                raise ValueError(
                    f"semantic dedup cell produced > {SEMDEDUP_MAX_EDGES} "
                    f"duplicate pairs at n={n} — a near-degenerate cell; "
                    f"tighten eps or increase k"
                )
    if n_edges:
        comp = minlabel_components(
            n, np.concatenate(ia_parts), np.concatenate(ib_parts)
        )
        order = np.lexsort((ids, sims_c))  # sim asc, id asc
        _, first_pos = np.unique(comp[order], return_index=True)
        keep = np.zeros(n, bool)
        keep[order[first_pos]] = True
    return keep


def semantic_dedup(
    embeddings_ds,
    k: int = 8,
    iters: int = 2,
    eps: float = 0.03,
    sample_mod: Optional[int] = None,
    max_cell_rows: int = SEMDEDUP_MAX_CELL_ROWS,
):
    """SemDeDup semantic deduplication (Abbas et al. 2023, "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication", arXiv:2303.09540): k-means the embedding space,
    call two vectors semantic duplicates when their cosine similarity
    INSIDE a cluster is >= 1 - eps, and keep exactly ONE
    representative per duplicate group — the member with the LOWEST
    cosine similarity to its cluster centroid (the paper's
    best-performing keep rule), ties to the smallest vec_id.

    Distributed shape (the paper's own scale argument): the fit is the
    integer-exact Lloyd of ``stages/kmeans.py`` (centroids broadcast,
    tree-folded partials), and the ONLY all-to-all exchange is one
    shuffle of the vectors partitioned by cell
    (``groupby(cell).map_groups``); each cell then runs one local
    block matmul plus the ``minlabel_components`` pointer-jumping
    kernel.  O(n_c^2) inside a cell is the algorithm's intended cost
    — ``max_cell_rows`` guards it (the engine's unguarded-O(n^2)
    policy: raise with "increase k", never silently degrade).
    Duplicate groups never span cells BY CONSTRUCTION — a documented
    property of the algorithm, not an approximation this engine adds.
    At 10^12 rows, build the cell layout once with ``ivf_build`` and
    run the per-cell step over each cell's parquet files.

    Determinism: cell assignment is a pure function of (vector, fitted
    centroids) and the fit is partition-invariant; per-pair cosines
    and per-vector centroid cosines are pure float64 functions of the
    float32 inputs with no batch-order coupling (each cell is always
    processed whole).  The result is therefore partition-invariant
    (pytest-pinned).

    Returns one row per input vector: (vec_id, cell, cent_sim_e6,
    keep) with cent_sim_e6 = floor(cos(v, centroid) * 1e6).  Corpus
    drop rate = 1 - mean(keep)."""
    import ray

    from .kmeans import GRID, _assign_cells, kmeans_fit

    cents_e6 = np.asarray(
        kmeans_fit(embeddings_ds, k=k, iters=iters, sample_mod=sample_mod),
        np.int64,
    )
    cent_ref = ray.put(cents_e6)

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                    "cent_sim_e6": pa.array([], pa.int64()),
                    "embedding": batch["embedding"],
                }
            )
        ce6 = ray.get(cent_ref)
        cents = ce6.astype(np.float64) / GRID
        m = _batch_matrix(batch)
        cell = _assign_cells(m, cents).astype(np.int64)
        sim = (_normalize(m) * _normalize(cents)[cell]).sum(axis=1)
        return pa.table(
            {
                "vec_id": pa.compute.cast(batch["vec_id"], pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "cent_sim_e6": pa.array(
                    np.floor(sim * 1_000_000.0).astype(np.int64), pa.int64()
                ),
                "embedding": batch["embedding"],
            }
        )

    thr = 1.0 - eps

    def cell_dedup(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        if n == 0:
            return _SEMDEDUP_SCHEMA.empty_table()
        if n > max_cell_rows:
            raise ValueError(
                f"semantic_dedup cell has {n} rows > max_cell_rows="
                f"{max_cell_rows}; the per-cell step is O(n_c^2) by design "
                f"— increase k so cells shrink (or raise max_cell_rows "
                f"deliberately)"
            )
        ids = df["vec_id"].to_numpy().astype(np.int64)
        sims_c = df["cent_sim_e6"].to_numpy().astype(np.int64)
        cell_id = np.full(n, int(df["cell"].iloc[0]), np.int64)
        if n > 1:
            mn = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
            keep = _semdedup_resolve(ids, sims_c, mn, thr)
        else:
            keep = np.ones(n, bool)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(cell_id, pa.int64()),
                "cent_sim_e6": pa.array(sims_c, pa.int64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return (
        embeddings_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(cell_dedup, batch_format="pandas")
    )


def semantic_dedup_ivf(
    index_dir: str,
    eps: float = 0.03,
    max_cell_rows: int = SEMDEDUP_MAX_CELL_ROWS,
    cells: Optional[List[int]] = None,
):
    """SemDeDup over an already-PERSISTED IVF layout (``ivf_build``):
    the shuffle-free variant.  The layout's ``cell=K/`` directories
    ARE the cluster partitioning, so this pass is an embarrassingly
    parallel map — one task per cell, each reading only its own
    cell's parquet fragments (column-pruned to vec_id + embedding)
    and resolving duplicate groups with the SAME kernel as
    ``semantic_dedup`` (``_semdedup_resolve``; centroid sims come
    from the persisted ``centroids.json``).  No k-means refit, no
    vector exchange: at 100 TB this turns semantic dedup into a
    read-compute-write pass over an index that similarity search
    already paid for.  Output rows are identical to
    ``semantic_dedup`` run with the same fitted centroids
    (pytest-pinned).  ``cells`` restricts the pass to a subset of
    cell ids (the incremental path re-resolves only touched cells)."""
    import glob
    import json
    import os

    import ray
    import ray.data as rd

    from .kmeans import GRID

    with open(os.path.join(index_dir, "centroids.json")) as f:
        cents_e6 = np.asarray(json.load(f)["cents_e6"], np.int64)
    cn_ref = ray.put(_normalize(cents_e6.astype(np.float64) / GRID))
    if cells is None:
        cells = _live_cells(index_dir)
    else:
        cells = sorted(int(c) for c in cells)
    if not cells:
        return rd.range(1).map_batches(
            lambda _t: _SEMDEDUP_SCHEMA.empty_table(), batch_format="pyarrow"
        )
    thr = 1.0 - eps

    def run_cells(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = []
        for c in batch["cell"].to_pylist():
            files = sorted(
                glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet"))
            )
            if not files:
                continue  # empty cell: manifest-only directory
            parts = [pq.read_table(f, columns=["vec_id", "embedding"]) for f in files]
            # fragments written by different producers can disagree on
            # the list child FIELD NAME (parquet "element" vs Arrow
            # "item") — same storage, concat_tables still refuses
            parts = [
                p if p.schema.equals(parts[0].schema) else p.cast(parts[0].schema)
                for p in parts
            ]
            t = pa.concat_tables(parts)
            n = t.num_rows
            if n == 0:
                continue
            if n > max_cell_rows:
                raise ValueError(
                    f"semantic_dedup_ivf cell {c} has {n} rows > "
                    f"max_cell_rows={max_cell_rows}; rebuild the index "
                    f"with more cells (or raise max_cell_rows deliberately)"
                )
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            mn = _normalize(_batch_matrix(t))
            sims_c = np.floor(
                (mn * ray.get(cn_ref)[c]).sum(axis=1) * 1_000_000.0
            ).astype(np.int64)
            keep = (
                _semdedup_resolve(ids, sims_c, mn, thr)
                if n > 1
                else np.ones(n, bool)
            )
            out.append(
                pa.table(
                    {
                        "vec_id": pa.array(ids, pa.int64()),
                        "cell": pa.array(np.full(n, c, np.int64), pa.int64()),
                        "cent_sim_e6": pa.array(sims_c, pa.int64()),
                        "keep": pa.array(keep, pa.bool_()),
                    }
                )
            )
        if not out:
            return _SEMDEDUP_SCHEMA.empty_table()
        return pa.concat_tables(out)

    return rd.from_items([{"cell": c} for c in cells]).map_batches(
        run_cells, batch_format="pyarrow", batch_size=1
    )


def semantic_dedup_ivf_add(
    embeddings_ds,
    index_dir: str,
    add_tag: str,
    prev_result_ds,
    eps: float = 0.03,
    max_cell_rows: int = SEMDEDUP_MAX_CELL_ROWS,
):
    """INCREMENTAL SemDeDup on a persisted IVF layout (the add/retract
    family's delta discipline): grow the index with ``ivf_add`` (new
    vectors assign to the FROZEN centroids, idempotent per tag), then
    re-resolve ONLY the cells the add touched; every untouched cell's
    rows carry forward from ``prev_result_ds`` unchanged — their input
    fragments are bit-identical, so recomputing them would produce the
    identical rows (add==fresh pinned in pytest).  At a 1/16-new delta
    this suppresses the per-cell O(n_c^2) work of every cold cell.

    Returns the full refreshed (vec_id, cell, cent_sim_e6, keep)
    result for the GROWN index."""
    import glob
    import os

    ivf_add(embeddings_ds, index_dir, add_tag)  # idempotent per tag
    # published fragments keep the tag in their name — the touched-cell
    # set survives crashes and retries (pre-swap leftovers of a crashed
    # retract are skipped by the regex)
    touched = set()
    for p in glob.glob(
        os.path.join(index_dir, "cell=*", f"add-{add_tag}-*.parquet")
    ):
        m = _CELL_DIR_RE.match(os.path.basename(os.path.dirname(p)))
        if m:
            touched.add(int(m.group(1)))
    touched = sorted(touched)
    return _resolve_touched_and_carry(
        index_dir, touched, prev_result_ds, eps, max_cell_rows
    )


def _resolve_touched_and_carry(
    index_dir: str, touched, prev_result_ds, eps: float, max_cell_rows: int
):
    """Re-resolve only ``touched`` cells and union with the previous
    result's untouched rows — the incremental add AND retract paths
    must apply the identical carry-forward rule."""
    if not touched:
        return prev_result_ds
    fresh = semantic_dedup_ivf(
        index_dir, eps=eps, max_cell_rows=max_cell_rows, cells=touched
    )
    touched_arr = pa.array(sorted(touched), pa.int64())

    def keep_untouched(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.invert(pc.is_in(t["cell"], value_set=touched_arr)))

    return prev_result_ds.map_batches(
        keep_untouched, batch_format="pyarrow"
    ).union(fresh)


# ---------------------------------------------------------------------------
# IVF index layout: k-means cells → cell-partitioned parquet → pruned probe
# ---------------------------------------------------------------------------


def ivf_build(
    embeddings_ds,
    out_dir: str,
    k: int = 8,
    iters: int = 2,
    sample_mod: Optional[int] = None,
):
    """Build a PERSISTED IVF index: fit k-means cells
    (``stages/kmeans.kmeans_fit`` — integer-exact Lloyd, centroid
    broadcast per iteration), assign every vector its cell in one
    streaming pass, and write the table hive-partitioned by cell
    (``cell=K/`` directories) so a probe READS only its cells'
    files — pruning happens at the filesystem listing, not as a
    full-scan filter.

    Resumable like ``sources/io.write_partitioned``: centroids are
    persisted first (atomic rename), each finished cell gets a
    manifest with footer-derived row counts, and a rerun skips
    manifested cells UPSTREAM (their rows are filtered out before the
    write).  Deterministic: the fit has no RNG, assignment ties break
    to the lowest cell id, so rerun output is byte-stable.

    Returns the per-cell manifests."""
    import glob
    import json
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from .kmeans import GRID, _assign_cells, kmeans_fit

    os.makedirs(out_dir, exist_ok=True)
    cent_path = os.path.join(out_dir, "centroids.json")
    if os.path.exists(cent_path):
        with open(cent_path) as f:
            cents_e6 = np.asarray(json.load(f)["cents_e6"], np.int64)
        if cents_e6.shape[0] != k:
            raise ValueError(
                f"ivf_build: existing index has k={cents_e6.shape[0]}, asked k={k}"
            )
    else:
        cents_e6 = kmeans_fit(embeddings_ds, k=k, iters=iters, sample_mod=sample_mod)
        tmp = cent_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"k": k, "cents_e6": cents_e6.tolist()}, f)
        os.replace(tmp, cent_path)

    todo = {
        c
        for c in range(k)
        if not os.path.exists(os.path.join(out_dir, f"cell={c}", "manifest.json"))
    }
    if todo:
        import shutil

        todo_arr = pa.array(sorted(todo), pa.int64())
        cent_ref = ray.put(cents_e6)

        def add_cell(batch: pa.Table) -> pa.Table:
            ce6 = ray.get(cent_ref)
            m = _batch_matrix(batch)
            cell = _assign_cells(m, ce6.astype(np.float64) / GRID).astype(np.int64)
            out = batch.append_column("cell", pa.array(cell, pa.int64()))
            return out.filter(pc.is_in(out["cell"], value_set=todo_arr))

        # stage-then-publish (the ivf_add discipline): a crashed build
        # must not leave orphan fragments that a rerun would APPEND to
        stage = os.path.join(out_dir, ".build_stage")
        shutil.rmtree(stage, ignore_errors=True)
        embeddings_ds.map_batches(add_cell, batch_format="pyarrow").write_parquet(
            stage, partition_cols=["cell"]
        )
        for c in sorted(todo):
            cell_dir = os.path.join(out_dir, f"cell={c}")
            # clear unmanifested leftovers from a crashed attempt
            shutil.rmtree(cell_dir, ignore_errors=True)
            os.makedirs(cell_dir, exist_ok=True)
            staged = os.path.join(stage, f"cell={c}")
            for frag in glob.glob(os.path.join(staged, "*.parquet")):
                os.replace(frag, os.path.join(cell_dir, os.path.basename(frag)))
            rows = sum(
                pq.ParquetFile(p).metadata.num_rows
                for p in glob.glob(os.path.join(cell_dir, "*.parquet"))
            )
            tmp = os.path.join(cell_dir, "manifest.json.tmp")
            with open(tmp, "w") as f:
                json.dump({"cell": c, "rows": rows}, f)
            os.replace(tmp, os.path.join(cell_dir, "manifest.json"))
        shutil.rmtree(stage, ignore_errors=True)
    out = []
    for c in range(k):
        with open(os.path.join(out_dir, f"cell={c}", "manifest.json")) as f:
            out.append(json.load(f))
    return out


def ivf_probe_cells(index_dir: str, query: np.ndarray, nprobe: int):
    """Rank the index's cells by centroid cosine to ``query`` and
    return the nprobe nearest cell ids (deterministic: stable argsort,
    ties to the lower cell id)."""
    import json
    import os

    with open(os.path.join(index_dir, "centroids.json")) as f:
        cents_e6 = np.asarray(json.load(f)["cents_e6"], np.float64)
    c = _normalize(cents_e6)
    qn = query.astype(np.float64)
    qn = qn / (np.linalg.norm(qn) or 1.0)
    order = np.argsort(-(c @ qn), kind="stable")
    return [int(i) for i in order[:nprobe]]


def ivf_probe_topk(index_dir: str, query: np.ndarray, k: int = 10, nprobe: int = 3):
    """Probe a persisted IVF index: read ONLY the ``nprobe`` nearest
    cells' parquet directories (column-pruned to vec_id + embedding),
    brute-force cosine top-k inside them.  The bytes read scale with
    nprobe/k_cells, not with the table — the 100-TB ANN path."""
    import os

    import ray.data as rd

    import glob

    cells = ivf_probe_cells(index_dir, query, nprobe)
    # only dirs that actually hold fragments: an empty k-means cell is
    # a manifest-only dir, and read_parquet raises on zero input files
    dirs = [
        d
        for c in cells
        for d in [os.path.join(index_dir, f"cell={c}")]
        if glob.glob(os.path.join(d, "*.parquet"))
    ]
    if not dirs:
        schema = pa.schema([("vec_id", pa.int64()), ("cos_e4", pa.int64())])
        return rd.range(1).map_batches(
            lambda _t, s=schema: s.empty_table(), batch_format="pyarrow"
        )
    ds = rd.read_parquet(
        dirs,
        columns=["vec_id", "embedding"],
        file_extensions=["parquet"],  # skip the manifests
    )
    return brute_force_topk(ds, query, k)


def ivf_add(embeddings_ds, index_dir: str, add_tag: str):
    """INCREMENTAL IVF index growth: assign new vectors to the
    EXISTING centroids (cells never move — probe recall semantics are
    unchanged; re-balance by rebuilding when drift matters) and append
    their rows to the cell directories.

    Idempotent per ``add_tag`` (the add/retract family's discipline):
    new fragments are staged under ``.add_<tag>/`` first, then
    published by renaming into the cell dirs, manifests recounted from
    parquet footers, and a marker written — a retried add with the
    same tag is a no-op after publish, and a crash before publish
    leaves the live cells untouched (the stage dir is simply rebuilt).

    Returns the refreshed per-cell manifests."""
    import glob
    import json
    import os
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from .kmeans import GRID, _assign_cells

    marker = os.path.join(index_dir, f"add_{add_tag}.done")
    k_path = os.path.join(index_dir, "centroids.json")
    with open(k_path) as f:
        cents_e6 = np.asarray(json.load(f)["cents_e6"], np.int64)
    k = cents_e6.shape[0]

    if not os.path.exists(marker):
        stage = os.path.join(index_dir, f".add_{add_tag}")
        shutil.rmtree(stage, ignore_errors=True)  # crashed attempt: rebuild
        cent_ref = ray.put(cents_e6)
        # pin new fragments to the live fragments' schema: Arrow list
        # child field names differ by producer (parquet "element" vs
        # Arrow "item"), and a mixed index breaks concat-based readers
        live_frags = glob.glob(os.path.join(index_dir, "cell=*", "*.parquet"))
        live_schema = (
            pq.ParquetFile(live_frags[0]).schema_arrow.remove_metadata()
            if live_frags
            else None
        )

        def add_cell(batch: pa.Table) -> pa.Table:
            ce6 = ray.get(cent_ref)
            m = _batch_matrix(batch)
            cell = _assign_cells(m, ce6.astype(np.float64) / GRID).astype(np.int64)
            if live_schema is not None:
                batch = batch.select(live_schema.names).cast(live_schema)
            return batch.append_column("cell", pa.array(cell, pa.int64()))

        embeddings_ds.map_batches(add_cell, batch_format="pyarrow").write_parquet(
            stage, partition_cols=["cell"]
        )
        # publish: move fragments into the live cell dirs (same fs →
        # rename), recount manifests, then the marker.  A retry after a
        # crash MID-publish must first clear this tag's partially-
        # published fragments (Ray names fragments randomly, so the
        # rerun's names differ — without the sweep the cell would hold
        # both copies and the recount would bless the duplicates)
        for live in glob.glob(os.path.join(index_dir, "cell=*")):
            for frag in glob.glob(os.path.join(live, f"add-{add_tag}-*.parquet")):
                os.remove(frag)
        for cell_dir in sorted(glob.glob(os.path.join(stage, "cell=*"))):
            c = int(cell_dir.rsplit("=", 1)[1])
            live = os.path.join(index_dir, f"cell={c}")
            os.makedirs(live, exist_ok=True)
            for frag in glob.glob(os.path.join(cell_dir, "*.parquet")):
                os.replace(
                    frag,
                    os.path.join(live, f"add-{add_tag}-" + os.path.basename(frag)),
                )
        for c in range(k):
            live = os.path.join(index_dir, f"cell={c}")
            os.makedirs(live, exist_ok=True)
            rows = sum(
                pq.ParquetFile(p).metadata.num_rows
                for p in glob.glob(os.path.join(live, "*.parquet"))
            )
            tmp = os.path.join(live, "manifest.json.tmp")
            with open(tmp, "w") as f:
                json.dump({"cell": c, "rows": rows}, f)
            os.replace(tmp, os.path.join(live, "manifest.json"))
        shutil.rmtree(stage, ignore_errors=True)
        with open(marker + ".tmp", "w") as f:
            f.write("ok")
        os.replace(marker + ".tmp", marker)
    out = []
    for c in range(k):
        with open(os.path.join(index_dir, f"cell={c}", "manifest.json")) as f:
            out.append(json.load(f))
    return out


IVF_RETRACT_BROADCAST_ROWS = 2_000_000  # removed-id broadcast gate


def ivf_retract(removed_ids_ds, index_dir: str, retract_tag: str):
    """RETRACTION from a persisted IVF index (right-to-be-forgotten,
    the add/retract family's discipline): drop the removed vec_ids
    from every cell that holds one, rewriting ONLY touched cells.

    Shape: the removed-id set broadcasts once (retraction sets are
    small by nature; above ``IVF_RETRACT_BROADCAST_ROWS`` this raises
    — at that volume rebuild the index); touched cells are found by a
    distributed column-pruned vec_id scan (one task per cell, nothing
    else read); each touched cell is rewritten by one task into a
    staged consolidated fragment.

    Crash safety is a per-cell directory SWAP: the staged dir replaces
    the live dir via two renames with a ``.pre-<tag>`` intermediate;
    a rerun first heals half-finished swaps (live missing → rename
    back; live present → drop the leftover), so no crash point loses
    rows.  The full touched-cell PLAN is persisted before the first
    swap — a retry after a partial publish cannot under-report which
    cells changed (the rescan alone would miss already-swapped ones).
    Idempotent per ``retract_tag`` (marker file records the plan).
    Returns the refreshed per-cell manifests."""
    import glob
    import json
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    marker = os.path.join(index_dir, f"retract_{retract_tag}.done")
    k = len(json.load(open(os.path.join(index_dir, "centroids.json")))["cents_e6"])

    def manifests():
        out = []
        for c in range(k):
            with open(os.path.join(index_dir, f"cell={c}", "manifest.json")) as f:
                out.append(json.load(f))
        return out

    # heal half-finished swaps from a crashed attempt (any tag)
    for leftover in glob.glob(os.path.join(index_dir, "cell=*.pre-*")):
        live = leftover.rsplit(".pre-", 1)[0]
        if os.path.isdir(live):
            shutil.rmtree(leftover)  # swap completed — drop the old copy
        else:
            os.rename(leftover, live)  # swap half-done — restore the old
    if os.path.exists(marker):
        return manifests()
    # the PLAN file persists the touched-cell set BEFORE any swap: a
    # crash after some swaps but before the marker would otherwise make
    # the retry's rescan miss the already-swapped cells (their removed
    # ids are gone), and downstream incremental consumers would carry
    # stale rows forward
    plan_path = os.path.join(index_dir, f"retract_{retract_tag}.plan")
    prior_plan: list = []
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            prior_plan = [int(c) for c in json.load(f)["touched"]]

    n_rem = removed_ids_ds.count()
    if n_rem > IVF_RETRACT_BROADCAST_ROWS:
        raise ValueError(
            f"ivf_retract: {n_rem} removed ids > broadcast gate "
            f"{IVF_RETRACT_BROADCAST_ROWS}; at this volume rebuild the "
            f"index with ivf_build instead"
        )
    parts = []
    for r in removed_ids_ds.select_columns(["vec_id"]).to_arrow_refs():
        t = ray.get(r)
        if "vec_id" in t.schema.names and t.num_rows:
            parts.append(t["vec_id"].to_numpy(zero_copy_only=False))
    rem = (
        np.unique(np.concatenate(parts).astype(np.int64))
        if parts
        else np.zeros(0, np.int64)
    )
    if not len(rem):
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"touched": prior_plan}, f)
        os.replace(tmp, marker)
        if os.path.exists(plan_path):
            os.remove(plan_path)
        return manifests()
    rem_ref = ray.put(rem)
    stage = os.path.join(index_dir, f".retract_{retract_tag}")
    shutil.rmtree(stage, ignore_errors=True)
    cells = _live_cells(index_dir)

    def rewrite(batch: pa.Table) -> pa.Table:
        """One task per cell: column-pruned touch scan, full rewrite
        only when the cell actually holds a removed id."""
        out_c, out_touched = [], []
        rset = ray.get(rem_ref)
        for c in batch["cell"].to_pylist():
            files = sorted(
                glob.glob(os.path.join(index_dir, f"cell={c}", "*.parquet"))
            )
            touched = False
            if files:
                ids = np.concatenate(
                    [
                        pq.read_table(f, columns=["vec_id"])["vec_id"]
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                        for f in files
                    ]
                )
                if np.isin(ids, rset).any():
                    touched = True
                    frag_parts = [pq.read_table(f) for f in files]
                    frag_parts = [
                        p
                        if p.schema.equals(frag_parts[0].schema)
                        else p.cast(frag_parts[0].schema)
                        for p in frag_parts
                    ]
                    t = pa.concat_tables(frag_parts)
                    keep = ~np.isin(
                        t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                        rset,
                    )
                    kept = t.filter(pa.array(keep))
                    cdir = os.path.join(stage, f"cell={c}")
                    os.makedirs(cdir, exist_ok=True)
                    if kept.num_rows:
                        pq.write_table(
                            kept,
                            os.path.join(
                                cdir, f"retract-{retract_tag}-0.parquet"
                            ),
                        )
                    with open(os.path.join(cdir, "manifest.json"), "w") as f:
                        json.dump({"cell": c, "rows": kept.num_rows}, f)
            out_c.append(c)
            out_touched.append(touched)
        return pa.table(
            {
                "cell": pa.array(out_c, pa.int64()),
                "touched": pa.array(out_touched, pa.bool_()),
            }
        )

    scan = (
        rd.from_items([{"cell": c} for c in cells])
        .map_batches(rewrite, batch_format="pyarrow", batch_size=1)
        .to_pandas()
    )
    touched_cells = sorted(scan[scan["touched"]]["cell"].astype(int).tolist())
    # commit the full plan (this run's finds ∪ any crashed prior run's)
    # atomically BEFORE the first swap
    plan = sorted(set(prior_plan) | set(touched_cells))
    tmp = plan_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"touched": plan}, f)
    os.replace(tmp, plan_path)
    # publish: per-cell two-rename swap (heal logic above covers every
    # crash point between them)
    for c in touched_cells:
        live = os.path.join(index_dir, f"cell={c}")
        pre = live + f".pre-{retract_tag}"
        os.rename(live, pre)
        os.rename(os.path.join(stage, f"cell={c}"), live)
        shutil.rmtree(pre)
    shutil.rmtree(stage, ignore_errors=True)
    # the marker records WHICH cells changed — retries of downstream
    # incremental consumers need it after the manifests stop moving
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"touched": plan}, f)
    os.replace(tmp, marker)
    os.remove(plan_path)
    return manifests()


def semantic_dedup_ivf_retract(
    removed_ids_ds,
    index_dir: str,
    retract_tag: str,
    prev_result_ds,
    eps: float = 0.03,
    max_cell_rows: int = SEMDEDUP_MAX_CELL_ROWS,
):
    """Incremental SemDeDup RETRACTION on a persisted IVF layout:
    ``ivf_retract`` drops the removed vectors (rewriting only touched
    cells), then ONLY those cells re-resolve — retracting a duplicate
    group's kept member promotes the group's next (cent_sim_e6,
    vec_id)-min member, exactly as a fresh resolve would
    (retract(add(X)) == never-added, pinned).  Untouched cells' rows
    carry forward from ``prev_result_ds``."""
    import json
    import os

    ivf_retract(removed_ids_ds, index_dir, retract_tag)  # idempotent per tag
    # the marker persists the touched-cell list, so a RETRY (when the
    # manifests no longer move) still re-resolves the right cells
    with open(os.path.join(index_dir, f"retract_{retract_tag}.done")) as f:
        touched = sorted(int(c) for c in json.load(f)["touched"])
    return _resolve_touched_and_carry(
        index_dir, touched, prev_result_ds, eps, max_cell_rows
    )
