"""Deduplication operators over the ``documents`` table.

Each operator is a Ray-Data-first composition (map_batches sketching →
band/bucket groupby shuffle → per-bucket candidate pairs → vectorized
verify → shared connected-components), mirroring the guide's
shingle→minhash→band→bucket pattern.  Exact dedup pre-aggregates per
batch before its single shuffle.

Scale notes: the shuffled band tables carry only fixed-size keys per doc
(64×16 B MinHash band rows, 8 B SimHash), never signatures or texts;
bucket groups are capped (``MAX_BUCKET``) with deterministic trimming so
a degenerate key (e.g. empty docs) cannot go quadratic; candidate pairs
are verified with EXACT text shingles fetched via two hash joins on the
(small) candidate table.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrowutil import concat_nonempty, from_pandas_clean
from ..functions.hashing import (
    band_keys_batch,
    minhash_signature_flat,
    simhash64_batch,
    word_shingles_flat,
)

MAX_BUCKET = 64
N_SHUFFLE_BUCKETS = 64


def _add_key_bucket(batch: pa.Table, key: str = "band_key") -> pa.Table:
    """Coarse shuffle bucket over a fine-grained int key (millions of tiny
    groupby groups → N_SHUFFLE_BUCKETS vectorized segments)."""
    import pyarrow.compute as pc

    b = pc.cast(
        pc.bit_wise_and(batch[key], pa.scalar(0x7FFFFFFF, pa.int64())), pa.int64()
    )
    return batch.append_column(
        "bucket", pc.cast(pc.subtract(b, pc.multiply(pc.divide(b, N_SHUFFLE_BUCKETS), N_SHUFFLE_BUCKETS)), pa.int64())
    )


def _triu_pairs(starts: np.ndarray, ends: np.ndarray):
    """Concatenated ``triu(k=1)`` index pairs for the segments
    ``[starts[i], ends[i])`` of a parent array — the closed form shared by
    ``_segment_pairs`` (dedup band buckets) and the resolve pipeline's
    ``emit_pairs_bucket`` (stages/blocking.py).  Fully vectorized: a
    per-segment ``np.triu_indices`` call costs ~1 ms of pure overhead
    each, which at hundreds of thousands of tiny segments per bucket was
    250 s of the 100k-doc dedup stress; this form is ~10 s there.

    Per element at global index i within segment [s, e): pair count
    c = e - i - 1; ``ia`` repeats each element c times, ``ib`` counts up
    from ia+1."""
    empty = np.array([], dtype=np.int64)
    sizes = ends - starts
    keep = sizes >= 2
    starts_k, ends_k, sizes_k = starts[keep], ends[keep], sizes[keep]
    if not len(starts_k):
        return empty, empty
    tot = int(sizes_k.sum())
    offs = np.cumsum(sizes_k) - sizes_k
    gidx = np.repeat(starts_k, sizes_k) + (np.arange(tot) - np.repeat(offs, sizes_k))
    c = np.repeat(ends_k, sizes_k) - gidx - 1
    tp = int(c.sum())
    if not tp:
        return empty, empty
    ia = np.repeat(gidx, c)
    poffs = np.cumsum(c) - c
    ib = ia + 1 + (np.arange(tp) - np.repeat(poffs, c))
    return ia.astype(np.int64), ib.astype(np.int64)


def _segment_pairs(keys: np.ndarray, max_seg: int = MAX_BUCKET):
    """Concatenated within-segment candidate index pairs over a SORTED
    key array: the full triu for segments up to ``max_seg``, and for
    larger (degenerate) segments the triu of the first ``max_seg``
    members PLUS a linear CHAIN over the tail (each tail member paired
    with its predecessor).

    The chain keeps the quadratic cap (pairs per segment is
    O(max_seg² + n), never O(n²)) while preserving CONNECTIVITY: under
    the old drop-the-tail trim, members beyond the cap lost every
    candidate in every band (the per-band segment is sorted by doc id,
    so all bands kept the same head) and near-dup clusters larger than
    the cap silently shattered — measured at the dense ×80 stress:
    29,682 clusters instead of the all-pairs ideal.  With the chain,
    the exact verify still decides every emitted pair, and transitive
    closure reconnects big cliques through verified adjacent pairs.
    Recall in the over-cap regime is no longer all-pairs-exact (a
    chain pair can fail verify where some distant pair would have
    passed) — each capped segment is logged; on the oracle fixtures no
    cap ever fires (band groups ≪ max_seg).

    Fully vectorized (no per-segment Python loop): a dense-near-dup
    corpus produces hundreds of thousands of tiny segments per bucket,
    and a per-segment ``np.triu_indices`` call was ~1 ms of pure
    overhead each — 250 s of the 100k-doc stress (scripts/
    stress_dedup.py) against ~10 s for this closed form."""
    import logging

    empty = np.array([], dtype=np.int64)
    n = len(keys)
    if n == 0:
        return empty, empty
    starts0 = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    ends0 = np.r_[starts0[1:], n]
    sizes0 = ends0 - starts0
    over = sizes0 > max_seg
    if over.any():
        # one summary line per call — a degenerate corpus can cap
        # hundreds of thousands of segments per bucket, and a per-
        # segment log line becomes its own bottleneck
        logging.getLogger(__name__).warning(
            "dedup: %d band segments over the %d cap (largest %d rows): "
            "full triu over the first %d members + predecessor chain over "
            "each tail",
            int(over.sum()), max_seg, int(sizes0[over].max()), max_seg,
        )
    # triu over the (possibly capped) head of each segment
    ends = starts0 + np.minimum(sizes0, max_seg)
    parts_ia, parts_ib = [], []
    ia_h, ib_h = _triu_pairs(starts0, ends)
    if len(ia_h):
        parts_ia.append(ia_h)
        parts_ib.append(ib_h)
    if over.any():
        # predecessor chain over each capped tail: (i, i+1) for
        # i in [start + max_seg - 1, end0 - 1)
        t_start = starts0[over] + max_seg - 1
        t_cnt = ends0[over] - t_start - 1
        tot = int(t_cnt.sum())
        if tot:
            toffs = np.cumsum(t_cnt) - t_cnt
            ia = np.repeat(t_start, t_cnt) + (
                np.arange(tot) - np.repeat(toffs, t_cnt)
            )
            parts_ia.append(ia)
            parts_ib.append(ia + 1)
    if not parts_ia:
        return empty, empty
    return (
        np.concatenate(parts_ia).astype(np.int64),
        np.concatenate(parts_ib).astype(np.int64),
    )


def sorted_pair_dedup(pairs_ds, keys: List[str], aggs: List[tuple] = ()):
    """Exact distributed groupby-aggregate for HIGH-CARDINALITY keys
    (group count ~ row count): one row per key, with optional per-key
    Arrow aggregates for value columns (any associative kernel Arrow
    exposes — ``min``/``max``/``sum``; partials are folded per block
    and re-folded across blocks/boundaries).  Exposed under two names:
    ``sorted_pair_dedup`` (dedup flavor) and ``sorted_group_agg`` (the
    engine's aggregation policy: native Ray groupby for LOW-cardinality
    keys where partial pre-agg collapses each block to a handful of
    rows; this sorted shape when groups number in the millions).

    Ray's native ``groupby(keys).aggregate(...)`` collapses when the
    number of GROUPS reaches millions — measured 202-230 s to reduce
    41M candidate rows to 2.6M distinct pairs at the 100k-doc stress
    (scripts/stress_dedup.py), vs **3.6 s** for this shape:

      per-block Arrow partial dedup  →  range-partition ``sort(keys)``
      →  per-block Arrow dedup  →  boundary stitch

    After the sort every copy of a key is contiguous, so per-block
    dedup leaves at most one surviving PARTIAL row per block boundary
    key.  The stitch MERGES those exactly (it must not just drop one:
    each survivor holds the aggregate over only its own block's copies
    — for a ``sum`` both halves count, and even a ``min`` can live in
    either half): tiny remote tasks fetch each block's (min, max) key
    tuple (bytes to the driver, never the data); the driver walks
    blocks in order — asserting the range-partition contract the same
    way ``pack_bins`` does — and for each boundary-spanning key pulls
    just that key's rows from the affected blocks, drops them there
    remotely, folds the partials with the same Arrow aggregate, and
    appends the merged rows as one extra block.  Driver state is
    O(blocks); full block payloads never leave the object store."""
    import ray
    import ray.data as rd

    aggs = list(aggs)
    agg_cols = [c for c, _ in aggs]
    out_cols = keys + agg_cols

    def block_dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(out_cols)
        g = t.group_by(keys).aggregate([(c, f) for c, f in aggs])
        return g.rename_columns(out_cols)

    # batch_size=None is LOAD-BEARING on the post-sort pass: the fn must
    # see each block whole (probed: None = entire block), else a key run
    # split across sub-block batches would leave un-stitched partials
    ds = (
        pairs_ds.map_batches(block_dedup, batch_format="pyarrow", batch_size=None)
        .sort(keys)
        .map_batches(block_dedup, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    refs = [r for r in ds.to_arrow_refs()]

    @ray.remote
    def key_range(t: pa.Table):
        """Lexicographic (min, max) key tuple of one block — the block may
        be internally unsorted after its group_by, so use sort_indices."""
        if t.num_rows == 0:
            return None
        import pyarrow.compute as pc

        kt = t.select(keys)
        idx = pc.sort_indices(
            kt, sort_keys=[(k, "ascending") for k in keys]
        )
        lo_i, hi_i = idx[0].as_py(), idx[len(idx) - 1].as_py()
        lo = tuple(kt[k][lo_i].as_py() for k in keys)
        hi = tuple(kt[k][hi_i].as_py() for k in keys)
        return lo, hi

    def _key_mask(t: pa.Table, key_tuples) -> np.ndarray:
        m = np.zeros(t.num_rows, dtype=bool)
        for kt in key_tuples:
            mm = np.ones(t.num_rows, dtype=bool)
            for k, v in zip(keys, kt):
                mm &= t[k].to_numpy(zero_copy_only=False) == v
            m |= mm
        return m

    @ray.remote
    def drop_keys(t: pa.Table, key_tuples):
        return t.filter(pa.array(~_key_mask(t, key_tuples)))

    @ray.remote
    def extract_keys(t: pa.Table, key_tuples):
        return t.filter(pa.array(_key_mask(t, key_tuples)))

    ranges = ray.get([key_range.remote(r) for r in refs])
    prev_max = None
    prev_i = None
    live = []  # (block index, ref) with at least one row
    affected: dict = {}  # key tuple -> set of block indices holding a partial
    for i, (ref, rng) in enumerate(zip(refs, ranges)):
        if rng is None:
            continue
        lo, hi = rng
        # full range-partition contract: each block must start AT or
        # ABOVE the previous max (equality = a key straddling the
        # boundary, handled below; anything less means the blocks
        # overlap and a partial would silently survive the stitch)
        if prev_max is not None and lo < prev_max:
            raise RuntimeError(
                "sorted_pair_dedup: sorted block ranges overlap "
                "(Ray to_arrow_refs contract changed) — cannot stitch"
            )
        if prev_max is not None and lo == prev_max:
            affected.setdefault(lo, set()).update((prev_i, i))
        if prev_max is None or hi > prev_max:
            prev_max = hi
            prev_i = i
        live.append((i, ref))
    if not live:
        return ds  # every block empty — already the right (empty) schema
    if affected:
        by_block: dict = {}
        for kt, blocks in affected.items():
            for bi in blocks:
                by_block.setdefault(bi, []).append(kt)
        pulls = {
            bi: extract_keys.remote(refs[bi], kts) for bi, kts in by_block.items()
        }
        new_refs = [
            drop_keys.remote(ref, by_block[i]) if i in by_block else ref
            for i, ref in live
        ]
        partials = [t for t in ray.get(list(pulls.values())) if t.num_rows]
        merged = block_dedup(pa.concat_tables(partials).combine_chunks())
        new_refs.append(ray.put(merged))
        return rd.from_arrow_refs(new_refs)
    return rd.from_arrow_refs([ref for _, ref in live])


sorted_group_agg = sorted_pair_dedup


# --- exact dedup -----------------------------------------------------------

def _content_hash_batch(batch: pa.Table) -> pa.Table:
    fps = [
        hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()
    ]
    return pa.table(
        {"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.string())}
    )


def _exact_partial(batch: pa.Table) -> pa.Table:
    return batch.group_by("fp").aggregate(
        [("doc_id", "min"), ("doc_id", "count")]
    ).rename_columns(["fp", "doc_id", "n_copies"])


def exact_dedup(docs_ds):
    """Hash-partition on content hash, keep first doc per group
    (SURVEY §2.d, A9 Eq/Hash semantics generalized to documents).

    Per-batch partial aggregate, then the global fold via
    ``sorted_pair_dedup``: the fp key is nearly all-unique (group count
    ≈ doc count), exactly the group cardinality where Ray's native
    groupby-aggregate collapses (measured in that docstring)."""
    agg = sorted_pair_dedup(
        docs_ds.map_batches(_content_hash_batch, batch_format="pyarrow")
        .map_batches(_exact_partial, batch_format="pyarrow"),
        ["fp"],
        [("doc_id", "min"), ("n_copies", "sum")],
    )
    return agg.map_batches(
        lambda t: t.select(["doc_id", "n_copies"]), batch_format="pyarrow"
    )


# --- MinHash + LSH near-dedup ---------------------------------------------

def minhash_sketch_batch(batch: pa.Table, shingle_k: int = 3, bands: int = 64) -> pa.Table:
    """text → (band_key, doc_id), one row per band.

    The 128-perm signature is computed locally and immediately reduced to
    its 64 two-row band keys — only 64×16 B per document is ever
    shuffled, never the signature (let alone the text).  At a 0.7
    Jaccard threshold the two-row bands give per-pair recall
    1-(1-0.7²)^64 ≈ 1-5e-19, so the banding stage is effectively exact
    and the downstream EXACT shingle verify decides membership.

    Plain task-based ``map_batches`` body: the sketch has no expensive
    per-worker state (the permutation constants are module-level numpy
    arrays shipped once with the function), so an actor pool would only
    add pool spin-up latency.  The whole sketch runs batch-wide —
    ``word_shingles_flat`` (unique-token crc32 + shifted-window mix64
    folds), ``minhash_signature_flat`` (affine perms +
    ``np.minimum.reduceat``), vectorized band-key mix — with no
    per-doc Python beyond ``str.split``."""
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch["text"].to_pylist()
    flat, slens = word_shingles_flat(texts, shingle_k)
    sigs = minhash_signature_flat(flat, slens)
    keys = band_keys_batch(sigs, bands)  # (n_docs, bands) int64
    cols = {
        "band_key": pa.array(keys.ravel(), pa.int64()),
        "doc_id": pa.array(np.repeat(doc_ids, bands), pa.int64()),
    }
    if "is_new" in batch.column_names:  # delta emission (incremental add)
        flags = batch["is_new"].to_numpy(zero_copy_only=False).astype(np.int8)
        cols["is_new"] = pa.array(np.repeat(flags, bands), pa.int8())
    return pa.table(cols)


def _bucket_candidate_pairs(g: pd.DataFrame) -> pa.Table:
    """Vectorized over one coarse bucket: all band groups inside processed
    with segment arithmetic (sort by band_key → triu per segment), with a
    per-bucket pair dedup before anything is emitted."""
    g = (
        g.drop_duplicates(["band_key", "doc_id"])
        .sort_values(["band_key", "doc_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
        }
    )
    ia, ib = _segment_pairs(g["band_key"].to_numpy())
    if len(ia) == 0:
        return empty
    ids = g["doc_id"].to_numpy()
    df = pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]}).drop_duplicates()
    return from_pandas_clean(df)


def _fold_candidate_pairs(cands):
    """Size-gated cross-band dedup of a MATERIALIZED (doc_a, doc_b)
    candidate dataset: per-bucket pairs are already deduped, so the
    cross-band residue is tiny — fold it on the driver below
    ``SMALL_CAND_LIMIT`` (saves a whole sort-shuffle barrier, the
    dominant cost at bench scale) and fall back to the distributed
    ``sorted_pair_dedup`` above it."""
    import ray
    import ray.data as rd

    if cands.count() <= SMALL_CAND_LIMIT:
        schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
        tbl = concat_nonempty(ray.get(cands.to_arrow_refs()), schema)
        return rd.from_arrow(tbl.group_by(["doc_a", "doc_b"]).aggregate([]))
    return sorted_pair_dedup(cands, ["doc_a", "doc_b"])


def minhash_candidate_pairs(docs_ds, bands: int = 64, shingle_k: int = 3):
    """documents → deduped near-dup candidate pairs (doc_a < doc_b).

    One task-based sketch pass, ONE shuffle (coarse band-key buckets),
    per-bucket vectorized pair emission, then the size-gated cross-band
    dedup (``_fold_candidate_pairs``).  Candidates are UNVERIFIED —
    pipe them through ``minhash_verified_pairs`` for the exact-Jaccard
    filter."""
    banded = docs_ds.map_batches(
        lambda t: minhash_sketch_batch(t, shingle_k, bands), batch_format="pyarrow"
    ).map_batches(_add_key_bucket, batch_format="pyarrow")
    cands = banded.groupby("bucket").map_groups(
        _bucket_candidate_pairs, batch_format="pandas"
    ).materialize()
    return _fold_candidate_pairs(cands)


SMALL_CAND_LIMIT = 500_000  # candidate pairs below which broadcast-verify wins
# above SMALL_CAND_LIMIT the verify path is chosen by the BYTE size of
# the unique texts the candidates actually touch: broadcasting a
# few-hundred-MB text dict once beats hash-joining the (much larger)
# pair table against the corpus twice — measured 59 s of twin joins vs
# ~8 s broadcast at the 100k-doc stress (30 MB of texts, 2.6M pairs).
# The id-pull cap bounds the driver-side unique() over candidate ids.
VERIFY_BROADCAST_BYTE_LIMIT = 256 * 1024 * 1024
VERIFY_BROADCAST_MAX_PAIRS = 50_000_000


def minhash_verified_pairs(
    docs_ds, threshold: float = 0.7, bands: int = 64, shingle_k: int = 3
):
    """Banding candidates → EXACT string-shingle Jaccard verify.

    The standard sketch→join→verify shape, size-gated like the CC
    short-circuit: when the candidate ids fit a driver unique() pass
    (``VERIFY_BROADCAST_MAX_PAIRS``) AND the texts those candidates
    actually touch fit ``VERIFY_BROADCAST_BYTE_LIMIT``, the needed
    texts are fetched with ONE streaming filter pass over the corpus
    and broadcast once via ``ray.put`` — hash-joining the (much
    larger) pair table against the corpus twice ships every text once
    per PAIR side, measured 59 s of joins vs ~8 s broadcast at the
    100k-doc stress.  Above either gate the candidate table is
    hash-joined back onto the documents twice (the true 100-TB path,
    where neither the ids nor the texts fit one heap).
    Either way ``JaccardVerifier`` computes the exact integer-e6
    k-word-shingle Jaccard — precision is exact; recall is the banding
    bound (1-(1-s^r)^b per pair, ~1-5e-19 at the 0.7 threshold), with
    over-cap band groups handled by ``_segment_pairs``' triu+chain cap
    (candidate pairs beyond the quadratic budget are replaced by a
    predecessor chain, so big near-dup cliques stay CONNECTED for the
    downstream transitive closure instead of shattering; each capped
    segment is logged).  On the oracle fixtures no cap fires, so the
    output equals the all-pairs exact-Jaccard ideal the DuckDB oracle
    computes.  Only candidate pairs ever touch the texts again;
    the corpus is never re-shuffled."""
    cand_mat = minhash_candidate_pairs(docs_ds, bands, shingle_k).materialize()
    return _verify_candidates(cand_mat, docs_ds, threshold, shingle_k)


def _verify_candidates(cand_mat, docs_ds, threshold: float, shingle_k: int = 3):
    """Exact-Jaccard verify of a MATERIALIZED candidate pair dataset
    against the documents source — the gated broadcast/twin-join stage
    shared by ``minhash_verified_pairs`` and the incremental add path
    (gate rationale in ``minhash_verified_pairs``'s docstring)."""
    import ray
    import ray.data as rd

    from .joins import hash_join

    thr = int(round(threshold * 1_000_000))
    n_cand = cand_mat.count()
    if n_cand == 0:
        return rd.from_arrow(
            pa.schema(
                [
                    ("doc_a", pa.int64()),
                    ("doc_b", pa.int64()),
                    ("jaccard_e6", pa.int64()),
                ]
            ).empty_table()
        )
    if n_cand <= VERIFY_BROADCAST_MAX_PAIRS:
        # unique touched ids computed DISTRIBUTED (per-batch partial
        # unique); only the id partials reach the driver — never the
        # pair table, whose pull would be wasted if the byte gate below
        # routes to the join path anyway
        def batch_ids(t: pa.Table) -> pa.Table:
            u = np.unique(
                np.concatenate(
                    [
                        t["doc_a"].to_numpy(zero_copy_only=False),
                        t["doc_b"].to_numpy(zero_copy_only=False),
                    ]
                )
            )
            return pa.table({"doc_id": pa.array(u, pa.int64())})

        id_parts = ray.get(
            cand_mat.map_batches(batch_ids, batch_format="pyarrow", batch_size=None).to_arrow_refs()
        )
        ids = np.unique(
            np.concatenate(
                [
                    p["doc_id"].to_numpy(zero_copy_only=False)
                    for p in id_parts
                    if p.num_rows
                ]
            )
        )
        ids_ref = ray.put(pa.array(ids, pa.int64()))

        def fetch_needed(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.is_in(t["doc_id"], value_set=ray.get(ids_ref)))

        needed_mat = docs_ds.map_batches(
            fetch_needed, batch_format="pyarrow"
        ).materialize()
        if (needed_mat.size_bytes() or 0) <= VERIFY_BROADCAST_BYTE_LIMIT:
            needed = concat_nonempty(
                ray.get(needed_mat.to_arrow_refs()),
                pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
            )
            # broadcast as Arrow arrays (zero-copy from the object store,
            # unlike a Python dict which re-deserializes per task) and
            # attach with C-speed index_in/take instead of per-row lookups
            texts_ref = ray.put(
                (needed["doc_id"].combine_chunks(), needed["text"].combine_chunks())
            )
            verifier = JaccardVerifier(shingle_k)

            def attach_and_verify(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                id_arr, text_arr = ray.get(texts_ref)
                pos_a = pc.index_in(t["doc_a"], value_set=id_arr)
                pos_b = pc.index_in(t["doc_b"], value_set=id_arr)
                t = t.append_column(
                    "text_a", pc.take(text_arr, pos_a)
                ).append_column("text_b", pc.take(text_arr, pos_b))
                return verifier(t)

            verified = cand_mat.map_batches(attach_and_verify, batch_format="pyarrow")
            return verified.filter(expr=f"jaccard_e6 >= {thr}")

    ta = docs_ds.map_batches(
        lambda t: pa.table({"doc_a": t["doc_id"], "text_a": t["text"]}),
        batch_format="pyarrow",
    )
    tb = docs_ds.map_batches(
        lambda t: pa.table({"doc_b": t["doc_id"], "text_b": t["text"]}),
        batch_format="pyarrow",
    )
    joined = hash_join(hash_join(cand_mat, ta, on="doc_a"), tb, on="doc_b")
    verified = joined.map_batches(
        JaccardVerifier(shingle_k), batch_format="pyarrow"
    )
    return verified.filter(expr=f"jaccard_e6 >= {thr}")


def minhash_dedup_clusters(docs_ds, threshold: float = 0.7):
    """Full near-dedup: banded candidates → exact-Jaccard verified pairs
    → connected components → one row per doc with its cluster id (min
    doc_id of the component).  Labels are zero-padded decimal strings so
    the CC lexicographic-min label IS the numeric min doc_id."""
    from .clustering import connected_components

    pairs = minhash_verified_pairs(docs_ds, threshold)

    def pad(col):
        return pa.compute.utf8_lpad(
            pa.compute.cast(col, pa.string()), width=12, padding="0"
        )

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table({"addr_a": pad(t["doc_a"]), "addr_b": pad(t["doc_b"])})

    def to_nodes(t: pa.Table) -> pa.Table:
        return pa.table({"address": pad(t["doc_id"])})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow")
    nodes = docs_ds.map_batches(to_nodes, batch_format="pyarrow")
    cc = connected_components(nodes, edges)
    return cc.map_batches(
        lambda t: pa.table(
            {
                "doc_id": pa.compute.cast(t["address"], pa.int64()),
                "cluster_id": pa.compute.cast(t["cluster_id"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _bucket_delta_pairs(g: pd.DataFrame) -> pa.Table:
    """``_bucket_candidate_pairs`` with old-old suppression: the band
    rows carry ``is_new`` and a pair is emitted only when AT LEAST ONE
    side is new — the incremental-add mirror of the resolve blocking
    stage's delta emission (stages/blocking.py).  Old docs' band keys
    are deterministic functions of their text, so the suppressed
    old-old candidates are exactly the ones the previous run already
    verified."""
    g = (
        g.drop_duplicates(["band_key", "doc_id"])
        .sort_values(["band_key", "doc_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    ia, ib = _segment_pairs(g["band_key"].to_numpy())
    if len(ia) == 0:
        return empty
    flags = g["is_new"].to_numpy().astype(bool)
    keep = flags[ia] | flags[ib]
    ia, ib = ia[keep], ib[keep]
    if len(ia) == 0:
        return empty
    ids = g["doc_id"].to_numpy()
    df = pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]}).drop_duplicates()
    return from_pandas_clean(df)


def minhash_incremental_clusters(
    old_docs_ds,
    old_pairs_ds,
    new_docs_ds,
    threshold: float = 0.7,
    bands: int = 64,
    shingle_k: int = 3,
    max_rounds: int = 16,
):
    """Fold a new document stream into an existing near-dedup state —
    the daily-append path.  Returns {"pairs", "clusters"} like
    ``minhash_retract_clusters``; together they give the dedup family
    full add/retract incrementality.

    The expensive work is delta-only: the sketch pass runs over the
    whole corpus (stateless, batch-wide, cheap), but candidate pairs
    with BOTH sides old are suppressed inside the bucket groups
    (``_bucket_delta_pairs``), so the exact-Jaccard text verify — the
    stage that actually fetches documents — touches only new-new and
    new-old pairs.  Old band keys are deterministic functions of the
    text, so the suppressed candidates are exactly the pairs the
    previous run verified: ``add(X) == fresh recompute`` holds for
    pairs and clusters on un-capped corpora (the over-cap chain caveat
    from ``_segment_pairs`` applies, same as retraction).

    Clustering is a full CC over old ∪ delta pairs — the same choice as
    ``incremental_resolve``: the win is never re-verifying old-old
    pairs, and CC over the (slim) pair table is cheap next to the text
    verify.  A new doc can MERGE old clusters (it bridges them), so
    scoped re-labelling would need the merge closure anyway.
    """
    from .clustering import connected_components

    flag = lambda v: lambda t: pa.table(  # noqa: E731
        {
            "doc_id": pa.compute.cast(t["doc_id"], pa.int64()),
            "text": t["text"],
            "is_new": pa.array(np.full(t.num_rows, v, np.int8), pa.int8()),
        }
    )
    docs_flagged = old_docs_ds.map_batches(
        flag(0), batch_format="pyarrow"
    ).union(new_docs_ds.map_batches(flag(1), batch_format="pyarrow"))

    banded = docs_flagged.map_batches(
        lambda t: minhash_sketch_batch(t, shingle_k, bands), batch_format="pyarrow"
    ).map_batches(_add_key_bucket, batch_format="pyarrow")
    delta_cands = (
        banded.groupby("bucket")
        .map_groups(_bucket_delta_pairs, batch_format="pandas")
        .materialize()
    )
    docs_all = docs_flagged.map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
    )
    delta_pairs = _verify_candidates(
        _fold_candidate_pairs(delta_cands).materialize(),
        docs_all,
        threshold,
        shingle_k,
    ).materialize()
    pairs = old_pairs_ds.union(delta_pairs).materialize()

    def pad(col):
        return pa.compute.utf8_lpad(
            pa.compute.cast(col, pa.string()), width=12, padding="0"
        )

    nodes = docs_all.map_batches(
        lambda t: pa.table({"address": pad(t["doc_id"])}), batch_format="pyarrow"
    )
    edges = pairs.map_batches(
        lambda t: pa.table({"addr_a": pad(t["doc_a"]), "addr_b": pad(t["doc_b"])}),
        batch_format="pyarrow",
    )
    clusters = connected_components(nodes, edges, max_rounds).map_batches(
        lambda t: pa.table(
            {
                "doc_id": pa.compute.cast(t["address"], pa.int64()),
                "cluster_id": pa.compute.cast(t["cluster_id"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return {"pairs": pairs, "clusters": clusters.materialize()}


DEDUP_RETRACT_BROADCAST_LIMIT = 2_000_000  # removed / affected ids above this


def _id_array(mat, col: str) -> pa.Array:
    import ray

    parts = [t for t in ray.get(mat.to_arrow_refs()) if t.num_rows]
    if not parts:
        return pa.array([], pa.int64())
    return pa.concat_tables([t.select([col]) for t in parts])[col].combine_chunks()


def minhash_retract_clusters(
    old_pairs_ds, old_clusters_ds, removed_docs_ds, max_rounds: int = 16
):
    """Retraction (deletion / right-to-be-forgotten) for the near-dedup
    family: drop removed docs, garbage-collect the verified pairs that
    touch them, and re-label clusters.  Returns {"pairs", "clusters"} —
    the dedup mirror of ``pipelines.incremental.incremental_retract``.

    Exactness: a verified pair depends only on its two documents (exact
    Jaccard), and on un-capped corpora candidate emission is
    corpus-independent (collide-in-any-band), so the retained pair table
    restricted to survivors equals a full ``minhash_verified_pairs``
    over the reduced corpus and ``retract(add(X)) == never-added`` holds
    for pairs and clusters.  Corpora where the ``_segment_pairs``
    over-cap chain fired carry the chain-shift caveat (a removed doc
    changes its segment's predecessor chain), same as the resolve
    retraction's oversize-block caveat.

    Removing a doc can SPLIT its cluster, and since a cluster's label is
    its min member id, it can also just RENAME it — so every cluster
    that lost a member is re-labelled.  Below
    ``DEDUP_RETRACT_BROADCAST_LIMIT`` only the affected components are
    re-CC'd (untouched components keep membership, edges, and label);
    above it, a full CC over the surviving graph gives the same answer
    with more work.
    """
    import ray
    import ray.data as rd

    from .clustering import connected_components
    from .joins import hash_join

    rem_mat = removed_docs_ds.map_batches(
        lambda t: pa.table({"doc_id": pa.compute.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    n_rem = rem_mat.count()
    if n_rem == 0:
        return {
            "pairs": old_pairs_ds.materialize(),
            "clusters": old_clusters_ds.materialize(),
        }

    if n_rem <= DEDUP_RETRACT_BROADCAST_LIMIT:
        rem_ref = ray.put(_id_array(rem_mat, "doc_id"))

        def gc(t: pa.Table) -> pa.Table:
            rids = ray.get(rem_ref)
            bad = pa.compute.or_(
                pa.compute.is_in(t["doc_a"], value_set=rids),
                pa.compute.is_in(t["doc_b"], value_set=rids),
            )
            return t.filter(pa.compute.invert(bad))

        pairs = old_pairs_ds.map_batches(gc, batch_format="pyarrow").materialize()

        def gc_members(t: pa.Table) -> pa.Table:
            return t.filter(
                pa.compute.invert(
                    pa.compute.is_in(t["doc_id"], value_set=ray.get(rem_ref))
                )
            )

        survivors = old_clusters_ds.map_batches(
            gc_members, batch_format="pyarrow"
        ).materialize()
    else:
        # at-scale path: Bloom-prefiltered exact GC (definite-miss
        # pairs/members bypass the shuffle; exactness preserved by the
        # verify joins on the maybe sliver — see sketches.bloom_pair_gc)
        from .sketches import bloom_anti_join, bloom_pair_gc

        pairs = bloom_pair_gc(
            old_pairs_ds, rem_mat, "doc_a", "doc_b", "doc_id", n_rem
        ).materialize()
        survivors = bloom_anti_join(
            old_clusters_ds, rem_mat, on="doc_id", small_count=n_rem
        ).materialize()

    def pad(col):
        return pa.compute.utf8_lpad(
            pa.compute.cast(col, pa.string()), width=12, padding="0"
        )

    def cc_over(nodes_src, pairs_src):
        nodes = nodes_src.map_batches(
            lambda t: pa.table({"address": pad(t["doc_id"])}), batch_format="pyarrow"
        )
        edges = pairs_src.map_batches(
            lambda t: pa.table({"addr_a": pad(t["doc_a"]), "addr_b": pad(t["doc_b"])}),
            batch_format="pyarrow",
        )
        return connected_components(nodes, edges, max_rounds).map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pa.compute.cast(t["address"], pa.int64()),
                    "cluster_id": pa.compute.cast(t["cluster_id"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    if n_rem > DEDUP_RETRACT_BROADCAST_LIMIT:
        return {"pairs": pairs, "clusters": cc_over(survivors, pairs).materialize()}

    # scoped re-CC: only components that lost a member
    rem_ref2 = ray.put(_id_array(rem_mat, "doc_id"))

    def pick_affected(t: pa.Table) -> pa.Table:
        hit = t.filter(pa.compute.is_in(t["doc_id"], value_set=ray.get(rem_ref2)))
        return pa.table({"cluster_id": pa.compute.unique(hit["cluster_id"])})

    old_cl_mat = old_clusters_ds.materialize()
    id_parts = [
        p
        for p in ray.get(
            old_cl_mat.map_batches(pick_affected, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if p.num_rows
    ]
    aff_ids = (
        pa.concat_tables(id_parts)["cluster_id"].combine_chunks().unique()
        if id_parts
        else pa.array([], pa.int64())
    )
    aff_ref = ray.put(aff_ids)

    untouched = survivors.map_batches(
        lambda t: t.filter(
            pa.compute.invert(
                pa.compute.is_in(t["cluster_id"], value_set=ray.get(aff_ref))
            )
        ),
        batch_format="pyarrow",
    ).materialize()
    aff_members = survivors.map_batches(
        lambda t: t.filter(pa.compute.is_in(t["cluster_id"], value_set=ray.get(aff_ref))),
        batch_format="pyarrow",
    ).materialize()
    if aff_members.count() > DEDUP_RETRACT_BROADCAST_LIMIT:
        return {"pairs": pairs, "clusters": cc_over(survivors, pairs).materialize()}
    aff_doc_ref = ray.put(_id_array(aff_members, "doc_id"))

    # any surviving pair's endpoints share an old component, so one side decides
    sub_pairs = pairs.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(t["doc_a"], value_set=ray.get(aff_doc_ref))
        ),
        batch_format="pyarrow",
    )
    relabeled = cc_over(aff_members, sub_pairs)
    clusters = untouched.map_batches(
        lambda t: t.select(["doc_id", "cluster_id"]), batch_format="pyarrow"
    ).union(relabeled).materialize()
    return {"pairs": pairs, "clusters": clusters}


# --- exact n-gram Jaccard verify ------------------------------------------

NGRAM_PAIRS_MAX_SIDE = 20_000  # guard: all-pairs baseline, not a scale path


def ngram_jaccard_pairs(
    docs_ds, k_shingle: int = 3, cutoff_hex: str = "40", seed: int = 7
):
    """Exact k-word-shingle Jaccard over all pairs of a deterministic
    md5 document sample (doc_a < doc_b, jaccard_e6 = floor(j * 1e6) > 0).

    The sampled side is collected once and broadcast (``ray.put``), each
    batch computes its block-row of the pair matrix — the same labeled
    O(n²) validation-baseline shape as ``cosine_pairs_exact``, guarded
    by ``NGRAM_PAIRS_MAX_SIDE``; the scale path for near-dup discovery
    is MinHash banding (``minhash_candidate_pairs``), for which this is
    the exact-verification oracle query.  Integer floor arithmetic and
    string shingles keep it bit-reproducible in SQL.
    """
    import ray

    from ..functions.hashing import word_shingle_set
    from .sampling import hash_sample

    sample = hash_sample(docs_ds, ["doc_id"], cutoff_hex=cutoff_hex, seed=seed).materialize()
    n = sample.count()
    if n > NGRAM_PAIRS_MAX_SIDE:
        raise ValueError(
            f"ngram_jaccard_pairs is the O(n^2) validation baseline; "
            f"refusing sample of {n} > {NGRAM_PAIRS_MAX_SIDE} docs. Use "
            f"minhash_candidate_pairs at this scale."
        )
    from ..functions.arrowutil import concat_nonempty

    side_t = concat_nonempty(
        ray.get(sample.to_arrow_refs()),
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )
    side = sorted(
        (int(d), word_shingle_set(t, k_shingle))
        for d, t in zip(side_t["doc_id"].to_pylist(), side_t["text"].to_pylist())
    )
    side_ref = ray.put(side)

    def block(batch: pa.Table) -> pa.Table:
        sd = ray.get(side_ref)
        o_a, o_b, o_j = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = word_shingle_set(text, k_shingle)
            for bid, bsh in sd:
                if bid <= did:
                    continue
                inter = len(sh & bsh)
                if inter == 0:
                    continue
                j_e6 = inter * 1_000_000 // (len(sh) + len(bsh) - inter)
                if j_e6 > 0:
                    o_a.append(did)
                    o_b.append(bid)
                    o_j.append(j_e6)
        return pa.table(
            {
                "doc_a": pa.array(o_a, pa.int64()),
                "doc_b": pa.array(o_b, pa.int64()),
                "jaccard_e6": pa.array(o_j, pa.int64()),
            }
        )

    return sample.map_batches(block, batch_format="pyarrow")

class JaccardVerifier:
    """Exact k-word-shingle Jaccard for candidate pairs (needs both texts).

    String shingle sets (collision-free) + integer floor arithmetic
    (``jaccard_e6 = inter * 1e6 // union``) so the value is
    bit-reproducible by the DuckDB ``list_intersect`` oracle."""

    def __init__(self, shingle_k: int = 3):
        self.k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.hashing import word_shingle_set

        ta = batch["text_a"].to_pylist()
        tb = batch["text_b"].to_pylist()
        # a doc in a dense near-dup cluster appears in O(cluster) pairs,
        # so memoize shingle sets per doc id within the batch (measured
        # ~40 pairs/doc at the 100k stress — shingling was ~40x redone)
        da = batch["doc_a"].to_pylist()
        db = batch["doc_b"].to_pylist()
        cache: dict = {}

        def sh(doc_id, text):
            s = cache.get(doc_id)
            if s is None:
                s = cache[doc_id] = word_shingle_set(text, self.k)
            return s

        vals = np.empty(len(ta), dtype=np.int64)
        for i in range(len(ta)):
            sa = sh(da[i], ta[i])
            sb = sh(db[i], tb[i])
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            vals[i] = inter * 1_000_000 // union if union else 1_000_000
        return batch.drop_columns(["text_a", "text_b"]).append_column(
            "jaccard_e6", pa.array(vals, pa.int64())
        )


# --- benchmark decontamination --------------------------------------------

DECONTAM_MAX_EVAL_SHINGLES = 50_000_000  # broadcast guard (~GBs of strings)


def _decontaminate_bloom(train_ds, eval_sh_ds, k_shingle: int):
    """The over-gate decontamination path: the eval shingle set is too
    large to broadcast as strings, so membership is decided in three
    exact-preserving steps:

    1. a Bloom filter over the eval shingles' FOLD HASHES (the same
       token-fold ``word_shingles_flat`` computes per train window, so
       equal strings guarantee equal hashes) is built distributively
       and broadcast — O(2^p) bytes no matter the shingle count.  If
       the optimally-sized bitmap would exceed ``BLOOM_MAX_BYTES`` it
       is CLAMPED to the budget (k re-derived): the false-positive
       rate rises, the output does not change — fps only enlarge the
       verify sliver;
    2. the training stream masks its flat window hashes against the
       bitmap (fully vectorized, same reduceat fold as the broadcast
       path's prefilter); docs with zero maybe-windows — at scale,
       almost all — emit nothing and never touch per-doc Python;
    3. candidate docs emit (doc_id, shingle-string) rows, exact-verified
       with ``bucketed_semi_join`` against the eval shingle strings
       (the union-tag co-location shape — sparse slivers are safe,
       unlike Ray's native join), then folded to (doc_id, n_hits)
       with ``sorted_group_agg`` (n_hits = DISTINCT shared shingles —
       the per-doc shingle sets are already distinct).

    Output is row-identical to the broadcast path (branch equality
    pinned in tests/test_decontaminate_scale.py)."""
    import ray

    from ..functions.hashing import word_shingle_set, word_shingles_flat
    from .joins import bucketed_semi_join
    from .sketches import (
        BLOOM_MAX_BYTES,
        bloom_bits_for,
        bloom_build,
        bloom_maybe_mask,
        hash64_column,
    )

    n = eval_sh_ds.count()
    n_bits, k = bloom_bits_for(n)
    if n_bits // 8 > BLOOM_MAX_BYTES:
        n_bits = BLOOM_MAX_BYTES * 8
        k = max(1, int(round(n_bits / n * 0.6931)))

    def fold_hashes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        hs, _ = word_shingles_flat(t["g"].to_pylist(), k_shingle)
        return pa.table({"h": pa.array(hs, pa.uint64())})

    ev_hashes = eval_sh_ds.map_batches(fold_hashes, batch_format="pyarrow")
    bm_ref = ray.put(bloom_build(ev_hashes, "h", n_bits, k))

    sliver_schema = pa.schema([("doc_id", pa.int64()), ("g", pa.string())])

    def sliver(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return sliver_schema.empty_table()
        texts = t["text"].to_pylist()
        bm = ray.get(bm_ref)
        hs, slens = word_shingles_flat(texts, k_shingle)
        maybe = bloom_maybe_mask(bm, hash64_column(pa.array(hs)), n_bits, k)
        soffs = np.cumsum(slens) - slens
        cand = np.flatnonzero(np.logical_or.reduceat(maybe, soffs))
        ids, gs = [], []
        dids = t["doc_id"].to_pylist()
        for i in cand:
            for g in word_shingle_set(texts[i], k_shingle):
                ids.append(dids[i])
                gs.append(g)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "g": pa.array(gs, pa.string())}
        )

    out_schema = pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())])

    def _stable_empty():
        # rd.from_arrow on an empty table (and a sort over empty
        # blocks) loses the schema (None); mapping an empty_table over
        # a 1-row range keeps it stable
        import ray.data as rd

        return rd.range(1).map_batches(
            lambda _t, s=out_schema: s.empty_table(), batch_format="pyarrow"
        )

    cand_rows = train_ds.map_batches(sliver, batch_format="pyarrow").materialize()
    if cand_rows.count() == 0:  # clean corpus: nothing to verify
        return _stable_empty()
    shared = bucketed_semi_join(cand_rows, eval_sh_ds, on="g")

    def ones(t: pa.Table) -> pa.Table:
        # a re-foldable count: per-row 1 summed twice (sorted_group_agg
        # applies its agg per block AND across blocks — "count" would
        # count the partials instead of summing them)
        return pa.table(
            {
                "doc_id": pa.compute.cast(t["doc_id"], pa.int64()),
                "n_hits": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        )

    folded = sorted_group_agg(
        shared.map_batches(ones, batch_format="pyarrow"),
        keys=["doc_id"],
        aggs=[("n_hits", "sum")],
    ).materialize()
    # an fp-only sliver verifies to zero rows — keep the schema stable
    return folded if folded.count() else _stable_empty()


def decontaminate(train_ds, eval_ds, k_shingle: int = 3):
    """Benchmark decontamination: flag training documents that share any
    exact k-word shingle with an eval/benchmark corpus (the GPT-3 / Pile
    n-gram-overlap rule).

    The eval side is the SMALL side by construction — benchmark suites
    are bounded while the training corpus is the 100-TB stream — so its
    DISTINCT shingle strings are reduced per-batch, unioned on the
    driver, and broadcast ONCE via ``ray.put``; above
    ``DECONTAM_MAX_EVAL_SHINGLES`` the operator switches to the
    DISTRIBUTED Bloom-prefiltered path (``_decontaminate_bloom``)
    instead of declining — same output, no driver-side eval set.
    The training corpus then streams through one
    task-based ``map_batches`` doing set-membership counting per doc —
    the big side is never shuffled, never re-read, never materialized.

    The train-side scan is TWO-PHASE: a fully vectorized hashed-shingle
    prefilter (``word_shingles_flat`` token-fold hashes against the
    sorted hashed eval set — string-equal shingles always hash-equal,
    so the prefilter can only OVER-select via rare 64-bit collisions,
    never miss), then the exact string-set intersection runs only on
    the prefilter hits.  On a clean corpus the no-hit majority never
    touches per-doc Python; the output is decided entirely by the exact
    phase, so it is bit-identical to the single-phase rule.

    Returns ``(doc_id, n_hits)`` for train docs with ≥ 1 shared
    shingle, where ``n_hits`` is the number of DISTINCT shared shingles
    — exact string shingles (same tokenization as ``word_shingle_set``),
    so the DuckDB oracle replays it with list_transform/unnest."""
    import ray

    from ..functions.hashing import word_shingle_set, word_shingles_flat

    def batch_shingles(t: pa.Table) -> pa.Table:
        out = set()
        for txt in t["text"].to_pylist():
            out |= word_shingle_set(txt, k_shingle)
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    eval_sh = eval_ds.map_batches(
        batch_shingles, batch_format="pyarrow"
    ).materialize()
    # per-batch-distinct row count is an UPPER bound on the global
    # distinct shingle count — a cheap gate probe, nothing pulled
    if eval_sh.count() > DECONTAM_MAX_EVAL_SHINGLES:
        return _decontaminate_bloom(train_ds, eval_sh, k_shingle)
    parts = ray.get(eval_sh.to_arrow_refs())
    ev: set = set()
    for p in parts:
        if p.num_rows:
            ev.update(p["g"].to_pylist())
    ev_ref = ray.put(frozenset(ev))
    # hashed mirror of the eval shingle set for the vectorized phase:
    # each shingle STRING hashed with the same token-fold the train
    # side computes per window, so equal strings guarantee equal hashes
    # (tokens carry no whitespace — join is injective on token seqs)
    ev_list = sorted(ev)
    evh_sorted = (
        np.unique(word_shingles_flat(ev_list, k_shingle)[0])
        if ev_list
        else np.empty(0, np.uint64)
    )
    evh_ref = ray.put(evh_sorted)

    def _doc_hits(texts, evh) -> np.ndarray:
        hs, slens = word_shingles_flat(texts, k_shingle)
        idx = np.searchsorted(evh, hs)
        hit = evh[np.minimum(idx, len(evh) - 1)] == hs
        soffs = np.cumsum(slens) - slens  # slens >= 1 always
        return np.logical_or.reduceat(hit, soffs)

    def flag(t: pa.Table) -> pa.Table:
        ids_out: list = []
        hits_out: list = []
        texts = t["text"].to_pylist()
        if texts:
            evh = ray.get(evh_ref)
            if len(evh):
                n = len(texts)
                # adaptive regime probe: on a HEAVILY contaminated
                # corpus (the dense stress: 99% of docs flagged) the
                # full prefilter is pure overhead on top of the exact
                # phase it cannot shrink — measured +2.4 s/100k docs.
                # Prefilter a 1-in-20 sample first; if most sampled
                # docs hit, go straight to the exact phase for all.
                probe = texts[::20]
                probe_rate = float(_doc_hits(probe, evh).mean()) if probe else 0.0
                if probe_rate >= 0.5:
                    cand = np.arange(n)
                else:
                    cand = np.flatnonzero(_doc_hits(texts, evh))
                if len(cand):
                    evs = ray.get(ev_ref)
                    dids = t["doc_id"].to_pylist()
                    for i in cand:
                        hits = len(word_shingle_set(texts[i], k_shingle) & evs)
                        if hits:  # prefilter hits can be hash collisions
                            ids_out.append(dids[i])
                            hits_out.append(hits)
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "n_hits": pa.array(hits_out, pa.int64()),
            }
        )

    return train_ds.map_batches(flag, batch_format="pyarrow")


# --- SimHash ---------------------------------------------------------------

def _simhash_batch(batch: pa.Table) -> pa.Table:
    """Batch-wide sketch + vectorized 16-bit pigeonhole banding (same
    key values as per-doc ``simhash_bands``)."""
    texts = batch["text"].to_pylist()
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    hs = simhash64_batch(texts)  # (n_docs,) uint64
    n_bands = 4
    shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(16)).reshape(1, -1)
    keys = ((hs.reshape(-1, 1) >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
    keys |= np.arange(n_bands, dtype=np.int64).reshape(1, -1) << 16
    return pa.table(
        {
            "band_key": pa.array(keys.ravel(), pa.int64()),
            "doc_id": pa.array(np.repeat(doc_ids, n_bands), pa.int64()),
            "simhash": pa.array(np.repeat(hs, n_bands)),
        }
    )


# SimHash's verify is an int64 xor + popcount (no text fetch), so its
# quadratic budget is far cheaper than the minhash family's: a full cap²
# segment is ~8M integer ops, not 8M string-shingle intersections.  The
# cap therefore sits at 4096 (like the embedding band cap) — 16-bit
# band groups at web scale hold ~n/65536 docs and real corpora stay
# far below it (sf0.1: largest observed group 317, which OVERFLOWED the
# old shared 64 cap and silently chained away 506 oracle pairs).
SIMHASH_MAX_SEGMENT = 4096


def _simhash_pairs(g: pd.DataFrame, max_hamming: int = 3) -> pd.DataFrame:
    """Vectorized over one coarse bucket: per-band segments → candidate
    index pairs → vectorized popcount-based hamming filter."""
    g = (
        g.drop_duplicates(["band_key", "doc_id"])
        .sort_values(["band_key", "doc_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    ia, ib = _segment_pairs(g["band_key"].to_numpy(), SIMHASH_MAX_SEGMENT)
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )
    if len(ia) == 0:
        return empty
    hs = g["simhash"].to_numpy().astype(np.uint64)
    x = hs[ia] ^ hs[ib]
    # vectorized popcount via byte view + unpackbits
    d = np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
    keep = d <= max_hamming
    if not keep.any():
        return empty
    ids = g["doc_id"].to_numpy()
    return from_pandas_clean(pd.DataFrame(
        {
            "doc_a": ids[ia[keep]],
            "doc_b": ids[ib[keep]],
            "hamming": d[keep].astype(np.int64),
        }
    ))


def simhash_near_dups(docs_ds, max_hamming: int = 3):
    """SimHash near-dup pairs: 16-bit band bucketing (pigeonhole-complete
    for hamming<4) → per-bucket hamming verify → cross-band dedup.

    The cross-band dedup runs through ``sorted_pair_dedup`` (Ray's
    native million-group groupby collapses — see that docstring); all
    copies of a pair carry the identical hamming (same two sketches),
    so the per-block min aggregate is a tiebreak no-op."""
    banded = docs_ds.map_batches(_simhash_batch, batch_format="pyarrow").map_batches(
        _add_key_bucket, batch_format="pyarrow"
    )
    pairs = banded.groupby("bucket").map_groups(
        lambda g: _simhash_pairs(g, max_hamming), batch_format="pandas"
    )
    return sorted_pair_dedup(pairs, ["doc_a", "doc_b"], [("hamming", "min")])


# --- cross-document duplicated-window statistics ---------------------------


def dup_window_stats(docs_ds, window: int = 8):
    """Per-doc duplicated-window statistics — the exact-substring
    duplication signal of Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better" (ACL), at fixed k-token window
    granularity instead of a suffix array: a window is DUPLICATED when
    its token sequence occurs >= 2 times corpus-wide (within or across
    docs).  Docs with a high duplicated fraction are boilerplate /
    template / license text the paper shows should be dropped or
    trimmed.

    Distributed shape (two streaming passes, only 16 B window rows
    ever shuffle — the minhash band-row discipline):

    1. per batch, ``word_shingles_flat`` hashes every k-token window
       vectorized; (h, 1) partials fold to corpus-wide window counts
       with ``sorted_group_agg`` (window hashes are the unbounded key
       — exactly the policy's case); hashes with count >= 2 become the
       duplicated set, kept DISTRIBUTED;
    2. a second pass re-emits (doc_id, h) rows, ``bucketed_semi_join``
       keeps the duplicated ones (sparse-safe — a clean corpus has a
       nearly-empty sliver), and one union + ``sorted_group_agg`` fold
       sums per-doc totals and duplicate counts WITHOUT a doc-grain
       join (totals rows carry (n_windows, 0), duplicate rows carry
       (0, 1)).

    64-bit fold hashes stand in for the token sequences, so a
    cross-sequence collision could overcount by ~n²/2⁶⁴ windows —
    approximate in the same sense as the minhash candidate stage;
    pytest pins exact agreement with a brute-force reference on
    collision-free corpora.  Returns (doc_id, n_windows,
    n_dup_windows, dup_win_ppm), one row per doc."""
    from ..functions.hashing import word_shingle_counts, word_shingles_flat
    from .joins import bucketed_semi_join
    from .pools import coalesce_small_blocks

    # heal fragmented materialized inputs: this operator makes three
    # passes over docs_ds and two sort-based shuffles — tiny-block
    # layouts cost O(blocks_in x blocks_out) object slices per shuffle
    docs_ds = coalesce_small_blocks(docs_ds)

    def window_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"h": pa.array([], pa.uint64()), "n": pa.array([], pa.int64())}
            )
        hs, _ = word_shingles_flat(t["text"].to_pylist(), window)
        uniq, cnt = np.unique(hs, return_counts=True)
        return pa.table(
            {"h": pa.array(uniq, pa.uint64()), "n": pa.array(cnt, pa.int64())}
        )

    counts = sorted_group_agg(
        docs_ds.map_batches(window_counts, batch_format="pyarrow"),
        keys=["h"],
        aggs=[("n", "sum")],
    )
    dup_h = counts.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["n"], 2)).select(["h"]),
        batch_format="pyarrow",
    )

    row_schema = pa.schema(
        [("doc_id", pa.int64()), ("h", pa.uint64())]
    )

    def doc_windows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return row_schema.empty_table()
        hs, slens = word_shingles_flat(t["text"].to_pylist(), window)
        dids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(dids, slens), pa.int64()),
                "h": pa.array(hs, pa.uint64()),
            }
        )

    agg_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_windows", pa.int64()),
         ("n_dup_windows", pa.int64())]
    )

    def totals(t: pa.Table) -> pa.Table:
        # counts only — re-running the full crc32+mix64 window-hash
        # pipeline here would be a redundant third hashing pass
        if t.num_rows == 0:
            return agg_schema.empty_table()
        slens = word_shingle_counts(t["text"].to_pylist(), window)
        return pa.table(
            {
                "doc_id": pa.compute.cast(t["doc_id"], pa.int64()),
                "n_windows": pa.array(slens, pa.int64()),
                "n_dup_windows": pa.array(np.zeros(len(slens), np.int64), pa.int64()),
            }
        )

    def dup_ones(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return agg_schema.empty_table()
        return pa.table(
            {
                "doc_id": pa.compute.cast(t["doc_id"], pa.int64()),
                "n_windows": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
                "n_dup_windows": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            }
        )

    dup_rows = bucketed_semi_join(
        docs_ds.map_batches(doc_windows, batch_format="pyarrow"), dup_h, on="h"
    ).map_batches(dup_ones, batch_format="pyarrow")
    total_rows = docs_ds.map_batches(totals, batch_format="pyarrow")
    folded = sorted_group_agg(
        total_rows.union(dup_rows),
        keys=["doc_id"],
        aggs=[("n_windows", "sum"), ("n_dup_windows", "sum")],
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("n_windows", pa.int64()),
                 ("n_dup_windows", pa.int64()), ("dup_win_ppm", pa.int64())]
            ).empty_table()
        nw = t["n_windows"].to_numpy(zero_copy_only=False)
        nd = t["n_dup_windows"].to_numpy(zero_copy_only=False)
        ppm = nd * 1_000_000 // np.maximum(nw, 1)
        return t.append_column("dup_win_ppm", pa.array(ppm, pa.int64()))

    return folded.map_batches(finish, batch_format="pyarrow")


def dedup_cut_spans(docs_ds, window: int = 8, min_count: int = 2,
                    n_buckets: int = 32):
    """Exact-substring span REMOVAL — the rewrite step of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"
    (ACL; their released ``deduplicate-text-datasets`` tool cuts EVERY
    occurrence of any >= k-token window that appears ``min_count``+
    times corpus-wide).  ``dup_window_stats`` computes the per-doc
    signal; this operator applies the cut and returns the corpus with
    duplicated spans excised.

    Semantics (word-token grain, same tokenization as the signal op):
    a window is duplicated when its k-token sequence occurs >=
    ``min_count`` times corpus-wide (within OR across docs — an
    intra-doc repeat counts).  Every token covered by ANY duplicated
    window is dropped; overlapping windows merge into one span.  Docs
    with < ``window`` tokens are a single whole-doc window, so exact
    short-doc duplicates are cut to empty on BOTH sides — the public
    tool's all-occurrences semantics (run exact dedup first if one
    survivor per group should be kept).  Affected docs are re-joined
    with single spaces (token-normalized whitespace); UNAFFECTED docs
    pass through byte-identical.

    Distributed shape (three streaming passes):
    1. corpus-wide window counts — ``word_shingles_flat`` per batch,
       (h, n) partials folded with ``sorted_group_agg`` (window hashes
       are an unbounded key); hashes with n >= min_count become the
       duplicated set, kept DISTRIBUTED;
    2. per-doc (doc_id, pos, h) window-occurrence rows,
       ``bucketed_semi_join``ed against the duplicated set (sparse-safe)
       -> the hit-position sliver, 20 B rows;
    3. ONE union-tag bucket shuffle co-locates each doc with its hit
       positions (the ``bucketed_semi_join`` shape — doc text crosses
       the wire exactly once); per bucket the cut is a diff-array
       interval merge over affected docs only, clean docs never
       re-tokenized.

    64-bit window hashes stand in for token sequences (collision odds
    ~n^2/2^64, the minhash-candidate caveat); pytest pins exact
    agreement with a collision-free token-tuple reference.

    Returns every input doc with the input column set, ``text``
    rewritten, plus ``n_tokens_cut``."""
    import pyarrow.compute as pc

    from ..functions.hashing import word_shingles_flat
    from .joins import bucketed_semi_join
    from .sketches import hash64_column
    from .pools import coalesce_small_blocks

    docs_ds = coalesce_small_blocks(docs_ds)  # see dup_window_stats

    def window_counts(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"h": pa.array([], pa.uint64()), "n": pa.array([], pa.int64())}
            )
        hs, _ = word_shingles_flat(t["text"].to_pylist(), window)
        uniq, cnt = np.unique(hs, return_counts=True)
        return pa.table(
            {"h": pa.array(uniq, pa.uint64()), "n": pa.array(cnt, pa.int64())}
        )

    counts = sorted_group_agg(
        docs_ds.map_batches(window_counts, batch_format="pyarrow"),
        keys=["h"],
        aggs=[("n", "sum")],
    )
    dup_h = counts.map_batches(
        lambda t: t.filter(
            pa.compute.greater_equal(t["n"], min_count)
        ).select(["h"]),
        batch_format="pyarrow",
    )

    occ_schema = pa.schema(
        [("doc_id", pa.int64()), ("pos", pa.int32()), ("h", pa.uint64())]
    )

    def doc_windows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return occ_schema.empty_table()
        hs, slens = word_shingles_flat(t["text"].to_pylist(), window)
        dids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.cumsum(slens) - slens
        pos = np.arange(len(hs), dtype=np.int64) - np.repeat(offs, slens)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(dids, slens), pa.int64()),
                "pos": pa.array(pos.astype(np.int32), pa.int32()),
                "h": pa.array(hs, pa.uint64()),
            }
        )

    hits = bucketed_semi_join(
        docs_ds.map_batches(doc_windows, batch_format="pyarrow"),
        dup_h,
        on="h",
        n_buckets=n_buckets,
    ).select_columns(["doc_id", "pos"])

    ds_schema = docs_ds.schema()
    doc_cols = list(ds_schema.names)
    types = dict(zip(ds_schema.names, ds_schema.types))
    out_schema = pa.schema(
        [(c, types[c]) for c in doc_cols] + [("n_tokens_cut", pa.int64())]
    )

    def tag(is_doc):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            b = (hash64_column(t["doc_id"]) % np.uint64(n_buckets)).astype(
                np.int64
            )
            arrays = {
                "__bucket": pa.array(b, pa.int64()),
                "__is_doc": pa.array([is_doc] * n, pa.bool_()),
            }
            for c in doc_cols:
                arrays[c] = t[c] if c in t.schema.names else pa.nulls(n, types[c])
            arrays["pos"] = (
                pc.cast(t["pos"], pa.int32())
                if "pos" in t.schema.names
                else pa.nulls(n, pa.int32())
            )
            return pa.table(arrays)

        return f

    both = docs_ds.map_batches(tag(True), batch_format="pyarrow").union(
        hits.map_batches(tag(False), batch_format="pyarrow")
    )

    def cut(t: pa.Table) -> pa.Table:
        is_doc = pc.fill_null(t["__is_doc"], False)
        dt = t.filter(is_doc)
        if dt.num_rows == 0:
            return out_schema.empty_table()
        ht = t.filter(pc.invert(is_doc))
        zeros = pa.array(np.zeros(dt.num_rows, np.int64), pa.int64())
        if ht.num_rows == 0:
            return dt.select(doc_cols).append_column("n_tokens_cut", zeros)
        h_did = ht["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h_pos = ht["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(h_did, kind="stable")
        h_did, h_pos = h_did[order], h_pos[order]
        starts = np.flatnonzero(np.r_[True, h_did[1:] != h_did[:-1]])
        ends = np.r_[starts[1:], len(h_did)]
        pos_by_doc = {
            int(h_did[s]): h_pos[s:e] for s, e in zip(starts, ends)
        }
        d_ids = dt["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = dt["text"].to_pylist()
        n_cut = np.zeros(len(texts), np.int64)
        for i, did in enumerate(d_ids):
            ps = pos_by_doc.get(int(did))
            if ps is None:
                continue
            toks = texts[i].split()
            tlen = len(toks)
            if tlen < window:
                # whole-doc window: the single pos-0 window covers all
                n_cut[i] = tlen
                texts[i] = ""
                continue
            # diff-array interval merge: +1 at pos, -1 at pos+window
            diff = np.zeros(tlen + 1, np.int64)
            np.add.at(diff, ps, 1)
            np.add.at(diff, np.minimum(ps + window, tlen), -1)
            covered = np.cumsum(diff[:-1]) > 0
            n_cut[i] = int(covered.sum())
            texts[i] = " ".join(
                tok for tok, c in zip(toks, covered) if not c
            )
        arrays = {c: dt[c] for c in doc_cols}
        arrays["text"] = pa.array(texts, types["text"])
        arrays["n_tokens_cut"] = pa.array(n_cut, pa.int64())
        return pa.table(arrays).cast(out_schema)

    return both.groupby("__bucket").map_groups(cut, batch_format="pyarrow")
