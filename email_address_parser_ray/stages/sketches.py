"""Mergeable sketch primitives — HyperLogLog distinct counting,
Bloom-filter join prefilters, Count-Min frequency sketches with an
EXACT heavy-hitters operator, and weighted exact-k sampling
(Efraimidis–Spirakis).

At 100 TB the exact machinery for COUNT DISTINCT (two-level groupby)
and anti/semi joins (full hash-partitioned shuffle of BOTH sides) is
often 100x more movement than the question needs.  The two classic
sketches here fix that with the engine's standard partial-combine
shape — per-block numpy partials, one tiny driver fold — and all are
PARTITION-INVARIANT by construction (register max / bitmap OR / count
sum / content-keyed priorities are commutative + associative), so
repartitioning, retries or cluster size cannot change the answer:

* **HyperLogLog** (Flajolet et al. 2007, public algorithm): one uint8
  register file of ``2^p`` bytes per block → ``np.maximum`` fold →
  bias-corrected harmonic-mean estimate with the standard small-range
  (linear counting) and 64-bit large-range corrections.  4 KB of state
  at p=12 summarises any number of rows with ~1.6 % standard error;
  registers are mergeable across days/shards, which is what makes it a
  pipeline primitive rather than a query trick (store the registers,
  never recount).

* **Bloom filter** (Bloom 1970) with Kirsch–Mitzenmacher double
  hashing: per-block OR partials over a caller-sized bitmap, then
  EXACTNESS-PRESERVING join prefilters — ``bloom_anti_join`` /
  ``bloom_semi_join`` split the big side into definite-misses (the
  filter's no-false-negative guarantee decides them outright, no
  shuffle) and maybe-hits (routed through the exact hash join).  The
  output equals the exact join row-for-row; the win is that at scale
  the maybe-hit side is the only data that ever reaches the shuffle.

Both sketches hash with the engine's production key hash (pandas'
stable fixed-key siphash → splitmix64 finisher — the
``fast_partition`` precedent, ``sources/io.py``): deterministic across
processes and machines, no PYTHONHASHSEED, no per-row Python.  Like
``stages/logreg.py`` these are approximate/iterative primitives with
no faithful SQL form, so they are pytest-pinned (accuracy envelope,
partition invariance, merge laws, equality-with-exact-join) rather
than driver-oracled.

Reference analog: none (the reference is a single-value parser); this
file is part of the engine-addition tier alongside dedup/ANN/kmeans.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import mix64

# ---------------------------------------------------------------------------
# shared key hashing
# ---------------------------------------------------------------------------


def hash64_column(col) -> np.ndarray:
    """Arrow array/chunked array → uint64 hashes (vectorized, stable).

    pandas' fixed-key siphash covers strings and ints at C speed;
    mix64 decorrelates it so register/bit indices are uniform."""
    import pandas as pd

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = pd.util.hash_pandas_object(col.to_pandas(), index=False).to_numpy()
    return mix64(h.astype(np.uint64))


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (0 → 0).  Six masked
    shift passes — no float log2, so no rounding cliff at powers of
    two."""
    w = w.copy()
    bl = np.zeros(len(w), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = w >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        w[m] >>= np.uint64(s)
    bl[w > 0] += 1
    return bl


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


def hll_batch_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """uint64 hashes → one (2^p,) uint8 register file: register j holds
    the max over the batch of rho(w) = leading-zero count + 1 of the
    top 64-p hash bits, bucketed by the low p bits."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if len(hashes) == 0:
        return regs
    bucket = (hashes & np.uint64(m - 1)).astype(np.int64)
    w = hashes >> np.uint64(p)
    rho = ((64 - p) - _bit_length_u64(w) + 1).astype(np.uint8)
    np.maximum.at(regs, bucket, rho)
    return regs


def hll_partials(ds, col: str, p: int = 12):
    """Dataset → Dataset of per-block register files (one ~2^p-byte
    binary row per input block).  The partial stream is what a 100-TB
    run persists/merges — O(blocks) rows regardless of input size."""
    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_batch_registers(hash64_column(batch[col]), p)
        return pa.table({"registers": pa.array([regs.tobytes()], pa.binary())})

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=None)


def hll_merge(register_blobs, p: int = 12) -> np.ndarray:
    """Fold any number of register files (bytes) with elementwise max —
    the HLL merge law.  Empty input = empty-set registers."""
    regs = np.zeros(1 << p, np.uint8)
    for blob in register_blobs:
        r = np.frombuffer(blob, np.uint8)
        if len(r) != len(regs):
            raise ValueError(f"register size mismatch: {len(r)} vs {len(regs)}")
        np.maximum(regs, r, out=regs)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimate: bias-corrected harmonic mean, linear
    counting below 2.5m, 64-bit-hash large-range correction."""
    m = len(regs)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            return m * np.log(m / zeros)
    two64 = float(2**64)
    if est > two64 / 30.0:
        return -two64 * np.log1p(-est / two64)
    return float(est)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """End-to-end approximate COUNT(DISTINCT col): distributed register
    partials, tiny driver fold (one 2^p-byte row per block — the ONLY
    thing that ever reaches the driver), estimate.  ~1.04/sqrt(2^p)
    standard error (1.6 % at the default p=12 / 4 KB)."""
    import ray

    blobs = []
    for ref in hll_partials(ds, col, p).to_arrow_refs():
        t = ray.get(ref)
        # zero-row inputs can surface blocks with the input schema
        if "registers" in t.schema.names:
            blobs.extend(t["registers"].to_pylist())
    return hll_estimate(hll_merge(blobs, p))


# ---------------------------------------------------------------------------
# Bloom filter + exactness-preserving join prefilters
# ---------------------------------------------------------------------------

BLOOM_MAX_BYTES = 64 * 1024 * 1024  # driver fold + broadcast budget

_BLOOM_SALT_A = np.uint64(0xA076_1D64_78BD_642F)
_BLOOM_SALT_B = np.uint64(0xE703_7ED1_A0B4_28DB)


def _bloom_indices(hashes: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(n*k,) bit indices via Kirsch–Mitzenmacher double hashing:
    idx_i = (h1 + i*h2) mod n_bits."""
    h1 = mix64(hashes ^ _BLOOM_SALT_A)
    h2 = mix64(hashes ^ _BLOOM_SALT_B) | np.uint64(1)  # odd → full orbit
    i = np.arange(k, dtype=np.uint64).reshape(1, -1)
    with np.errstate(over="ignore"):
        idx = (h1.reshape(-1, 1) + i * h2.reshape(-1, 1)) % np.uint64(n_bits)
    return idx.reshape(-1)


def bloom_bits_for(n_keys: int, fp_rate: float = 0.01) -> tuple:
    """Textbook sizing: (n_bits, k) for a target false-positive rate.
    n_bits = -n ln(fp) / ln(2)^2 rounded up to a byte, k = ln(2)*bits/n."""
    n_keys = max(1, n_keys)
    n_bits = int(np.ceil(-n_keys * np.log(fp_rate) / (np.log(2) ** 2)))
    n_bits = max(64, (n_bits + 7) & ~7)
    k = max(1, int(round(np.log(2) * n_bits / n_keys)))
    return n_bits, min(k, 16)


def bloom_build(ds, col: str, n_bits: int, k: int) -> np.ndarray:
    """Distributed Bloom build: per-block OR partials (one bitmap row
    per block), driver OR fold.  Raises above ``BLOOM_MAX_BYTES`` —
    a filter that big should be sharded by key range instead."""
    import ray

    n_bytes = n_bits // 8
    if n_bytes > BLOOM_MAX_BYTES:
        raise ValueError(
            f"bloom bitmap {n_bytes}B exceeds BLOOM_MAX_BYTES "
            f"({BLOOM_MAX_BYTES}B); shard the filter by key range"
        )

    def partial(batch: pa.Table) -> pa.Table:
        bm = np.zeros(n_bytes, np.uint8)
        if batch.num_rows:
            idx = _bloom_indices(hash64_column(batch[col]), n_bits, k)
            np.bitwise_or.at(bm, (idx >> np.uint64(3)).astype(np.int64),
                             np.left_shift(1, (idx & np.uint64(7)).astype(np.int64)).astype(np.uint8))
        return pa.table({"bitmap": pa.array([bm.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    bm = np.zeros(n_bytes, np.uint8)
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if "bitmap" not in t.schema.names:  # zero-row input block
            continue
        for blob in t["bitmap"].to_pylist():
            np.bitwise_or(bm, np.frombuffer(blob, np.uint8), out=bm)
    return bm


def bloom_maybe_mask(bitmap: np.ndarray, hashes: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """True where ALL k bits are set (maybe present); False = definite
    miss.  No false negatives by construction."""
    if len(hashes) == 0:
        return np.zeros(0, bool)
    idx = _bloom_indices(hashes, n_bits, k)
    bits = (bitmap[(idx >> np.uint64(3)).astype(np.int64)]
            >> (idx & np.uint64(7)).astype(np.uint8)) & 1
    return bits.reshape(-1, k).all(axis=1)


def _bloom_split(big, on: str, bitmap: np.ndarray, n_bits: int, k: int, want_maybe: bool):
    """Filter the big side by the broadcast bitmap (ray.put once, read
    per task — never re-shipped per batch)."""
    import ray

    bm_ref = ray.put(bitmap)

    def keep(batch: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        m = bloom_maybe_mask(bm, hash64_column(batch[on]), n_bits, k)
        return batch.filter(pa.array(m if want_maybe else ~m))

    return big.map_batches(keep, batch_format="pyarrow")


def bloom_anti_join(big, small, on: str, n_bits: int = 0, k: int = 0,
                    small_count: int = 0):
    """EXACT left anti join (rows of ``big`` whose key is absent from
    ``small``) with a Bloom prefilter: definite-misses pass straight
    through (no shuffle at all — at scale this is almost every row);
    only the maybe-hit sliver goes through the exact hash join.
    Auto-sizes the filter from ``small_count`` (or a count() pass)
    when n_bits/k are 0.  Mirrors ``bloom_pair_gc``'s guards: falls
    back to a plain hash join when the small side would want a bitmap
    above ``BLOOM_MAX_BYTES``, and short-circuits when the maybe
    sliver is empty (which also sidesteps Acero's empty-partition join
    failure — see ``bucket_join``)."""
    from .joins import hash_join

    if not n_bits:
        n_bits, k = bloom_bits_for(small_count or small.count())
    if n_bits // 8 > BLOOM_MAX_BYTES:
        return hash_join(big, small.select_columns([on]), on=on,
                         join_type="left_anti")
    bm = bloom_build(small, on, n_bits, k)
    definite_miss = _bloom_split(big, on, bm, n_bits, k, want_maybe=False)
    maybe = _bloom_split(big, on, bm, n_bits, k, want_maybe=True).materialize()
    if maybe.count() == 0:
        return definite_miss
    verified = hash_join(maybe, small.select_columns([on]), on=on,
                         join_type="left_anti")
    return definite_miss.union(verified)


def bloom_semi_join(big, small, on: str, n_bits: int = 0, k: int = 0,
                    small_count: int = 0):
    """EXACT left semi join with a Bloom prefilter: definite-misses are
    dropped before the shuffle; maybe-hits are verified exactly.
    Same guards as ``bloom_anti_join``: plain hash join above
    ``BLOOM_MAX_BYTES``, short-circuit on an empty maybe sliver."""
    from .joins import hash_join

    if not n_bits:
        n_bits, k = bloom_bits_for(small_count or small.count())
    if n_bits // 8 > BLOOM_MAX_BYTES:
        return hash_join(big, small.select_columns([on]), on=on,
                         join_type="left_semi")
    bm = bloom_build(small, on, n_bits, k)
    maybe = _bloom_split(big, on, bm, n_bits, k, want_maybe=True).materialize()
    if maybe.count() == 0:
        return maybe  # empty, big's schema
    return hash_join(maybe, small.select_columns([on]), on=on,
                     join_type="left_semi")


# ---------------------------------------------------------------------------
# Count-Min sketch + exact heavy hitters
# ---------------------------------------------------------------------------

_CMS_ROW_SALTS = mix64(np.arange(64, dtype=np.uint64) ^ np.uint64(0xC0117_51DE))


def cms_batch(hashes: np.ndarray, width: int, depth: int) -> np.ndarray:
    """uint64 hashes → (depth, width) int64 count matrix: row d counts
    into bucket mix64(h ^ salt_d) % width."""
    m = np.zeros((depth, width), np.int64)
    for d in range(depth):
        idx = (mix64(hashes ^ _CMS_ROW_SALTS[d]) % np.uint64(width)).astype(np.int64)
        np.add.at(m[d], idx, 1)
    return m


def cms_build(ds, col: str, width: int = 16384, depth: int = 4) -> np.ndarray:
    """Distributed Count-Min build: per-block count-matrix partials
    (sum-mergeable), driver sum fold.  Estimates are an UPPER bound on
    the true count, within eps*N (eps = e/width) with probability
    1 - exp(-depth).  depth*width*8 bytes of state regardless of rows."""
    import ray

    out = np.zeros((depth, width), np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        m = cms_batch(hash64_column(batch[col]), width, depth)
        return pa.table({"cms": pa.array([m.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if "cms" not in t.schema.names:  # zero-row input block
            continue
        for blob in t["cms"].to_pylist():
            out += np.frombuffer(blob, np.int64).reshape(depth, width)
    return out


def cms_query(cms: np.ndarray, keys) -> np.ndarray:
    """Point-query upper-bound counts for an Arrow array of keys:
    min over the depth rows."""
    depth, width = cms.shape
    h = hash64_column(keys if isinstance(keys, (pa.Array, pa.ChunkedArray)) else pa.array(keys))
    est = np.full(len(h), np.iinfo(np.int64).max, np.int64)
    for d in range(depth):
        idx = (mix64(h ^ _CMS_ROW_SALTS[d]) % np.uint64(width)).astype(np.int64)
        np.minimum(est, cms[d][idx], out=est)
    return est


HEAVY_HITTER_MAX_CANDIDATES = 5_000_000  # driver candidate budget


def heavy_hitters(ds, col: str, phi: float):
    """EXACT phi-heavy hitters (keys with count >= phi * N) in two
    narrow passes, no full-key shuffle:

    1. candidate pass — per block, keys with local count >= phi *
       block_rows.  Pigeonhole guarantees NO false negatives: a key
       below the local threshold in EVERY block sums below phi * N.
       Emits O(1/phi) keys per block regardless of cardinality.
    2. exact verify — candidate set broadcast once (``ray.put``), one
       streaming filtered-count pass, final phi * N cut on the exact
       totals.

    Returns a pyarrow Table (key, count) sorted by count desc, key asc.
    The driver holds only candidates (<= blocks/phi keys), never the
    key universe."""
    import ray

    def local_cands(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"key": pa.array([], batch[col].type)})
        import pyarrow.compute as pc

        # drop_null: value_counts would otherwise surface None as a
        # candidate, and the final (count, key) sort can't order None
        # against concrete keys
        vc = pc.value_counts(pc.drop_null(batch[col].combine_chunks()))
        thr = phi * batch.num_rows
        keep = pc.greater_equal(vc.field("counts"), pa.scalar(int(np.ceil(thr))))
        return pa.table({"key": pc.filter(vc.field("values"), keep)})

    cand_parts = ds.map_batches(local_cands, batch_format="pyarrow", batch_size=None)
    cands = []
    n_cand = 0
    for ref in cand_parts.to_arrow_refs():
        t = ray.get(ref)
        if "key" in t.schema.names:
            a = t["key"].combine_chunks()
            cands.append(a)
            n_cand += len(a)
            # ≤ 1/phi candidates per block by construction; this trips
            # only on a pathological phi for the block count — the ask
            # is then a frequency table, not heavy hitters
            if n_cand > HEAVY_HITTER_MAX_CANDIDATES:
                raise ValueError(
                    f"heavy_hitters: > {HEAVY_HITTER_MAX_CANDIDATES} local "
                    f"candidates (phi={phi} too small for this block "
                    "count); use an exact groupby count instead"
                )
    if not cands:
        return pa.table({"key": pa.array([], pa.string()), "count": pa.array([], pa.int64())})
    cand_arr = pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cands]).unique()
    cand_ref = ray.put(cand_arr)

    def count_cands(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ca = ray.get(cand_ref)
        pos = pc.index_in(batch[col], value_set=ca)
        valid = pc.is_valid(pos)
        counts = np.zeros(len(ca), np.int64)
        np.add.at(counts, pc.filter(pos, valid).to_numpy(zero_copy_only=False), 1)
        # ONE row per batch: the count vector as a blob + the batch's
        # row count (safe even if the executor merges output blocks)
        return pa.table(
            {
                "cnt": pa.array([counts.tobytes()], pa.binary()),
                "n": pa.array([batch.num_rows], pa.int64()),
            }
        )

    totals = np.zeros(len(cand_arr), np.int64)
    n_rows = 0
    for ref in ds.map_batches(count_cands, batch_format="pyarrow", batch_size=None).to_arrow_refs():
        t = ray.get(ref)
        if "cnt" not in t.schema.names:
            continue
        for blob, n in zip(t["cnt"].to_pylist(), t["n"].to_pylist()):
            totals += np.frombuffer(blob, np.int64)
            n_rows += int(n)
    keep = np.flatnonzero(totals >= np.ceil(phi * n_rows))
    keys = cand_arr.to_pylist()
    order = sorted(keep.tolist(), key=lambda i: (-int(totals[i]), keys[i]))
    return pa.table(
        {
            "key": pa.array([keys[i] for i in order], cand_arr.type),
            "count": pa.array([int(totals[i]) for i in order], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Weighted exact-k sampling without replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------


def weighted_sample_k(ds, key_col: str, weight_col, k: int, seed: int = 7,
                      log_weights: bool = False):
    """Deterministic weighted sample of exactly k rows WITHOUT
    replacement: every row gets the Efraimidis–Spirakis priority
    u^(1/w) (u = uniform from mix64(key ^ seed) — content-keyed, so
    partitioning/retries cannot change the draw), and the global top-k
    priorities win.  Distributed as per-block partial top-k (each block
    ships at most k rows) + driver final top-k — the same
    partial-prune shape as grouped_topk.  Zero-weight rows never win;
    equal weights (or ``weight_col=None``) reduce to a uniform
    content-keyed sample — the bottom-k sketch ``approx_quantiles``
    builds on.

    Works on the log scale (ln u / w) for numerical stability.

    ``log_weights=True`` reads ``weight_col`` as LOG weights lw and
    ranks by lw - log(-log u) — the Gumbel-top-k form, order-identical
    to Efraimidis–Spirakis with w = exp(lw) but stable when lw spans
    hundreds of nats (the DSIR importance-weight case, ``stages/
    dsir.py``).  -inf / NaN log weights never win."""
    import ray

    seed_h = mix64(np.uint64(seed))

    def partial_topk(batch: pa.Table):
        if batch.num_rows == 0:
            return batch
        h = hash64_column(batch[key_col])
        # u in (0,1): 53 mantissa bits of the mixed hash
        u = ((mix64(h ^ seed_h) >> np.uint64(11)).astype(np.float64) + 0.5) / float(1 << 53)
        if weight_col is None:
            pri = np.log(u)
        elif log_weights:
            lw = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
            pri = np.where(np.isfinite(lw), lw - np.log(-np.log(u)), -np.inf)
        else:
            w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
            pri = np.where(w > 0, np.log(u) / np.maximum(w, 1e-300), -np.inf)
        keep = np.argsort(-pri, kind="stable")[:k]
        out = batch.take(pa.array(np.sort(keep)))
        pri_kept = pri[np.sort(keep)]
        return out.append_column("__pri", pa.array(pri_kept, pa.float64()))

    # streaming driver fold: keep a running top-k while iterating the
    # per-block partials, so driver state is O(k), not O(blocks × k)
    best = None
    for ref in ds.map_batches(partial_topk, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(ref)
        if "__pri" not in t.schema.names or t.num_rows == 0:
            continue
        best = t if best is None else pa.concat_tables([best, t])
        if best.num_rows > k:
            pri = best["__pri"].to_numpy()
            top = np.argsort(-pri, kind="stable")[:k]
            best = best.take(pa.array(np.sort(top))).combine_chunks()
    if best is None:
        return None
    pri = best["__pri"].to_numpy()
    top = np.argsort(-pri, kind="stable")[:k]
    return best.take(pa.array(np.sort(top))).drop_columns(["__pri"])


# ---------------------------------------------------------------------------
# grouped approximate distinct (HLL per group)
# ---------------------------------------------------------------------------

GROUPED_HLL_MAX_BYTES = 256 * 1024 * 1024  # groups x 2^p driver budget


def grouped_approx_distinct(ds, group_col: str, col: str, p: int = 12):
    """Approximate COUNT(DISTINCT col) GROUP BY group_col for
    LOW-cardinality groups (channels, languages, days — the shapes the
    question is actually asked over): each block emits one
    (group, registers) row per group it contains; the driver max-folds
    per group.  Driver state is groups x 2^p bytes, guarded by
    ``GROUPED_HLL_MAX_BYTES`` (a million-group key wants the exact
    two-level distinct instead — each group is then small).

    Partition-invariant like the global sketch (per-group max-merge).
    Returns a pyarrow Table (group_col, approx_distinct int64) sorted
    by group."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    group_col: pa.array([], batch[group_col].type),
                    "registers": pa.array([], pa.binary()),
                }
            )
        import pyarrow.compute as pc

        # null group keys break the sorted driver fold — drop those rows
        if batch[group_col].null_count:
            batch = batch.filter(pc.is_valid(batch[group_col]))
            if batch.num_rows == 0:
                return pa.table(
                    {
                        group_col: pa.array([], batch[group_col].type),
                        "registers": pa.array([], pa.binary()),
                    }
                )
        gcol = batch[group_col].combine_chunks()
        uniq = gcol.unique()
        inv = pc.index_in(gcol, value_set=uniq).to_numpy(zero_copy_only=False)
        h = hash64_column(batch[col])
        m = 1 << p
        # one register row per group in this batch: bucket offsets by group
        regs = np.zeros((len(uniq), m), np.uint8)
        bucket = (h & np.uint64(m - 1)).astype(np.int64)
        w = h >> np.uint64(p)
        rho = ((64 - p) - _bit_length_u64(w) + 1).astype(np.uint8)
        np.maximum.at(regs.reshape(-1), inv.astype(np.int64) * m + bucket, rho)
        return pa.table(
            {
                group_col: uniq,
                "registers": pa.array([r.tobytes() for r in regs], pa.binary()),
            }
        )

    folded: dict = {}
    budget = 0
    for ref in ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_arrow_refs():
        t = ray.get(ref)
        if "registers" not in t.schema.names:
            continue
        for g, blob in zip(t[group_col].to_pylist(), t["registers"].to_pylist()):
            r = np.frombuffer(blob, np.uint8)
            if g in folded:
                np.maximum(folded[g], r, out=folded[g])
            else:
                folded[g] = r.copy()
                budget += len(r)
                if budget > GROUPED_HLL_MAX_BYTES:
                    raise ValueError(
                        "grouped_approx_distinct: group cardinality exceeds "
                        f"GROUPED_HLL_MAX_BYTES ({GROUPED_HLL_MAX_BYTES}B of "
                        "registers); use the exact two-level distinct for "
                        "high-cardinality group keys"
                    )
    groups = sorted(folded)
    return pa.table(
        {
            group_col: pa.array(groups),
            "approx_distinct": pa.array(
                [int(round(hll_estimate(folded[g]))) for g in groups], pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# pair-table GC with a Bloom prefilter (the retract families' scale path)
# ---------------------------------------------------------------------------


BLOOM_GC_VERIFY_BROADCAST_ROWS = 5_000_000  # maybe-sliver verify gate


def bloom_pair_gc(pairs_ds, removed_ds, col_a: str, col_b: str,
                  removed_col: str, removed_count: int = 0):
    """EXACT removal of pair rows touching any removed id, Bloom-
    prefiltered: ONE filter is built over the removed ids; pair rows
    where BOTH endpoints are definite misses pass straight through
    (at retract scale that is almost every pair — none of them enter
    a shuffle), and only the maybe sliver is verified exactly — below
    ``BLOOM_GC_VERIFY_BROADCAST_ROWS`` via the gated broadcast shape
    (unique maybe-endpoints → one streaming filter over the removed
    set → is_in GC with the hit ids), above it via twin ``left_anti``
    hash joins.  Output is row-identical to plain twin joins over the
    whole pair table (the filter has no false negatives); falls back
    to exactly those when the removed set would want a bitmap above
    ``BLOOM_MAX_BYTES``."""
    import ray

    from .joins import hash_join

    n = removed_count or removed_ds.count()

    def renamed(col):
        return removed_ds.map_batches(
            lambda t, c=col: pa.table({c: t[removed_col]}),
            batch_format="pyarrow",
        )

    def twin_joins(src):
        return hash_join(
            hash_join(src, renamed(col_a), on=col_a, join_type="left_anti"),
            renamed(col_b),
            on=col_b,
            join_type="left_anti",
        )

    n_bits, k = bloom_bits_for(n)
    if n_bits // 8 > BLOOM_MAX_BYTES:
        return twin_joins(pairs_ds)
    bm_ref = ray.put(bloom_build(removed_ds, removed_col, n_bits, k))

    def split(want_maybe: bool):
        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            bm = ray.get(bm_ref)
            m = bloom_maybe_mask(bm, hash64_column(t[col_a]), n_bits, k) | \
                bloom_maybe_mask(bm, hash64_column(t[col_b]), n_bits, k)
            return t.filter(pa.array(m if want_maybe else ~m))

        return f

    definite = pairs_ds.map_batches(split(False), batch_format="pyarrow")
    maybe = pairs_ds.map_batches(split(True), batch_format="pyarrow").materialize()
    if maybe.count() == 0:
        return definite
    if maybe.count() <= BLOOM_GC_VERIFY_BROADCAST_ROWS:
        # the standard gated verify: unique maybe-endpoints (small by
        # construction — true hits + fp_rate of the pairs) → ONE
        # streaming filter pass over the removed set → the hit ids
        # (⊆ endpoints) broadcast for an exact is_in GC.  No shuffle
        # join at all — which also sidesteps Acero's empty-partition
        # join failure on sparse maybe slivers (see bucket_join).
        import pyarrow.compute as pc

        ep_parts = []
        for ref in maybe.to_arrow_refs():
            t = ray.get(ref)
            if t.num_rows:
                ep_parts.append(t[col_a].combine_chunks().unique())
                ep_parts.append(t[col_b].combine_chunks().unique())
        eps = pa.concat_arrays(ep_parts).unique()
        eps_ref = ray.put(eps)

        def hit_ids(t: pa.Table) -> pa.Table:
            keep = pc.is_in(t[removed_col], value_set=ray.get(eps_ref))
            return pa.table({"id": t.filter(keep)[removed_col]})

        hits = []
        for ref in removed_ds.map_batches(
            hit_ids, batch_format="pyarrow"
        ).to_arrow_refs():
            t = ray.get(ref)
            if "id" in t.schema.names and t.num_rows:
                hits.append(t["id"].combine_chunks())
        if not hits:
            return definite.union(maybe)  # every maybe was a false positive
        hit_arr = pa.concat_arrays(hits).unique()
        hit_ref = ray.put(hit_arr)

        def gc(t: pa.Table) -> pa.Table:
            ids = ray.get(hit_ref)
            bad = pc.or_(
                pc.is_in(t[col_a], value_set=ids),
                pc.is_in(t[col_b], value_set=ids),
            )
            return t.filter(pc.invert(bad))

        return definite.union(maybe.map_batches(gc, batch_format="pyarrow"))
    return definite.union(twin_joins(maybe))


# ---------------------------------------------------------------------------
# approximate quantiles from a bottom-k uniform row sample
# ---------------------------------------------------------------------------


def approx_quantiles(ds, value_col: str, key_col: str, qs, k: int = 8192,
                     seed: int = 7):
    """Approximate quantiles of ``value_col`` in ONE streaming pass: a
    deterministic uniform k-row sample (content-keyed bottom-k
    priorities over ``key_col`` — ``weighted_sample_k`` with no
    weights, so partitioning/retries cannot change the draw), then the
    exact quantiles of the sample.  Rank error is the binomial
    O(sqrt(q(1-q)/k)) — ±1.1% of rank at the default k=8192 (2σ) —
    and when the dataset has at most k rows the sample IS the dataset,
    so the result is exact.

    This is the single-pass mergeable complement to the engine's EXACT
    multi-pass radix-refinement quantiles (``dist_quantiles``,
    pipelines/relational.py): use this for monitoring/threshold
    picking, that one when the answer must hash against an oracle.
    ``key_col`` must identify rows (a duplicate key contributes one
    sampled row — duplicates would bias the draw).

    Returns a pyarrow Table (q float64, value float64) using the
    lower-nearest-rank sample quantile (deterministic, no
    interpolation)."""
    sample = weighted_sample_k(ds, key_col, None, k, seed)
    if sample is None or sample.num_rows == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    v = np.sort(
        sample[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    )
    qs = list(qs)
    idx = np.minimum((np.asarray(qs) * len(v)).astype(np.int64), len(v) - 1)
    return pa.table(
        {
            "q": pa.array([float(q) for q in qs], pa.float64()),
            "value": pa.array(v[idx], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# grouped approximate quantiles (per-group bottom-k sample partials)
# ---------------------------------------------------------------------------

GROUPED_QUANTILE_MAX_SAMPLES = 32_000_000  # groups x k driver sample budget


def grouped_approx_quantiles(ds, group_col: str, value_col: str, key_col: str,
                             qs, k: int = 8192, seed: int = 7):
    """Per-group ``approx_quantiles`` for LOW-cardinality group keys
    (the ``grouped_approx_distinct`` shape): each block emits at most
    k (group, priority, value) rows per group it contains — a
    content-keyed bottom-k uniform sample, so partitioning/retries
    cannot change the draw — and the driver merge keeps the global
    bottom-k per group.  Groups with <= k rows carry their ENTIRE
    value set, so their quantiles are exact; larger groups get the
    binomial O(sqrt(q(1-q)/k)) rank error of the global sketch.

    Driver state is groups x k samples, guarded by
    ``GROUPED_QUANTILE_MAX_SAMPLES`` (a million-group key wants the
    exact radix-refinement quantiles instead).  Null group keys are
    dropped (they cannot order in the sorted fold); ``key_col`` must
    identify rows.  Returns a pyarrow Table (group_col, q float64,
    value float64), lower-nearest-rank, sorted by (group, q)."""
    import ray

    seed_h = mix64(np.uint64(seed))

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        empty = pa.table(
            {
                group_col: pa.array([], batch[group_col].type),
                "pri": pa.array([], pa.uint64()),
                "value": pa.array([], pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        if batch[group_col].null_count:
            batch = batch.filter(pc.is_valid(batch[group_col]))
            if batch.num_rows == 0:
                return empty
        gcol = batch[group_col].combine_chunks()
        uniq = gcol.unique()
        inv = pc.index_in(gcol, value_set=uniq).to_numpy(zero_copy_only=False).astype(np.int64)
        h = mix64(hash64_column(batch[key_col]) ^ seed_h)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((v, h, inv))  # (group, pri, value) — total order
        inv_s, h_s, v_s = inv[order], h[order], v[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(inv_s)) + 1])
        within = np.arange(len(inv_s)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(inv_s)]]))
        )
        keep = within < k
        return pa.table(
            {
                group_col: pc.take(uniq, pa.array(inv_s[keep], pa.int64())),
                "pri": pa.array(h_s[keep], pa.uint64()),
                "value": pa.array(v_s[keep], pa.float64()),
            }
        )

    folded: dict = {}
    budget = 0
    for ref in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs():
        t = ray.get(ref)
        if "pri" not in t.schema.names or t.num_rows == 0:
            continue
        groups = t[group_col].to_pylist()
        pris = t["pri"].to_numpy(zero_copy_only=False)
        vals = t["value"].to_numpy(zero_copy_only=False)
        # segment by group (the partial emits group-contiguous rows)
        garr = np.array(groups, dtype=object)
        starts = np.concatenate(
            [[0], np.flatnonzero(garr[1:] != garr[:-1]) + 1, [len(garr)]]
        )
        for s, e in zip(starts[:-1], starts[1:]):
            g = garr[s]
            # keep priorities and values as SEPARATE lexsort keys —
            # np.stack would promote uint64 to float64 and round away
            # the low ~11 priority bits, breaking partition invariance
            # at the k cutoff
            p_new = pris[s:e].astype(np.uint64)
            v_new = vals[s:e]
            if g in folded:
                op, ov = folded[g]
                mp = np.concatenate([op, p_new])
                mv = np.concatenate([ov, v_new])
                budget -= len(op)
            else:
                mp, mv = p_new, v_new
            o = np.lexsort((mv, mp))[:k]
            folded[g] = (mp[o], mv[o])
            budget += len(folded[g][0])
            if budget > GROUPED_QUANTILE_MAX_SAMPLES:
                raise ValueError(
                    "grouped_approx_quantiles: group cardinality x k exceeds "
                    f"GROUPED_QUANTILE_MAX_SAMPLES ({GROUPED_QUANTILE_MAX_SAMPLES}); "
                    "use the exact radix-refinement quantiles for "
                    "high-cardinality group keys"
                )
    qs = [float(q) for q in qs]
    out_g, out_q, out_v = [], [], []
    for g in sorted(folded):
        v = np.sort(folded[g][1])
        idx = np.minimum((np.asarray(qs) * len(v)).astype(np.int64), len(v) - 1)
        out_g.extend([g] * len(qs))
        out_q.extend(qs)
        out_v.extend(v[idx])
    return pa.table(
        {
            group_col: pa.array(out_g),
            "q": pa.array(out_q, pa.float64()),
            "value": pa.array(out_v, pa.float64()),
        }
    )
