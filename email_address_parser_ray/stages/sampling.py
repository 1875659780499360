"""Seeded sampling operators (SURVEY §2.d sampling).

Two flavors:

* ``seeded_random_sample`` — thin wrapper over Ray Data's native
  ``Dataset.random_sample(fraction, seed=...)``: per-block vectorized
  Bernoulli keep-mask, streaming, no shuffle.  Reproducible for a fixed
  seed + partitioning, but NOT partition-independent — resharding the
  input changes which rows are kept.
* ``hash_sample`` — content-keyed deterministic sampling: keep a row
  iff ``md5(seed|key_cols...)`` falls below the rate cutoff.  Stable
  under any repartitioning / retry / cluster size (the property a
  resumable 100-TB export needs for held-out splits), and exactly
  reproducible in SQL (DuckDB ``md5``) — this is the oracle-checked
  variant.
* ``fast_hash_sample`` / ``fast_mixture_sample`` — the production hot
  path: the same content-keyed invariants via the splitmix64 finalizer
  over an int64 key at numpy speed (the md5 variants burn ~1-2 µs/row
  of Python hashing, the dominant cost at 10^12 rows).
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa


def seeded_random_sample(ds, fraction: float, seed: int):
    return ds.random_sample(fraction, seed=seed)


def _norm_cutoff(cutoff: str) -> str:
    """Lowercase a hex-prefix cutoff and reject non-hex input (digest
    comparisons are against lowercase hex, so 'CC' would match nothing)."""
    c = cutoff.lower()
    if c and set(c) - set("0123456789abcdef"):
        raise ValueError(f"cutoff {cutoff!r} is not a hex prefix")
    return c


def hash_sample(ds, key_cols: List[str], cutoff_hex: str = "0d", seed: int = 7):
    """Keep rows whose ``md5("{seed}|{col1}|{col2}|...")`` hex digest is
    lexicographically below ``cutoff_hex`` (a hex-prefix rate knob:
    "0d" ≈ 13/256 ≈ 5.1%).  SQL equivalent::

        WHERE md5(CAST(seed AS VARCHAR) || '|' || col1 || '|' || ...) < '0d'
    """
    cutoff_hex = _norm_cutoff(cutoff_hex)

    def keep(batch: pa.Table) -> pa.Table:
        cols = [batch[c].to_pylist() for c in key_cols]
        mask = [
            hashlib.md5(
                ("|".join([str(seed)] + [str(v) for v in vals])).encode("utf-8")
            ).hexdigest()
            < cutoff_hex
            for vals in zip(*cols)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def fast_hash_sample(ds, key_col: str, rate_ppm: int, seed: int = 7):
    """Production-grade vectorized sampler: splitmix64 over an int64 key
    column, ~numpy speed (no per-row Python, no md5).

    Same invariants as ``hash_sample`` — content-keyed, so the sample is
    deterministic across partitioning, retries and cluster size — but
    ~1000x cheaper per row, which is what matters at 10^12 rows.  The
    md5-based samplers remain the SQL-replayable oracle path; this is
    the hot path (a row is kept iff
    ``mix64(key ^ mix64(seed)) % 1e6 < rate_ppm``)."""
    from ..functions.hashing import mix64

    if not 0 <= rate_ppm <= 1_000_000:
        raise ValueError(f"rate_ppm {rate_ppm} outside [0, 1e6]")
    seed_h = mix64(np.uint64(seed))

    def keep(batch: pa.Table) -> pa.Table:
        k = (
            batch[key_col]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        h = mix64(k ^ seed_h)
        mask = (h % np.uint64(1_000_000)) < np.uint64(rate_ppm)
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def fast_mixture_sample(
    ds,
    source_col: str,
    rates_ppm: dict,
    key_col: str,
    default_ppm: int = 0,
    seed: int = 7,
):
    """Vectorized weighted data mixing: per-source keep rates in ppm,
    splitmix64-keyed on an int64 column.  The per-row source→rate lookup
    is an Arrow dictionary probe (``pc.index_in``), never a Python loop;
    same determinism contract as ``fast_hash_sample``."""
    import pyarrow.compute as pc

    from ..functions.hashing import mix64

    for v in list(rates_ppm.values()) + [default_ppm]:
        if not 0 <= v <= 1_000_000:
            raise ValueError(f"rate {v} ppm outside [0, 1e6]")
    names = pa.array(list(rates_ppm.keys()), pa.string())
    rates = np.fromiter(rates_ppm.values(), dtype=np.uint64, count=len(rates_ppm))
    seed_h = mix64(np.uint64(seed))

    def keep(batch: pa.Table) -> pa.Table:
        if len(rates) == 0:
            # empty rate table: every row is a miss and takes default_ppm
            # (fancy-indexing the empty rates array would IndexError)
            row_rate = np.full(batch.num_rows, default_ppm, dtype=np.uint64)
        else:
            idx = pc.index_in(batch[source_col], value_set=names)
            idx_np = (
                pc.fill_null(idx, -1).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            miss = idx_np < 0
            row_rate = np.where(
                miss, np.uint64(default_ppm), rates[np.where(miss, 0, idx_np)]
            )
        k = (
            batch[key_col]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        h = mix64(k ^ seed_h)
        mask = (h % np.uint64(1_000_000)) < row_rate
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def mixture_sample(
    ds,
    source_col: str,
    cutoffs: dict,
    key_cols: List[str],
    default_cutoff: str = "00",
    seed: int = 7,
):
    """Weighted mixture sampling — the training-data 'data mixing'
    primitive: each row is kept iff ``md5("{seed}|{keys...}")`` falls
    below its SOURCE's hex cutoff, so every source is downsampled at its
    own rate (e.g. {"web": "1a", "books": "cc"} ≈ 10% web, 80% books).

    Content-keyed like ``hash_sample``: the mix is invariant to
    partitioning, retries and cluster size, and exactly reproducible in
    SQL with a CASE over the source column."""
    # md5 hexdigests are always lowercase: an uppercase cutoff like "CC"
    # would silently keep ~0 rows, so normalize and validate up front
    cutoffs = {k: _norm_cutoff(v) for k, v in cutoffs.items()}
    default_cutoff = _norm_cutoff(default_cutoff)

    def keep(batch: pa.Table) -> pa.Table:
        srcs = batch[source_col].to_pylist()
        cols = [batch[c].to_pylist() for c in key_cols]
        mask = [
            hashlib.md5(
                ("|".join([str(seed)] + [str(v) for v in vals])).encode("utf-8")
            ).hexdigest()
            < cutoffs.get(src, default_cutoff)
            for src, vals in zip(srcs, zip(*cols))
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(keep, batch_format="pyarrow")


def temperature_mixture_rates(ds, source_col: str, alpha: float = 0.3):
    """Temperature-based mixture rates — the multilingual sampling rule
    of Lample & Conneau 2019 (XLM) / Conneau et al. 2020 (XLM-R):
    resample sources to q_i ∝ p_i^alpha (p_i the corpus share), which
    upweights small sources and flattens the head as alpha → 0.

    One streaming pass of per-batch ``value_counts`` partials (source
    is a low-cardinality key — the driver fold holds O(sources ×
    blocks) tiny rows, never row data; nulls are dropped before
    counting).  The per-source Bernoulli keep rates realize the q
    mixture at the LARGEST feasible size: r_i ∝ n_i^(alpha-1),
    normalized so the most-upweighted (smallest) source keeps 100%.

    Returns ``(rates_ppm, counts)`` — the {source: keep-rate ppm} dict
    ready for ``fast_mixture_sample`` and the exact per-source counts
    (ship both in the run's lineage)."""
    import ray

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha {alpha} outside [0, 1]")
    import pyarrow.compute as pc

    part_schema = pa.schema([("src", pa.string()), ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        vc = pc.value_counts(pc.drop_null(t[source_col]))
        if len(vc) == 0:
            return part_schema.empty_table()
        return pa.table(
            {
                "src": pc.cast(vc.field("values"), pa.string()),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    counts: dict = {}
    for ref in (
        ds.select_columns([source_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()
    ):
        t = ray.get(ref)
        if "src" in t.schema.names and t.num_rows:
            for s, n in zip(t["src"].to_pylist(), t["n"].to_pylist()):
                counts[s] = counts.get(s, 0) + int(n)
    if not counts:
        return {}, {}
    srcs = sorted(counts)
    n = np.array([counts[s] for s in srcs], np.float64)
    ratio = n ** (alpha - 1.0)  # q_i / n_i up to a constant
    rates = np.floor(1_000_000.0 * ratio / ratio.max()).astype(np.int64)
    return {s: int(r) for s, r in zip(srcs, rates)}, counts


def temperature_mixture_sample(
    ds, source_col: str, key_col: str, alpha: float = 0.3, seed: int = 7
):
    """Derive temperature rates from the data and apply them in one
    call: ``fast_mixture_sample`` with ``temperature_mixture_rates``.
    Returns ``(sampled_ds, rates_ppm, counts)`` so the realized mix and
    its inputs can ship in lineage.  Content-keyed on ``key_col`` —
    partition/retry/cluster-size invariant like every sampler here."""
    rates, counts = temperature_mixture_rates(ds, source_col, alpha)
    return (
        fast_mixture_sample(ds, source_col, rates, key_col, seed=seed),
        rates,
        counts,
    )
