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
"""

from __future__ import annotations

import hashlib
from typing import List

import pyarrow as pa


def seeded_random_sample(ds, fraction: float, seed: int):
    return ds.random_sample(fraction, seed=seed)


def hash_sample(ds, key_cols: List[str], cutoff_hex: str = "0d", seed: int = 7):
    """Keep rows whose ``md5("{seed}|{col1}|{col2}|...")`` hex digest is
    lexicographically below ``cutoff_hex`` (a hex-prefix rate knob:
    "0d" ≈ 13/256 ≈ 5.1%).  SQL equivalent::

        WHERE md5(CAST(seed AS VARCHAR) || '|' || col1 || '|' || ...) < '0d'
    """

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
