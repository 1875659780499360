"""Blocking: unique-address nodes → salted multi-pass block keys → candidate pairs.

The reference's only identity operator is exact ``(local_part, domain)``
equality (rust-lib/src/email_address.rs:78).  The engine extends it to
near-duplicate resolution with recall-safe *multi-pass* blocking over
canonical forms:

* ``d|`` key — domain_canon + full dotless local (catches dot-insertion
  variants and all canonical-equal surfaces),
* ``p|`` key — domain_canon + 4-char dotless prefix,
* ``s|`` key — domain_canon + 4-char dotless suffix.

A single-character typo at position p of the local part breaks at most one
of prefix/suffix keys, so every lev<=1 pair is co-blocked by at least one
pass (locals are >=6 chars under the fuzzy rule).  Keys embed the full
domain, so blocks are naturally fine-grained; a Zipf-hot domain (the skew
case) is split across locals by the p|/s| passes.  Residual mega-blocks
(same domain AND same 4-char affix) are bounded by ``max_block_size`` via
deterministic sorted-neighborhood windowing instead of quadratic emission
— the explicit skew guard the north rule asks for.

All key computation is vectorized Arrow (`pyarrow.compute`); pair
emission is a per-block ``map_groups`` (the hash-shuffle join on the
block key).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

NODE_COLS = ["address", "local_part", "domain", "local_canon", "domain_canon", "canonical_key"]
MAX_BLOCK_SIZE = 256  # blocks larger than this switch to sorted-neighborhood
SN_WINDOW = 8  # neighborhood width inside oversize blocks


def partial_node_agg(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse duplicate surfaces before the global
    shuffle (pre-aggregation — SURVEY §2.d aggregations)."""
    return batch.group_by(NODE_COLS).aggregate([("address", "count")]).rename_columns(
        NODE_COLS + ["n_mentions"]
    )


def merge_nodes(group: pd.DataFrame) -> pd.DataFrame:
    out = group.head(1).copy()
    out["n_mentions"] = group["n_mentions"].sum()
    return out


def build_nodes(mentions_ds):
    """mentions → one row per unique surface address (+ mention count).

    partial per-batch aggregate, then one hash shuffle on the surface."""
    return (
        mentions_ds.map_batches(partial_node_agg, batch_format="pyarrow")
        .groupby("address")
        .map_groups(merge_nodes, batch_format="pandas")
    )


def _dotless(local_canon: pa.ChunkedArray | pa.Array):
    return pc.replace_substring(local_canon, ".", "")


def explode_block_keys(batch: pa.Table) -> pa.Table:
    """Vectorized: 3 (block_key, node...) rows per node, one per blocking pass.

    Keys use the case-folded domain (``domain_key``): domain names compare
    case-insensitively in the engine's matching rules, while the canonical
    column keeps the verbatim-cased form (reference semantics, SURVEY §1.1).
    """
    dot = _dotless(batch["local_canon"])
    dom = pc.utf8_lower(batch["domain_canon"])
    prefix = pc.utf8_slice_codeunits(dot, 0, 4)
    suffix = pc.utf8_slice_codeunits(pc.utf8_reverse(dot), 0, 4)
    base = batch.append_column("dotless", dot).append_column("domain_key", dom)
    parts: List[pa.Table] = []
    for tag, key_part in (("d", dot), ("p", prefix), ("s", suffix)):
        key = pc.binary_join_element_wise(dom, pa.scalar(tag), key_part, "|")
        parts.append(base.append_column("block_key", key).append_column(
            "pass_tag", pa.array([tag] * batch.num_rows, pa.string())
        ))
    return pa.concat_tables(parts)


_PAIR_SIDE_COLS = ["address", "canonical_key", "dotless", "domain_key"]


def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """Per-block candidate pair emission (runs inside groupby(block_key)).

    - affix passes (p|/s|) skip pairs with equal dotless locals: those are
      guaranteed co-blocked by the d| pass (cross-pass dedup without an
      extra shuffle);
    - blocks over max_block_size use deterministic sorted-neighborhood
      (sort by dotless, window SN_WINDOW) — the quadratic-pair cap for
      skewed mega-blocks.
    """
    n = len(group)
    empty = {f"{c}_a": [] for c in _PAIR_SIDE_COLS} | {f"{c}_b": [] for c in _PAIR_SIDE_COLS}
    if n < 2:
        return pd.DataFrame(empty)
    tag = group["pass_tag"].iat[0]
    g = group.sort_values("address").reset_index(drop=True)
    if n <= MAX_BLOCK_SIZE:
        ia, ib = np.triu_indices(n, k=1)
    else:
        g = g.sort_values("dotless", kind="mergesort").reset_index(drop=True)
        offs = [(i, i + d) for d in range(1, SN_WINDOW + 1) for i in range(n - d)]
        ia = np.array([o[0] for o in offs], dtype=np.int64)
        ib = np.array([o[1] for o in offs], dtype=np.int64)
    if tag in ("p", "s"):
        dot = g["dotless"].to_numpy()
        keep = dot[ia] != dot[ib]
        ia, ib = ia[keep], ib[keep]
    if len(ia) == 0:
        return pd.DataFrame(empty)
    out = {}
    for c in _PAIR_SIDE_COLS:
        v = g[c].to_numpy()
        out[f"{c}_a"] = v[ia]
        out[f"{c}_b"] = v[ib]
    return pd.DataFrame(out)


def candidate_pairs(nodes_ds):
    """nodes → candidate pairs: vectorized key explode, then the block-key
    hash shuffle with per-block emission."""
    return (
        nodes_ds.map_batches(explode_block_keys, batch_format="pyarrow")
        .groupby("block_key")
        .map_groups(emit_pairs, batch_format="pandas")
    )
