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

from ..functions.arrowutil import from_pandas_clean
from .dedup import _triu_pairs

NODE_COLS = ["address", "local_part", "domain", "local_canon", "domain_canon", "canonical_key"]
MAX_BLOCK_SIZE = 96  # blocks larger than this switch to sorted-neighborhood
SN_WINDOW = 8  # neighborhood width inside oversize blocks
N_PAIR_BUCKETS = 64  # coarse shuffle buckets (explicit partitioned hash join)


def partial_node_agg(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: collapse duplicate surfaces before the global
    shuffle (pre-aggregation — SURVEY §2.d aggregations).  Only
    (address, count) travels through the shuffle — every other node
    column is a deterministic function of the surface and is re-derived
    AFTER the reduce, shrinking the shuffled payload ~6x."""
    return batch.group_by("address").aggregate([("address", "count")]).rename_columns(
        ["address", "n_mentions"]
    )


def _add_addr_bucket(batch: pa.Table, n_buckets: int) -> pa.Table:
    h = pd.util.hash_pandas_object(batch["address"].to_pandas(), index=False)
    return batch.append_column(
        "bucket", pa.array((h % n_buckets).astype(np.int64).to_numpy(), pa.int64())
    )


def _merge_nodes_bucket(df: pd.DataFrame) -> pd.DataFrame:
    return from_pandas_clean(
        df.groupby("address", as_index=False, sort=False)["n_mentions"].sum()
    )


def _rederive_node_columns(batch: pa.Table) -> pa.Table:
    """Rebuild (local_part, domain, local_canon, domain_canon,
    canonical_key) from the surface via the vectorized tokenizer — same
    kernels that produced them during extraction, so values are
    bit-identical."""
    from ..functions.fastpath import tokenize_batch

    t = tokenize_batch(
        pa.table({"address": batch["address"]}), "address", is_lax=True
    )
    cols = {
        "address": batch["address"],
        "local_part": t["local_part"],
        "domain": t["domain"],
        "local_canon": t["local_canon"],
        "domain_canon": t["domain_canon"],
        "canonical_key": t["canonical_key"],
        "n_mentions": batch["n_mentions"],
    }
    if "is_new" in batch.column_names:  # incremental-resolve marker
        cols["is_new"] = batch["is_new"]
    return pa.table(cols)


def build_nodes(mentions_ds, n_buckets: int = N_PAIR_BUCKETS):
    """mentions → one row per unique surface address (+ mention count).

    Partial per-batch (address, count) aggregate, one coarse hash-bucket
    shuffle with a C-speed pandas fold per bucket, then vectorized
    re-derivation of the canonical columns on the (much smaller) unique
    surface set."""
    import ray

    # coalesce before the all-to-all: Ray's sort shuffle degrades with
    # many small map-side blocks (O(maps x reduces) tiny objects), but a
    # fixed width would cap merge parallelism at cluster scale — size it
    # to the CPUs instead
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (
        mentions_ds.map_batches(partial_node_agg, batch_format="pyarrow")
        .map_batches(lambda t: _add_addr_bucket(t, n_buckets), batch_format="pyarrow")
        .repartition(max(8, cpus))
        .groupby("bucket")
        .map_groups(_merge_nodes_bucket, batch_format="pandas")
        .map_batches(_rederive_node_columns, batch_format="pyarrow")
    )


def _dotless(local_canon: pa.ChunkedArray | pa.Array):
    return pc.replace_substring(local_canon, ".", "")


DEL_KEY_MIN_LEN = 6
DEL_KEY_MAX_LEN = 32


def explode_block_keys(batch: pa.Table) -> pa.Table:
    """Blocking-key explode: several (block_key, node...) rows per node.

    Passes (keys always embed the case-folded domain — ``domain_key``;
    the canonical column keeps the verbatim-cased form per reference
    semantics, SURVEY §1.1):

    * ``d`` — full dotless local: canonical-equal surfaces + dot-variants;
    * ``e`` — positional deletion neighborhood (SymSpell-style): one key
      per character position with that character deleted.  Two locals at
      Levenshtein distance 1 by SUBSTITUTION share exactly the key at
      the substituted position — recall for the typo rule is EXACT and
      duplicate-free, with tiny blocks regardless of skew;
    * ``p``/``s`` — 4-char dotless prefix/suffix affixes: candidate
      recall for insertion/deletion-shaped edits (windowed, heuristic).
    """
    dot = _dotless(batch["local_canon"])
    dom = pc.utf8_lower(batch["domain_canon"])
    prefix = pc.utf8_slice_codeunits(dot, 0, 4)
    suffix = pc.utf8_slice_codeunits(pc.utf8_reverse(dot), 0, 4)
    # only the columns a consumer actually reads leave this stage
    # (emit: address/dotless/pass_tag; hot_blocks: block_key) — the
    # node's other columns would otherwise multiply the exploded payload
    base_cols = {"address": batch["address"], "dotless": dot, "domain_key": dom}
    if "is_new" in batch.column_names:  # incremental-resolve marker
        base_cols["is_new"] = batch["is_new"]
    base = pa.table(base_cols)
    parts: List[pa.Table] = []

    def _part(src: pa.Table, key, tag: str) -> pa.Table:
        cols = {
            "address": src["address"],
            "dotless": src["dotless"],
            "block_key": key,
            "pass_tag": pa.array([tag] * src.num_rows, pa.string()),
        }
        if "is_new" in src.column_names:
            cols["is_new"] = src["is_new"]
        return pa.table(cols)

    for tag, key_part in (("d", dot), ("p", prefix), ("s", suffix)):
        key = pc.binary_join_element_wise(dom, pa.scalar(tag), key_part, "|")
        parts.append(_part(base, key, tag))
    # deletion-neighborhood pass, fully vectorized: one Arrow slice-pair
    # per deletion position (<= DEL_KEY_MAX_LEN passes over the batch)
    # instead of a per-node Python loop — the loop was the stage's
    # scalability cap at corpus scale.
    lens = pc.utf8_length(dot)
    eligible = pc.and_(
        pc.greater_equal(lens, DEL_KEY_MIN_LEN),
        pc.less_equal(lens, DEL_KEY_MAX_LEN),
    )
    base_e = base.filter(pc.fill_null(eligible, False))
    if base_e.num_rows:
        lens_e = pc.utf8_length(base_e["dotless"])
        for i in range(DEL_KEY_MAX_LEN):
            sub = base_e.filter(pc.greater(lens_e, i))
            if sub.num_rows == 0:
                break
            d = sub["dotless"]
            deleted = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(d, 0, i),
                pc.utf8_slice_codeunits(d, i + 1, 0x7FFFFFFF),
                "",
            )
            key = pc.binary_join_element_wise(
                sub["domain_key"], pa.scalar(f"e{i}"), deleted, "|"
            )
            parts.append(_part(sub, key, "e"))
    return pa.concat_tables(parts)


# pairs carry ONLY the two surfaces: every other scoring feature is a
# deterministic function of the surface and is re-derived from the (much
# smaller) per-batch unique-address set inside the scorer — shrinks the
# emitted pair payload 4x (the emit stage's cost is string materialization)
_PAIR_SIDE_COLS = ["address"]


def slim_hash_keys(batch: pa.Table, n_buckets: int = N_PAIR_BUCKETS) -> pa.Table:
    """Shuffle-payload minimizer for the pair shuffle: the block-key
    STRING is replaced by its deterministic 64-bit hash (`key_hash`) and
    the pass tag by a single `is_d` flag, so the all-to-all ships only
    (key_hash, bucket, address, dotless, is_d) — the key strings (the
    widest column) never leave the map side.  A 64-bit collision merges
    two blocks, which can only ADD candidate pairs (recall is preserved;
    the scorer filters precision), with ~n²/2⁶⁵ expected extra merges.

    Fuses with ``explode_block_keys`` into one map task, so the dropped
    columns never hit the object store."""
    h = (
        pd.util.hash_pandas_object(batch["block_key"].to_pandas(), index=False)
        .to_numpy()
    )
    cols = {
        "key_hash": pa.array(h.view(np.int64), pa.int64()),
        "bucket": pa.array((h % n_buckets).astype(np.int64), pa.int64()),
        "address": batch["address"],
        "dotless": batch["dotless"],
        "is_d": pc.cast(pc.equal(batch["pass_tag"], "d"), pa.int8()),
    }
    if "is_new" in batch.column_names:
        cols["is_new"] = pc.cast(batch["is_new"], pa.int8())
    return pa.table(cols)


def emit_pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized candidate-pair emission over one whole bucket of blocks.

    All blocks in the bucket are processed with numpy segment arithmetic
    (sort by key_hash → group offsets → concatenated triu indices); the
    per-group Python work is just index-array construction, never pandas
    object creation.  Rules preserved from the per-block version:

    - affix passes (p|/s|) skip pairs with equal dotless locals (those
      are co-blocked by the d| pass — cross-pass dedup with no shuffle);
    - blocks over MAX_BLOCK_SIZE switch to deterministic
      sorted-neighborhood (sort by dotless, window SN_WINDOW) — the
      quadratic cap for skew-hot blocks.
    """
    empty = pa.table(
        {f"{c}_{s}": pa.array([], pa.string()) for c in _PAIR_SIDE_COLS for s in "ab"}
    )
    n = len(df)
    if n < 2:
        return empty
    g = df.sort_values(["key_hash", "address"], kind="mergesort").reset_index(drop=True)
    keys = g["key_hash"].to_numpy()
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    ends = np.r_[starts[1:], n]
    sizes = ends - starts
    dotless = g["dotless"].to_numpy()
    # small blocks: closed-form concatenated triu (shared with the dedup
    # family — one vectorized call for ALL segments in the bucket; the
    # per-segment np.triu_indices loop this replaces was ~1 ms of pure
    # overhead each and sat inside the fused emit+score actor stage that
    # dominates resolve wall time)
    small = sizes <= MAX_BLOCK_SIZE
    ia_h, ib_h = _triu_pairs(starts[small], ends[small])
    ia_parts = [ia_h] if len(ia_h) else []
    ib_parts = [ib_h] if len(ib_h) else []
    # oversize (skew-hot) blocks are rare by construction — keep the
    # deterministic sorted-neighborhood branch per block
    for s, e in zip(starts[~small], ends[~small]):
        sz = e - s
        order = s + np.argsort(dotless[s:e], kind="stable")
        for d in range(1, SN_WINDOW + 1):
            ia_parts.append(order[: sz - d])
            ib_parts.append(order[d:])
    if not ia_parts:
        return empty
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    nond = g["is_d"].to_numpy()[ia] == 0  # p/s/e passes: skip dotless-equal
    keep = ~(nond & (dotless[ia] == dotless[ib]))
    if "is_new" in g.columns:
        # incremental mode: pairs between two already-resolved addresses
        # were scored in a previous run — only pairs touching a new
        # surface leave this stage
        new = g["is_new"].to_numpy() != 0
        keep &= new[ia] | new[ib]
    ia, ib = ia[keep], ib[keep]
    if len(ia) == 0:
        return empty
    out = {}
    for c in _PAIR_SIDE_COLS:
        v = g[c].to_numpy()
        out[f"{c}_a"] = v[ia]
        out[f"{c}_b"] = v[ib]
    return from_pandas_clean(pd.DataFrame(out))


def candidate_pairs(nodes_ds, n_buckets: int = N_PAIR_BUCKETS):
    """nodes → candidate pairs: vectorized key explode, coarse bucket
    shuffle, per-bucket vectorized emission.  Map-side blocks sized to
    the cluster (one per core) so the explode stage scales with added
    CPUs instead of capping at a fixed width."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return (
        nodes_ds.repartition(max(8, cpus))
        .map_batches(explode_block_keys, batch_format="pyarrow")
        .map_batches(
            lambda t: slim_hash_keys(t, n_buckets), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(emit_pairs_bucket, batch_format="pandas")
    )
