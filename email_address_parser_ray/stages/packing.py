"""Sequence packing via a distributed prefix scan.

The concat-and-chunk packing used for LLM pre-training batches: lay the
corpus out in a deterministic global order, accumulate token counts,
and assign every document to the fixed-token-budget bin its *start
offset* falls in (``bin = start_offset // cap``).  The hard part is the
global running offset — an inherently sequential scan — done here as
the classic two-pass parallel prefix sum:

1. one pass computes each sorted block's token TOTAL in parallel
   (tiny per-block Ray tasks returning one int each);
2. the driver exclusive-scans the block totals — O(num_blocks) state,
   never row data;
3. a second parallel pass computes each block's LOCAL exclusive cumsum
   and adds its block offset.

This is one of the few operators expressed with raw ``@ray.remote``
tasks rather than ``map_batches``: a prefix scan needs each task to
know its block's position in the global order, which the Dataset map
API deliberately hides.  Partitioning assumption: the input is
range-sorted by ``doc_id`` (Ray's distributed sort provides it); block
refs from ``to_arrow_refs()`` preserve that order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_CAP = 2048

_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("bin", pa.int64())]
)


def _token_counts(batch: pa.Table) -> pa.Table:
    # same whitespace tokenizer as functions/textstats.token_stats
    return pa.table(
        {
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "n_tokens": pc.cast(
                pc.count_substring_regex(batch["text"], r"\S+"), pa.int64()
            ),
        }
    )


def pack_bins(docs_ds, cap: int = DEFAULT_CAP, bpe_model=None):
    """(doc_id, n_tokens, bin) with ``bin = global_start_offset // cap``
    under doc_id order.  ``docs_ds`` must have doc_id + text columns.

    With ``bpe_model`` (a functions.bpe.BpeModel) the budget is
    SUBWORD-token exact: lengths come from the broadcast BPE encoder
    (actor-pool stage, model read once per actor) instead of the
    whitespace regex — the packing scan itself is unchanged."""
    if bpe_model is not None:
        from ..functions.bpe import bpe_token_count_ds

        counts = bpe_token_count_ds(docs_ds, bpe_model).map_batches(
            lambda t: t.rename_columns(["doc_id", "n_tokens"]),
            batch_format="pyarrow",
        )
    else:
        counts = docs_ds.map_batches(_token_counts, batch_format="pyarrow")
    return pack_bins_over_counts(counts, cap)


def pack_bins_over_counts(counts_ds, cap: int = DEFAULT_CAP):
    """The packing prefix scan over ANY dataset carrying (doc_id,
    n_tokens, ...): appends a ``bin`` column, preserving every other
    column — so token-id payloads (list columns Acero joins cannot
    carry) ride along instead of needing a post-hoc join."""
    import ray
    import ray.data as rd

    counts = counts_ds.sort("doc_id")
    refs = counts.to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def block_total(tab: pa.Table):
        if tab.num_columns == 0 or len(tab) == 0:
            return 0, None, None
        return (
            int(pc.sum(tab["n_tokens"]).as_py() or 0),
            int(pc.min(tab["doc_id"]).as_py()),
            int(pc.max(tab["doc_id"]).as_py()),
        )

    @ray.remote(num_cpus=0.5)
    def assign(tab: pa.Table, offset: int, cap: int) -> pa.Table:
        if tab.num_columns == 0:
            return _SCHEMA.empty_table()
        if len(tab) == 0:
            return tab.append_column("bin", pa.array([], pa.int64()))
        n = tab["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        starts = offset + np.concatenate(([0], np.cumsum(n)[:-1]))
        return tab.append_column("bin", pa.array(starts // cap, pa.int64()))

    stats = ray.get([block_total.remote(r) for r in refs])
    totals = [s[0] if isinstance(s, tuple) else s for s in stats]
    # to_arrow_refs() returning blocks in the global sort order is Ray
    # Data internal behavior, not a documented contract — verify it
    # cheaply via the per-block doc_id ranges before trusting offsets
    # (a Ray version change would otherwise scramble bins silently)
    prev_max = None
    for s in stats:
        if not isinstance(s, tuple) or s[1] is None:
            continue
        _, lo, hi = s
        if prev_max is not None and lo <= prev_max:
            raise RuntimeError(
                "pack_bins: to_arrow_refs() blocks are not in global "
                f"doc_id sort order (block min {lo} <= previous max "
                f"{prev_max}); cannot assign prefix offsets"
            )
        prev_max = hi
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1])).astype(np.int64)
    out_refs = [
        assign.remote(r, int(off), int(cap)) for r, off in zip(refs, offsets)
    ]
    return rd.from_arrow_refs(out_refs)
