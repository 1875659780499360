"""End-to-end LLM pretraining data preparation — the composition the
engine's training-data operators exist for, as ONE pipeline:

    raw documents
      → exact dedup            (content-hash, sorted_group_agg fold)
      → line dedup (opt)       (CCNet corpus-wide frequent-line scrub,
                                keep-first — ``stages/lines.py``)
      → near-dedup             (MinHash+LSH clusters, keep min-id rep)
      → semantic dedup (opt)   (SemDeDup over a caller-supplied
                                vec_id==doc_id embedding table)
      → span cut (opt)         (Lee et al. exact-substring duplicated-
                                span removal — ``dedup_cut_spans``)
      → decontamination        (eval n-gram overlap, Bloom path above
                                the broadcast gate)
      → quality filter         (token count + Gopher top-word ppm)
      → DSIR selection (opt)   (importance resampling toward a target
                                corpus — ``stages/dsir.py``)
      → BPE training           (distributed word counts, capped driver)
      → token-exact packing    (prefix-scan bins over BPE counts)
      → resumable export       (hash-partitioned parquet + manifests)

Every stage is one of the engine's tested operators; this module only
wires them and carries a per-stage row-count lineage (the
``pipeline_counters`` discipline).  Filters are ANTI/SEMI joins that
never broadcast an unbounded side: survivors flow through
``bucketed_semi_join`` (one union-tag shuffle, sparse-safe), and the
decontamination drop list is broadcast only under an explicit row
gate, with the Bloom-prefiltered exact anti join above it.

Intermediate survivor sets are ``materialize()``-d once each — every
one is consumed at least twice (its own count + the next stage), so
this trades object-store blocks for avoided recompute, never driver
memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DROP_BROADCAST_ROWS = 2_000_000  # flagged-id broadcast gate


def _mat(ds):
    """Materialize a survivor set AND heal its block layout: each
    bucket-shuffle stage leaves ~3x more (and proportionally smaller)
    blocks than it read, and sort-based shuffles cost
    O(blocks_in x blocks_out) object slices — chained stages go
    quadratic on a fragmented layout (measured 28 s -> 377 s for the
    all-options pipeline at sf0.1 before this).  ``coalesce_small_blocks``
    is a no-op at production block sizes."""
    from ..stages.pools import coalesce_small_blocks

    return coalesce_small_blocks(ds.materialize())


def _semi(docs, keep_ids):
    from ..stages.joins import bucketed_semi_join

    return bucketed_semi_join(docs, keep_ids, on="doc_id")


def _anti_ids(docs, drop_ds, n_drop: int):
    """Drop rows whose doc_id is in ``drop_ds`` — broadcast is_in under
    the gate, Bloom-prefiltered exact anti join above it."""
    import ray

    if n_drop == 0:
        return docs
    if n_drop <= DROP_BROADCAST_ROWS:
        parts = []
        for r in drop_ds.to_arrow_refs():
            t = ray.get(r)
            if "doc_id" in t.schema.names and t.num_rows:
                parts.append(t["doc_id"].combine_chunks())
        ids_ref = ray.put(pa.concat_arrays(parts))

        def drop(t: pa.Table) -> pa.Table:
            return t.filter(
                pc.invert(pc.is_in(t["doc_id"], value_set=ray.get(ids_ref)))
            )

        return docs.map_batches(drop, batch_format="pyarrow")
    from ..stages.sketches import bloom_anti_join

    return bloom_anti_join(
        docs, drop_ds.select_columns(["doc_id"]), on="doc_id", small_count=n_drop
    )


def pretrain_prep(
    docs_ds,
    eval_ds,
    out_dir: str,
    num_merges: int = 256,
    cap: int = 2048,
    min_tokens: int = 5,
    max_top_tok_ppm: int = 500_000,
    n_partitions: int = 16,
    jaccard: float = 0.7,
    langs=None,
    quality_lm=None,
    max_nll_e6: int = 0,
    embeddings_ds=None,
    semdedup_eps: float = 0.03,
    semdedup_k: int = 128,
    line_dedup: bool = False,
    cut_spans_window: int = 0,
    dsir_target_ds=None,
    dsir_k: int = 0,
    bpe_pretok: str = "ascii",
):
    """Run the full prep over a (doc_id, text) dataset against an eval
    corpus.  Returns (manifests, counters, bpe_model): the resumable
    export's per-partition manifests, the per-stage row-count lineage,
    and the trained tokenizer (ship it with the shards — ids are
    meaningless without it)."""
    from ..functions.bpe import bpe_encode_ds, train_bpe
    from ..functions.textstats import repetition_stats, token_stats
    from ..sources.io import write_partitioned
    from ..stages.dedup import decontaminate, exact_dedup, minhash_dedup_clusters
    from ..stages.packing import pack_bins_over_counts

    counters = {}
    docs = _mat(docs_ds)
    counters["input_docs"] = docs.count()

    # 1. exact dedup — cheap content-hash pre-pass shrinks everything after
    keep_exact = exact_dedup(docs).select_columns(["doc_id"])
    docs = _mat(_semi(docs, keep_exact))
    counters["after_exact_dedup"] = docs.count()

    # 1b. optional CCNet line dedup: frequent-line boilerplate scrubbed
    # keep-first; docs whose every line was boilerplate drop entirely
    if line_dedup:
        from ..stages.lines import remove_frequent_lines

        scrubbed = _mat(remove_frequent_lines(docs))
        counters["lines_cut"] = int(scrubbed.sum("n_lines_cut") or 0)
        docs = _mat(scrubbed.map_batches(
            lambda t: t.filter(
                pc.invert(pc.equal(t["text"], ""))
            ).drop_columns(["n_lines_cut"]),
            batch_format="pyarrow",
        ))
        counters["after_line_dedup"] = docs.count()

    # 2. near-dedup — keep each cluster's min-id representative
    clusters = minhash_dedup_clusters(docs, threshold=jaccard)
    reps = clusters.map_batches(
        lambda t: t.filter(pc.equal(t["doc_id"], t["cluster_id"])).select(
            ["doc_id"]
        ),
        batch_format="pyarrow",
    )
    docs = _mat(_semi(docs, reps))
    counters["after_near_dedup"] = docs.count()

    # 2b. optional SemDeDup semantic dedup stage (Abbas et al. 2023)
    # when the caller supplies a (vec_id == doc_id, embedding) table:
    # duplicate groups among the SURVIVING docs resolve to their
    # lowest-centroid-sim member; docs without an embedding row pass
    # through untouched (they cannot be semantically compared)
    if embeddings_ds is not None:
        from ..stages.ann import semantic_dedup
        from ..stages.joins import bucketed_semi_join

        ids_as_vec = docs.select_columns(["doc_id"]).map_batches(
            lambda t: t.rename_columns(["vec_id"]), batch_format="pyarrow"
        )
        emb_surv = bucketed_semi_join(
            embeddings_ds.select_columns(["vec_id", "embedding"]),
            ids_as_vec,
            on="vec_id",
        )
        sd = semantic_dedup(emb_surv, k=semdedup_k, eps=semdedup_eps)
        drop_sem = sd.map_batches(
            lambda t: t.filter(pc.invert(t["keep"]))
            .select(["vec_id"])
            .rename_columns(["doc_id"]),
            batch_format="pyarrow",
        ).materialize()
        n_sem = drop_sem.count()
        counters["semdedup_dropped"] = n_sem
        docs = _mat(_anti_ids(docs, drop_sem, n_sem))
        counters["after_semdedup"] = docs.count()

    # 2c. optional exact-substring span cut (Lee et al. 2022): windows
    # duplicated corpus-wide among the SURVIVORS are excised from every
    # doc; docs cut to nothing drop
    if cut_spans_window:
        from ..stages.dedup import dedup_cut_spans

        cut = _mat(dedup_cut_spans(docs, window=cut_spans_window))
        counters["tokens_cut"] = int(cut.sum("n_tokens_cut") or 0)
        docs = _mat(cut.map_batches(
            lambda t: t.filter(
                pc.invert(pc.equal(t["text"], ""))
            ).drop_columns(["n_tokens_cut"]),
            batch_format="pyarrow",
        ))
        counters["after_cut_spans"] = docs.count()

    # 3. decontamination — drop flagged docs
    flagged = decontaminate(docs, eval_ds).materialize()
    counters["contaminated"] = n_flagged = flagged.count()
    docs = _mat(_anti_ids(docs, flagged, n_flagged))
    counters["after_decontaminate"] = docs.count()

    # 4. quality filter — whitespace token floor + Gopher top-word ppm
    # (+ optional language allow-list, e.g. langs=("en",))
    def quality(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        toks = token_stats(t)["n_tokens"].to_numpy(zero_copy_only=False)
        rep = repetition_stats(t)["top_tok_ppm"].to_numpy(zero_copy_only=False)
        keep = (toks >= min_tokens) & (rep <= max_top_tok_ppm)
        if langs is not None:
            from ..functions.textstats import lang_id

            pred = np.array(lang_id(t)["lang_pred"].to_pylist(), dtype=object)
            keep &= np.isin(pred, np.array(list(langs), dtype=object))
        return t.filter(pa.array(keep))

    docs = _mat(docs.map_batches(quality, batch_format="pyarrow"))
    counters["after_quality"] = docs.count()

    # 4b. optional LM-perplexity filter (the CCNet rule): a caller-
    # provided trusted-text BigramLM scores every survivor; docs above
    # the nll budget drop.  The LM is trained on TRUSTED text, not this
    # corpus — pass it in.
    if quality_lm is not None and max_nll_e6:
        from ..stages.ngram_lm import score_docs_nll

        flagged_lm = score_docs_nll(docs, quality_lm).map_batches(
            lambda t: t.filter(
                pc.greater(t["nll_e6"], pa.scalar(max_nll_e6, pa.int64()))
            ).select(["doc_id"]),
            batch_format="pyarrow",
        ).materialize()
        n_lm = flagged_lm.count()
        counters["lm_filtered"] = n_lm
        docs = _mat(_anti_ids(docs, flagged_lm, n_lm))
        counters["after_lm_filter"] = docs.count()

    # 4c. optional DSIR selection (Xie et al. 2023): resample dsir_k
    # survivors toward the target corpus's hashed-ngram distribution
    # (the driver holds the k winning ids — the weighted_sample_k
    # contract; dsir_k is the selection budget, not the corpus size)
    if dsir_target_ds is not None and dsir_k:
        import ray

        from ..stages.dsir import dsir_select_k

        sel = dsir_select_k(docs, dsir_target_ds, k=dsir_k)
        keep_ids = ray.data.from_arrow(sel.select(["doc_id"]))
        docs = _mat(_semi(docs, keep_ids))
        counters["after_dsir"] = docs.count()

    # 5-6. BPE training, id encoding, token-exact packing — the bin
    # scan runs directly over the encoded rows (token_ids ride along;
    # Acero joins cannot carry list columns, so no post-hoc join)
    model = train_bpe(docs, num_merges=num_merges, pretok=bpe_pretok)
    encoded = bpe_encode_ds(docs, model).map_batches(
        lambda t: t.rename_columns(["doc_id", "token_ids", "n_tokens"]),
        batch_format="pyarrow",
    )
    packed = pack_bins_over_counts(encoded, cap=cap).materialize()
    counters["packed_docs"] = packed.count()

    # 7. resumable hash-partitioned export; the tokenizer ships with
    # the shards (ids are meaningless without it)
    manifests = write_partitioned(
        packed, out_dir, key="doc_id", n_partitions=n_partitions,
        partitioner="mix64",
    )
    import json
    import os

    model.save(os.path.join(out_dir, "bpe_model.json"))
    counters["exported_rows"] = sum(m["rows"] for m in manifests)
    # the audit trail ships with the data (the pipeline_counters
    # discipline): per-stage row counts + the knobs that produced them
    lineage = {
        "counters": counters,
        "params": {
            "num_merges": num_merges, "cap": cap, "min_tokens": min_tokens,
            "max_top_tok_ppm": max_top_tok_ppm, "jaccard": jaccard,
            # langs=() is an ACTIVE filter (drops everything); only
            # None means "no language filter ran"
            "langs": list(langs) if langs is not None else None,
            "max_nll_e6": max_nll_e6 if quality_lm is not None else None,
            "semdedup_eps": semdedup_eps if embeddings_ds is not None else None,
            "semdedup_k": semdedup_k if embeddings_ds is not None else None,
            "line_dedup": line_dedup,
            "cut_spans_window": cut_spans_window or None,
            "dsir_k": dsir_k if dsir_target_ds is not None else None,
            "bpe_pretok": bpe_pretok,
            "n_partitions": n_partitions,
        },
    }
    tmp = os.path.join(out_dir, "lineage.json.tmp")
    with open(tmp, "w") as f:
        json.dump(lineage, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "lineage.json"))
    return manifests, counters, model
