"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

The transcript input table (BASELINE.json ``input_hint`` shape) is not
part of the driver-provided testdata, so it is synthesised
deterministically per scale factor (seeded, cached under /tmp —
``email_address_parser_ray.sources.transcripts``); its gold tables are
the SQL oracles for the record-linkage queries.  All other queries run
over the driver's own parquet tables (pre-registered DuckDB views).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import os as _os

# the scale the driver's correctness gate runs oracles at; the local
# sf0.1 sweep (scripts/check_correctness.py, GRAFT_CHECK_SF_DIR)
# overrides it so oracle and query read the SAME corpus
SF_CORRECTNESS = _os.environ.get("GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")


def _tcache(sf_dir: str) -> str:
    from email_address_parser_ray.sources.transcripts import ensure_transcripts

    return ensure_transcripts(sf_dir)


def entry() -> Any:
    """Flagship pipeline: transcripts → extract → block → score → cluster
    at sf0.001; returns the cluster-assignment Dataset."""
    from email_address_parser_ray.pipelines.resolve import resolve

    root = _tcache("/root/testdata/sf0.001")
    return resolve(f"{root}/transcripts")["clusters"]


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def _q_extract_mentions(sf_dir: str):
    from email_address_parser_ray.pipelines.resolve import (
        extract_mentions, read_transcripts,
    )

    root = _tcache(sf_dir)
    ds = extract_mentions(read_transcripts(f"{root}/transcripts"))
    return ds.select_columns(["conv_id", "turn_idx", "mention_idx", "address"])


def _q_turn_roundtrip(sf_dir: str):
    """Per-turn text equality invariant: transcripts pass through the
    extraction-annotation stage and come out byte-identical under the
    stable (conv_id, turn_idx) key."""
    import ray.data as rd
    from email_address_parser_ray.functions.fastpath import extract_mentions_batch

    root = _tcache(sf_dir)
    ds = rd.read_parquet(f"{root}/transcripts", columns=["conv_id", "turn_idx", "text"])

    def annotate(t: pa.Table) -> pa.Table:
        mentions = extract_mentions_batch(t)
        per_turn = mentions.group_by(["conv_id", "turn_idx"]).aggregate(
            [("mention_idx", "count")]
        )
        # vectorized (conv_id, turn_idx) lookup: composite string key +
        # index_in/take instead of a per-row Python dict probe
        def _flat(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col

        key_m = pc.binary_join_element_wise(
            _flat(per_turn["conv_id"]),
            _flat(pc.cast(per_turn["turn_idx"], pa.string())),
            "|",
        )
        key_t = pc.binary_join_element_wise(
            t["conv_id"], pc.cast(t["turn_idx"], pa.string()), "|"
        )
        idx = pc.index_in(key_t, value_set=key_m)
        n_m = pc.cast(
            pc.fill_null(pc.take(per_turn["mention_idx_count"], idx), 0), pa.int64()
        )
        return t.append_column("n_mentions", n_m)

    return ds.map_batches(annotate, batch_format="pyarrow").select_columns(
        ["conv_id", "turn_idx", "text"]
    )


def _q_exact_entities(sf_dir: str):
    """A9 exact-equality semantics: distinct verbatim addresses + counts.
    Address cardinality is unbounded → sorted_group_agg policy."""
    from email_address_parser_ray.pipelines.resolve import (
        extract_mentions, read_transcripts,
    )
    from email_address_parser_ray.stages.dedup import sorted_group_agg

    root = _tcache(sf_dir)
    ds = extract_mentions(read_transcripts(f"{root}/transcripts"))

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by("address").aggregate([("address", "count")]).rename_columns(
            ["address", "p_cnt"]
        )

    agg = sorted_group_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["address"],
        [("p_cnt", "sum")],
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"address": t["address"], "n_mentions": pc.cast(t["p_cnt"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


def _q_resolve_clusters(sf_dir: str):
    from email_address_parser_ray.pipelines.resolve import cluster_sizes, resolve

    root = _tcache(sf_dir)
    res = resolve(f"{root}/transcripts")
    return cluster_sizes(res["clusters"])


def _q_incremental_clusters(sf_dir: str):
    """Two-day incremental run: resolve the even-conv half from scratch,
    fold the odd-conv half in via ``incremental_resolve`` (old-old pairs
    never re-scored), and report cluster sizes.  Oracle: identical to
    ``resolve_clusters`` — the incremental path is exact vs a full
    recompute (tests/test_incremental_resolve.py pins edge-set and
    cluster equality)."""
    from email_address_parser_ray.pipelines.incremental import incremental_resolve
    from email_address_parser_ray.pipelines.resolve import (
        cluster_sizes, extract_mentions, read_transcripts,
    )
    from email_address_parser_ray.stages.blocking import build_nodes, candidate_pairs
    from email_address_parser_ray.stages.scoring import score_pairs

    root = _tcache(sf_dir)
    mentions = extract_mentions(read_transcripts(f"{root}/transcripts"))

    def half(keep_even):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # vectorized even-codepoint test on the last char: for the
            # digit/hex tails the corpus generates, ord(c) % 2 == 0 ⇔
            # c ∈ "02468bdfhjlnprtvxz" (letters with even codepoints)
            par = pa.array([False] * len(t))
            for ch in "02468bdfhjlnprtvxz":
                par = pc.or_(par, pc.ends_with(t["conv_id"], pattern=ch))
            return t.filter(par if keep_even else pc.invert(par))

        return f

    m_old = mentions.map_batches(half(True), batch_format="pyarrow")
    m_new = mentions.map_batches(half(False), batch_format="pyarrow")
    nodes_old = build_nodes(m_old).materialize()
    edges_old = score_pairs(candidate_pairs(nodes_old))
    inc = incremental_resolve(nodes_old, edges_old, m_new)
    return cluster_sizes(inc["clusters"])


def _q_match_edges(sf_dir: str):
    """Accepted match pairs, normalized (addr_a < addr_b) and deduped
    across blocking passes, with the accept rule.  Oracle: the scorer's
    accept rules restated in SQL over the gold node canonicalization
    (levenshtein / string equality on the same dotless + domain_key
    features the engine blocks and scores on)."""
    from email_address_parser_ray.pipelines.resolve import resolve

    root = _tcache(sf_dir)
    # resolve()'s edge stage already normalizes (addr_a < addr_b) and
    # dedupes across blocking passes (stages/scoring.py dedupe_edges)
    edges = resolve(f"{root}/transcripts")["edges"]
    return edges.select_columns(["addr_a", "addr_b", "rule"])


def _q_sample_mentions(sf_dir: str):
    """Deterministic content-keyed 5.1% sample of extracted mentions
    (labeled-pair candidate sampling — SURVEY §2.d seeded sampling).
    Hash-based, so the sample is invariant to partitioning/retries and
    exactly reproducible by the DuckDB md5 oracle."""
    from email_address_parser_ray.pipelines.resolve import (
        extract_mentions, read_transcripts,
    )
    from email_address_parser_ray.stages.sampling import hash_sample

    root = _tcache(sf_dir)
    ds = extract_mentions(read_transcripts(f"{root}/transcripts"))
    sampled = hash_sample(
        ds, ["conv_id", "turn_idx", "mention_idx"], cutoff_hex="0d", seed=7
    )
    return sampled.select_columns(["conv_id", "turn_idx", "mention_idx", "address"])


def _q_corpus_conformance(sf_dir: str):
    """Reference conformance through the VECTORIZED kernels, merged into
    one query surface (the driver's correctness gate caps at 50 queries):
    all 940 cartesian strict cases through ``tokenize_batch``
    (EmailAddress::parse / is_valid — A1/A2) AND through
    ``validate_pairs_batch`` (EmailAddress::new ok flag + the reference's
    exact error string — A3).  Oracle = the expected truth table (the
    same corpus rust-lib/build.rs compiles its generated tests from)."""
    import ray.data as rd
    from email_address_parser_ray.functions.corpus import ensure_fixtures
    from email_address_parser_ray.functions.fastpath import (
        tokenize_batch, validate_pairs_batch,
    )

    paths = ensure_fixtures()
    ds = rd.read_parquet(
        paths["corpus_addresses"],
        columns=["case_id", "address", "local_part", "domain"],
    )

    def conform(t: pa.Table) -> pa.Table:
        tok = tokenize_batch(t, "address", is_lax=False)
        new = validate_pairs_batch(t)
        return pa.table(
            {
                "case_id": t["case_id"],
                "is_valid": tok["is_valid"],
                "new_ok": new["new_ok"],
                "new_error": new["new_error"],
            }
        )

    return ds.map_batches(conform, batch_format="pyarrow")


def _q_isemail_lax(sf_dir: str):
    import ray.data as rd
    from email_address_parser_ray.functions.corpus import ensure_fixtures
    from email_address_parser_ray.functions.fastpath import tokenize_batch

    paths = ensure_fixtures()
    ds = rd.read_parquet(paths["isemail_cases"], columns=["case_id", "address"])
    return ds.map_batches(
        lambda t: tokenize_batch(t, "address", is_lax=True).select(
            ["case_id", "is_valid"]
        ),
        batch_format="pyarrow",
    )




def _q_f1_report(sf_dir: str):
    """One-row pairwise P/R/F1 of the pipeline clusters vs gold entities
    (the north metric, in ppm so it value-hashes exactly).  Fully
    distributed contingency-table reduction; the oracle states the
    perfect-score expectation derived from the gold partition, so any
    clustering regression hash-mismatches."""
    import ray.data as rd
    from email_address_parser_ray.functions.evalmetrics import f1_report_distributed
    from email_address_parser_ray.pipelines.resolve import resolve

    root = _tcache(sf_dir)
    clusters = resolve(f"{root}/transcripts")["clusters"]
    gold = rd.read_parquet(f"{root}/gold_entities.parquet")
    return f1_report_distributed(clusters, gold)


def _q_hot_blocks(sf_dir: str):
    """Top-20 largest blocking keys (skew detection feed — SURVEY §2.d
    sorts/top-k; drives the salting/sorted-neighborhood guard)."""
    from email_address_parser_ray.pipelines.resolve import (
        extract_mentions, read_transcripts,
    )
    from email_address_parser_ray.stages.blocking import build_nodes, explode_block_keys
    from email_address_parser_ray.stages.dedup import sorted_group_agg

    root = _tcache(sf_dir)
    nodes = build_nodes(extract_mentions(read_transcripts(f"{root}/transcripts")))
    keys = nodes.map_batches(explode_block_keys, batch_format="pyarrow")
    # block-key cardinality grows with unique addresses: sorted shape
    sizes = sorted_group_agg(
        keys.map_batches(
            lambda t: t.group_by("block_key")
            .aggregate([("block_key", "count")])
            .rename_columns(["block_key", "p_cnt"]),
            batch_format="pyarrow",
        ),
        ["block_key"],
        [("p_cnt", "sum")],
    ).map_batches(
        lambda t: pa.table(
            {"block_key": t["block_key"], "n_nodes": pc.cast(t["p_cnt"], pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return sizes.sort(["n_nodes", "block_key"], descending=[True, False]).limit(20)


def _q_docs_exact_dedup(sf_dir: str):
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.dedup import exact_dedup

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return exact_dedup(docs)


def _q_docs_text_profile(sf_dir: str):
    """Whole text-analysis family (token counting, quality scoring,
    md5 fingerprinting, stopword language-ID) in one vectorized pass —
    one merged query surface because the driver's correctness gate caps
    at 50 entries; every column is individually SQL-oracled."""
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.functions.textstats import text_profile

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(text_profile, batch_format="pyarrow")


_MIX_CUTOFFS = {
    "src0": "cc", "src1": "cc", "src2": "cc", "src3": "cc", "src4": "cc",
    "src5": "66", "src6": "66", "src7": "66", "src8": "66", "src9": "66",
}


def _q_docs_mixture_sample(sf_dir: str):
    """Weighted data mixing: sources src0-4 kept at ~80%, src5-9 at
    ~40%, the long tail at ~10% — md5-keyed per doc so the mix is
    partition/retry/cluster-size invariant and SQL-replayable."""
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.sampling import mixture_sample

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "lang"]
    )
    return mixture_sample(
        docs, "source", _MIX_CUTOFFS, ["doc_id"], default_cutoff="1a", seed=7
    )


def _q_events_pagerank(sf_dir: str):
    """Integer-exact PageRank (2 damped iterations) over the bipartite
    user ↔ event-type graph; the DuckDB oracle replays the iterations
    as chained CTEs with the same int64 arithmetic."""
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.dedup import sorted_group_agg
    from email_address_parser_ray.stages.graph import pagerank_integer

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )

    def pair_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["user_id", "event_type"]).aggregate([])

    # distinct-edge key is user-cardinality → sorted_group_agg policy
    edges = (
        sorted_group_agg(
            ev.map_batches(pair_partial, batch_format="pyarrow"),
            ["user_id", "event_type"],
        )
        .map_batches(
            lambda t: pa.table(
                {
                    "src": pc.binary_join_element_wise(
                        pa.array(["u:"] * len(t)),
                        pc.cast(t["user_id"], pa.string()),
                        "",
                    ),
                    "dst": pc.binary_join_element_wise(
                        pa.array(["t:"] * len(t)), t["event_type"], ""
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return pagerank_integer(edges, iters=2)


def _q_docs_pack_bins(sf_dir: str):
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.packing import pack_bins

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_bins(docs, cap=2048)


def _q_minhash_dedup(sf_dir: str):
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.dedup import minhash_dedup_clusters

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_dedup_clusters(docs, threshold=0.7)


def _q_docs_near_pairs(sf_dir: str):
    """Two near-dup pair detectors over ``documents`` at the same
    (doc_a, doc_b) grain, unioned with a ``method`` tag: the exact
    n-gram-Jaccard baseline over an md5 doc sample (metric =
    jaccard_e6) and the banded-SimHash sketch over the full corpus
    (metric = hamming).  Both branches are task-based pipelines, so the
    lazy union carries no actor pools (scoring.py pool constraint)."""
    import pyarrow.compute as pc

    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.dedup import (
        ngram_jaccard_pairs, simhash_near_dups,
    )

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tag(method, metric_col):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_a": t["doc_a"],
                    "doc_b": t["doc_b"],
                    "method": pa.array([method] * len(t), pa.string()),
                    "metric": pc.cast(t[metric_col], pa.int64()),
                }
            )

        return f

    a = ngram_jaccard_pairs(docs).map_batches(
        tag("ngram", "jaccard_e6"), batch_format="pyarrow"
    )
    b = simhash_near_dups(docs, max_hamming=3).map_batches(
        tag("simhash", "hamming"), batch_format="pyarrow"
    )
    return a.union(b)


def _q_docs_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 97 == 0 act as the
    held-out eval suite; every other doc sharing >= 1 exact 3-word
    shingle with it is flagged with its distinct-shared-shingle count."""
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.dedup import decontaminate

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def part(keep_eval):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            is_ev = pc.equal(
                pc.subtract(
                    t["doc_id"],
                    pc.multiply(pc.divide(t["doc_id"], 97), pa.scalar(97, pa.int64())),
                ),
                pa.scalar(0, pa.int64()),
            )
            return t.filter(is_ev if keep_eval else pc.invert(is_ev))

        return f

    train = docs.map_batches(part(False), batch_format="pyarrow")
    ev = docs.map_batches(part(True), batch_format="pyarrow")
    return decontaminate(train, ev)


def _q_embedding_neardup(sf_dir: str):
    import os

    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.ann import embedding_near_dup_pairs

    path = f"{sf_dir}/embeddings.parquet"
    emb = read_parquet_clean(path, columns=["vec_id", "embedding"])
    # 0.45 sits where true pairs exist in the driver's embeddings (max
    # pairwise cosine ≈ 0.51); the banded-LSH recall at this threshold is
    # verified exactly by the SQL self-join oracle.  The file size (×2
    # for decode expansion) gates the value-identical driver fold.
    return embedding_near_dup_pairs(
        emb, d=64, threshold=0.45, input_bytes_hint=2 * os.path.getsize(path)
    )


def _query_vector(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t["vec_id"].to_pylist().index(0)
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)


def _q_cosine_pairs(sf_dir: str):
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.ann import cosine_pairs_exact

    emb = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return cosine_pairs_exact(emb, threshold=0.40)


def _q_ann_methods_topk(sf_dir: str):
    """All three ANN top-k strategies over the same query vector, tagged
    by method and unioned into one query surface (the driver's
    correctness gate caps at 50 entries):

    * ``brute`` — exact per-batch partial top-k (numpy matmul against
      the broadcast query), shuffle-free;
    * ``ivf``   — the PERSISTED IVF layout end-to-end: k-means cells
      (stages/kmeans) → cell-partitioned parquet index under /tmp →
      pruned probe (stages/ann.ivf_probe_topk).  With nprobe = all 10
      cells the probe is exhaustive, so the rows equal brute's (the
      nprobe<cells approximation knob and the probe-pruned bytes-read
      are pinned by tests/test_ivf_layout.py);
    * ``lsh``   — SRP-LSH with 6 planes => 64 buckets, so at the test
      scale (500 vectors) the probe set holds a real candidate pool; the
      integer-exact bucketing makes the rows bit-reproducible by the
      plane-literal SQL oracle."""
    import hashlib
    import shutil

    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.ann import (
        brute_force_topk, ivf_build, ivf_probe_topk, lsh_topk,
    )

    q = _query_vector(sf_dir)
    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    index_dir = f"/tmp/eap_ray_ivf_{tag}"
    shutil.rmtree(index_dir, ignore_errors=True)  # never trust a stale index
    ivf_build(emb, index_dir, k=10, iters=2)
    parts = [
        ("brute", brute_force_topk(emb, q, k=10)),
        ("ivf", ivf_probe_topk(index_dir, q, k=10, nprobe=10)),
        ("lsh", lsh_topk(emb, q, k=10, probes=3, n_planes=6)),
    ]

    def tag(name):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("method", pa.array([name] * t.num_rows))

        return f

    out = None
    for name, ds in parts:
        tagged = ds.map_batches(tag(name), batch_format="pyarrow")
        out = tagged if out is None else out.union(tagged)
    return out


def _q_embedding_centroids(sf_dir: str):
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.ann import embedding_centroids

    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )
    return embedding_centroids(emb)


def _q_kmeans_cells(sf_dir: str):
    """Distributed integer-exact Lloyd k-means (k=8, 2 iterations,
    deterministic smallest-vec_id seeds).  Centroids live on a 1e-6
    grid so the iterations are bit-reproducible across block layouts
    and the DuckDB oracle can replay them as chained CTEs."""
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.kmeans import kmeans_cells

    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return kmeans_cells(emb, k=8, iters=2)


def _q_media_features(sf_dir: str):
    """Actor-pool media decode stage over the cached fake corpus,
    exploded to one row per (media_id, feature) so the md5-derived
    pseudo-features are value-checked end-to-end by the SQL oracle."""
    import ray.data as rd
    from email_address_parser_ray.stages.multimodal import (
        ensure_media_parquet, media_features,
    )

    media = rd.read_parquet(ensure_media_parquet(256))
    feats = media_features(media)

    def explode(t: pa.Table) -> pa.Table:
        col = t["features"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        dim = len(col[0]) if len(col) else 0
        idx = np.repeat(np.arange(t.num_rows), dim)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "media_id": pc.take(t["media_id"], pa.array(idx)),
                "kind": pc.take(t["kind"], pa.array(idx)),
                "n_bytes": pc.take(t["n_bytes"], pa.array(idx)),
                "feat_idx": pa.array(np.tile(np.arange(dim), t.num_rows), pa.int64()),
                "feat_val": pa.array(flat.astype(np.int64), pa.int64()),
            }
        )

    return feats.map_batches(explode, batch_format="pyarrow")


def _q_export_shards(sf_dir: str):
    """Training-export pattern: extracted mentions → seeded random_shuffle
    → resumable hash-partitioned Parquet shards; returns the
    per-partition manifest counters (rows-only check)."""
    import os
    import shutil

    import pyarrow as pa
    from email_address_parser_ray.pipelines.resolve import (
        extract_mentions, read_transcripts,
    )
    from email_address_parser_ray.sources.io import write_partitioned

    root = _tcache(sf_dir)
    # the OPERATOR takes the destination (write_partitioned(out_dir=…));
    # this scratch root is only this driver query's choice, overridable
    export_root = os.environ.get("EAP_EXPORT_ROOT", "/tmp/eap_ray_export")
    out = f"{export_root}/{root.rsplit('/', 1)[-1]}"
    shutil.rmtree(out, ignore_errors=True)
    ds = extract_mentions(read_transcripts(f"{root}/transcripts"))
    shuffled = ds.random_shuffle(seed=7)
    manifests = write_partitioned(shuffled, out, key="canonical_key", n_partitions=16)
    return pa.Table.from_pylist(
        [{"part": m["part"], "rows": m["rows"]} for m in manifests]
    )


def _q_pipeline_counters(sf_dir: str):
    """Run the checkpointed pipeline and report per-stage row counters
    from the lineage manifests (north rule: per-partition lineage +
    metrics).  The query projects the manifests to their SQL-expressible
    columns — (stage, n_rows) — so the lineage state is VALUE-checked
    against the gold tables (mention count / distinct surfaces / logical
    match-pair count); the engine-internal fields (input fingerprint,
    per-partition file layout) stay in the manifest API."""
    import pyarrow as pa
    from email_address_parser_ray.pipelines.resolve import resolve
    from email_address_parser_ray.state.checkpoint import load_manifest

    root = _tcache(sf_dir)
    ck = f"/tmp/eap_ray_ckpt/{root.rsplit('/', 1)[-1]}"
    resolve(f"{root}/transcripts", checkpoint_root=ck)
    rows = []
    for stage in ("mentions", "nodes", "edges", "clusters"):
        man = load_manifest(ck, stage)
        rows.append({"stage": stage, "n_rows": man["rows"]})
    return pa.Table.from_pylist(rows)


def _rel(name):
    def f(sf_dir: str):
        from email_address_parser_ray.pipelines import relational

        return getattr(relational, name)(sf_dir)

    return f


def queries() -> dict[str, Callable[[str], Any]]:
    # EXACTLY 50 entries: the driver's correctness gate records at most
    # 50 rows (CORRECTNESS_r02 had 50 of 56, dropping the last 6 in
    # registration order), so same-grain queries over the same table are
    # merged into single surfaces (corpus_conformance, ann_methods_topk,
    # orders_windows, docs_text_profile) rather than dropped — every
    # operator keeps a value-checked column or method tag.
    return {
        # record-linkage flagship family
        "extract_mentions": _q_extract_mentions,
        "sample_mentions": _q_sample_mentions,
        "turn_roundtrip": _q_turn_roundtrip,
        "exact_entities": _q_exact_entities,
        "resolve_clusters": _q_resolve_clusters,
        "incremental_clusters": _q_incremental_clusters,
        "match_edges": _q_match_edges,
        "f1_report": _q_f1_report,
        "hot_blocks": _q_hot_blocks,
        "pipeline_counters": _q_pipeline_counters,
        "export_shards": _q_export_shards,
        # reference-grammar conformance (the corpus IS the spec)
        "corpus_conformance": _q_corpus_conformance,
        "isemail_lax": _q_isemail_lax,
        # embedding / ANN / clustering family (cheap — keep early)
        "ann_methods_topk": _q_ann_methods_topk,
        "embedding_centroids": _q_embedding_centroids,
        "kmeans_cells": _q_kmeans_cells,
        "media_features": _q_media_features,
        "embedding_neardup": _q_embedding_neardup,
        "cosine_pairs": _q_cosine_pairs,
        # training-data ops
        "docs_text_profile": _q_docs_text_profile,
        "docs_exact_dedup": _q_docs_exact_dedup,
        "minhash_dedup": _q_minhash_dedup,
        "docs_near_pairs": _q_docs_near_pairs,
        "docs_decontaminate": _q_docs_decontaminate,
        "docs_pack_bins": _q_docs_pack_bins,
        "docs_mixture_sample": _q_docs_mixture_sample,
        "docs_sample_per_lang": _rel("docs_sample_per_lang"),
        "docs_vocab": _rel("docs_vocab"),
        "docs_tfidf_top_terms": _rel("docs_tfidf_top_terms"),
        # relational operator coverage
        "q1_lineitem": _rel("q1_lineitem"),
        "q3_top_orders": _rel("q3_top_orders"),
        "q5_region_revenue": _rel("q5_region_revenue"),
        "events_hourly": _rel("events_hourly"),
        "events_sessionize": _rel("events_sessionize"),
        "events_props_sum": _rel("events_props_sum"),
        "parttype_revenue": _rel("parttype_revenue"),
        "top_customers": _rel("top_customers"),
        "distinct_segments": _rel("distinct_segments"),
        "customers_without_orders": _rel("customers_without_orders"),
        "events_asof_orders": _rel("events_asof_orders"),
        "events_range_join": _rel("events_range_join"),
        "orders_windows": _rel("orders_windows"),
        "orders_price_quantiles": _rel("orders_price_quantiles"),
        "top_orders_per_priority": _rel("top_orders_per_priority"),
        "events_distinct_users": _rel("events_distinct_users"),
        "events_pivot": _rel("events_pivot"),
        "events_sliding_3h": _rel("events_sliding_3h"),
        "lineitem_moments": _rel("lineitem_moments"),
        "customers_order_stats": _rel("customers_order_stats"),
        "events_pagerank": _q_events_pagerank,
    }


# kmeans_cells oracle: replay the integer-exact Lloyd iterations as
# chained CTEs — assignment (argmin L2, ties to lowest cell) and grid
# update (floor-1e-6 integer sums, truncating //, empty cells keep the
# previous centroid) mirror stages/kmeans.py exactly.
_KM_ASSIGN = (
    "{out} AS (SELECT vec_id, cell FROM ("
    "SELECT e.vec_id, c.cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id "
    "ORDER BY list_distance(e.v, list_transform(c.ce6, "
    "y -> CAST(y AS DOUBLE) / 1000000.0)), c.cell) AS rn "
    "FROM e CROSS JOIN {cents} c) WHERE rn = 1)"
)
_KM_UPDATE = (
    "{out} AS (SELECT p.cell, COALESCE(mnew.ce6, p.ce6) AS ce6 "
    "FROM {prev} p LEFT JOIN ("
    "SELECT cell, list(CAST(s // n AS BIGINT) ORDER BY dim) AS ce6 FROM ("
    "SELECT a.cell, u.i AS dim, SUM(CAST(FLOOR(u.x * 1000000) AS BIGINT)) AS s, "
    "COUNT(*) AS n FROM {a} a JOIN (SELECT vec_id, unnest(v) AS x, "
    "generate_subscripts(v, 1) AS i FROM e) u USING (vec_id) "
    "GROUP BY a.cell, u.i) GROUP BY cell) mnew USING (cell))"
)
_KMEANS_ORACLE = (
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
    "c0 AS (SELECT vec_id AS cell, list_transform(v, "
    "x -> CAST(FLOOR(x * 1000000) AS BIGINT)) AS ce6 FROM e WHERE vec_id < 8), "
    + _KM_ASSIGN.format(out="a1", cents="c0") + ", "
    + _KM_UPDATE.format(out="c1", prev="c0", a="a1") + ", "
    + _KM_ASSIGN.format(out="a2", cents="c1") + ", "
    + _KM_UPDATE.format(out="c2", prev="c1", a="a2") + ", "
    + _KM_ASSIGN.format(out="a3", cents="c2")
    + " SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cell AS BIGINT) AS cell FROM a3"
)


def _lsh_topk_oracle() -> str:
    """Replay the integer-exact SRP bucketing (stages/ann.py) in SQL:
    the quantized hyperplanes and the deterministic probe-key set are
    embedded as literals, the per-vector bucket is the same integer
    sign pattern, and the final top-k matches ann_topk's shape."""
    from email_address_parser_ray.stages.ann import _planes_q, lsh_probe_keys

    n_planes = 6  # matches _q_ann_lsh_topk
    qvec = _query_vector(SF_CORRECTNESS)
    d = len(qvec)
    planes_q = _planes_q(d, n_planes)
    probe_list = ", ".join(
        str(k) for k in lsh_probe_keys(qvec, d, probes=3, n_planes=n_planes)
    )
    plane_rows = ", ".join(
        f"({p}, CAST([{', '.join(str(int(w)) for w in planes_q[p])}] AS BIGINT[]))"
        for p in range(n_planes)
    )
    return (
        f"WITH pl(p, w) AS (VALUES {plane_rows}), "
        "eq AS (SELECT vec_id, embedding, list_transform(embedding, "
        "x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q "
        "FROM embeddings), "
        "b AS (SELECT e.vec_id, SUM(CASE WHEN list_inner_product(e.q, pl.w) > 0 "
        "THEN CAST(power(2, pl.p) AS BIGINT) ELSE 0 END) AS bucket "
        "FROM eq e CROSS JOIN pl GROUP BY e.vec_id), "
        "probed AS (SELECT eq.vec_id, eq.embedding FROM eq JOIN b USING (vec_id) "
        f"WHERE b.bucket IN ({probe_list})), "
        "qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0) "
        "SELECT p.vec_id, CAST(ROUND(list_cosine_similarity(p.embedding, "
        "qv.embedding) * 10000) AS BIGINT) AS cos_e4 FROM probed p, qv "
        "ORDER BY cos_e4 DESC, p.vec_id LIMIT 10"
    )


def oracle_sql() -> dict[str, str]:
    # the record-linkage oracles read the synthesized gold tables; make
    # sure they exist before DuckDB runs
    from email_address_parser_ray.functions.corpus import ensure_fixtures
    from email_address_parser_ray.stages.multimodal import ensure_media_parquet

    fixtures = ensure_fixtures()
    root = _tcache(SF_CORRECTNESS)
    _media_path = ensure_media_parquet(256)
    gm = f"read_parquet('{root}/gold_mentions.parquet')"
    ge = f"read_parquet('{root}/gold_entities.parquet')"
    gn = f"read_parquet('{root}/gold_nodes.parquet')"
    tr = f"read_parquet('{root}/transcripts/*.parquet')"
    corp = f"read_parquet('{fixtures['corpus_addresses']}')"
    ise = f"read_parquet('{fixtures['isemail_cases']}')"
    # scorer accept rules (stages/scoring.py) restated in SQL over the
    # gold node canonicalization; same-domain is a rule precondition, so
    # the self-join can equi-join on domain_key.  Shared by the
    # match_edges value check and the pipeline_counters edge counter.
    match_edges_sql = (
        f"WITH mentioned AS (SELECT DISTINCT address FROM {gm}), "
        f"n AS (SELECT g.* FROM {gn} g JOIN mentioned m USING (address)), "
        f"p AS (SELECT a.address AS addr_a, b.address AS addr_b, "
        f"CASE WHEN a.canonical_key = b.canonical_key THEN 'exact_canonical' "
        f"WHEN a.dotless = b.dotless AND len(a.dotless) >= 6 "
        f"  AND len(b.dotless) >= 6 THEN 'dotless_equal' "
        f"WHEN len(a.dotless) >= 6 AND len(b.dotless) >= 6 "
        f"  AND abs(len(a.dotless) - len(b.dotless)) <= 1 "
        f"  AND levenshtein(a.dotless, b.dotless) <= 1 THEN 'lev1' "
        f"END AS rule "
        f"FROM n a JOIN n b ON a.domain_key = b.domain_key "
        f"AND a.address < b.address) "
        f"SELECT addr_a, addr_b, rule FROM p WHERE rule IS NOT NULL"
    )
    return {
        "corpus_conformance": (
            f"SELECT case_id, expected_valid_strict AS is_valid, "
            f"expected_valid_strict AS new_ok, "
            f"CASE WHEN expected_valid_strict THEN NULL "
            f"ELSE 'Invalid local part ''' || local_part || '''.' END AS new_error "
            f"FROM {corp}"
        ),
        "isemail_lax": (
            f"SELECT case_id, expected_valid_lax AS is_valid FROM {ise}"
        ),
        "extract_mentions": (
            f"SELECT conv_id, turn_idx, mention_idx, address FROM {gm}"
        ),
        "turn_roundtrip": f"SELECT conv_id, turn_idx, text FROM {tr}",
        "sample_mentions": (
            f"SELECT conv_id, turn_idx, mention_idx, address FROM {gm} "
            f"WHERE md5('7|' || conv_id || '|' || CAST(turn_idx AS VARCHAR) "
            f"|| '|' || CAST(mention_idx AS VARCHAR)) < '0d'"
        ),
        "exact_entities": (
            f"SELECT address, CAST(count(*) AS BIGINT) AS n_mentions "
            f"FROM {gm} GROUP BY address"
        ),
        "resolve_clusters": (
            f"WITH mentioned AS (SELECT DISTINCT address FROM {gm}), "
            f"surf AS (SELECT DISTINCT g.entity_id, g.address FROM {ge} g "
            f"JOIN mentioned m USING (address)), "
            f"sz AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS cluster_size "
            f"FROM surf GROUP BY entity_id) "
            f"SELECT surf.address AS address, sz.cluster_size AS cluster_size "
            f"FROM surf JOIN sz USING (entity_id)"
        ),
        "incremental_clusters": (
            f"WITH mentioned AS (SELECT DISTINCT address FROM {gm}), "
            f"surf AS (SELECT DISTINCT g.entity_id, g.address FROM {ge} g "
            f"JOIN mentioned m USING (address)), "
            f"sz AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS cluster_size "
            f"FROM surf GROUP BY entity_id) "
            f"SELECT surf.address AS address, sz.cluster_size AS cluster_size "
            f"FROM surf JOIN sz USING (entity_id)"
        ),
        "match_edges": match_edges_sql,
        "pipeline_counters": (
            # the lineage manifests' per-stage row counters restated from
            # the gold tables: mention rows, distinct surfaces (nodes and
            # cluster assignments are one row per surface), and the
            # logical deduped match-pair count (the match_edges rule SQL)
            f"SELECT 'mentions' AS stage, CAST(count(*) AS BIGINT) AS n_rows FROM {gm} "
            f"UNION ALL SELECT 'nodes', count(DISTINCT address) FROM {gm} "
            f"UNION ALL SELECT 'edges', count(*) FROM ({match_edges_sql}) "
            f"UNION ALL SELECT 'clusters', count(DISTINCT address) FROM {gm}"
        ),
        "f1_report": (
            # the engine must reproduce the gold partition exactly, so the
            # expected report is derivable from gold alone: tp = all
            # within-entity pairs over mentioned surfaces, fp = fn = 0.
            f"WITH mentioned AS (SELECT DISTINCT address FROM {gm}), "
            f"surf AS (SELECT DISTINCT g.entity_id, g.address FROM {ge} g "
            f"JOIN mentioned m USING (address)), "
            f"sz AS (SELECT entity_id, count(*) AS n FROM surf GROUP BY entity_id) "
            f"SELECT CAST(sum(n) AS BIGINT) AS n_nodes, "
            f"CAST(sum(n*(n-1)//2) AS BIGINT) AS tp, "
            f"CAST(0 AS BIGINT) AS fp, CAST(0 AS BIGINT) AS fn, "
            f"CAST(1000000 AS BIGINT) AS precision_ppm, "
            f"CAST(1000000 AS BIGINT) AS recall_ppm, "
            f"CAST(1000000 AS BIGINT) AS f1_ppm FROM sz"
        ),
        "q1_lineitem": (
            # money quantized per ROW (base = exact 2 decimals → e2,
            # disc = exact 4 → e4) and summed in BIGINT, mirroring the
            # engine — float summation ORDER once moved a group total
            # across a .5-cent boundary at the sf0.1 sweep
            "SELECT l_returnflag, l_linestatus, "
            "CAST(ROUND(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_cents, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_base_price_cents, "
            "CAST((SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 50) // 100 "
            "AS BIGINT) AS sum_disc_price_cents, "
            "CAST(count(*) AS BIGINT) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "q3_top_orders": (
            "SELECT o_orderkey, "
            "CAST(ROUND(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_cents "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "GROUP BY o_orderkey ORDER BY revenue_cents DESC, o_orderkey LIMIT 10"
        ),
        "q5_region_revenue": (
            # per-row e4 quantization + BIGINT sum, mirroring the engine
            # (float summation order is not reproducible across engines)
            "SELECT n_name, "
            "CAST((SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 50) // 100 "
            "AS BIGINT) AS revenue_cents "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name ORDER BY revenue_cents DESC"
        ),
        "events_hourly": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(ROUND(sum(value) * 100) AS BIGINT) AS sum_value_cents "
            "FROM events GROUP BY event_type, date_trunc('hour', ts)"
        ),
        "parttype_revenue": (
            "SELECT p_type, "
            "CAST((SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) + 50) // 100 "
            "AS BIGINT) AS revenue_cents, CAST(count(*) AS BIGINT) AS n_items "
            "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_type"
        ),
        "events_distinct_users": (
            "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) "
            "AS n_users FROM events GROUP BY event_type"
        ),
        "docs_vocab": (
            "WITH toks AS (SELECT unnest(list_filter("
            "regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
            "x -> len(x) > 0)) AS token FROM documents) "
            "SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks "
            "GROUP BY token ORDER BY n DESC, token LIMIT 100"
        ),
        "events_pivot": (
            "SELECT event_type, "
            + ", ".join(
                "CAST(sum(CASE WHEN EXTRACT(hour FROM ts) >= {lo} AND "
                "EXTRACT(hour FROM ts) < {hi} THEN 1 ELSE 0 END) AS BIGINT) "
                "AS n_q{q}".format(lo=6 * q, hi=6 * (q + 1), q=q)
                for q in range(4)
            )
            + " FROM events GROUP BY event_type"
        ),
        "orders_windows": (
            "SELECT o_orderkey, o_custkey, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w "
            "AS BIGINT) AS running_cents, "
            "CAST(COALESCE(date_diff('day', LAG(o_orderdate) OVER w, "
            "o_orderdate), -1) AS BIGINT) AS gap_days "
            "FROM orders WINDOW w AS (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey)"
        ),
        "events_range_join": (
            "SELECT a.event_id AS event_id_a, b.event_id AS event_id_b, "
            "a.user_id, "
            "CAST(epoch_us(a.ts) - epoch_us(b.ts) AS BIGINT) AS lag_us "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND b.ts <= a.ts AND b.ts >= a.ts - INTERVAL 1 HOUR "
            "AND a.event_id <> b.event_id"
        ),
        "events_sliding_3h": (
            "WITH h AS (SELECT date_trunc('hour', ts) AS hour, "
            "count(*) AS c FROM events GROUP BY 1) "
            "SELECT a.hour, CAST(sum(b.c) AS BIGINT) AS n_3h FROM h a "
            "JOIN h b ON b.hour BETWEEN a.hour - INTERVAL 2 HOUR AND a.hour "
            "GROUP BY a.hour"
        ),
        "lineitem_moments": (
            "WITH x AS (SELECT l_returnflag, "
            "CAST(round(l_quantity, 0) AS BIGINT) AS q, "
            "CAST(round(l_discount * 1000000, 0) AS BIGINT) AS d FROM lineitem) "
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(q) AS BIGINT) AS sum_qty, "
            "CAST(sum(q * q) AS BIGINT) AS sum_qty2, "
            "CAST(sum(d) AS BIGINT) AS sum_disc_ppm, "
            "CAST(sum(d * d) AS BIGINT) AS sum_disc_ppm2, "
            "CAST(sum(q * d) AS BIGINT) AS sum_qty_disc "
            "FROM x GROUP BY l_returnflag"
        ),
        "docs_tfidf_top_terms": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
            "x -> len(x) > 0)) AS token FROM documents), "
            "tf AS (SELECT doc_id, token, count(*) AS tf "
            "FROM toks GROUP BY doc_id, token), "
            "df AS (SELECT token, count(*) AS df FROM tf GROUP BY token), "
            "n AS (SELECT count(*) AS n_docs FROM documents), "
            "scored AS (SELECT tf.doc_id, tf.token, "
            "CAST(tf.tf * (n.n_docs // df.df) AS BIGINT) AS score "
            "FROM tf JOIN df USING (token) CROSS JOIN n), "
            "ranked AS (SELECT doc_id, token, score, CAST(row_number() OVER ("
            "PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rnk "
            "FROM scored) "
            "SELECT doc_id, rnk, token, score FROM ranked WHERE rnk <= 5"
        ),
        "customers_order_stats": (
            "WITH agg AS (SELECT o_custkey, "
            "CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) "
            "AS cents, CAST(count(*) AS BIGINT) AS cnt "
            "FROM orders GROUP BY o_custkey) "
            "SELECT c_custkey, CAST(COALESCE(cnt, 0) AS BIGINT) AS n_orders, "
            "CAST(COALESCE(cents, 0) AS BIGINT) AS total_cents "
            "FROM customer LEFT JOIN agg ON c_custkey = o_custkey"
        ),
        "docs_sample_per_lang": (
            "WITH ranked AS (SELECT lang, doc_id, "
            "md5('7|' || CAST(doc_id AS VARCHAR)) AS rank_key, "
            "CAST(row_number() OVER (PARTITION BY lang "
            "ORDER BY md5('7|' || CAST(doc_id AS VARCHAR)) DESC, doc_id) "
            "AS BIGINT) AS rnk FROM documents) "
            "SELECT lang, rnk, doc_id, rank_key FROM ranked WHERE rnk <= 10"
        ),
        "docs_mixture_sample": (
            "SELECT doc_id, source, lang FROM documents "
            "WHERE md5('7|' || CAST(doc_id AS VARCHAR)) < CASE "
            "WHEN source IN ('src0','src1','src2','src3','src4') THEN 'cc' "
            "WHEN source IN ('src5','src6','src7','src8','src9') THEN '66' "
            "ELSE '1a' END"
        ),
        "events_pagerank": (
            "WITH e0 AS (SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS src, "
            "'t:' || event_type AS dst FROM events), "
            "e AS (SELECT src, dst FROM e0 "
            "UNION ALL SELECT dst AS src, src AS dst FROM e0), "
            "deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d "
            "FROM e GROUP BY src), "
            "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg), "
            "c1 AS (SELECT e.dst AS node, sum(r0.r // deg.d) AS s FROM e "
            "JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.node "
            "GROUP BY e.dst), "
            "r1 AS (SELECT c1.node, CAST(150000 + (85 * c1.s) // 100 AS BIGINT) "
            "AS r FROM c1), "
            "c2 AS (SELECT e.dst AS node, sum(r1.r // deg.d) AS s FROM e "
            "JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.node "
            "GROUP BY e.dst), "
            "r2 AS (SELECT c2.node, CAST(150000 + (85 * c2.s) // 100 AS BIGINT) "
            "AS r FROM c2) "
            "SELECT node, r FROM r2"
        ),
        "docs_pack_bins": (
            "WITH t AS (SELECT doc_id, "
            "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents), "
            "c AS (SELECT doc_id, n_tokens, SUM(n_tokens) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            ") - n_tokens AS start_off FROM t) "
            "SELECT doc_id, n_tokens, CAST(start_off // 2048 AS BIGINT) AS bin "
            "FROM c"
        ),
        "events_props_sum": (
            "SELECT event_type, "
            "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, "
            "CAST(count(*) AS BIGINT) AS n_events "
            "FROM events GROUP BY event_type"
        ),
        "events_sessionize": (
            "WITH x AS (SELECT user_id, ts, event_id, "
            "CASE WHEN LAG(ts) OVER w IS NULL "
            "OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "y AS (SELECT user_id, ts, "
            "SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_idx "
            "FROM x) "
            "SELECT user_id, CAST(sess_idx AS BIGINT) AS session_idx, "
            "CAST(count(*) AS BIGINT) AS n_events, min(ts) AS session_start "
            "FROM y GROUP BY user_id, sess_idx"
        ),
        "embedding_centroids": (
            # x must be promoted to DOUBLE before the 1e6 quantization:
            # float32 arithmetic rounds x*1e6 to a 24-bit mantissa and
            # lands FLOOR one cell off for ~1% of components (caught by
            # the sf0.1 sweep); the engine quantizes in exact float64
            "WITH u AS (SELECT label, CAST(unnest(embedding) AS DOUBLE) AS x, "
            "generate_subscripts(embedding, 1) AS i FROM embeddings) "
            "SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS dim, "
            "CAST(SUM(CAST(FLOOR(x * 1000000) AS BIGINT)) // count(*) AS BIGINT) "
            "AS centroid_e6 FROM u GROUP BY label, i"
        ),
        "top_customers": (
            "SELECT c_custkey, c_name, "
            "CAST(ROUND(sum(o_totalprice) * 100) AS BIGINT) AS total_spent_cents, "
            "CAST(count(*) AS BIGINT) AS n_orders "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_custkey, c_name "
            "ORDER BY total_spent_cents DESC, c_custkey LIMIT 20"
        ),
        "distinct_segments": "SELECT DISTINCT c_mktsegment FROM customer",
        "customers_without_orders": (
            "SELECT c_custkey, c_name FROM customer ANTI JOIN "
            "(SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01') o ON c_custkey = o_custkey"
        ),
        "events_asof_orders": (
            "SELECT e.event_id, e.user_id, o.o_orderkey "
            "FROM events e ASOF JOIN orders o "
            "ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"
        ),
        "orders_price_quantiles": (
            # engine: dist_quantiles radix refinement; quantile_disc uses
            # the same 0-based ceil(q*n)-1 rank on ascending cents
            "SELECT unnest(CAST([2500, 5000, 7500, 9000, 9900] AS BIGINT[])) AS q_e4, "
            "unnest(quantile_disc(cents, [0.25, 0.50, 0.75, 0.90, 0.99])) AS value_cents "
            "FROM (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders)"
        ),
        "top_orders_per_priority": (
            "SELECT o_orderpriority, CAST(rn AS BIGINT) AS rnk, o_orderkey, "
            "total_cents FROM ("
            "SELECT o_orderpriority, CAST(o_orderkey AS BIGINT) AS o_orderkey, "
            "CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents, "
            "ROW_NUMBER() OVER (PARTITION BY o_orderpriority "
            "ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC, o_orderkey) AS rn "
            "FROM orders) WHERE rn <= 3"
        ),
        "hot_blocks": (
            # blocking-key explode (stages/blocking.py explode_block_keys)
            # restated in SQL over the gold node canonicalization:
            # d|/p|/s| passes plus the positional deletion neighborhood.
            f"WITH mentioned AS (SELECT DISTINCT address FROM {gm}), "
            f"n AS (SELECT g.* FROM {gn} g JOIN mentioned m USING (address)), "
            f"keys AS ("
            f"SELECT domain_key || '|d|' || dotless AS block_key FROM n "
            f"UNION ALL SELECT domain_key || '|p|' || substr(dotless, 1, 4) FROM n "
            f"UNION ALL SELECT domain_key || '|s|' || substr(reverse(dotless), 1, 4) FROM n "
            f"UNION ALL SELECT n.domain_key || '|e' || CAST(t.i AS VARCHAR) || '|' "
            f"|| substr(n.dotless, 1, t.i) || substr(n.dotless, t.i + 2) "
            f"FROM n CROSS JOIN generate_series(0, 31) AS t(i) "
            f"WHERE len(n.dotless) BETWEEN 6 AND 32 AND t.i < len(n.dotless)) "
            f"SELECT block_key, CAST(count(*) AS BIGINT) AS n_nodes FROM keys "
            f"GROUP BY block_key ORDER BY n_nodes DESC, block_key LIMIT 20"
        ),
        "export_shards": (
            # rows per md5-hash partition of mentions keyed by canonical
            # key; md5_number_lower(x) % 16 is bit-identical to the
            # engine's md5_partition (sources/io.py).
            f"WITH parts AS (SELECT CAST(md5_number_lower(n.canonical_key) % 16 "
            f"AS BIGINT) AS part FROM {gm} m JOIN {gn} n USING (address)) "
            f"SELECT s.part, CAST(coalesce(c.rows, 0) AS BIGINT) AS rows "
            f"FROM generate_series(0, 15) AS s(part) LEFT JOIN "
            f"(SELECT part, count(*) AS rows FROM parts GROUP BY part) c "
            f"USING (part)"
        ),
        "docs_exact_dedup": (
            "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, "
            "CAST(count(*) AS BIGINT) AS n_copies FROM documents GROUP BY text"
        ),
        "docs_text_profile": (
            # token_stats + quality_stats + fingerprint + lang_id in one
            # per-doc SELECT (columns match functions/textstats.py
            # text_profile exactly)
            "WITH rep AS (SELECT doc_id, CAST(max(c) * 1000000 // greatest(sum(c), 1) AS BIGINT) AS top_tok_ppm "
            "FROM (SELECT doc_id, tok, count(*) AS c FROM "
            "(SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents) "
            "GROUP BY doc_id, tok) GROUP BY doc_id), "
            "bg AS (SELECT doc_id, CAST((count(*) - count(DISTINCT g)) * 1000000 // greatest(count(*), 1) AS BIGINT) AS dup_2gram_ppm "
            "FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1), "
            # space separator: a '\S+' token can never contain one, so
            # joined bigrams cannot collide (chr(1) could appear in-token)
            "i -> toks[i] || ' ' || toks[i + 1])) AS g "
            "FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents)) "
            "GROUP BY doc_id), "
            "lid AS (SELECT doc_id, n, en, es, fr, de FROM ("
            "SELECT doc_id, len(toks) AS n, "
            "len(list_filter(toks, x -> x IN ('the','a','and','of','to','in','is','that','it','for'))) AS en, "
            "len(list_filter(toks, x -> x IN ('el','la','de','que','y','en','un','una','es','por'))) AS es, "
            "len(list_filter(toks, x -> x IN ('le','la','de','et','les','des','un','une','est','dans'))) AS fr, "
            "len(list_filter(toks, x -> x IN ('der','die','das','und','ist','von','ein','eine','zu','mit'))) AS de "
            "FROM (SELECT doc_id, list_slice(regexp_split_to_array("
            "trim(lower(text), ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), "
            "'\\s+'), 1, 256) AS toks FROM documents))) "
            "SELECT d.doc_id, "
            "CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens, "
            "CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(length(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish, "
            "CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct, "
            "CAST(length(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper, "
            "CAST(length(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit, "
            "CAST(length(regexp_extract_all(text, '[.,;:!?]')) * 1000000 "
            "  // greatest(length(text), 1) AS BIGINT) AS punct_ppm, "
            "CAST(length(regexp_extract_all(text, '[ ]')) * 1000000 "
            "  // greatest(length(text), 1) AS BIGINT) AS space_ppm, "
            "md5(text) AS fp, "
            "CASE WHEN greatest(en, es, fr, de) * 50 > n THEN "
            "CASE WHEN en >= es AND en >= fr AND en >= de THEN 'en' "
            "WHEN es >= fr AND es >= de THEN 'es' "
            "WHEN fr >= de THEN 'fr' ELSE 'de' END "
            "ELSE 'und' END AS lang_pred, "
            "CAST(greatest(en, es, fr, de) * 1000000 // n AS BIGINT) AS lang_score_ppm, "
            # normalization family over the shared messy variant (the raw
            # corpus is ASCII/lowercase/single-spaced, so both sides build
            # the same perturbed string — see textstats.messy_variant)
            "md5(trim(regexp_replace(lower(nfc_normalize(messy)), '\\s+', ' ', 'g'), ' ')) AS norm_fp, "
            "CAST(length(trim(regexp_replace(lower(nfc_normalize(messy)), '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS norm_len, "
            "md5(trim(regexp_replace(lower(strip_accents(messy)), '\\s+', ' ', 'g'), ' ')) AS ascii_fp, "
            # Gopher-style repetition filters (functions/textstats.py
            # repetition_stats): top-word fraction + duplicate-bigram
            # fraction, integer ppm on both sides
            "CAST(coalesce(rep.top_tok_ppm, 0) AS BIGINT) AS top_tok_ppm, "
            "CAST(coalesce(bg.dup_2gram_ppm, 0) AS BIGINT) AS dup_2gram_ppm "
            "FROM (SELECT *, ' ' || upper(substr(text, 1, 40)) || chr(9) || "
            "chr(201) || ' ' || chr(101) || chr(769) || chr(13) || chr(10) || "
            "text || '  ' AS messy FROM documents) d JOIN lid USING (doc_id) "
            "LEFT JOIN rep USING (doc_id) LEFT JOIN bg USING (doc_id)"
        ),
        "docs_near_pairs": (
            # union of the two pair detectors at the same grain: the
            # exact n-gram-Jaccard baseline (md5 doc sample) and the
            # full-corpus 64-vote SimHash sketch replay, tagged by
            # method (metric = jaccard_e6 resp. hamming)
            "WITH samp AS (SELECT doc_id, regexp_split_to_array(trim(text, "
            "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') AS toks "
            "FROM documents WHERE md5('7|' || CAST(doc_id AS VARCHAR)) < '40'), "
            "s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 "
            "THEN [array_to_string(toks, ' ')] "
            "ELSE list_transform(range(1, len(toks) - 1), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh FROM samp), "
            "ng AS (SELECT doc_a, doc_b, jaccard_e6 FROM ("
            "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(len(list_intersect(a.sh, b.sh)) * 1000000 // "
            "(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS BIGINT) "
            "AS jaccard_e6 "
            "FROM s a JOIN s b ON a.doc_id < b.doc_id) WHERE jaccard_e6 > 0), "
            "tk AS (SELECT doc_id, list_filter(regexp_split_to_array("
            "trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), "
            "'\\s+'), x -> len(x) > 0) AS toks FROM documents), "
            "tok AS (SELECT doc_id, unnest(toks) AS t FROM tk), "
            "h AS (SELECT doc_id, md5_number_lower(t) AS h FROM tok), "
            "bits AS (SELECT doc_id, b.i AS bit, "
            "SUM(CASE WHEN (h >> b.i) & 1 = 1 THEN 1 ELSE -1 END) AS v "
            "FROM h CROSS JOIN generate_series(0, 63) b(i) GROUP BY doc_id, b.i), "
            "sv AS (SELECT doc_id, SUM(CASE WHEN v > 0 "
            "THEN CAST(power(2, bit) AS UBIGINT) ELSE 0 END) AS s FROM bits "
            "GROUP BY doc_id), "
            "sh AS (SELECT d.doc_id, COALESCE(sv.s, 0) AS s "
            "FROM documents d LEFT JOIN sv USING (doc_id)), "
            "sim AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming "
            "FROM sh a JOIN sh b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.s, b.s)) <= 3) "
            "SELECT doc_a, doc_b, 'ngram' AS method, jaccard_e6 AS metric FROM ng "
            "UNION ALL "
            "SELECT doc_a, doc_b, 'simhash' AS method, hamming AS metric FROM sim"
        ),
        "docs_decontaminate": (
            # GPT-3/Pile-style n-gram decontamination: eval suite =
            # doc_id % 97 == 0; train docs sharing >= 1 exact 3-word
            # shingle are flagged with the distinct shared-shingle count
            "WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(text, "
            "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') AS toks "
            "FROM documents), "
            "s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 "
            "THEN [array_to_string(toks, ' ')] "
            "ELSE list_transform(range(1, len(toks) - 1), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh FROM tk), "
            "tg AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE doc_id % 97 <> 0), "
            "ev AS (SELECT DISTINCT unnest(sh) AS g FROM s WHERE doc_id % 97 = 0) "
            "SELECT CAST(t.doc_id AS BIGINT) AS doc_id, "
            "CAST(COUNT(*) AS BIGINT) AS n_hits "
            "FROM tg t JOIN ev USING (g) GROUP BY t.doc_id"
        ),
        "cosine_pairs": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "CAST(ROUND(list_cosine_similarity(a.embedding, b.embedding) "
            "* 1000) AS BIGINT) AS cos_e3 "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.40"
        ),
        "embedding_neardup": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "CAST(ROUND(list_cosine_similarity(a.embedding, b.embedding) "
            "* 1000) AS BIGINT) AS cos_e3 "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45"
        ),
        "ann_methods_topk": (
            # brute = exact top-k; exhaustive-probe IVF is exact => same
            # rows; LSH replays the integer plane bucketing
            "WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0), "
            "exact AS (SELECT e.vec_id, "
            "CAST(ROUND(list_cosine_similarity(e.embedding, q.embedding) "
            "* 10000) AS BIGINT) AS cos_e4 "
            "FROM embeddings e, q ORDER BY cos_e4 DESC, e.vec_id LIMIT 10) "
            "SELECT vec_id, cos_e4, 'brute' AS method FROM exact "
            "UNION ALL SELECT vec_id, cos_e4, 'ivf' FROM exact "
            f"UNION ALL SELECT vec_id, cos_e4, 'lsh' FROM ({_lsh_topk_oracle()})"
        ),
        "kmeans_cells": _KMEANS_ORACLE,
        "minhash_dedup": (
            # the oracle states the all-pairs exact-Jaccard IDEAL:
            # string-shingle pairs >= 0.7 (same integer-e6 arithmetic as
            # the engine's verify stage) closed transitively via a
            # recursive CTE.  The engine's banding recall at this
            # threshold is 1-(1-0.49)^64 ~ 1-5e-19 per pair, so its
            # candidate set matches the ideal and the exact verify makes
            # precision identical.
            # pair generation is an INVERTED shingle join (unnest → self
            # join on the shingle → per-pair intersection counts), not an
            # all-pairs list_intersect: identical pairs (jaccard > 0
            # requires >= 1 shared shingle), but cost ~ sum df(g)^2
            # instead of n^2 full-list intersections — the all-pairs form
            # ran for tens of minutes at the sf0.1 sweep's 5000 docs
            "WITH RECURSIVE tk AS (SELECT doc_id, regexp_split_to_array(trim(text, "
            "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), '\\s+') AS toks "
            "FROM documents), "
            "s AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 "
            "THEN [array_to_string(toks, ' ')] "
            "ELSE list_transform(range(1, len(toks) - 1), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS sh FROM tk), "
            "sf AS (SELECT doc_id, unnest(sh) AS g FROM s), "
            "ln AS (SELECT doc_id, len(sh) AS n FROM s), "
            "inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c "
            "FROM sf a JOIN sf b ON a.g = b.g AND a.doc_id < b.doc_id "
            "GROUP BY a.doc_id, b.doc_id), "
            "p AS (SELECT da, db FROM inter "
            "JOIN ln la ON la.doc_id = inter.da "
            "JOIN ln lb ON lb.doc_id = inter.db "
            "WHERE c * 1000000 // (la.n + lb.n - c) >= 700000), "
            "e AS (SELECT da AS a, db AS b FROM p UNION ALL SELECT db, da FROM p), "
            "reach AS (SELECT doc_id AS src, doc_id AS dst FROM documents "
            "UNION SELECT r.src, e.b FROM reach r JOIN e ON e.a = r.dst) "
            "SELECT CAST(src AS BIGINT) AS doc_id, CAST(MIN(dst) AS BIGINT) AS cluster_id "
            "FROM reach GROUP BY src"
        ),
        "media_features": (
            # replay the md5-derived pseudo-features over the same cached
            # payload bytes (stages/multimodal.py MediaDecoder._decode)
            f"WITH f AS (SELECT media_id, kind, "
            f"CAST(octet_length(payload) AS BIGINT) AS n_bytes, "
            f"md5_number_lower(hex(payload)) AS lo, "
            f"md5_number_upper(hex(payload)) AS hi "
            f"FROM read_parquet('{_media_path}')) "
            f"SELECT media_id, kind, n_bytes, CAST(t.i AS BIGINT) AS feat_idx, "
            f"CAST(CASE WHEN t.i < 4 THEN (lo >> (16 * t.i)) & 65535 "
            f"ELSE (hi >> (16 * (t.i - 4))) & 65535 END AS BIGINT) AS feat_val "
            f"FROM f CROSS JOIN generate_series(0, 7) t(i)"
        ),
    }
