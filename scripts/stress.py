"""Unified stress entry point — one command per scale-evidence family.

    RAY_GRAFT_CPUS=32 python scripts/stress.py --family dedup [args...]

Families ``cc | dedup | embedding | incremental_dedup | mediadedup |
sketches`` dispatch to the existing per-family harnesses via runpy
(same module, same argv shape, therefore identical measured numbers —
each family's docstring documents its args).  ``decontaminate`` is
implemented here: it forces the broadcast gate low so the distributed
Bloom path runs over the full sf0.1 documents table, asserts
row-identity with the broadcast path, and reports both walls.

Every family prints one JSON line; BASELINE.md records the results.
"""

import argparse
import json
import os
import runpy
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

_SCRIPTED = {
    "cc": "scripts/stress_cc.py",
    "dedup": "scripts/stress_dedup.py",
    "embedding": "scripts/stress_embedding.py",
    "incremental_dedup": "scripts/stress_incremental_dedup.py",
    "mediadedup": "scripts/stress_mediadedup.py",
    "sketches": "scripts/stress_sketches.py",
}


def stress_decontaminate(tiles: int) -> None:
    """Forced-low-gate decontamination over the (tiled) sf0.1 docs:
    the Bloom path must match the broadcast path row-for-row at a
    corpus size where the broadcast path is still runnable."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from email_address_parser_ray.stages import dedup as dedup_mod

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    src = "/root/testdata/sf0.1/documents.parquet"

    def load():
        docs = rd.read_parquet(src, columns=["doc_id", "text"])
        if tiles > 1:
            import pyarrow.parquet as pq

            base = pq.read_table(src, columns=["doc_id", "text"])
            n = base.num_rows
            parts = []
            for t in range(tiles):
                parts.append(
                    pa.table(
                        {
                            "doc_id": pc.add(base["doc_id"], pa.scalar(t * n, pa.int64())),
                            "text": base["text"],
                        }
                    )
                )
            docs = rd.from_arrow(pa.concat_tables(parts)).repartition(num_cpus * 2)
        return docs


    out = {"metric": "stress_decontaminate", "tiles": tiles, "num_cpus": num_cpus}
    results = {}
    for name, gate in (("broadcast", None), ("bloom", 1)):
        old = dedup_mod.DECONTAM_MAX_EVAL_SHINGLES
        if gate is not None:
            dedup_mod.DECONTAM_MAX_EVAL_SHINGLES = gate
        try:
            from email_address_parser_ray.sources.io import eval_train_split

            docs = load()
            train_side, eval_side = eval_train_split(docs)
            t0 = time.time()
            res = dedup_mod.decontaminate(train_side, eval_side)
            df = res.to_pandas().sort_values("doc_id").reset_index(drop=True)
            out[f"{name}_sec"] = round(time.time() - t0, 3)
            out[f"{name}_rows"] = len(df)
            results[name] = df
        finally:
            dedup_mod.DECONTAM_MAX_EVAL_SHINGLES = old
    assert results["broadcast"].equals(results["bloom"]), "branches diverge!"
    out["branches_identical"] = True
    print(json.dumps(out))
    ray.shutdown()


def stress_ivf(tiles: int, k: int = 64, nprobe: int = 4) -> None:
    """Persisted-IVF layout at scale: tile the sf0.1 embeddings T
    times (perturbed per tile so cells stay meaningful), build the
    cell-partitioned index, and measure (a) probe wall vs brute-force
    wall and (b) BYTES READ by the pruned probe vs the whole index —
    the claim the layout exists for."""
    import glob
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from email_address_parser_ray.stages.ann import (
        brute_force_topk, ivf_build, ivf_probe_cells, ivf_probe_topk,
    )

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    src = "/root/testdata/sf0.1/embeddings.parquet"
    base = pq.read_table(src, columns=["vec_id", "embedding"])
    n = base.num_rows
    d = len(base["embedding"][0])
    m0 = np.asarray(base["embedding"].combine_chunks().flatten()).reshape(n, d)
    parts = []
    rng = np.random.RandomState(7)
    for t in range(tiles):
        shift = rng.normal(scale=2.0, size=(1, d))  # separated tiles: real cluster geometry
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n) + t * n, pa.int64()),
                    "embedding": pa.array([r.tolist() for r in (m0 + shift)]),
                }
            )
        )
    all_t = pa.concat_tables(parts)
    emb = rd.from_arrow(all_t).repartition(num_cpus * 2).materialize()

    out = {"metric": "stress_ivf", "vectors": all_t.num_rows, "k_cells": k,
           "nprobe": nprobe, "num_cpus": num_cpus}
    index_dir = f"/tmp/eap_ray_cache/stress_ivf_x{tiles}"
    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.time()
    ivf_build(emb, index_dir, k=k, iters=2)
    out["build_sec"] = round(time.time() - t0, 3)

    q = m0[17]
    t0 = time.time()
    brute = brute_force_topk(emb, q, k=10).to_pandas()
    out["brute_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    probed = ivf_probe_topk(index_dir, q, k=10, nprobe=nprobe).to_pandas()
    out["probe_sec"] = round(time.time() - t0, 3)
    out["recall_at_10"] = len(set(brute["vec_id"]) & set(probed["vec_id"])) / 10

    cells = set(ivf_probe_cells(index_dir, q, nprobe))
    probed_bytes = total_bytes = 0
    for p in glob.glob(os.path.join(index_dir, "cell=*", "*.parquet")):
        b = os.path.getsize(p)
        total_bytes += b
        if int(p.split("cell=")[1].split("/")[0]) in cells:
            probed_bytes += b
    out["probed_bytes"] = probed_bytes
    out["index_bytes"] = total_bytes
    out["bytes_read_fraction"] = round(probed_bytes / total_bytes, 4)
    print(json.dumps(out))
    ray.shutdown()


def stress_semdedup(tiles: int, k: int = 128) -> None:
    """SemDeDup at scale: tile the sf0.1 embeddings T times, each tile
    under its own random ROTATION (rotations preserve within-tile
    cosine geometry — distinct vectors stay distinct — while
    decorrelating tiles; an additive shift would make a whole tile
    near-parallel and degenerate the test), plant a near-identical
    copy of every 10th vector, and measure the wall plus how many
    planted duplicate pairs the cluster-then-pairwise pass resolves
    (exactly one member kept)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from email_address_parser_ray.stages.ann import semantic_dedup

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    src = "/root/testdata/sf0.1/embeddings.parquet"
    base = pq.read_table(src, columns=["vec_id", "embedding"])
    n = base.num_rows
    d = len(base["embedding"][0])
    m0 = np.asarray(base["embedding"].combine_chunks().flatten()).reshape(n, d)
    rng = np.random.RandomState(23)
    mats, ids = [], []
    dup_of = []  # (orig_id, dup_id) planted pairs
    next_dup = tiles * n
    for t in range(tiles):
        q, _ = np.linalg.qr(rng.normal(size=(d, d)))
        tm = m0 @ q
        tid = np.arange(n, dtype=np.int64) + t * n
        mats.append(tm)
        ids.append(tid)
        dm = tm[::10] + rng.normal(scale=1e-3, size=tm[::10].shape)
        did = np.arange(len(dm), dtype=np.int64) + next_dup
        next_dup += len(dm)
        mats.append(dm)
        ids.append(did)
        dup_of.extend(zip(tid[::10].tolist(), did.tolist()))
    all_m = np.concatenate(mats).astype(np.float32)
    all_id = np.concatenate(ids)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(all_id, pa.int64()),
                "embedding": pa.array(
                    list(all_m), pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(num_cpus * 2).materialize()

    t0 = time.time()
    df = (
        semantic_dedup(emb, k=k, iters=2, eps=0.03)
        .to_pandas()
        .set_index("vec_id")
    )
    wall = round(time.time() - t0, 3)
    keep = df["keep"]
    resolved = sum(
        1 for a, b in dup_of if not (keep.loc[a] and keep.loc[b])
    )
    # the shuffle-free variant over a persisted IVF layout of the same
    # fit must produce the identical result
    import shutil

    from email_address_parser_ray.stages.ann import ivf_build, semantic_dedup_ivf

    idx = f"/tmp/eap_ray_cache/stress_semdedup_ivf_x{tiles}"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    ivf_build(emb, idx, k=k, iters=2)
    build_sec = round(time.time() - t0, 3)
    t0 = time.time()
    df_ivf = semantic_dedup_ivf(idx).to_pandas().set_index("vec_id")
    ivf_sec = round(time.time() - t0, 3)
    assert df.sort_index().equals(df_ivf.sort_index()), "ivf variant diverges!"
    print(json.dumps({
        "metric": "stress_semdedup", "tiles": tiles, "num_cpus": num_cpus,
        "vectors": int(len(all_id)), "k_cells": k, "wall_sec": wall,
        "vectors_per_sec": round(len(all_id) / wall, 1),
        "dropped": int((~keep).sum()),
        "planted_pairs": len(dup_of),
        "planted_resolved_fraction": round(resolved / len(dup_of), 4),
        "cells_used": int(df["cell"].nunique()),
        "ivf_build_sec": build_sec,
        "ivf_variant_sec": ivf_sec,
        "ivf_variant_identical": True,
    }))
    ray.shutdown()


def stress_pretrain(tiles: int) -> None:
    """The composed pretraining prep end-to-end over a tiled sf0.1
    documents corpus (tiling multiplies exact-dup mass, so every stage
    does real work); reports the wall and the full lineage counters."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from email_address_parser_ray.pipelines.pretrain import pretrain_prep

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    src = "/root/testdata/sf0.1/documents.parquet"
    import pyarrow.parquet as pq

    base = pq.read_table(src, columns=["doc_id", "text"])
    n = base.num_rows
    texts = base["text"].to_pylist()
    # tile k > 0 prepends a marker token: cross-tile copies are NEAR
    # dups (exercising the minhash stage), tile 0 keeps the exact-dup
    # mass the corpus already carries
    parts = [
        pa.table(
            {
                "doc_id": pc.add(base["doc_id"], pa.scalar(t * n, pa.int64())),
                "text": base["text"] if t == 0 else pa.array(
                    [f"cp{t} " + x for x in texts], pa.string()
                ),
            }
        )
        for t in range(tiles)
    ]
    train_side = rd.from_arrow(pa.concat_tables(parts)).repartition(num_cpus * 2)
    # eval is an EXTERNAL corpus (the real decontamination shape):
    # mostly disjoint text, plus train 3-gram splices in a minority so
    # the stage flags a real (bounded) sliver
    import numpy as np

    rng = np.random.RandomState(11)
    ev = [
        " ".join(f"ev{rng.randint(10**9)}" for _ in range(14)) for _ in range(150)
    ]
    for i in range(50):
        toks = texts[rng.randint(len(texts))].split()[:3]
        ev.append(" ".join(f"ev{rng.randint(10**9)}" for _ in range(10))
                  + " " + " ".join(toks))
    eval_side = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(10**9, 10**9 + len(ev)), pa.int64()),
                  "text": pa.array(ev, pa.string())})
    ).repartition(4)
    out_dir = f"/tmp/eap_ray_cache/stress_pretrain_x{tiles}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    _, counters, _ = pretrain_prep(train_side, eval_side, out_dir, num_merges=128)
    wall = round(time.time() - t0, 3)
    print(json.dumps({"metric": "stress_pretrain", "tiles": tiles,
                      "num_cpus": num_cpus, "wall_sec": wall,
                      "docs_per_sec": round(counters["input_docs"] / wall, 1),
                      **counters}))
    ray.shutdown()


def stress_textrewrite(tiles: int) -> None:
    """Scale evidence for the text-rewrite/selection tier: CCNet line
    dedup (planted banner on every 10th doc — exactly one survivor),
    exact-substring span cut (24-token passage spliced into every 37th
    doc — every occurrence excised), and DSIR selection (bimodal vocab
    — the target-distribution half must win the budget).  The corpus
    is driver-synthesized from a ~10^9 vocab so no 16-token window
    repeats by accident: every planted artifact is exactly accounted."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from email_address_parser_ray.stages.dedup import dedup_cut_spans
    from email_address_parser_ray.stages.dsir import dsir_select_k
    from email_address_parser_ray.stages.lines import remove_frequent_lines

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    n_docs = tiles * 50_000
    rng = np.random.RandomState(23)
    vocab_a = np.array([f"ta{i}" for i in range(400)])
    vocab_b = np.array([f"jb{i}" for i in range(400)])
    banner = "subscribe to our mailing list for updates today"
    passage = " ".join(f"boiler{j}" for j in range(24))
    lens = rng.randint(30, 60, n_docs)
    texts = []
    for i in range(n_docs):
        v = vocab_a if i % 2 == 0 else vocab_b
        # unique per-doc salt tokens bracket the body so no two docs
        # share a 16-token window outside the planted passage
        body = " ".join(
            f"u{rng.randint(10**9)}" if j % 3 == 0 else v[rng.randint(len(v))]
            for j in range(lens[i])
        )
        # the two planted classes are DISJOINT: a doc carrying both
        # would share a banner+passage suffix with every other such
        # doc, widening the duplicated span beyond the passage and
        # breaking the exact token accounting below
        if i % 37 == 0 and i % 10 != 0:
            # a unique salt guards the splice point: otherwise the
            # window [last body token + first 15 passage tokens]
            # duplicates whenever two passage docs end on the same
            # vocab token, cutting a 25th token
            body = body + f" u{rng.randint(10**9)} " + passage
        if i % 10 == 0:
            body = body + "\n" + banner
        texts.append(body)
    n_banner = len(range(0, n_docs, 10))
    n_passage = sum(1 for i in range(0, n_docs, 37) if i % 10 != 0)
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(num_cpus * 2).materialize()

    t0 = time.time()
    scrubbed = remove_frequent_lines(docs).materialize()
    lines_wall = round(time.time() - t0, 3)
    lines_cut = int(scrubbed.sum("n_lines_cut") or 0)
    assert lines_cut == n_banner - 1, (lines_cut, n_banner)

    t0 = time.time()
    cut = dedup_cut_spans(docs, window=16).materialize()
    spans_wall = round(time.time() - t0, 3)
    tokens_cut = int(cut.sum("n_tokens_cut") or 0)
    assert tokens_cut == 24 * n_passage, (tokens_cut, 24 * n_passage)

    target = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(10**9, 10**9 + 500), pa.int64()),
        "text": pa.array(
            [" ".join(vocab_a[rng.randint(len(vocab_a), size=20)])
             for _ in range(500)], pa.string()),
    })).repartition(4)
    k = n_docs // 10
    t0 = time.time()
    sel = dsir_select_k(docs, target, k=k)
    dsir_wall = round(time.time() - t0, 3)
    sel_ids = np.asarray(sel["doc_id"])
    frac_target = float((sel_ids % 2 == 0).mean())
    assert len(sel_ids) == k
    assert frac_target > 0.95, frac_target

    print(json.dumps({
        "metric": "stress_textrewrite", "tiles": tiles, "n_docs": n_docs,
        "num_cpus": num_cpus,
        "line_dedup_sec": lines_wall, "lines_cut": lines_cut,
        "cut_spans_sec": spans_wall, "tokens_cut": tokens_cut,
        "dsir_sec": dsir_wall, "dsir_k": k,
        "dsir_target_fraction": round(frac_target, 4),
        "docs_per_sec_line": round(n_docs / lines_wall, 1),
        "docs_per_sec_spans": round(n_docs / spans_wall, 1),
        "docs_per_sec_dsir": round(n_docs / dsir_wall, 1),
    }))
    ray.shutdown()


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--family", required=True,
                    choices=sorted(_SCRIPTED)
                    + ["decontaminate", "ivf", "pretrain", "semdedup",
                       "textrewrite"])
    ap.add_argument("args", nargs="*", help="family-specific positional args")
    ns = ap.parse_args()
    if ns.family == "decontaminate":
        stress_decontaminate(int(ns.args[0]) if ns.args else 1)
        return
    if ns.family == "ivf":
        stress_ivf(int(ns.args[0]) if ns.args else 40)
        return
    if ns.family == "pretrain":
        stress_pretrain(int(ns.args[0]) if ns.args else 4)
        return
    if ns.family == "semdedup":
        stress_semdedup(int(ns.args[0]) if ns.args else 100)
        return
    if ns.family == "textrewrite":
        stress_textrewrite(int(ns.args[0]) if ns.args else 4)
        return
    path = _SCRIPTED[ns.family]
    sys.argv = [path] + ns.args
    runpy.run_path(path, run_name="__main__")


if __name__ == "__main__":
    main()
