"""Scale stress for the dedup / decontamination family.

Deterministically tiles the sf0.1 ``documents`` table T times (default
20 -> 100k docs): copy k of a doc prepends a ``cpK`` marker token, so
cross-tile copies remain near-dups (prepending one token adds k-1=2
shingles: Jaccard ~ n/(n+2) >> 0.7).  That makes every doc a member of
a ~T-size near-dup cluster, which (a) pushes the candidate-pair count
past ``SMALL_CAND_LIMIT`` so the DISTRIBUTED twin-hash-join verify path
runs, and (b) grows connected components to T x the base size — the
adversarial shape for a 100-TB dedup, not the easy one.

With mode ``indep`` (second arg) copy k instead prefixes EVERY token
with ``cK_`` — cross-tile Jaccard drops to 0, so the corpus is T
independent replicas of the base near-dup structure: cluster count and
pair count grow LINEARLY with T.  That is the shape for scaling
comparisons (the default ``dense`` shape is quadratic in T by design).

Usage: RAY_GRAFT_CPUS=32 python scripts/stress_dedup.py [tiles] [mode]
Prints one JSON line with wall seconds + docs/sec for each op.
"""

import json
import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

SRC = "/root/testdata/sf0.1/documents.parquet"
TILES = int(sys.argv[1]) if len(sys.argv) > 1 else 20
MODE = sys.argv[2] if len(sys.argv) > 2 else "dense"
CACHE = f"/tmp/eap_ray_cache/stress_docs_{MODE}_x{TILES}.parquet"
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def build_corpus() -> str:
    if os.path.exists(CACHE):
        return CACHE
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(SRC, columns=["doc_id", "text"])
    n = base.num_rows
    ids = base["doc_id"].to_pylist()
    texts = base["text"].to_pylist()
    out_ids, out_texts = [], []
    for k in range(TILES):
        for d, t in zip(ids, texts):
            out_ids.append(k * n * 10 + d)  # disjoint, deterministic
            if k == 0:
                out_texts.append(t)
            elif MODE == "indep":
                out_texts.append(" ".join(f"c{k}_{w}" for w in t.split()))
            else:
                out_texts.append(f"cp{k} {t}")
    tbl = pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "text": pa.array(out_texts, pa.string()),
        }
    )
    pq.write_table(tbl, CACHE + ".tmp")
    os.rename(CACHE + ".tmp", CACHE)
    return CACHE


def main() -> None:
    path = build_corpus()
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        logging_level="ERROR",
    )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    import pyarrow.compute as pc

    from email_address_parser_ray.stages.dedup import (
        decontaminate, minhash_dedup_clusters,
    )

    n_docs = rd.read_parquet(path).count()
    out = {"tiles": TILES, "n_docs": n_docs, "num_cpus": NUM_CPUS}

    # split the single cached file well beyond CPU count — otherwise
    # the sketch stage is capped at the file's natural block count
    nblocks = max(32, NUM_CPUS * 3)
    t0 = time.time()
    docs = rd.read_parquet(
        path, columns=["doc_id", "text"], override_num_blocks=nblocks
    )
    cc = minhash_dedup_clusters(docs, threshold=0.7)
    n_clusters = cc.map_batches(
        lambda t: t.select(["cluster_id"]), batch_format="pyarrow"
    ).unique("cluster_id")
    out["minhash_dedup_sec"] = round(time.time() - t0, 2)
    out["minhash_clusters"] = len(n_clusters)
    out["minhash_docs_per_sec"] = round(n_docs / out["minhash_dedup_sec"], 1)

    def part(keep_eval):
        def f(t):
            import pyarrow as pa

            m = pc.equal(
                pc.subtract(
                    t["doc_id"],
                    pc.multiply(pc.divide(t["doc_id"], 97), pa.scalar(97, pa.int64())),
                ),
                pa.scalar(0, pa.int64()),
            )
            return t.filter(m if keep_eval else pc.invert(m))

        return f

    t0 = time.time()
    docs2 = rd.read_parquet(
        path, columns=["doc_id", "text"], override_num_blocks=nblocks
    )
    train = docs2.map_batches(part(False), batch_format="pyarrow")
    ev = docs2.map_batches(part(True), batch_format="pyarrow")
    n_flag = decontaminate(train, ev).count()
    out["decontaminate_sec"] = round(time.time() - t0, 2)
    out["decontaminate_flagged"] = n_flag
    out["decontaminate_docs_per_sec"] = round(n_docs / out["decontaminate_sec"], 1)

    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
