"""Scale stress for the embedding near-dup family (stages/ann.py).

Deterministically tiles the sf0.1 ``embeddings`` table T times (default
20).  Copy k of a vector adds a tiny deterministic per-copy perturbation
(+k * 1e-3 on one rotating component), so cross-tile copies stay
near-duplicates (cos >> 0.9) and every vector belongs to a ~T-size
near-dup clique — the adversarial quadratic shape.  Mode ``indep``
instead applies a deterministic per-tile orthogonal transform
(component permutation x sign flips): within-tile geometry — and thus
the base tile's near-dup pair structure — is exactly preserved, while
cross-tile cosines fall to the random baseline, so pair volume grows
linearly with T — the shape for scaling comparisons.

This drives the round-4 rewrite of ``embedding_near_dup_pairs``:
vector-free 16 B/band rows through the shuffle (vs the old 8·d·L bytes
per vector), closed-form ``_segment_pairs`` bucket emission, sorted-
shape cross-band dedup, and the byte-gated broadcast-vs-twin-join
vector fetch for the exact verify.

Usage: RAY_GRAFT_CPUS=32 python scripts/stress_embedding.py [tiles] [mode] [threshold]
Prints one JSON line with wall seconds + vectors/sec.
"""

import json
import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

SRC = "/root/testdata/sf0.1/embeddings.parquet"
TILES = int(sys.argv[1]) if len(sys.argv) > 1 else 20
MODE = sys.argv[2] if len(sys.argv) > 2 else "dense"
THRESHOLD = float(sys.argv[3]) if len(sys.argv) > 3 else 0.9
CACHE = f"/tmp/eap_ray_cache/stress_emb_{MODE}_x{TILES}.parquet"
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def build_corpus() -> str:
    if os.path.exists(CACHE):
        return CACHE
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = pq.read_table(SRC, columns=["vec_id", "embedding"])
    n = base.num_rows
    ids = base["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    emb = base["embedding"].combine_chunks()
    m = emb.flatten().to_numpy(zero_copy_only=False).reshape(n, -1).astype(np.float64)
    d = m.shape[1]
    out_ids, out_mats = [], []
    for k in range(TILES):
        mk = m.copy()
        if k > 0:
            if MODE == "indep":
                # per-tile deterministic ORTHOGONAL transform (component
                # permutation x sign flips): within-tile pairwise cosines
                # are exactly preserved (the base tile's near-dup
                # structure repeats — linear growth), while cross-tile
                # cosines are scrambled to the random-vector baseline
                r = np.random.RandomState(1000 + k)
                mk = mk[:, r.permutation(d)] * r.choice([-1.0, 1.0], size=d)
            else:
                # tiny perturbation on one rotating component: copies
                # remain cos >> 0.9 near-dups of tile 0 (dense cliques)
                mk[:, k % d] += 1e-3 * k
        out_ids.append(k * n * 10 + ids)
        out_mats.append(mk.astype(np.float32))
    flat = np.concatenate(out_mats).reshape(-1)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(flat, pa.float32()), d
            ).cast(pa.list_(pa.float32())),
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
    import pyarrow.parquet as pq

    from email_address_parser_ray.stages.ann import embedding_near_dup_pairs

    d = len(pq.read_table(path, columns=["embedding"]).slice(0, 1)["embedding"][0])
    nblocks = max(32, NUM_CPUS * 3)
    n_vecs = rd.read_parquet(path).count()
    out = {
        "tiles": TILES, "mode": MODE, "n_vecs": n_vecs, "d": d,
        "threshold": THRESHOLD, "num_cpus": NUM_CPUS,
    }

    t0 = time.time()
    emb = rd.read_parquet(
        path, columns=["vec_id", "embedding"], override_num_blocks=nblocks
    )
    # near-dup banding tuned for a true near-dup threshold at volume:
    # b=16 planes/band gives a 2^16 key space per band so bucket sizes
    # stay ~n/65536 (at 40k vectors the 2^8 space of b=8 collided every
    # bucket into ~150 rows and candidate volume went quadratic);
    # near-identical copies (cos ~ 0.999, p = 1-θ/π ~ 0.99) still
    # collide in a band with p^16 ~ 0.86, so across L=8 bands recall
    # stays > 1-1e-6
    pairs = embedding_near_dup_pairs(
        emb, d=d, threshold=THRESHOLD, planes_per_band=16, n_bands=8
    )
    n_pairs = pairs.count()
    out["neardup_sec"] = round(time.time() - t0, 2)
    out["neardup_pairs"] = n_pairs
    out["neardup_vecs_per_sec"] = round(n_vecs / out["neardup_sec"], 1)

    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
