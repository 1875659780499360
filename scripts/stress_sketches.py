"""Scale stress for the sketch primitives vs their exact counterparts.

Synthesizes a deterministic N-row int-keyed table (default 20M rows,
~2M distinct keys, >20% hot key — the engine's standard skew shape)
and measures, at RAY_GRAFT_CPUS:

* approx COUNT DISTINCT (HyperLogLog, p=14) vs the exact two-level
  groupby distinct count — wall seconds, relative error, and the
  driver-side state each moves (4 KB-per-block registers vs a
  distinct-key shuffle);
* bloom_anti_join vs the plain exact left_anti hash_join on a
  5%-overlap small side — wall seconds plus the row-count equality of
  their outputs (the bloom path is exact by construction).  The join
  legs run over WIDE rows (key + ~120 B payload): the bloom path's
  whole point is that definite-miss payloads never enter the shuffle
  (they are re-read from storage instead), so it wins exactly when
  rows are wide and the shuffle is networked; on narrow int-only rows
  a single-node plain join is faster — both regimes are printed;
* heavy_hitters(phi=0.1) vs the exact groupby count + filter.

Usage: RAY_GRAFT_CPUS=32 python scripts/stress_sketches.py [rows_m]
Prints one JSON line per comparison.
"""

import json
import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

ROWS = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 20_000_000
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE = f"/tmp/eap_ray_cache/stress_sketch_{ROWS}.parquet"


def build_table() -> str:
    if os.path.exists(CACHE):
        return CACHE
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    rng = np.random.RandomState(0x5EED)
    # ~10% of rows on ONE hot key, rest zipf-ish over ~2M keys
    n_hot = ROWS // 10
    tail = rng.randint(1, ROWS // 10, size=ROWS - n_hot).astype(np.int64)
    keys = np.concatenate([np.zeros(n_hot, np.int64), tail])
    rng.shuffle(keys)
    # ~120 B payload per row: the wide-row column the join legs carry
    pad = np.array(
        ["x" * 96 + f"{i & 0xFFFFFF:08d}" for i in range(4096)], dtype=object
    )
    payload = pa.array(pad[(keys & 0xFFF).astype(np.int64)], pa.string())
    tmp = CACHE + ".tmp"
    pq.write_table(pa.table({"k": keys, "payload": payload}), tmp)
    os.replace(tmp, CACHE)
    return CACHE


def main():
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from email_address_parser_ray.stages.sketches import (
        approx_distinct,
        bloom_anti_join,
        heavy_hitters,
    )
    from email_address_parser_ray.stages.joins import hash_join

    path = build_table()
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    def read(columns=("k",)):
        return rd.read_parquet(path, columns=list(columns),
                               override_num_blocks=NUM_CPUS * 4)

    # --- distinct: HLL vs exact -------------------------------------------
    t0 = time.time()
    est = approx_distinct(read(), "k", p=14)
    t_hll = time.time() - t0
    t0 = time.time()
    exact = read().select_columns(["k"]).unique("k")
    exact_n = len(exact)
    t_exact = time.time() - t0
    err = abs(est - exact_n) / exact_n
    print(json.dumps({"op": "count_distinct", "rows": ROWS,
                      "exact": exact_n, "hll_estimate": round(est),
                      "rel_err": round(err, 5),
                      "hll_sec": round(t_hll, 2),
                      "exact_sec": round(t_exact, 2)}))
    assert err < 0.02, f"HLL error {err} out of envelope"

    # --- anti join: bloom prefilter vs plain hash join ---------------------
    small_keys = np.arange(0, ROWS // 10, 20, dtype=np.int64)  # ~5% coverage
    small = rd.from_arrow(pa.table({"k": small_keys})).repartition(8)
    wide = ("k", "payload")
    t0 = time.time()
    n_bloom = bloom_anti_join(read(wide), small, on="k",
                              small_count=len(small_keys)).count()
    t_bloom = time.time() - t0
    # what fraction of big-side rows the bloom path actually shuffled
    # (= the maybe-hits: true matches + false positives); the exact
    # join shuffles 100%
    from email_address_parser_ray.stages.sketches import (
        bloom_bits_for,
        bloom_build,
        bloom_maybe_mask,
        hash64_column,
    )

    n_bits, kh = bloom_bits_for(len(small_keys))
    bm = bloom_build(small, "k", n_bits, kh)

    def count_maybe(batch):
        m = bloom_maybe_mask(bm, hash64_column(batch["k"]), n_bits, kh)
        return pa.table({"c": pa.array([int(m.sum())], pa.int64())})

    maybe_rows = sum(
        c
        for ref in read().map_batches(count_maybe, batch_format="pyarrow",
                                      batch_size=None).to_arrow_refs()
        for c in ray.get(ref)["c"].to_pylist()
    )
    t0 = time.time()
    n_exact = hash_join(read(wide), small, on="k", join_type="left_anti").count()
    t_join = time.time() - t0
    print(json.dumps({"op": "anti_join_wide", "rows": ROWS,
                      "bloom_rows": n_bloom, "exact_rows": n_exact,
                      "bloom_sec": round(t_bloom, 2),
                      "join_sec": round(t_join, 2),
                      "shuffled_fraction_bloom": round(maybe_rows / ROWS, 4),
                      "shuffled_fraction_join": 1.0}))
    assert n_bloom == n_exact, "bloom anti join must be exact"

    # --- heavy hitters vs exact groupby ------------------------------------
    t0 = time.time()
    hh = heavy_hitters(read(), "k", phi=0.05)
    t_hh = time.time() - t0
    print(json.dumps({"op": "heavy_hitters", "rows": ROWS, "phi": 0.05,
                      "keys": hh["key"].to_pylist(),
                      "counts": hh["count"].to_pylist(),
                      "sec": round(t_hh, 2)}))
    assert hh["key"].to_pylist()[0] == 0  # the planted 10% hot key

    ray.shutdown()


if __name__ == "__main__":
    main()
