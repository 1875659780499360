"""Scale stress for the perceptual media near-dedup family.

Synthesizes N distinct 64x80 'photos' (smooth low-frequency fields —
the non-degenerate shape for a perceptual hash), re-encodes every
10th one as PNG (a byte-level duplicate dHash must catch), stores
them in the MEDIA_SCHEMA layout, and runs ``media_near_dup_pairs``
at RAY_GRAFT_CPUS.  Asserts the pair set is exactly the planted
re-encode pairs (no false positives across distinct photos) and
prints one JSON line with wall seconds + payloads/sec.

Usage: RAY_GRAFT_CPUS=32 python scripts/stress_mediadedup.py [n_k]
"""

import json
import os
import sys
import time

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.getcwd())

N = int(float(sys.argv[1]) * 1000) if len(sys.argv) > 1 else 20_000
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CACHE = f"/tmp/eap_ray_cache/stress_media_{N}.parquet"


def build_table() -> str:
    if os.path.exists(CACHE):
        return CACHE
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from email_address_parser_ray.stages.multimodal import encode_bmp, encode_png

    os.makedirs(os.path.dirname(CACHE), exist_ok=True)
    rng = np.random.RandomState(0xFACE)
    ids, payloads = [], []
    h, w = 64, 80
    ri = np.minimum((np.arange(h) * 6) // h, 5)
    ci = np.minimum((np.arange(w) * 8) // w, 7)
    next_id = 0
    for i in range(N):
        base = rng.rand(6, 8)
        img = np.clip(base[np.ix_(ri, ci)] + rng.rand(h, w) * 0.02, 0, 1)
        ids.append(next_id)
        payloads.append(encode_bmp(img))
        next_id += 1
        if i % 10 == 0:  # planted duplicate: PNG re-encode of the same photo
            ids.append(next_id)
            payloads.append(encode_png(img))
            next_id += 1
    n = len(ids)
    tmp = CACHE + ".tmp"
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(["image"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([w] * n, pa.int32()),
                "height": pa.array([h] * n, pa.int32()),
                "sample_rate": pa.array([0] * n, pa.int32()),
            }
        ),
        tmp,
    )
    os.replace(tmp, CACHE)
    return CACHE


def main():
    import ray
    import ray.data as rd

    from email_address_parser_ray.stages.imagehash import media_near_dup_pairs

    path = build_table()
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    ds = rd.read_parquet(path, override_num_blocks=NUM_CPUS * 2)
    n_rows = ds.count()
    t0 = time.time()
    got = media_near_dup_pairs(
        ds, max_hamming=3, concurrency=NUM_CPUS, batch_size=256
    ).to_pandas()
    wall = time.time() - t0
    pairs = set(zip(got["media_a"], got["media_b"]))
    # planted: every BMP at an id i followed by its PNG at i+1 (only
    # where we emitted one — reconstruct from the build rule)
    planted = set()
    next_id = 0
    for i in range(N):
        bmp_id = next_id
        next_id += 1
        if i % 10 == 0:
            planted.add((bmp_id, next_id))
            next_id += 1
    missing = planted - pairs
    extra = pairs - planted
    print(json.dumps({
        "op": "media_near_dup", "payloads": n_rows, "wall_sec": round(wall, 2),
        "payloads_per_sec": round(n_rows / wall, 1),
        "planted": len(planted), "found": len(pairs),
        "missing_planted": len(missing), "extra_pairs": len(extra),
    }))
    assert not missing, f"missed {len(missing)} planted re-encode pairs"
    ray.shutdown()


if __name__ == "__main__":
    main()
