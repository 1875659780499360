"""Parity and invariance gates for the distributed re-implementations:
the driver-free f1 report must equal the pandas contingency math, and
hash sampling must be invariant to input partitioning."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_f1_distributed_matches_pandas(ray_session):
    import ray.data as rd
    from email_address_parser_ray.functions.evalmetrics import (
        f1_report_distributed, f1_report_table,
    )

    rng = np.random.RandomState(11)
    n = 500
    addrs = [f"a{i}@x.com" for i in range(n)]
    gold_ids = rng.randint(0, 80, size=n)
    # imperfect clustering: 5% of nodes assigned to a wrong cluster
    pred = gold_ids.copy()
    flip = rng.choice(n, size=25, replace=False)
    pred[flip] = rng.randint(80, 120, size=25)

    clusters = pd.DataFrame({"address": addrs, "cluster_id": [f"c{p}" for p in pred]})
    gold = pd.DataFrame({"entity_id": gold_ids, "address": addrs})

    want = f1_report_table(clusters, gold).to_pydict()
    got = f1_report_distributed(
        rd.from_pandas(clusters), rd.from_pandas(gold)
    ).to_pandas().iloc[0]
    for col in ("n_nodes", "tp", "fp", "fn"):
        assert int(got[col]) == want[col][0], col
    # ppm columns may differ by 1 from legacy float truncation; exact here
    for col in ("precision_ppm", "recall_ppm", "f1_ppm"):
        assert abs(int(got[col]) - want[col][0]) <= 1, col


def test_hash_sample_partition_invariant(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.sampling import hash_sample

    t = pa.table(
        {
            "k": pa.array([f"key-{i}" for i in range(2000)], pa.string()),
            "v": pa.array(list(range(2000)), pa.int64()),
        }
    )

    def run(blocks):
        ds = rd.from_arrow(t).repartition(blocks)
        out = hash_sample(ds, ["k"], cutoff_hex="20", seed=3).to_pandas()
        return sorted(out["v"])

    one = run(1)
    many = run(13)
    assert one == many
    assert 0 < len(one) < 2000  # ~12.5% expected


def test_sessionize_gap_splits(ray_session):
    import ray.data as rd
    from email_address_parser_ray.pipelines.relational import events_sessionize
    import os
    import tempfile

    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        [
            "2020-01-01 00:00",  # u1 s1
            "2020-01-01 00:10",  # u1 s1 (10 min gap)
            "2020-01-01 01:00",  # u1 s2 (50 min gap)
            "2020-01-01 00:05",  # u2 s1
        ]
    )
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = events_sessionize(d).to_pandas().sort_values(
            ["user_id", "session_idx"]
        ).reset_index(drop=True)
    assert list(out["user_id"]) == [1, 1, 2]
    assert list(out["session_idx"]) == [1, 2, 1]
    assert list(out["n_events"]) == [2, 1, 1]


def test_dist_quantiles_matches_numpy_multi_pass(ray_session):
    """Wide int64 range (forces several radix refinement passes),
    negatives, duplicates — exact quantile_disc rank semantics."""
    import math

    import ray.data as rd
    from email_address_parser_ray.pipelines.relational import dist_quantiles

    rng = np.random.RandomState(23)
    vals = np.concatenate(
        [
            rng.randint(-(10**12), 10**12, size=4000),
            np.repeat([-7, 0, 42], 300),  # heavy duplicates
        ]
    ).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})).repartition(8)
    qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = dist_quantiles(ds, "v", qs)
    srt = np.sort(vals)
    want = [int(srt[max(math.ceil(q * len(vals)) - 1, 0)]) for q in qs]
    assert got == want


def test_grouped_topk_matches_pandas(ray_session):
    import ray.data as rd
    from email_address_parser_ray.pipelines.relational import grouped_topk

    rng = np.random.RandomState(31)
    n = 2000
    df = pd.DataFrame(
        {
            "grp": rng.choice(["a", "b", "c", "d"], size=n),
            "val": rng.randint(0, 50, size=n).astype(np.int64),  # many ties
            "id": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(6)
    got = (
        grouped_topk(ds, "grp", "val", 5, tiebreak_col="id")
        .to_pandas()
        .sort_values(["grp", "rnk"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["grp", "val", "id"], ascending=[True, False, True], kind="mergesort")
        .groupby("grp", sort=True)
        .head(5)
        .reset_index(drop=True)
    )
    want["rnk"] = want.groupby("grp").cumcount() + 1
    want = want[["grp", "rnk", "id", "val"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_bucket_join_preserves_int64_beyond_2p53(ray_session):
    """Int64 payload columns survive bucket_join exactly above 2^53 —
    the side split happens in Arrow and ints cross into pandas as
    nullable Int64, never float64 (whose exactness ends at 2^53)."""
    import ray.data as rd
    from email_address_parser_ray.stages.joins import bucket_join

    big = (1 << 60) + 1  # not representable in float64 (rounds to 2^60)
    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array([big, big + 2, big + 4], pa.int64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([2, 3, 4], pa.int64()),
                "other": pa.array([big + 1, big + 3, big + 5], pa.int64()),
            }
        )
    )
    out = bucket_join(left, right, on="k").to_pandas().sort_values("k")
    assert list(out["k"]) == [2, 3]
    assert list(out["payload"]) == [big + 2, big + 4]
    assert list(out["other"]) == [big + 1, big + 3]
