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
