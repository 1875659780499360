"""SF-dependent dimension sides (supplier/part) must produce identical
results through BOTH attach paths: ray.put broadcast (below
BROADCAST_ROW_LIMIT) and hash-partitioned join (above it)."""

import pandas as pd

from email_address_parser_ray.pipelines import relational

SF_DIR = "/root/testdata/sf0.001"


def _canon(ds):
    df = ds.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _both_paths(monkeypatch, fn, sf_dir=SF_DIR):
    monkeypatch.setattr(relational, "BROADCAST_ROW_LIMIT", 10**9)
    broadcast = _canon(fn(sf_dir))
    monkeypatch.setattr(relational, "BROADCAST_ROW_LIMIT", 0)
    joined = _canon(fn(sf_dir))
    return broadcast, joined


def test_q5_supplier_join_path_matches_broadcast(ray_session, monkeypatch):
    # sf0.01: q5's orders ⋈ customer native hash join needs every hash
    # partition non-empty (Ray Dataset.join limitation at toy scale)
    b, j = _both_paths(monkeypatch, relational.q5_region_revenue, "/root/testdata/sf0.01")
    assert len(b) > 0
    pd.testing.assert_frame_equal(b, j)


def test_parttype_part_join_path_matches_broadcast(ray_session, monkeypatch):
    b, j = _both_paths(monkeypatch, relational.parttype_revenue)
    assert len(b) > 0
    pd.testing.assert_frame_equal(b, j)
