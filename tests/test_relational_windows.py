"""Parity gates for the window / pivot / moments / tf-idf relational
operators against straightforward pandas or pure-Python references on
synthetic tables (the sf0.01 DuckDB oracle replay is the second gate,
via scripts/check_correctness.py)."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from email_address_parser_ray.pipelines import relational


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _synth_events(n=3000, seed=5):
    rng = np.random.RandomState(seed)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + (rng.randint(0, 96 * 3600, size=n) * 1_000_000).astype(
        "timedelta64[us]"
    )
    # leave some hours empty so the sliding window has gaps to handle
    hours = (ts - base).astype("timedelta64[h]").astype(int)
    keep = hours % 7 != 3
    ts = ts[keep]
    return pa.table(
        {
            "event_id": pa.array(np.arange(len(ts)), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.randint(0, 40, size=len(ts)), pa.int64()),
            "event_type": pa.array(
                np.array(["a", "b", "c"])[rng.randint(0, 3, size=len(ts))]
            ),
            "value": pa.array(rng.rand(len(ts))),
            "props": pa.array(["{}"] * len(ts)),
        }
    )


def test_events_sliding_3h_matches_pandas(ray_session, tmp_path):
    t = _synth_events()
    sf_dir = _write(tmp_path, "events", t)
    got = (
        relational.events_sliding_3h(sf_dir)
        .to_pandas()
        .sort_values("hour")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    hourly = df.groupby(df["ts"].dt.floor("h")).size()
    want = {
        h: sum(
            hourly.get(h - pd.Timedelta(hours=d), 0) for d in range(3)
        )
        for h in hourly.index
    }
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert want[row["hour"]] == row["n_3h"], row["hour"]


def test_events_pivot_matches_crosstab(ray_session, tmp_path):
    t = _synth_events(seed=6)
    sf_dir = _write(tmp_path, "events", t)
    got = relational.events_pivot(sf_dir).to_pandas().set_index("event_type")
    df = t.to_pandas()
    df["q"] = df["ts"].dt.hour // 6
    ct = pd.crosstab(df["event_type"], df["q"])
    for etype in ct.index:
        for q in range(4):
            assert got.loc[etype, f"n_q{q}"] == ct.loc[etype].get(q, 0)


def test_orders_lag_gap_matches_pandas(ray_session, tmp_path):
    rng = np.random.RandomState(7)
    n = 2000
    dates = np.datetime64("1995-01-01", "us") + (
        rng.randint(0, 2000, size=n).astype("timedelta64[D]").astype("timedelta64[us]")
    )
    t = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n), pa.int64()),
            "o_custkey": pa.array(rng.randint(0, 150, size=n), pa.int64()),
            "o_orderstatus": pa.array(["O"] * n),
            "o_totalprice": pa.array(rng.rand(n) * 1000),
            "o_orderdate": pa.array(dates),
            "o_orderpriority": pa.array(["1-URGENT"] * n),
        }
    )
    sf_dir = _write(tmp_path, "orders", t)
    got = (
        relational.orders_lag_gap(sf_dir)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    df = t.to_pandas().sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    prev = df.groupby("o_custkey")["o_orderdate"].shift()
    want = (
        pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"],
                "gap_days": (df["o_orderdate"] - prev).dt.days.fillna(-1).astype(int),
            }
        )
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert len(got) == n
    assert (got["gap_days"].to_numpy() == want["gap_days"].to_numpy()).all()


def test_lineitem_moments_exact(ray_session, tmp_path):
    rng = np.random.RandomState(8)
    n = 5000
    qty = rng.randint(1, 51, size=n).astype(float)
    disc = rng.randint(0, 11, size=n) / 100.0
    t = pa.table(
        {
            "l_returnflag": pa.array(
                np.array(["A", "N", "R"])[rng.randint(0, 3, size=n)]
            ),
            "l_quantity": pa.array(qty),
            "l_discount": pa.array(disc),
        }
    )
    sf_dir = _write(tmp_path, "lineitem", t)
    got = relational.lineitem_moments(sf_dir).to_pandas().set_index("l_returnflag")
    df = pd.DataFrame(
        {
            "f": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "q": qty.astype(np.int64),
            "d": np.rint(disc * 1_000_000).astype(np.int64),
        }
    )
    for f, g in df.groupby("f"):
        assert got.loc[f, "n"] == len(g)
        assert got.loc[f, "sum_qty"] == g["q"].sum()
        assert got.loc[f, "sum_qty2"] == (g["q"] ** 2).sum()
        assert got.loc[f, "sum_disc_ppm"] == g["d"].sum()
        assert got.loc[f, "sum_disc_ppm2"] == (g["d"] ** 2).sum()
        assert got.loc[f, "sum_qty_disc"] == (g["q"] * g["d"]).sum()


def test_docs_tfidf_matches_pure_python(ray_session, tmp_path):
    import re

    docs = [
        "apple banana apple cherry",
        "banana cherry cherry dates",
        "apple dates eggs figs figs",
        "zebra apple banana",
        "eggs zebra zebra zebra",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["t"] * len(docs)),
            "n_chars": pa.array([len(d) for d in docs], pa.int64()),
        }
    )
    sf_dir = _write(tmp_path, "documents", t)
    got = relational.docs_tfidf_top_terms(sf_dir, k=2).to_pandas()

    tf = {
        i: collections.Counter(w for w in re.split(r"[^a-z0-9]+", d.lower()) if w)
        for i, d in enumerate(docs)
    }
    df_counts = collections.Counter(w for c in tf.values() for w in c)
    n_docs = len(docs)
    for i in range(n_docs):
        scored = sorted(
            ((-c * (n_docs // df_counts[w]), w) for w, c in tf[i].items())
        )[:2]
        sub = got[got["doc_id"] == i].sort_values("rnk")
        assert list(sub["token"]) == [w for _, w in scored]
        assert list(sub["score"]) == [-s for s, _ in scored]


def test_pack_bins_partition_invariant_prefix_sum(ray_session):
    import ray.data as rd

    from email_address_parser_ray.stages.packing import pack_bins

    rng = np.random.RandomState(9)
    n = 400
    texts = [" ".join(["w"] * rng.randint(1, 120)) for _ in range(n)]
    t = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)}
    )
    tokens = np.array([len(s.split()) for s in texts], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(tokens)[:-1]))
    want = starts // 256

    for blocks in (1, 7, 32):
        ds = rd.from_arrow(t).repartition(blocks)
        got = (
            pack_bins(ds, cap=256)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert (got["n_tokens"].to_numpy() == tokens).all()
        assert (got["bin"].to_numpy() == want).all(), blocks


def test_customers_order_stats_keeps_zero_order_customers(ray_session, tmp_path):
    rng = np.random.RandomState(10)
    n_cust, n_ord = 300, 900
    cust = pa.table({"c_custkey": pa.array(range(n_cust), pa.int64())})
    ckeys = rng.randint(0, n_cust // 2, size=n_ord)  # half never order
    orders = pa.table(
        {
            "o_custkey": pa.array(ckeys, pa.int64()),
            "o_totalprice": pa.array(rng.rand(n_ord) * 500),
        }
    )
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = (
        relational.customers_order_stats(str(tmp_path))
        .to_pandas()
        .set_index("c_custkey")
        .sort_index()
    )
    assert len(got) == n_cust
    cents = np.rint(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    want = pd.DataFrame({"k": ckeys, "c": cents}).groupby("k")["c"].agg(["count", "sum"])
    for k in range(n_cust):
        if k in want.index:
            assert got.loc[k, "n_orders"] == want.loc[k, "count"]
            assert got.loc[k, "total_cents"] == want.loc[k, "sum"]
        else:
            assert got.loc[k, "n_orders"] == 0
            assert got.loc[k, "total_cents"] == 0


def test_sample_per_lang_partition_invariant(ray_session, tmp_path):
    rng = np.random.RandomState(12)
    n = 600
    langs = np.array(["en", "es", "fr", "de"])[rng.randint(0, 4, size=n)]
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n),
            "lang": pa.array(langs),
            "source": pa.array(["t"] * n),
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    a = (
        relational.docs_sample_per_lang(str(tmp_path), k=5)
        .to_pandas()
        .sort_values(["lang", "rnk"])
        .reset_index(drop=True)
    )
    b = (
        relational.docs_sample_per_lang(str(tmp_path), k=5)
        .to_pandas()
        .sort_values(["lang", "rnk"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert (a.groupby("lang").size() == 5).all()
