"""profile_dataset: exact columns pinned against pandas ground truth,
NDV against the linear-counting near-exact regime, and partition
invariance (the one-pass profile cannot depend on block layout)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from email_address_parser_ray.stages.profile import profile_dataset


def _mixed_table(n=5000):
    rng = np.random.RandomState(31)
    ints = rng.randint(-100, 900, size=n).astype(np.int64)
    floats = np.where(rng.rand(n) < 0.1, np.nan, rng.rand(n) * 10)
    strs = [f"u{int(i) % 137}@example.test" if i % 7 else None for i in range(n)]
    return pa.table(
        {
            "i": pa.array(ints, pa.int64()),
            "f": pa.array([None if np.isnan(x) else float(x) for x in floats],
                          pa.float64()),
            "s": pa.array(strs, pa.string()),
        }
    )


def test_profile_exact_columns(ray_session):
    t = _mixed_table()
    prof = profile_dataset(rd.from_arrow(t).repartition(6)).to_pandas()
    prof = prof.set_index("column")
    df = t.to_pandas()
    for c in "ifs":
        assert prof.loc[c, "count"] == len(df)
        assert prof.loc[c, "null_count"] == int(df[c].isna().sum())
    assert prof.loc["i", "min"] == str(int(df["i"].min()))
    assert prof.loc["i", "max"] == str(int(df["i"].max()))
    assert prof.loc["s", "min"] == df["s"].dropna().min()
    assert prof.loc["s", "max"] == df["s"].dropna().max()
    assert prof.loc["i", "dtype"] == "int64"


def test_profile_ndv_near_exact_small_range(ray_session):
    t = _mixed_table()
    prof = profile_dataset(rd.from_arrow(t).repartition(4)).to_pandas()
    prof = prof.set_index("column")
    true_s = t.to_pandas()["s"].dropna().nunique()  # 137 — linear counting
    assert abs(prof.loc["s", "approx_distinct"] - true_s) <= 2
    true_i = t.to_pandas()["i"].nunique()  # ~1000
    assert abs(prof.loc["i", "approx_distinct"] - true_i) / true_i < 0.06


def test_profile_partition_invariance(ray_session):
    t = _mixed_table()
    p1 = profile_dataset(rd.from_arrow(t).repartition(2))
    p2 = profile_dataset(rd.from_arrow(t).repartition(13))
    assert p1.equals(p2)


def test_profile_column_subset_and_all_null(ray_session):
    t = pa.table(
        {
            "a": pa.array([1, 2, 3], pa.int64()),
            "b": pa.array([None, None, None], pa.string()),
        }
    )
    prof = profile_dataset(rd.from_arrow(t), columns=["b"]).to_pandas()
    assert list(prof["column"]) == ["b"]
    assert prof.iloc[0]["null_count"] == 3
    assert prof.iloc[0]["approx_distinct"] == 0
    assert prof.iloc[0]["min"] is None or prof.iloc[0]["min"] != prof.iloc[0]["min"]


def test_profile_quantiles_envelope_and_exact_small(ray_session):
    import ray.data as rd

    from email_address_parser_ray.stages.profile import profile_quantiles

    rng = np.random.RandomState(3)
    n = 30_000
    t = pa.table(
        {
            "rid": pa.array(range(n), pa.int64()),
            "a": pa.array(rng.normal(100, 15, n), pa.float64()),
            "b": pa.array(rng.randint(0, 1000, n), pa.int64()),
            "s": pa.array(["x"] * n, pa.string()),  # non-numeric: skipped
        }
    )
    ds = rd.from_arrow(t).repartition(6)
    out = profile_quantiles(ds, "rid", qs=(0.1, 0.5, 0.9), k=4096).to_pandas()
    assert set(out["column"]) == {"rid", "a", "b"}
    for c in ("a", "b"):
        vals = np.sort(t[c].to_numpy())
        for q in (0.1, 0.5, 0.9):
            got = float(out[(out["column"] == c) & (out["q"] == q)]["value"])
            rank = np.searchsorted(vals, got, side="right") / n
            assert abs(rank - q) <= 3.5 * np.sqrt(q * (1 - q) / 4096) + 2 / n
    # small dataset: the sample IS the data → exact
    small = rd.from_arrow(t.slice(0, 500)).repartition(3)
    out2 = profile_quantiles(small, "rid", qs=(0.5,), k=4096).to_pandas()
    va = np.sort(t["a"].to_numpy()[:500])
    got = float(out2[(out2["column"] == "a")]["value"])
    assert got == va[min(int(0.5 * 500), 499)]


def test_profile_quantiles_partition_invariant(ray_session):
    import ray.data as rd

    from email_address_parser_ray.stages.profile import profile_quantiles

    rng = np.random.RandomState(9)
    t = pa.table(
        {
            "rid": pa.array(range(5000), pa.int64()),
            "v": pa.array(rng.exponential(3.0, 5000), pa.float64()),
        }
    )
    a = profile_quantiles(rd.from_arrow(t).repartition(1), "rid", k=512).to_pandas()
    b = profile_quantiles(rd.from_arrow(t).repartition(9), "rid", k=512).to_pandas()
    assert a.values.tolist() == b.values.tolist()
