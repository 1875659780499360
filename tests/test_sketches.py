"""Sketch primitives: HyperLogLog accuracy/merge laws and Bloom-filter
join prefilters (exactness-preserving by construction).

Like test_logreg.py these pin approximate/iterative primitives that
have no faithful SQL form: accuracy envelopes, partition invariance
(the 100-TB property — retries/repartition cannot change the answer),
merge laws, and row-for-row equality of the Bloom-prefiltered joins
with the exact joins they accelerate."""

import numpy as np
import pyarrow as pa
import pytest

from email_address_parser_ray.stages.sketches import (
    approx_distinct,
    bloom_anti_join,
    bloom_bits_for,
    bloom_build,
    bloom_maybe_mask,
    bloom_semi_join,
    hash64_column,
    hll_estimate,
    hll_merge,
    hll_partials,
)


def _int_ds(ray, values, blocks=4):
    import ray.data as rd

    return rd.from_arrow(
        pa.table({"k": pa.array(values, pa.int64())})
    ).repartition(blocks)


def _merged_registers(ray, ds, p=12):
    blobs = []
    for ref in hll_partials(ds, "k", p).to_arrow_refs():
        blobs.extend(ray.get(ref)["registers"].to_pylist())
    return hll_merge(blobs, p)


def test_hll_accuracy_ints(ray_session):
    rng = np.random.RandomState(7)
    truth = 20_000
    vals = rng.randint(0, truth, size=60_000) * 977  # 20k distinct, repeated
    ds = _int_ds(ray_session, vals.tolist(), blocks=6)
    n_true = len(np.unique(vals))
    est = approx_distinct(ds, "k", p=12)
    # p=12 → se ≈ 1.04/64 ≈ 1.6%; allow 3.5σ
    assert abs(est - n_true) / n_true < 0.06


def test_hll_accuracy_strings(ray_session):
    import ray.data as rd

    vals = [f"user-{i % 5000}@example.test" for i in range(25_000)]
    ds = rd.from_arrow(pa.table({"k": pa.array(vals, pa.string())})).repartition(5)
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - 5000) / 5000 < 0.06


def test_hll_small_range_linear_counting(ray_session):
    ds = _int_ds(ray_session, [i % 10 for i in range(1000)], blocks=3)
    est = approx_distinct(ds, "k", p=12)
    assert abs(est - 10) <= 1  # linear-counting regime is near-exact


def test_hll_partition_invariance(ray_session):
    vals = (np.arange(30_000) % 7919).tolist()
    r1 = _merged_registers(ray_session, _int_ds(ray_session, vals, blocks=2))
    r2 = _merged_registers(ray_session, _int_ds(ray_session, vals, blocks=11))
    assert np.array_equal(r1, r2)  # max-merge ⇒ layout cannot matter


def test_hll_merge_law(ray_session):
    a = list(range(0, 8000))
    b = list(range(4000, 12000))
    ra = _merged_registers(ray_session, _int_ds(ray_session, a))
    rb = _merged_registers(ray_session, _int_ds(ray_session, b))
    runion = _merged_registers(ray_session, _int_ds(ray_session, a + b))
    assert np.array_equal(np.maximum(ra, rb), runion)
    est = hll_estimate(np.maximum(ra, rb))
    assert abs(est - 12000) / 12000 < 0.06


def test_hll_empty(ray_session):
    ds = _int_ds(ray_session, [], blocks=1)
    assert approx_distinct(ds, "k", p=12) == 0.0


def test_bloom_no_false_negatives(ray_session):
    keys = (np.arange(2000) * 31 + 5).tolist()
    ds = _int_ds(ray_session, keys, blocks=4)
    n_bits, k = bloom_bits_for(2000, 0.01)
    bm = bloom_build(ds, "k", n_bits, k)
    h = hash64_column(pa.array(keys, pa.int64()))
    assert bloom_maybe_mask(bm, h, n_bits, k).all()


def test_bloom_fp_rate_in_envelope(ray_session):
    keys = list(range(5000))
    ds = _int_ds(ray_session, keys, blocks=4)
    n_bits, k = bloom_bits_for(5000, 0.01)
    bm = bloom_build(ds, "k", n_bits, k)
    absent = pa.array([10**9 + i for i in range(20_000)], pa.int64())
    fp = bloom_maybe_mask(bm, hash64_column(absent), n_bits, k).mean()
    assert fp < 0.05  # target 1%, generous envelope


def test_bloom_build_partition_invariance(ray_session):
    keys = [i * 13 for i in range(3000)]
    n_bits, k = bloom_bits_for(3000, 0.01)
    b1 = bloom_build(_int_ds(ray_session, keys, blocks=2), "k", n_bits, k)
    b2 = bloom_build(_int_ds(ray_session, keys, blocks=9), "k", n_bits, k)
    assert np.array_equal(b1, b2)  # OR-merge ⇒ layout cannot matter


def test_bloom_oversize_raises(ray_session):
    ds = _int_ds(ray_session, [1, 2, 3], blocks=1)
    with pytest.raises(ValueError, match="BLOOM_MAX_BYTES"):
        bloom_build(ds, "k", 8 * 65 * 1024 * 1024, 4)


def _join_fixture(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    big_keys = rng.randint(0, 1000, size=5000)
    big = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(big_keys, pa.int64()),
                "payload": pa.array(np.arange(5000), pa.int64()),
            }
        )
    ).repartition(5)
    small_keys = rng.choice(1000, size=300, replace=False)
    # duplicate keys on the small side must not duplicate semi rows
    small = rd.from_arrow(
        pa.table({"k": pa.array(np.repeat(small_keys, 2), pa.int64())})
    ).repartition(3)
    return big, small, big_keys, set(small_keys.tolist())


def test_bloom_anti_join_equals_exact(ray_session):
    big, small, big_keys, small_set = _join_fixture(ray_session)
    got = bloom_anti_join(big, small, on="k").to_pandas()
    want = {
        (int(k), int(p))
        for p, k in enumerate(big_keys)
        if int(k) not in small_set
    }
    assert set(zip(got["k"], got["payload"])) == want
    assert len(got) == len(want)


def test_bloom_semi_join_equals_exact(ray_session):
    big, small, big_keys, small_set = _join_fixture(ray_session)
    got = bloom_semi_join(big, small, on="k").to_pandas()
    want = {
        (int(k), int(p))
        for p, k in enumerate(big_keys)
        if int(k) in small_set
    }
    assert set(zip(got["k"], got["payload"])) == want
    assert len(got) == len(want)


# --- Count-Min + heavy hitters ------------------------------------------------


def test_cms_upper_bound_and_accuracy(ray_session):
    rng = np.random.RandomState(3)
    # zipf-ish skew: key i appears ~ 5000/i times
    keys = np.repeat(np.arange(1, 200), (5000 / np.arange(1, 200)).astype(int))
    ds = _int_ds(ray_session, keys.tolist(), blocks=6)
    from email_address_parser_ray.stages.sketches import cms_build, cms_query

    cms = cms_build(ds, "k", width=16384, depth=4)
    probe = pa.array(np.arange(1, 200), pa.int64())
    est = cms_query(cms, probe)
    true = np.array([(keys == i).sum() for i in range(1, 200)])
    assert (est >= true).all()  # CMS never undercounts
    n = len(keys)
    eps = np.e / 16384
    assert ((est - true) <= eps * n + 1).all()


def test_cms_partition_invariance(ray_session):
    from email_address_parser_ray.stages.sketches import cms_build

    keys = [i % 97 for i in range(5000)]
    c1 = cms_build(_int_ds(ray_session, keys, blocks=2), "k", 4096, 3)
    c2 = cms_build(_int_ds(ray_session, keys, blocks=13), "k", 4096, 3)
    assert np.array_equal(c1, c2)  # sum-merge: layout cannot matter


def test_heavy_hitters_exact(ray_session):
    from email_address_parser_ray.stages.sketches import heavy_hitters

    # 3 heavy keys (>= 10%) + a long tail
    vals = [1] * 3000 + [2] * 2000 + [3] * 1500 + list(range(100, 3600))
    rng = np.random.RandomState(5)
    vals = np.array(vals)
    rng.shuffle(vals)  # heavy keys spread across blocks
    ds = _int_ds(ray_session, vals.tolist(), blocks=8)
    got = heavy_hitters(ds, "k", phi=0.10)
    n = len(vals)
    exact = {
        int(k): int(c)
        for k, c in zip(*np.unique(vals, return_counts=True))
        if c >= 0.10 * n
    }
    assert dict(zip(got["key"].to_pylist(), got["count"].to_pylist())) == exact
    # sorted by count desc
    counts = got["count"].to_pylist()
    assert counts == sorted(counts, reverse=True)


def test_heavy_hitters_no_false_negatives_on_spread_key(ray_session):
    """A key just over phi that never dominates any single block must
    still be found (the pigeonhole guarantee the local threshold rests
    on)."""
    from email_address_parser_ray.stages.sketches import heavy_hitters

    # key 7: 130 of 1000 rows (13%), interleaved uniformly so each
    # block sees it at ~13% (above its local threshold in at least one)
    vals = []
    for i in range(1000):
        vals.append(7 if i % 8 == 0 else 1000 + i)
    ds = _int_ds(ray_session, vals, blocks=5)
    got = heavy_hitters(ds, "k", phi=0.12)
    assert 7 in got["key"].to_pylist()


def test_heavy_hitters_strings(ray_session):
    import ray.data as rd

    from email_address_parser_ray.stages.sketches import heavy_hitters

    vals = ["hot@example.test"] * 400 + [f"u{i}@example.test" for i in range(600)]
    ds = rd.from_arrow(pa.table({"k": pa.array(vals, pa.string())})).repartition(4)
    got = heavy_hitters(ds, "k", phi=0.25)
    assert got["key"].to_pylist() == ["hot@example.test"]
    assert got["count"].to_pylist() == [400]


# --- weighted exact-k sampling --------------------------------------------------


def _weighted_ds(ray_session, n=2000, blocks=4):
    import ray.data as rd

    w = np.where(np.arange(n) < 100, 50.0, 1.0)  # 100 heavy rows
    return rd.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(n), pa.int64()),
                "w": pa.array(w, pa.float64()),
            }
        )
    ).repartition(blocks)


def test_weighted_sample_k_exact_k_and_partition_invariance(ray_session):
    from email_address_parser_ray.stages.sketches import weighted_sample_k

    s1 = weighted_sample_k(_weighted_ds(ray_session, blocks=3), "id", "w", 50, seed=9)
    s2 = weighted_sample_k(_weighted_ds(ray_session, blocks=11), "id", "w", 50, seed=9)
    assert s1.num_rows == 50 and s2.num_rows == 50
    assert sorted(s1["id"].to_pylist()) == sorted(s2["id"].to_pylist())
    assert len(set(s1["id"].to_pylist())) == 50  # without replacement


def test_weighted_sample_k_favors_heavy_weights(ray_session):
    from email_address_parser_ray.stages.sketches import weighted_sample_k

    heavy_fracs = []
    for seed in range(5):
        s = weighted_sample_k(_weighted_ds(ray_session), "id", "w", 100, seed=seed)
        ids = np.array(s["id"].to_pylist())
        heavy_fracs.append((ids < 100).mean())
    # 100 heavy rows at weight 50 vs 1900 at weight 1: heavy mass is
    # 5000/6900 ≈ 72% — the sample should be dominated by heavy rows
    assert np.mean(heavy_fracs) > 0.5


def test_weighted_sample_k_zero_weight_never_drawn(ray_session):
    import ray.data as rd

    from email_address_parser_ray.stages.sketches import weighted_sample_k

    t = pa.table(
        {
            "id": pa.array(np.arange(100), pa.int64()),
            "w": pa.array([0.0] * 50 + [1.0] * 50, pa.float64()),
        }
    )
    s = weighted_sample_k(rd.from_arrow(t).repartition(3), "id", "w", 50, seed=1)
    assert all(i >= 50 for i in s["id"].to_pylist())


# --- grouped approximate distinct ----------------------------------------------


def _grouped_ds(ray_session, blocks=5):
    import ray.data as rd

    rng = np.random.RandomState(17)
    n = 40_000
    groups = np.array(["a", "b", "c"])[rng.randint(0, 3, size=n)]
    # group a: ~2000 distinct, b: ~500, c: ~50
    width = {"a": 2000, "b": 500, "c": 50}
    vals = np.array([rng.randint(0, width[g]) * 7 + hash(g) % 97 for g in groups])
    t = pa.table(
        {
            "g": pa.array(groups, pa.string()),
            "v": pa.array(vals, pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(blocks), groups, vals


def test_grouped_approx_distinct_accuracy(ray_session):
    from email_address_parser_ray.stages.sketches import grouped_approx_distinct

    ds, groups, vals = _grouped_ds(ray_session)
    got = dict(
        zip(*(c.to_pylist() for c in grouped_approx_distinct(ds, "g", "v").columns))
    )
    for g in "abc":
        true = len(np.unique(vals[groups == g]))
        assert abs(got[g] - true) / true < 0.08, (g, got[g], true)


def test_grouped_approx_distinct_partition_invariance(ray_session):
    from email_address_parser_ray.stages.sketches import grouped_approx_distinct

    ds1, _, _ = _grouped_ds(ray_session, blocks=2)
    ds2, _, _ = _grouped_ds(ray_session, blocks=13)
    t1 = grouped_approx_distinct(ds1, "g", "v")
    t2 = grouped_approx_distinct(ds2, "g", "v")
    assert t1.equals(t2)


def test_grouped_approx_distinct_budget_guard(ray_session):
    import email_address_parser_ray.stages.sketches as sk

    ds, _, _ = _grouped_ds(ray_session)
    old = sk.GROUPED_HLL_MAX_BYTES
    sk.GROUPED_HLL_MAX_BYTES = 4096  # one group's registers
    try:
        with pytest.raises(ValueError, match="GROUPED_HLL_MAX_BYTES"):
            sk.grouped_approx_distinct(ds, "g", "v")
    finally:
        sk.GROUPED_HLL_MAX_BYTES = old


# --- approximate quantiles -------------------------------------------------------


def test_approx_quantiles_rank_error(ray_session):
    import ray.data as rd

    from email_address_parser_ray.stages.sketches import approx_quantiles

    rng = np.random.RandomState(23)
    n = 200_000
    vals = rng.lognormal(0, 1.0, size=n)
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(vals, pa.float64()),
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = approx_quantiles(ds, "v", "id", qs, k=8192)
    sv = np.sort(vals)
    for q, val in zip(got["q"].to_pylist(), got["value"].to_pylist()):
        # rank of the returned value must be within ~2.5 sigma of q*n
        rank = np.searchsorted(sv, val) / n
        tol = 2.5 * np.sqrt(q * (1 - q) / 8192) + 1e-4
        assert abs(rank - q) < tol, (q, rank, tol)


def test_approx_quantiles_partition_invariance(ray_session):
    import ray.data as rd

    from email_address_parser_ray.stages.sketches import approx_quantiles

    n = 30_000
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "v": pa.array((np.arange(n) % 1000).astype(np.float64), pa.float64()),
        }
    )
    a = approx_quantiles(rd.from_arrow(t).repartition(3), "v", "id", [0.25, 0.75])
    b = approx_quantiles(rd.from_arrow(t).repartition(17), "v", "id", [0.25, 0.75])
    assert a.equals(b)  # content-keyed draw: layout cannot matter


def test_approx_quantiles_exact_when_small(ray_session):
    import ray.data as rd

    from email_address_parser_ray.stages.sketches import approx_quantiles

    vals = np.arange(100, dtype=np.float64)
    t = pa.table(
        {
            "id": pa.array(np.arange(100), pa.int64()),
            "v": pa.array(vals, pa.float64()),
        }
    )
    got = approx_quantiles(rd.from_arrow(t).repartition(4), "v", "id",
                           [0.0, 0.5, 0.99], k=8192)
    assert got["value"].to_pylist() == [0.0, 50.0, 99.0]
