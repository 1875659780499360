"""Regression tests for the round-4 ADVICE findings: Bloom-join
guards (over-budget fallback + empty maybe sliver), FLAC
unknown-length streams and partition-order validation, null handling
in heavy_hitters / grouped_approx_distinct, and RE2-exact
repetition-stats tokenization."""

import numpy as np
import pyarrow as pa
import pytest
from wave import Error as WavError

from email_address_parser_ray.stages import sketches
from email_address_parser_ray.stages.flac import (
    _BitReader,
    _BitWriter,
    _decode_residual,
    encode_flac,
    parse_flac,
)
from email_address_parser_ray.stages.sketches import (
    bloom_anti_join,
    bloom_bits_for,
    bloom_build,
    bloom_maybe_mask,
    bloom_anti_join,
    bloom_semi_join,
    grouped_approx_distinct,
    hash64_column,
    heavy_hitters,
)


def _ds(values, blocks=3):
    import ray.data as rd

    return rd.from_arrow(pa.table({"k": pa.array(values)})).repartition(blocks)


# --- bloom_anti_join / bloom_semi_join guards --------------------------------


def test_bloom_joins_fall_back_above_max_bytes(ray_session, monkeypatch):
    """Over BLOOM_MAX_BYTES the joins must degrade to the plain hash
    join (bloom_build would raise), exactly like bloom_pair_gc."""
    monkeypatch.setattr(sketches, "BLOOM_MAX_BYTES", 1)
    big = _ds(list(range(200)))
    small = _ds([3, 7, 500])
    anti = sorted(bloom_anti_join(big, small, on="k").to_pandas()["k"])
    semi = sorted(bloom_semi_join(big, small, on="k").to_pandas()["k"])
    assert anti == sorted(set(range(200)) - {3, 7})
    assert semi == [3, 7]


def test_bloom_joins_empty_maybe_sliver(ray_session):
    """Disjoint sides where the Bloom mask clears every big key: the
    joins must short-circuit instead of feeding an empty side to the
    hash join (the Acero 'No match FieldRef' shape)."""
    big_keys = [i * 977 for i in range(500)]
    small_keys = [10**12 + 7]
    n_bits, k = bloom_bits_for(len(small_keys))
    big = _ds(big_keys)
    small = _ds(small_keys, blocks=1)
    bm = bloom_build(small, "k", n_bits, k)
    mask = bloom_maybe_mask(
        bm, hash64_column(pa.array(big_keys, pa.int64())), n_bits, k
    )
    # the test must actually exercise the empty-sliver branch
    assert not mask.any(), "pick different keys: Bloom FP hit"
    anti = bloom_anti_join(big, small, on="k")
    semi = bloom_semi_join(big, small, on="k")
    assert sorted(anti.to_pandas()["k"]) == sorted(big_keys)
    assert semi.count() == 0


# --- FLAC: unknown total_samples + partition-order validation ----------------


def _zero_streaminfo_total(payload: bytes) -> bytes:
    """STREAMINFO body bytes 10..18 hold rate/ch/bps/total packed;
    total is the low 36 bits.  Body starts at payload offset 8."""
    buf = bytearray(payload)
    bi = int.from_bytes(buf[18:26], "big")
    bi &= ~0xFFFFFFFFF
    buf[18:26] = bi.to_bytes(8, "big")
    return bytes(buf)


def test_flac_unknown_length_stream_decodes():
    rng = np.random.RandomState(11)
    pcm = np.cumsum(rng.randint(-200, 201, size=5000)).clip(-30000, 30000)
    payload = _zero_streaminfo_total(encode_flac(pcm, 16000))
    rate, frames = parse_flac(payload)
    assert rate == 16000
    assert frames.shape == (5000, 1)
    back = np.round(frames[:, 0] * (1 << 15)).astype(np.int64)
    assert np.array_equal(back, pcm)


def test_flac_unknown_length_no_frames_raises():
    # metadata only, zero total, no frames → honest error, not silence
    payload = _zero_streaminfo_total(encode_flac(np.zeros(1, np.int64), 16000))
    # truncate right after the 38-byte STREAMINFO block (4 magic + 4 hdr + 34)
    with pytest.raises(WavError):
        parse_flac(payload[:42])


def test_flac_residual_partition_divisibility_guard():
    w = _BitWriter()
    w.write(0, 2)  # Rice method, 4-bit params
    w.write(3, 4)  # partition order 3 → 8 partitions; 100 % 8 != 0
    w.write(0, 4)  # rice k for partition 0 (never reached)
    w.align()
    br = _BitReader(w.to_bytes(), 0)
    with pytest.raises(WavError):
        _decode_residual(br, 100, 0)


# --- null handling in the sketch tier -----------------------------------------


def test_heavy_hitters_ignores_nulls(ray_session):
    vals = ["a"] * 50 + ["b"] * 30 + [None] * 40 + ["c"] * 5
    t = heavy_hitters(_ds(vals), "k", phi=0.2)
    got = dict(zip(t["key"].to_pylist(), t["count"].to_pylist()))
    assert got == {"a": 50, "b": 30}


def test_grouped_approx_distinct_ignores_null_groups(ray_session):
    import ray.data as rd

    g = ["x"] * 100 + [None] * 50 + ["y"] * 80
    v = list(range(100)) + list(range(50)) + list(range(40)) * 2
    ds = rd.from_arrow(
        pa.table({"g": pa.array(g, pa.string()), "v": pa.array(v, pa.int64())})
    ).repartition(4)
    t = grouped_approx_distinct(ds, "g", "v", p=12)
    groups = t["g"].to_pylist()
    est = dict(zip(groups, t["approx_distinct"].to_pylist()))
    assert groups == ["x", "y"]
    assert abs(est["x"] - 100) <= 10 and abs(est["y"] - 40) <= 6


# --- repetition stats: RE2-exact tokenization ---------------------------------


def test_repetition_stats_matches_oracle_on_exotic_whitespace():
    """NBSP / vertical tab are token CHARS for RE2's \\S+ (the oracle)
    but separators for Python str.split(); \\x01 inside tokens must not
    collide joined bigrams.  Both sides must agree exactly."""
    import duckdb

    from email_address_parser_ray.functions.textstats import repetition_stats

    docs = [
        "a\xa0b a\xa0b c",          # NBSP-joined token repeated
        "x\x0by x\x0by x\x0by",     # vertical-tab token chars
        "p\x01q r p q\x01r p",      # \x01 bigram-collision probe
        "plain plain plain text",
        "one-token",
        "",
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()),
         "text": pa.array(docs, pa.string())}
    )
    got = repetition_stats(batch)
    con = duckdb.connect()
    con.register("documents", batch.select(["doc_id", "text"]))
    oracle = con.execute(
        "WITH rep AS (SELECT doc_id, CAST(max(c) * 1000000 // greatest(sum(c), 1) AS BIGINT) AS top_tok_ppm "
        "FROM (SELECT doc_id, tok, count(*) AS c FROM "
        "(SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents) "
        "GROUP BY doc_id, tok) GROUP BY doc_id), "
        "bg AS (SELECT doc_id, CAST((count(*) - count(DISTINCT g)) * 1000000 // greatest(count(*), 1) AS BIGINT) AS dup_2gram_ppm "
        "FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1), "
        "i -> toks[i] || ' ' || toks[i + 1])) AS g "
        "FROM (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents)) "
        "GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(rep.top_tok_ppm, 0) AS top_tok_ppm, "
        "coalesce(bg.dup_2gram_ppm, 0) AS dup_2gram_ppm "
        "FROM documents d LEFT JOIN rep USING (doc_id) LEFT JOIN bg USING (doc_id) "
        "ORDER BY doc_id"
    ).fetch_arrow_table()
    assert got["top_tok_ppm"].to_pylist() == oracle["top_tok_ppm"].to_pylist()
    assert got["dup_2gram_ppm"].to_pylist() == oracle["dup_2gram_ppm"].to_pylist()


# --- grouped approximate quantiles --------------------------------------------


def _grouped_ds(seed=7, groups=("a", "b", "c"), n_per=(20000, 5000, 100), blocks=6):
    import ray.data as rd

    rng = np.random.RandomState(seed)
    g, v, kid = [], [], []
    base = 0
    for name, n in zip(groups, n_per):
        g.extend([name] * n)
        v.extend(rng.normal(loc=len(name) * 10, scale=5, size=n).tolist())
        kid.extend(range(base, base + n))
        base += n
    t = pa.table(
        {
            "g": pa.array(g, pa.string()),
            "v": pa.array(v, pa.float64()),
            "rid": pa.array(kid, pa.int64()),
        }
    )
    return rd.from_arrow(t).repartition(blocks), t


def test_grouped_approx_quantiles_rank_error_and_exact_small(ray_session):
    from email_address_parser_ray.stages.sketches import grouped_approx_quantiles

    ds, t = _grouped_ds()
    qs = [0.1, 0.5, 0.9]
    out = grouped_approx_quantiles(ds, "g", "v", "rid", qs, k=4096).to_pandas()
    df = t.to_pandas()
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["v"].to_numpy())
        for q in qs:
            got = float(
                out[(out["g"] == g) & (out["q"] == q)]["value"].iloc[0]
            )
            # rank of the returned value must be within 3.5 sigma of q
            rank = np.searchsorted(vals, got, side="right") / len(vals)
            tol = 3.5 * np.sqrt(q * (1 - q) / min(4096, len(vals))) + 1.0 / len(vals)
            assert abs(rank - q) <= tol, (g, q, rank)
        if len(vals) <= 4096:  # small group: exact lower-nearest-rank
            for q in qs:
                got = float(out[(out["g"] == g) & (out["q"] == q)]["value"].iloc[0])
                assert got == vals[min(int(q * len(vals)), len(vals) - 1)]


def test_grouped_approx_quantiles_partition_invariant(ray_session):
    from email_address_parser_ray.stages.sketches import grouped_approx_quantiles

    ds1, t = _grouped_ds(seed=13, blocks=1)
    ds8, _ = _grouped_ds(seed=13, blocks=8)
    qs = [0.25, 0.75]
    a = grouped_approx_quantiles(ds1, "g", "v", "rid", qs, k=512).to_pandas()
    b = grouped_approx_quantiles(ds8, "g", "v", "rid", qs, k=512).to_pandas()
    assert a.values.tolist() == b.values.tolist()


def test_grouped_approx_quantiles_null_groups_and_budget(ray_session):
    import ray.data as rd

    from email_address_parser_ray.stages import sketches as sk

    t = pa.table(
        {
            "g": pa.array(["x"] * 50 + [None] * 20 + ["y"] * 30, pa.string()),
            "v": pa.array([float(i) for i in range(100)], pa.float64()),
            "rid": pa.array(range(100), pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    out = sk.grouped_approx_quantiles(ds, "g", "v", "rid", [0.5], k=64)
    assert out["g"].to_pylist() == ["x", "y"]
    old = sk.GROUPED_QUANTILE_MAX_SAMPLES
    sk.GROUPED_QUANTILE_MAX_SAMPLES = 10
    try:
        with pytest.raises(ValueError, match="GROUPED_QUANTILE_MAX_SAMPLES"):
            sk.grouped_approx_quantiles(ds, "g", "v", "rid", [0.5], k=64)
    finally:
        sk.GROUPED_QUANTILE_MAX_SAMPLES = old
