"""Training-data operator tests: dedup family, ANN, text stats, multimodal
plumbing — with small controlled inputs so expected outputs are exact.
"""

import numpy as np
import pyarrow as pa
import pytest


def _docs_with_near_dups():
    """12 docs: 3 exact copies of A, 2 near-dups of B (one word changed in
    a 300-distinct-token doc — high shingle-Jaccard AND low SimHash
    hamming), the rest distinct."""
    base_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    base_b = " ".join(f"tok{i:04d}" for i in range(300))
    b_var = base_b.replace("tok0150", "tokXXXX", 1)
    texts = [
        base_a, base_a, base_a,
        base_b, b_var,
        "totally different content about distributed dataflow engines and arrow",
        "another unrelated piece mentioning shuffles and actors in a cluster",
        "short text",
        "the quick brown fox jumps over the lazy dog again and again today",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod",
        "rayon weaves threads while ray schedules tasks across the object store",
        "final document closing out the tiny corpus with neutral words only",
    ]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_exact_dedup_groups(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.dedup import exact_dedup

    out = exact_dedup(rd.from_arrow(_docs_with_near_dups())).to_pandas()
    assert len(out) == 10  # 12 docs, one triple collapses
    trip = out[out["n_copies"] == 3]
    assert len(trip) == 1 and trip["doc_id"].iat[0] == 0


def test_minhash_finds_planted_near_dups(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.dedup import minhash_dedup_clusters

    out = minhash_dedup_clusters(
        rd.from_arrow(_docs_with_near_dups()), threshold=0.5
    ).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[0] == cl[1] == cl[2]          # exact copies
    assert cl[3] == cl[4]                    # near-dup pair
    assert cl[0] != cl[3]
    assert cl[5] not in (cl[0], cl[3])


def test_minhash_verify_paths_agree(ray_session, monkeypatch):
    """The broadcast-lookup fast path (below SMALL_CAND_LIMIT) and the
    hash-join path (above it) must produce identical verified pairs."""
    import ray.data as rd
    from email_address_parser_ray.stages import dedup

    docs = _docs_with_near_dups()

    def run():
        out = dedup.minhash_verified_pairs(
            rd.from_arrow(docs), threshold=0.5
        ).to_pandas()
        return sorted(map(tuple, out[["doc_a", "doc_b", "jaccard_e6"]].to_numpy()))

    fast = run()
    monkeypatch.setattr(dedup, "SMALL_CAND_LIMIT", -1)  # force hash-join path
    slow = run()
    assert fast == slow and len(fast) >= 4


def test_simhash_finds_exact_and_near(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.dedup import simhash_near_dups

    out = simhash_near_dups(rd.from_arrow(_docs_with_near_dups()), max_hamming=4).to_pandas()
    pairs = set(map(tuple, out[["doc_a", "doc_b"]].to_numpy()))
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert (3, 4) in pairs


def test_jaccard_verifier_exact():
    from email_address_parser_ray.stages.dedup import JaccardVerifier

    t = pa.table(
        {
            "doc_a": pa.array([1], pa.int64()),
            "doc_b": pa.array([2], pa.int64()),
            "text_a": pa.array(["a b c d e f"], pa.string()),
            "text_b": pa.array(["a b c d e f"], pa.string()),
        }
    )
    out = JaccardVerifier()(t)
    assert out["jaccard_e6"][0].as_py() == 1_000_000


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.ann import brute_force_topk

    rng = np.random.RandomState(7)
    m = rng.normal(size=(200, 16)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([row.tolist() for row in m], pa.list_(pa.float32())),
        }
    )
    q = m[0].astype(np.float64)
    out = brute_force_topk(rd.from_arrow(t), q, k=5).to_pandas()
    mm = m.astype(np.float64)
    mm /= np.linalg.norm(mm, axis=1, keepdims=True)
    qq = q / np.linalg.norm(q)
    cos = mm @ qq
    want = np.argsort(-np.round(cos * 10_000))[:5]
    assert out["vec_id"].iat[0] == 0
    assert set(out["vec_id"]) == set(want)


def test_lsh_topk_contains_query_itself(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.ann import lsh_topk

    rng = np.random.RandomState(11)
    m = rng.normal(size=(300, 16)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array([row.tolist() for row in m], pa.list_(pa.float32())),
        }
    )
    out = lsh_topk(rd.from_arrow(t), m[42].astype(np.float64), k=3).to_pandas()
    assert out["vec_id"].iat[0] == 42  # its own bucket always probed


def test_embedding_near_dup_pairs(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.ann import embedding_near_dup_pairs

    rng = np.random.RandomState(3)
    base = rng.normal(size=(50, 16))
    dup = base[7] + rng.normal(scale=1e-3, size=16)  # near-identical to 7
    m = np.vstack([base, dup])
    t = pa.table(
        {
            "vec_id": pa.array(range(51), pa.int64()),
            "embedding": pa.array([r.tolist() for r in m.astype(np.float32)], pa.list_(pa.float32())),
        }
    )
    out = embedding_near_dup_pairs(rd.from_arrow(t), d=16, threshold=0.99).to_pandas()
    assert (7, 50) in set(map(tuple, out[["vec_a", "vec_b"]].to_numpy()))


def test_cosine_pairs_exact_matches_numpy(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.ann import cosine_pairs_exact

    rng = np.random.RandomState(5)
    m = rng.normal(size=(120, 16)).astype(np.float32)
    m[60] = m[12] + rng.normal(scale=0.05, size=16).astype(np.float32)  # plant a hit
    t = pa.table(
        {
            "vec_id": pa.array(range(120), pa.int64()),
            "embedding": pa.array([r.tolist() for r in m], pa.list_(pa.float32())),
        }
    )
    out = cosine_pairs_exact(rd.from_arrow(t), threshold=0.6).to_pandas()
    got = set(map(tuple, out[["vec_a", "vec_b"]].to_numpy()))
    mm = m.astype(np.float64)
    mm /= np.linalg.norm(mm, axis=1, keepdims=True)
    sims = mm @ mm.T
    ia, ib = np.triu_indices(120, k=1)
    want = {(int(a), int(b)) for a, b in zip(ia[sims[ia, ib] >= 0.6], ib[sims[ia, ib] >= 0.6])}
    assert (12, 60) in want
    assert got == want  # exact: recall AND precision 1.0 vs brute force


def test_token_stats_vectorized():
    from email_address_parser_ray.functions.textstats import token_stats

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a bb  ccc", "Hello, world! 42"], pa.string()),
        }
    )
    out = token_stats(t)
    assert out["n_tokens"].to_pylist() == [3, 3]
    assert out["n_chars"].to_pylist() == [9, 16]
    # "Hello" "," "world" "!" "42" → 5 BPE-ish tokens
    assert out["n_bpeish"].to_pylist()[1] == 5


def test_normalize_text_canonical_form():
    """NFC composition (via the non-ASCII fallback — pyarrow 16's
    utf8_normalize never composes), case folding, whitespace collapse."""
    from email_address_parser_ray.functions.textstats import normalize_text

    decomposed = "Café  du\tMonde\r\n"
    out = normalize_text(pa.array([decomposed, "  plain   ASCII  ", ""]))
    assert out.to_pylist() == ["café du monde", "plain ascii", ""]
    # idempotent: normalizing the output is a no-op
    assert normalize_text(out).to_pylist() == out.to_pylist()


def test_normalize_text_strip_marks_matches_duckdb():
    """strip_marks must reproduce DuckDB strip_accents: combining marks
    go, but ligatures / fullwidth / non-decomposable letters survive."""
    import duckdb

    from email_address_parser_ray.functions.textstats import normalize_text

    cases = ["Éclair CAFÉ", "Øresund ﬁle", "niño über"]
    ours = normalize_text(pa.array(cases), strip_marks=True).to_pylist()
    con = duckdb.connect()
    for c, mine in zip(cases, ours):
        want, = con.execute(
            "SELECT trim(regexp_replace(lower(strip_accents(?)), "
            "'\\s+', ' ', 'g'), ' ')", [c]
        ).fetchone()
        assert mine == want
    assert ours[0] == "eclair cafe"
    assert ours[1] == "øresund ﬁle"  # Ø and the fi ligature survive


def test_normalize_text_nfkc_compatibility():
    """NFKC folds fullwidth and ligature compatibility forms (Python
    unicodedata path, exercised because the rows are non-ASCII)."""
    from email_address_parser_ray.functions.textstats import normalize_text

    out = normalize_text(
        pa.array(["ＦＵＬＬ ﬁle"]), form="NFKC"
    )
    assert out.to_pylist() == ["full file"]


def test_lang_id_english_stopwords():
    from email_address_parser_ray.functions.textstats import lang_id

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    "the cat sat on the mat and it is a good day for the团队",
                    "el perro y la casa de un amigo que es grande por la calle",
                ],
                pa.string(),
            ),
        }
    )
    out = lang_id(t)
    assert out["lang_pred"].to_pylist() == ["en", "es"]


def test_media_decoder_plumbing(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.multimodal import (
        MediaDecoder, media_features, synthesize_media_table,
    )

    media = synthesize_media_table(64)
    out = media_features(rd.from_arrow(media), concurrency=2, batch_size=16).to_pandas()
    assert len(out) == 64
    assert {"media_id", "kind", "n_bytes", "features"} <= set(out.columns)
    assert all(len(f) == 8 for f in out["features"])
    # deterministic: same payload → same features
    d = MediaDecoder(fake=True)
    f1 = d._decode(b"payload", "image")
    f2 = d._decode(b"payload", "image")
    assert np.allclose(f1, f2)
    with pytest.raises(NotImplementedError):
        MediaDecoder(fake=False)._decode(b"x", "image")


def test_image_resize_and_frame_sample_plumbing(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.multimodal import (
        FrameSampler, ImageResizer, synthesize_media_table,
    )

    media = synthesize_media_table(96)
    ds = rd.from_arrow(media)
    resized = ds.map_batches(
        ImageResizer, batch_format="pyarrow", batch_size=16, concurrency=(1, 2), num_cpus=1
    ).to_pandas()
    assert (resized["width"] == 256).all() and (resized["height"] == 256).all()
    assert len(resized) == 96

    frames = ds.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=16, concurrency=(1, 2), num_cpus=1
    ).to_pandas()
    n_videos = (media["kind"].to_pandas() == "video").sum()
    assert len(frames) == 4 * n_videos
    assert set(frames["frame_idx"]) == {0, 1, 2, 3}


def test_embedding_near_dup_matches_exact(ray_session):
    """Banded-LSH near-dup at the query threshold reproduces the exact
    all-pairs result on the driver's embeddings (recall check for the
    SQL-oracled embedding_neardup query)."""
    import ray.data as rd
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.ann import (
        cosine_pairs_exact, embedding_near_dup_pairs,
    )

    emb = read_parquet_clean(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    lsh = embedding_near_dup_pairs(emb, d=64, threshold=0.45).to_pandas()
    exact = cosine_pairs_exact(emb, threshold=0.45).to_pandas()
    key = lambda df: sorted(map(tuple, df[["vec_a", "vec_b"]].to_numpy()))
    assert key(lsh) == key(exact)
    assert len(lsh) > 0


def test_embedding_near_dup_join_path_matches_broadcast(ray_session, monkeypatch):
    """Force the twin-hash-join verify path and the distributed
    sorted_pair_dedup cross-band dedup (both gates to 0) — the true
    100-TB shape must produce exactly the broadcast path's pairs."""
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages import ann

    emb = read_parquet_clean(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    fast = ann.embedding_near_dup_pairs(emb, d=64, threshold=0.45).to_pandas()
    monkeypatch.setattr(ann, "NEARDUP_BROADCAST_BYTE_LIMIT", 0)
    monkeypatch.setattr(ann, "NEARDUP_SMALL_CAND_LIMIT", 0)
    joined = ann.embedding_near_dup_pairs(emb, d=64, threshold=0.45).to_pandas()
    key = lambda df: sorted(map(tuple, df[["vec_a", "vec_b", "cos_e3"]].to_numpy()))
    assert key(fast) == key(joined)
    assert len(fast) > 0


def test_embedding_near_dup_driver_fold_matches_distributed(ray_session):
    """The byte-gated driver fold (input_bytes_hint below the gate) must
    produce exactly the distributed path's pairs+cosines — the PageRank
    dual-path-equality pattern."""
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages import ann

    emb = read_parquet_clean(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    dist = ann.embedding_near_dup_pairs(emb, d=64, threshold=0.45).to_pandas()
    folded = ann.embedding_near_dup_pairs(
        emb, d=64, threshold=0.45, input_bytes_hint=1
    ).to_pandas()
    key = lambda df: sorted(map(tuple, df[["vec_a", "vec_b", "cos_e3"]].to_numpy()))
    assert key(dist) == key(folded)
    assert len(folded) > 0
    # a hint above the gate must keep the distributed path
    assert ann.NEARDUP_SMALL_INPUT_BYTES < 10**12


def test_embedding_near_dup_fold_branches(ray_session, monkeypatch):
    """All three fold regimes agree: gram scan (default), the
    capped-candidate branch (gram row cap forced to 0), and the
    decline-to-distributed path (pair budget forced to 0)."""
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages import ann

    emb = read_parquet_clean(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    key = lambda df: sorted(map(tuple, df[["vec_a", "vec_b", "cos_e3"]].to_numpy()))
    gram = ann.embedding_near_dup_pairs(
        emb, d=64, threshold=0.45, input_bytes_hint=1
    ).to_pandas()

    monkeypatch.setattr(ann, "NEARDUP_GRAM_MAX_ROWS", 0)
    cand = ann.embedding_near_dup_pairs(
        emb, d=64, threshold=0.45, input_bytes_hint=1
    ).to_pandas()
    assert key(cand) == key(gram)

    monkeypatch.setattr(ann, "NEARDUP_FOLD_MAX_PAIRS", 0)
    declined = ann.embedding_near_dup_pairs(
        emb, d=64, threshold=0.45, input_bytes_hint=1
    ).to_pandas()
    assert key(declined) == key(gram)
    assert len(gram) > 0


def test_ivf_topk_probe_behavior(ray_session):
    """Exhaustive probe equals brute force; restricted probe returns k
    results drawn only from the probed cells."""
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.ann import brute_force_topk, ivf_topk
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.asarray(t["embedding"][t["vec_id"].to_pylist().index(0)].as_py(), float)

    emb = read_parquet_clean(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    full = ivf_topk(emb, q, k=10, nprobe=10).to_pandas()
    brute = brute_force_topk(
        read_parquet_clean(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]),
        q, k=10,
    ).to_pandas()
    assert full.values.tolist() == brute.values.tolist()

    narrow = ivf_topk(emb, q, k=10, nprobe=2).to_pandas()
    assert len(narrow) == 10
    # every hit comes from one of the 2 probed cells, and within those
    # cells the ranking is exact (equals brute force over the same subset)
    labels = dict(
        pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "label"])
        .to_pandas()
        .itertuples(index=False, name=None)
    )
    probed = {labels[v] for v in narrow["vec_id"]}
    assert len(probed) <= 2
    sub = read_parquet_clean(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    ).filter(lambda r: r["label"] in probed)
    sub_brute = brute_force_topk(sub, q, k=10).to_pandas()
    assert narrow.values.tolist() == sub_brute.values.tolist()


def _lloyd_reference(ids, m, k, iters, grid=1_000_000):
    """Pure-numpy integer-exact Lloyd, the spec for stages/kmeans.py."""
    def assign(m, ce6):
        c = ce6.astype(np.float64) / grid
        d2 = (m * m).sum(1)[:, None] - 2.0 * (m @ c.T) + (c * c).sum(1)[None, :]
        return d2.argmin(1)

    ce6 = np.floor(m[np.argsort(ids)][:k] * grid).astype(np.int64)
    for _ in range(iters):
        cell = assign(m, ce6)
        q = np.floor(m * grid).astype(np.int64)
        sums = np.zeros((k, q.shape[1]), np.int64)
        np.add.at(sums, cell, q)
        cnts = np.bincount(cell, minlength=k).astype(np.int64)
        upd = np.sign(sums) * (np.abs(sums) // np.maximum(cnts, 1)[:, None])
        ce6 = np.where(cnts[:, None] > 0, upd, ce6).astype(np.int64)
    return ce6, assign(m, ce6)


def test_kmeans_matches_reference_and_reduces_inertia(ray_session):
    import pyarrow.parquet as pq
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.kmeans import kmeans_cells, kmeans_fit

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    m = np.asarray(t["embedding"].to_pylist(), np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]

    emb = read_parquet_clean(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    for iters in (0, 1, 3):
        ref_c, ref_a = _lloyd_reference(ids, m, k=8, iters=iters)
        got_c = kmeans_fit(emb, k=8, iters=iters)
        assert np.array_equal(got_c, ref_c), f"centroids diverge at iters={iters}"
        got = (
            kmeans_cells(emb, k=8, iters=iters)
            .to_pandas()
            .set_index("vec_id")["cell"]
            .reindex(ids)
            .to_numpy()
        )
        assert np.array_equal(got, ref_a), f"assignment diverges at iters={iters}"

    def inertia(ce6, a):
        c = ce6.astype(np.float64) / 1_000_000
        return float(((m - c[a]) ** 2).sum())

    vals = [inertia(*_lloyd_reference(ids, m, k=8, iters=i)) for i in (0, 1, 3)]
    assert vals[0] > vals[1] >= vals[2]  # Lloyd never increases inertia


def test_kmeans_sample_fit_assigns_everything(ray_session):
    from email_address_parser_ray.sources.io import read_parquet_clean
    from email_address_parser_ray.stages.kmeans import kmeans_cells

    sf = "/root/testdata/sf0.001"
    emb = read_parquet_clean(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    df = kmeans_cells(emb, k=8, iters=2, sample_mod=4).to_pandas()
    assert len(df) == emb.count()  # sketch fit, full one-pass assignment
    assert df["cell"].between(0, 7).all()
    assert df["vec_id"].is_unique


def test_decontaminate_flags_overlapping_train_docs(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.dedup import decontaminate

    # eval doc shares the trigram "alpha beta gamma" with train doc 0 and
    # shares nothing with the others; train doc 1 is byte-disjoint
    ev = pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array(["benchmark question alpha beta gamma answer"], pa.string()),
    })
    train = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([
            "prefix words alpha beta gamma suffix tail here",
            "completely disjoint vocabulary nothing shared at all",
        ], pa.string()),
    })
    out = decontaminate(rd.from_arrow(train), rd.from_arrow(ev)).to_pandas()
    assert out["doc_id"].tolist() == [0]
    assert out["n_hits"].iat[0] == 1  # exactly the one shared shingle


def test_decontaminate_counts_distinct_shared_shingles(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.dedup import decontaminate

    # train doc repeats the contaminated span twice: n_hits counts
    # DISTINCT shingles, so the duplicate span adds nothing
    ev = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["one two three four"], pa.string()),
    })
    train = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["one two three four filler one two three four"], pa.string()),
    })
    out = decontaminate(rd.from_arrow(train), rd.from_arrow(ev)).to_pandas()
    # eval shingles: {"one two three", "two three four"}; both appear in train
    assert out["n_hits"].iat[0] == 2


def test_decontaminate_edge_docs_and_empty_eval(ray_session):
    """Short (<k tokens) and empty docs flow through the vectorized
    prefilter with the same short-doc rule as word_shingle_set; an
    empty eval corpus flags nothing."""
    import ray.data as rd
    from email_address_parser_ray.stages.dedup import decontaminate

    ev = pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(["short one", ""], pa.string()),
    })
    train = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "short one",                  # short-doc shingle match
            "",                           # empty matches empty-eval doc
            "short one plus more words",  # full-width shingles only: no match
            "unrelated entirely",
        ], pa.string()),
    })
    out = (
        decontaminate(rd.from_arrow(train), rd.from_arrow(ev))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["doc_id"].tolist() == [0, 1]
    assert out["n_hits"].tolist() == [1, 1]

    empty_ev = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    })
    assert decontaminate(rd.from_arrow(train), rd.from_arrow(empty_ev)).count() == 0


def test_decontaminate_eval_guard(ray_session):
    """Above the broadcast gate the operator now degrades to the
    distributed Bloom path instead of raising (full branch-equality
    coverage lives in tests/test_decontaminate_scale.py) — here: the
    self-decontamination answer must be unchanged by the gate."""
    import ray.data as rd
    import email_address_parser_ray.stages.dedup as dedup

    ev = pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a b c d e f g h"], pa.string()),
    })
    want = dedup.decontaminate(rd.from_arrow(ev), rd.from_arrow(ev)).to_pandas()
    old = dedup.DECONTAM_MAX_EVAL_SHINGLES
    dedup.DECONTAM_MAX_EVAL_SHINGLES = 2
    try:
        got = dedup.decontaminate(rd.from_arrow(ev), rd.from_arrow(ev)).to_pandas()
    finally:
        dedup.DECONTAM_MAX_EVAL_SHINGLES = old
    assert got.values.tolist() == want.values.tolist() == [[0, 6]]


def test_sorted_pair_dedup_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd
    from email_address_parser_ray.stages.dedup import sorted_pair_dedup

    rng = np.random.RandomState(11)
    for seed in range(3):
        rng = np.random.RandomState(seed)
        n = 50_000
        a = rng.randint(0, 2000, n)
        b = rng.randint(0, 25, n)
        v = rng.randint(0, 1000, n)
        tbl = pa.table({
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64()),
            "val": pa.array(v, pa.int64()),
        })
        out = sorted_pair_dedup(
            rd.from_arrow(tbl).repartition(16), ["doc_a", "doc_b"], [("val", "min")]
        ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        exp = (
            pd.DataFrame({"doc_a": a, "doc_b": b, "val": v})
            .groupby(["doc_a", "doc_b"], as_index=False)["val"].min()
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        assert out.equals(exp.astype({"doc_a": "int64", "doc_b": "int64", "val": "int64"}))


def test_dedupe_edges_sorted_path_matches_driver_fold(ray_session, monkeypatch):
    import ray.data as rd
    import email_address_parser_ray.stages.scoring as scoring

    tbl = pa.table({
        "addr_a": pa.array(["b@x", "a@x", "a@x", "c@x"], pa.string()),
        "addr_b": pa.array(["a@x", "b@x", "c@x", "a@x"], pa.string()),
        "score": pa.array([900, 900, 800, 700], pa.int64()),
        "rule": pa.array([2, 1, 1, 3], pa.int64()),
    })
    ds = rd.from_arrow(tbl).repartition(3)
    small = scoring.dedupe_edges(ds).to_pandas().sort_values(
        ["addr_a", "addr_b"]).reset_index(drop=True)
    monkeypatch.setattr(scoring, "SMALL_EDGE_LIMIT", 0)
    big = scoring.dedupe_edges(ds).to_pandas().sort_values(
        ["addr_a", "addr_b"]).reset_index(drop=True)
    assert list(small.columns) == ["addr_a", "addr_b", "rule", "score"]
    assert big[list(small.columns)].equals(small)
    # (a@x, b@x) emitted both ways: min rule 1, max score 900
    row = small[(small.addr_a == "a@x") & (small.addr_b == "b@x")]
    assert row["rule"].iat[0] == 1 and row["score"].iat[0] == 900


def test_sorted_pair_dedup_merges_boundary_partials(ray_session):
    import pandas as pd
    import ray.data as rd
    from email_address_parser_ray.stages.dedup import sorted_pair_dedup

    # every key appears once per input block, so after the per-block
    # partial pass each key has 16 partial rows; if Ray's sort ever
    # slices an equal-key run across output blocks (probed: it does not
    # today, even at 944 forced blocks — but it is undocumented), the
    # boundary stitch must MERGE the straddling partials, not drop one.
    # This pins the end-to-end invariant under aggressive block counts.
    n_keys, n_blocks = 1000, 16
    k = np.tile(np.arange(n_keys), n_blocks)
    v = np.concatenate([np.full(n_keys, b + 1) for b in range(n_blocks)])
    tbl = pa.table({
        "doc_a": pa.array(k, pa.int64()),
        "doc_b": pa.array(k % 7, pa.int64()),
        "n": pa.array(v, pa.int64()),
    })
    out = sorted_pair_dedup(
        rd.from_arrow(tbl).repartition(n_blocks), ["doc_a", "doc_b"], [("n", "sum")]
    ).to_pandas()
    assert len(out) == n_keys
    # every key's sum must include all 16 block contributions
    assert (out["n"] == sum(range(1, n_blocks + 1))).all()


def test_word_shingles_flat_rules():
    from email_address_parser_ray.functions.hashing import (
        minhash_signature_batch, minhash_signature_flat, word_shingles_flat,
    )

    texts = ["a b c d e", "x y", "", "one", "a b c", "c b a", "a a a a"]
    flat, lens = word_shingles_flat(texts, 3)
    # window counts: max(n_tokens - k + 1, 1) with the short-doc rule
    assert lens.tolist() == [3, 1, 1, 1, 1, 1, 2]
    offs = np.cumsum(lens) - lens
    # identical window text -> identical hash ("a b c" == doc0's first window)
    assert flat[offs[0]] == flat[offs[4]]
    # token order matters
    assert flat[offs[4]] != flat[offs[5]]
    # deterministic across calls; empty docs agree
    f2, _ = word_shingles_flat(["", ""], 3)
    assert f2[0] == f2[1]
    fa, _ = word_shingles_flat(texts, 3)
    assert (fa == flat).all()
    # flat signature core == list-of-rows wrapper
    rows = [np.array([1, 2, 3], dtype=np.uint64), np.array([7], dtype=np.uint64)]
    s1 = minhash_signature_batch(rows)
    s2 = minhash_signature_flat(
        np.array([1, 2, 3, 7], dtype=np.uint64), np.array([3, 1])
    )
    assert (s1 == s2).all()


def test_hash_join_full_outer(ray_session):
    import ray.data as rd
    from email_address_parser_ray.stages.joins import hash_join

    l = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "a": pa.array([10, 20, 30], pa.int64()),
    }))
    r = rd.from_arrow(pa.table({
        "j": pa.array([2, 3, 4], pa.int64()),
        "b": pa.array([200, 300, 400], pa.int64()),
    }))
    out = hash_join(l, r, on="k", right_on="j", join_type="full_outer").to_pandas()
    rows = {int(k): (a, b) for k, a, b in
            zip(out["k"], out["a"].fillna(-1), out["b"].fillna(-1))}
    assert rows == {1: (10, -1), 2: (20, 200), 3: (30, 300), 4: (-1, 400)}
