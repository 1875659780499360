"""DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169).

Pins: feature counts match a scalar reference (incl. doc-boundary
bigram masking and empty docs), log-weights match a numpy replay,
target-like docs win the selection over junk, the Gumbel log-weight
sampler is order-identical to Efraimidis-Spirakis on safe weights,
and the whole path is partition-invariant.
"""
import zlib

import numpy as np
import pyarrow as pa
import pytest
import ray

from email_address_parser_ray.functions.hashing import mix64
from email_address_parser_ray.stages.dsir import (
    _TOK_SEED,
    _feature_ids,
    append_dsir_log_weight,
    dsir_log_ratio,
    dsir_select_k,
    hashed_ngram_counts,
)
from email_address_parser_ray.stages.sketches import weighted_sample_k

M = 512


def _tok_h(w):
    return mix64(np.uint64(zlib.crc32(w.encode())))


def _ref_ids(text, m=M):
    toks = text.split()
    ids = [int(_tok_h(w) % np.uint64(m)) for w in toks]
    for a, b in zip(toks, toks[1:]):
        h = mix64(mix64(_TOK_SEED ^ _tok_h(a)) ^ _tok_h(b))
        ids.append(int(h % np.uint64(m)))
    return ids


def test_feature_ids_match_scalar_reference():
    texts = ["a b c", "", "x", "p q"]
    ids, doc_idx = _feature_ids(texts, M)
    ref = []
    for i, t in enumerate(texts):
        ref.extend((i, f) for f in _ref_ids(t))
    got = sorted(zip(doc_idx.tolist(), ids.tolist()))
    assert got == sorted(ref)
    # no bigram ever crosses a doc boundary: doc 0 has 3 uni + 2 bi,
    # doc 1 none, doc 2 one uni, doc 3 two uni + one bi
    counts = np.bincount(doc_idx, minlength=4)
    assert counts.tolist() == [5, 0, 1, 3]


def _ds(texts, blocks=3):
    return ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
    ).repartition(blocks)


def test_counts_match_reference_and_partition_invariant(ray_session):
    texts = ["the cat sat", "the dog", "", "cat cat cat", "a b c d e"]
    ref = np.zeros(M, np.int64)
    for t in texts:
        for f in _ref_ids(t):
            ref[f] += 1
    for blocks in (1, 4):
        got = hashed_ngram_counts(_ds(texts, blocks), M)
        assert np.array_equal(got, ref)


def test_log_weights_match_numpy_replay(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, int(rng.integers(0, 15)))) for _ in range(20)]
    lr = rng.normal(size=M)
    out = (
        append_dsir_log_weight(_ds(texts), lr, M)
        .to_pandas()
        .sort_values("doc_id")
    )
    ref = [sum(lr[f] for f in _ref_ids(t)) for t in texts]
    assert np.allclose(out["dsir_logw"].to_numpy(), ref, atol=1e-12)


def test_target_like_docs_win_selection(ray_session):
    rng = np.random.default_rng(5)
    tvocab = [f"t{i}" for i in range(20)]
    jvocab = [f"j{i}" for i in range(20)]
    target = [" ".join(rng.choice(tvocab, 12)) for _ in range(10)]
    raw = []
    for i in range(60):
        v = tvocab if i % 3 == 0 else jvocab
        raw.append(" ".join(rng.choice(v, 12)))
    sel = dsir_select_k(_ds(raw, 4), _ds(target, 2), k=15, m=M)
    picked = sel["doc_id"].to_pylist()
    assert len(picked) == 15
    # every selected doc is target-like (doc_id % 3 == 0 by construction)
    assert all(d % 3 == 0 for d in picked)
    assert all(np.isfinite(sel["dsir_logw"].to_numpy()))


def test_selection_partition_invariant(ray_session):
    rng = np.random.default_rng(9)
    vocab = [f"v{i}" for i in range(40)]
    target = [" ".join(rng.choice(vocab[:20], 10)) for _ in range(5)]
    raw = [" ".join(rng.choice(vocab, 10)) for _ in range(50)]
    a = dsir_select_k(_ds(raw, 1), _ds(target, 1), k=12, m=M)
    b = dsir_select_k(_ds(raw, 7), _ds(target, 3), k=12, m=M)
    assert sorted(a["doc_id"].to_pylist()) == sorted(b["doc_id"].to_pylist())


def test_gumbel_mode_matches_es_on_safe_weights(ray_session):
    # moderate weights: exp(lw) never over/underflows, so the Gumbel
    # log-weight order must equal Efraimidis-Spirakis on w = exp(lw)
    rng = np.random.default_rng(13)
    n = 80
    lw = rng.uniform(-3, 3, n)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lw": pa.array(lw, pa.float64()),
        "w": pa.array(np.exp(lw), pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    a = weighted_sample_k(ds, "doc_id", "lw", k=10, seed=21, log_weights=True)
    b = weighted_sample_k(ds, "doc_id", "w", k=10, seed=21)
    assert sorted(a["doc_id"].to_pylist()) == sorted(b["doc_id"].to_pylist())


def test_smoothing_keeps_unseen_buckets_finite():
    tc = np.zeros(M, np.int64)
    rc = np.zeros(M, np.int64)
    tc[3] = 10
    rc[7] = 10
    lr = dsir_log_ratio(tc, rc)
    assert np.all(np.isfinite(lr))
