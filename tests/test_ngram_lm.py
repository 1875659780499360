"""Bigram LM quality scoring (the CCNet-style perplexity filter):
vectorized scorer == scalar reference exactly, in-distribution text
scores better than gibberish, training is partition-invariant, and
the caps bound driver state without changing the top of the model."""

import numpy as np
import pyarrow as pa
import pytest

from email_address_parser_ray.stages.ngram_lm import (
    BigramLM,
    score_docs_nll,
    score_nll_scalar,
    train_bigram_lm,
)


def _ds(texts, blocks=4, start=0):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(start, start + len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)


def _english_ish(seed=3, n=200):
    rng = np.random.RandomState(seed)
    # a tiny grammar: determiner noun verb determiner noun (plus noise)
    det = ["the", "a"]
    noun = ["cat", "dog", "bird", "fish", "tree"]
    verb = ["sees", "likes", "chases", "finds"]
    out = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(2, 6)):
            parts += [rng.choice(det), rng.choice(noun), rng.choice(verb)]
        parts += [rng.choice(det), rng.choice(noun)]
        out.append(" ".join(parts))
    return out


def test_scorer_matches_scalar_reference(ray_session):
    corpus = _english_ish()
    lm = train_bigram_lm(_ds(corpus), max_vocab=1000, max_bigrams=10_000)
    probes = corpus[:5] + [
        "the cat sees a dog",
        "zzz qqq www unseen tokens only",
        "the the the the",
        "",
    ]
    got = (
        score_docs_nll(_ds(probes), lm)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i, t in enumerate(probes):
        n, nll = score_nll_scalar(lm, t)
        assert got["n_tokens"][i] == n
        assert got["nll_e6"][i] == round(nll * 1_000_000), (i, t)


def test_in_distribution_beats_gibberish(ray_session):
    corpus = _english_ish(seed=9)
    lm = train_bigram_lm(_ds(corpus), max_vocab=1000, max_bigrams=10_000)
    rng = np.random.RandomState(4)
    gibberish = [
        " ".join(f"x{rng.randint(10**6)}" for _ in range(12)) for _ in range(10)
    ]
    indist = corpus[:10]
    df = (
        score_docs_nll(_ds(indist + gibberish, start=0), lm)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    nll_in = df["nll_e6"][:10].mean()
    nll_gib = df["nll_e6"][10:].mean()
    assert nll_in < nll_gib - 2_000_000  # ≥ 2 bits/token separation


def test_training_partition_invariant(ray_session):
    corpus = _english_ish(seed=17, n=120)
    a = train_bigram_lm(_ds(corpus, blocks=1), max_vocab=500, max_bigrams=5000)
    b = train_bigram_lm(_ds(corpus, blocks=8), max_vocab=500, max_bigrams=5000)
    assert a == b


def test_empty_vocab_scores_all_unk(ray_session):
    # a token-free trusted corpus trains an empty model; scoring must
    # treat every token as <unk> (not IndexError inside a Ray task)
    lm = train_bigram_lm(_ds(["", "   "]), max_vocab=10, max_bigrams=10)
    assert len(lm.vocab) == 0
    got = score_docs_nll(_ds(["some text here"]), lm).to_pandas()
    n, nll = score_nll_scalar(lm, "some text here")
    assert got["n_tokens"][0] == n == 3
    assert got["nll_e6"][0] == round(nll * 1_000_000)


def test_scoring_partition_invariant(ray_session):
    # per-doc sums are segment-local: a doc's nll must not depend on
    # which other docs share its batch
    corpus = _english_ish(seed=5, n=60)
    lm = train_bigram_lm(_ds(corpus), max_vocab=500, max_bigrams=5000)
    probes = corpus[:30] + ["", "the cat", "zzz unseen"]
    a = (
        score_docs_nll(_ds(probes, blocks=1), lm)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        score_docs_nll(_ds(probes, blocks=11), lm)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert (a["nll_e6"] == b["nll_e6"]).all()
    assert (a["n_tokens"] == b["n_tokens"]).all()


def test_caps_keep_the_head(ray_session):
    corpus = _english_ish(seed=21)
    full = train_bigram_lm(_ds(corpus), max_vocab=1000, max_bigrams=100_000)
    capped = train_bigram_lm(_ds(corpus), max_vocab=1000, max_bigrams=5)
    # the capped model's 5 bigrams are the 5 most frequent of the full model
    pairs = sorted(
        zip(full.bigram_counts, [-k for k in full.bigram_keys]), reverse=True
    )[:5]
    want = sorted(-k for _, k in pairs)
    assert sorted(capped.bigram_keys) == sorted(want)
