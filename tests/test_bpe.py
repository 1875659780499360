"""BPE tokenizer pins: merge-selection parity with a naive reference
trainer, the Sennrich paper's worked example, encode determinism +
round-trip, batch-kernel == scalar parity, distributed-training
partition invariance (the 100-TB property), driver-state capping, and
token-exact pack_bins.

The tokenizer has no faithful SQL form (the merge loop is iterative
and data-dependent), so like the sketches/logreg tiers it is
pytest-pinned rather than driver-oracled."""

import numpy as np
import pyarrow as pa
import pytest

from email_address_parser_ray.functions.bpe import (
    END,
    PRETOK,
    BpeModel,
    BpeTokenizer,
    _merge_seq,
    bpe_token_count_ds,
    bpe_vocab_ds,
    bpe_word_counts,
    train_bpe,
    train_bpe_from_counts,
)
from email_address_parser_ray.stages.packing import pack_bins


# --- naive reference trainer (full recount per merge) -------------------------


def naive_train(words, counts, num_merges, min_count=2):
    seqs = [tuple(w) + (END,) for w in words]
    merges = []
    for _ in range(num_merges):
        pc_ = {}
        for seq, c in zip(seqs, counts):
            for p in zip(seq, seq[1:]):
                pc_[p] = pc_.get(p, 0) + c
        if not pc_:
            break
        best = min(pc_, key=lambda p: (-pc_[p], p))
        if pc_[best] < min_count:
            break
        merges.append(best)
        seqs = [_merge_seq(s, *best, best[0] + best[1]) for s in seqs]
    return tuple(merges)


def _rand_corpus(seed, n_words=120):
    rng = np.random.RandomState(seed)
    alpha = "abcdef"
    words = sorted(
        {
            "".join(alpha[i] for i in rng.randint(0, len(alpha), rng.randint(2, 9)))
            for _ in range(n_words)
        }
    )
    counts = rng.randint(1, 50, len(words)).tolist()
    return words, counts


def test_sennrich_worked_example():
    words = ["low", "lower", "newest", "widest"]
    counts = [5, 2, 6, 3]
    model = train_bpe_from_counts(words, counts, num_merges=10)
    # pair totals: es=9, st=9, t</w>=9 tie → lexicographic smallest first
    assert model.merges[0] == ("e", "s")
    tok = BpeTokenizer(model)
    for w in words:
        sym = tok.encode_word(w)
        assert "".join(sym).replace(END, "") == w  # round-trip


@pytest.mark.parametrize("seed", [3, 11, 29])
def test_incremental_trainer_equals_naive(seed):
    words, counts = _rand_corpus(seed)
    got = train_bpe_from_counts(words, counts, num_merges=80, min_count=2)
    assert got.merges == naive_train(words, counts, 80, min_count=2)


def test_encode_parity_and_cache_determinism():
    words, counts = _rand_corpus(7)
    model = train_bpe_from_counts(words, counts, num_merges=60)
    t1, t2 = BpeTokenizer(model), BpeTokenizer(model)
    probe = words + ["zzézz", "", "abcdefabcdef"]
    for w in probe:
        a = t1.encode_word(w)  # cold
        b = t1.encode_word(w)  # cached
        c = t2.encode_word(w)  # independent instance
        assert a == b == c
        assert "".join(a).replace(END, "") == w


def test_token_ids_deterministic_and_unk():
    model = train_bpe_from_counts(["abab", "abba"], [5, 3], num_merges=4)
    ids = model.token_ids()
    assert ids["<unk>"] == 0
    assert ids == BpeModel(model.merges, model.alphabet).token_ids()
    # alphabet symbols precede merged symbols
    assert all(ids[s] < ids[model.merges[0][0] + model.merges[0][1]]
               for s in model.alphabet)


def test_batch_token_counts_match_scalar():
    words, counts = _rand_corpus(13)
    model = train_bpe_from_counts(words, counts, num_merges=50)
    tok = BpeTokenizer(model)
    texts = [
        " ".join(words[:10]),
        "Hello, world! 42x",
        "",
        "éé unseen-chars",
    ]
    got = tok.token_counts(texts)
    want = [
        sum(len(tok.encode_word(w)) for w in PRETOK.findall(t)) for t in texts
    ]
    assert got.tolist() == want


# --- distributed pieces --------------------------------------------------------


def _docs_ds(texts, blocks=4):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)


def _corpus_texts(seed=5, n=300):
    words, counts = _rand_corpus(seed, n_words=60)
    rng = np.random.RandomState(seed + 1)
    return [
        " ".join(rng.choice(words, size=rng.randint(3, 25)))
        for _ in range(n)
    ]


def test_train_bpe_partition_invariance(ray_session):
    texts = _corpus_texts()
    m1 = train_bpe(_docs_ds(texts, blocks=1), num_merges=40)
    m8 = train_bpe(_docs_ds(texts, blocks=8), num_merges=40)
    assert m1 == m8


def test_bpe_word_counts_exact_and_cap(ray_session):
    texts = _corpus_texts(seed=9, n=200)
    # exact expected counts
    exp = {}
    for t in texts:
        for w in PRETOK.findall(t):
            exp[w] = exp.get(w, 0) + 1
    words, counts, n_distinct = bpe_word_counts(_docs_ds(texts), max_words=10**6)
    assert n_distinct == len(exp)
    assert dict(zip(words, counts)) == exp
    # cap: top-5 by (count desc, word asc)
    top_words, top_counts, nd = bpe_word_counts(_docs_ds(texts), max_words=5)
    want = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert list(zip(top_words, top_counts)) == want
    assert nd == len(exp)


def test_bpe_token_count_ds_and_vocab(ray_session):
    texts = _corpus_texts(seed=21, n=150)
    ds = _docs_ds(texts, blocks=5)
    model = train_bpe(ds, num_merges=30)
    tok = BpeTokenizer(model)

    counted = bpe_token_count_ds(ds, model, concurrency=2).to_pandas()
    counted = counted.sort_values("doc_id").reset_index(drop=True)
    want = tok.token_counts(texts)
    assert counted["n_bpe_tokens"].tolist() == want.tolist()

    vocab = bpe_vocab_ds(ds, model, concurrency=2).to_pandas()
    got = dict(zip(vocab["token"], vocab["cnt"]))
    exp = {}
    for t in texts:
        for w in PRETOK.findall(t):
            for s in tok.encode_word(w):
                exp[s] = exp.get(s, 0) + 1
    assert got == exp
    # conservation: total vocab mass == total token count
    assert sum(got.values()) == int(want.sum())


def test_pack_bins_token_exact(ray_session):
    texts = _corpus_texts(seed=31, n=120)
    ds = _docs_ds(texts, blocks=4)
    model = train_bpe(ds, num_merges=25)
    tok = BpeTokenizer(model)
    cap = 64
    out = pack_bins(ds, cap=cap, bpe_model=model).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    lens = tok.token_counts(texts)
    assert out["n_tokens"].tolist() == lens.tolist()
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    assert out["bin"].tolist() == (starts // cap).tolist()


def test_bpe_encode_ds_ids_roundtrip(ray_session):
    from email_address_parser_ray.functions.bpe import bpe_encode_ds

    texts = _corpus_texts(seed=41, n=80)
    ds = _docs_ds(texts, blocks=4)
    model = train_bpe(ds, num_merges=30)
    tok = BpeTokenizer(model)
    out = bpe_encode_ds(ds, model, concurrency=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    id2tok = {v: k for k, v in model.token_ids().items()}
    for i, t in enumerate(texts):
        ids = list(out["token_ids"][i])
        assert out["n_bpe_tokens"][i] == len(ids)
        # decode round-trip: concatenating the id's symbols (modulo the
        # end-of-word markers) reproduces the pre-token stream
        syms = "".join(id2tok[j] for j in ids).replace(END, "")
        assert syms == "".join(PRETOK.findall(t))
        assert 0 not in ids  # training corpus chars are all in-vocab
    # count column agrees with the counting stage
    assert out["n_bpe_tokens"].tolist() == tok.token_counts(texts).tolist()


def test_bpe_encode_unk_for_unseen_char(ray_session):
    from email_address_parser_ray.functions.bpe import bpe_encode_ds

    model = train_bpe_from_counts(["abc", "abd"], [5, 5], num_merges=2)
    ds = _docs_ds(["abc xyz"], blocks=1)
    out = bpe_encode_ds(ds, model, concurrency=1).to_pandas()
    ids = list(out["token_ids"][0])
    assert 0 in ids  # x/y/z never seen in training → <unk>


def test_bpe_model_persistence_roundtrip(tmp_path):
    words, counts = _rand_corpus(19)
    model = train_bpe_from_counts(words, counts, num_merges=40)
    path = str(tmp_path / "bpe_model.json")
    model.save(path)
    back = BpeModel.load(path)
    assert back == model
    assert back.token_ids() == model.token_ids()
    t1, t2 = BpeTokenizer(model), BpeTokenizer(back)
    for w in words[:20]:
        assert t1.encode_word(w) == t2.encode_word(w)


# --- hypothesis property pins ---------------------------------------------------

from hypothesis import given, settings, strategies as st

_word = st.text(alphabet="abcd", min_size=1, max_size=8)
_corpus_strategy = st.lists(
    st.tuples(_word, st.integers(min_value=1, max_value=30)),
    min_size=1, max_size=40, unique_by=lambda t: t[0],
)


@settings(max_examples=60, deadline=None)
@given(_corpus_strategy, st.integers(min_value=1, max_value=30))
def test_property_incremental_equals_naive(corpus, n_merges):
    words = [w for w, _ in corpus]
    counts = [c for _, c in corpus]
    got = train_bpe_from_counts(words, counts, n_merges)
    assert got.merges == naive_train(words, counts, n_merges)


@settings(max_examples=60, deadline=None)
@given(_corpus_strategy, st.lists(_word, min_size=1, max_size=10))
def test_property_encode_roundtrip_any_input(corpus, probes):
    words = [w for w, _ in corpus]
    counts = [c for _, c in corpus]
    tok = BpeTokenizer(train_bpe_from_counts(words, counts, 20))
    for w in probes:
        sym = tok.encode_word(w)
        assert "".join(sym).replace(END, "") == w
        # encoding is idempotent through the cache
        assert tok.encode_word(w) == sym


def test_gpt2ish_pretokenizer_split():
    """The opt-in GPT-2-shape split: contraction suffixes peel off,
    letters/digits/symbols separate, and the leading space rides with
    the following token (so " world" and "world" are distinct words)."""
    from email_address_parser_ray.functions.bpe import PRETOK_GPT2ISH

    assert PRETOK_GPT2ISH.findall("I'll see 2 worlds, maybe 3!") == [
        "I", "'ll", " see", " 2", " worlds", ",", " maybe", " 3", "!",
    ]
    assert PRETOK_GPT2ISH.findall("hello") == ["hello"]
    assert PRETOK_GPT2ISH.findall("a_b") == ["a", "_", "b"]


def test_gpt2ish_train_encode_roundtrip(ray_session):
    """Training with pretok="gpt2ish" ships the choice in the model;
    encode splits the same way (cache-deterministic), and json
    round-trip preserves it.  Pre-pretok json defaults to ascii."""
    import json

    import ray.data as rd

    from email_address_parser_ray.functions.bpe import (
        BpeModel, BpeTokenizer, bpe_token_count_ds, train_bpe,
    )

    texts = ["I'll go home now", "you'll go there soon", "we'll go far"] * 5
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(3)
    model = train_bpe(ds, num_merges=20, pretok="gpt2ish")
    assert model.pretok == "gpt2ish"
    # round-trip preserves the pretok; encode is a pure function of it
    m2 = BpeModel.from_json(model.to_json())
    assert m2 == model
    tok = BpeTokenizer(model)
    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count_ds(ds, model).take_all()
    }
    assert counts[0] == len(
        [s for w in tok.pretok.findall(texts[0]) for s in tok.encode_word(w)]
    )
    # " go" (leading space) must be a trained word — spacing is carried
    assert any(w.startswith(" ") for w in ["".join(p) for p in model.merges])
    # legacy json without the field loads as ascii
    legacy = json.loads(model.to_json())
    del legacy["pretok"]
    assert BpeModel.from_json(json.dumps(legacy)).pretok == "ascii"
