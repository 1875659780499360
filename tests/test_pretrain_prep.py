"""The composed LLM pretraining data-prep pipeline: planted exact
dups, near dups, contaminated docs and junk docs must each be dropped
at the right stage (the counters prove it), the packed export must be
complete and token-exact, and the whole pipeline must be
partition-invariant."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from email_address_parser_ray.pipelines.pretrain import pretrain_prep


def _corpus():
    """60 clean docs + planted: 3 exact copies of doc 0, 2 near copies
    of doc 1, 2 docs containing an eval shingle, 3 junk docs (too
    short / one token repeated)."""
    rng = np.random.RandomState(5)
    vocab = [f"tok{i}" for i in range(150)]
    clean = [
        " ".join(rng.choice(vocab, size=rng.randint(12, 30)))
        for _ in range(60)
    ]
    ev = [" ".join(rng.choice(vocab, size=15)) for _ in range(6)]
    docs = list(clean)
    docs += [clean[0]] * 3                                   # exact dups
    docs += [clean[1] + " tail" + str(i) for i in range(2)]  # near dups
    # contaminated docs are FRESH (not near-dups of any clean doc):
    # independent random text with an eval 3-gram spliced in
    docs += [
        " ".join(rng.choice(vocab, size=20)) + " " + " ".join(ev[0].split()[:3])
        for _ in range(2)
    ]
    docs += ["a b", "x", "spam " * 40]                       # junk
    return docs, ev


def _ds(texts, blocks):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)


def test_pretrain_prep_end_to_end(ray_session, tmp_path):
    docs, ev = _corpus()
    out = str(tmp_path / "export")
    manifests, counters, model = pretrain_prep(
        _ds(docs, 4), _ds(ev, 2), out, num_merges=40, cap=64, min_tokens=5
    )
    assert counters["input_docs"] == len(docs)
    # 3 exact copies of doc 0 collapse (also the near-dup family keeps
    # one rep of doc 1's group); junk and contaminated docs drop
    assert counters["after_exact_dedup"] == len(docs) - 3
    assert counters["after_near_dedup"] == counters["after_exact_dedup"] - 2
    assert counters["contaminated"] >= 2
    assert (
        counters["after_decontaminate"]
        == counters["after_near_dedup"] - counters["contaminated"]
    )
    assert counters["after_quality"] <= counters["after_decontaminate"] - 3
    assert counters["packed_docs"] == counters["after_quality"]
    assert counters["exported_rows"] == counters["packed_docs"]

    # the export is real, complete, and token-exact
    frags = glob.glob(os.path.join(out, "part=*", "*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in frags])
    assert t.num_rows == counters["exported_rows"]
    assert set(t.schema.names) == {"doc_id", "n_tokens", "bin", "token_ids"}
    from email_address_parser_ray.functions.bpe import BpeTokenizer

    tok = BpeTokenizer(model)
    df = t.to_pandas().sort_values("doc_id")
    for _, row in df.head(10).iterrows():
        assert row["n_tokens"] == len(row["token_ids"])
        assert row["n_tokens"] == tok.token_counts([docs[row["doc_id"]]])[0]
    # bins respect the running-offset rule
    lens = df["n_tokens"].to_numpy()
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    assert df["bin"].tolist() == (starts // 64).tolist()
    assert sum(m["rows"] for m in manifests) == t.num_rows
    # the tokenizer ships with the shards
    from email_address_parser_ray.functions.bpe import BpeModel

    assert BpeModel.load(os.path.join(out, "bpe_model.json")) == model
    # the audit trail ships with the shards
    lineage = json.load(open(os.path.join(out, "lineage.json")))
    assert lineage["counters"] == counters
    assert lineage["params"]["cap"] == 64


def test_pretrain_prep_partition_invariant(ray_session, tmp_path):
    docs, ev = _corpus()
    outs = {}
    for blocks in (1, 6):
        out = str(tmp_path / f"exp{blocks}")
        _, counters, model = pretrain_prep(
            _ds(docs, blocks), _ds(ev, 1), out, num_merges=25, cap=64
        )
        frags = glob.glob(os.path.join(out, "part=*", "*.parquet"))
        t = pa.concat_tables([pq.read_table(f) for f in frags])
        df = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs[blocks] = (counters, model, df[["doc_id", "n_tokens", "bin"]])
    assert outs[1][0] == outs[6][0]          # identical lineage counters
    assert outs[1][1] == outs[6][1]          # identical BPE model
    assert outs[1][2].equals(outs[6][2])     # identical packed rows


def test_pretrain_prep_semdedup_stage(ray_session, tmp_path):
    """The optional SemDeDup stage: docs that are textually distinct
    but embedding-near-identical collapse to one representative; docs
    without an embedding row pass through untouched."""
    docs, ev = _corpus()
    rng = np.random.RandomState(31)
    d = 16
    # embeddings ONLY for doc_ids 10..40 (the rest have none and must
    # pass through; ids deliberately do NOT start at 0 — kmeans seeding
    # must take the k smallest PRESENT ids, not demand 0..k-1); docs
    # 10/11/12 are textually distinct but get near-identical vectors —
    # a planted semantic-duplicate trio
    ids = list(range(10, 41))
    vecs = rng.normal(size=(len(ids), d))
    base = rng.normal(size=d)
    for i in (0, 1, 2):  # rows for doc_ids 10/11/12
        vecs[i] = base + rng.normal(scale=1e-3, size=d)
    import ray.data as rd

    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(3)
    out = str(tmp_path / "exp_sem")
    _, counters, _ = pretrain_prep(
        _ds(docs, 4), _ds(ev, 1), out, num_merges=25, cap=64,
        embeddings_ds=emb, semdedup_k=2, semdedup_eps=0.03,
    )
    assert counters["semdedup_dropped"] == 2  # trio keeps one member
    assert (
        counters["after_semdedup"] == counters["after_near_dedup"] - 2
    )
    assert counters["exported_rows"] == counters["packed_docs"]
    lineage = json.load(open(os.path.join(out, "lineage.json")))
    assert lineage["params"]["semdedup_eps"] == 0.03
    assert lineage["params"]["semdedup_k"] == 2
    # without the embeddings the stage does not run at all
    out2 = str(tmp_path / "exp_nosem")
    _, c2, _ = pretrain_prep(
        _ds(docs, 4), _ds(ev, 1), out2, num_merges=25, cap=64
    )
    assert "semdedup_dropped" not in c2
    lineage2 = json.load(open(os.path.join(out2, "lineage.json")))
    assert lineage2["params"]["semdedup_eps"] is None


def test_pretrain_prep_lm_filter(ray_session, tmp_path):
    """The optional CCNet-style LM gate: gibberish docs exceed the nll
    budget and drop; clean docs survive; counters account for it."""
    from email_address_parser_ray.stages.ngram_lm import train_bigram_lm

    docs, ev = _corpus()
    rng = np.random.RandomState(99)
    gibberish = [
        " ".join(f"g{rng.randint(10**9)}" for _ in range(15)) for _ in range(4)
    ]
    all_docs = docs + gibberish
    trusted = _ds(docs[:40], 2)  # LM trained on trusted text only
    lm = train_bigram_lm(trusted, max_vocab=2000, max_bigrams=20_000)
    # derive the gate empirically: midpoint between the groups' scores
    from email_address_parser_ray.stages.ngram_lm import score_docs_nll

    sc = score_docs_nll(_ds(docs[:20] + gibberish, 2), lm).to_pandas()
    sc = sc.sort_values("doc_id").reset_index(drop=True)
    clean_max = int(sc["nll_e6"][:20].max())
    gib_min = int(sc["nll_e6"][20:].min())
    assert gib_min > clean_max  # the LM separates the groups at all
    gate = (clean_max + gib_min) // 2
    out = str(tmp_path / "exp_lm")
    _, counters, _ = pretrain_prep(
        _ds(all_docs, 4), _ds(ev, 1), out, num_merges=25, cap=64,
        quality_lm=lm, max_nll_e6=gate,
    )
    assert counters["lm_filtered"] >= 4  # all gibberish docs flagged
    assert (
        counters["after_lm_filter"]
        == counters["after_quality"] - counters["lm_filtered"]
    )
    assert counters["exported_rows"] == counters["after_lm_filter"]


def test_pretrain_prep_line_dedup_and_cut_spans(ray_session, tmp_path):
    """The optional line-dedup and span-cut stages: a boilerplate line
    shared by many docs keeps one copy; a duplicated passage is excised
    from the survivors; counters account for both."""
    docs, ev = _corpus()
    banner = "subscribe to our newsletter today please"
    # append the banner as a second LINE to 5 clean docs — skipping
    # docs 0/1, whose planted exact/near copies would otherwise turn
    # the un-bannered first line into an extra corpus-wide dup
    for i in range(2, 7):
        docs[i] = docs[i] + "\n" + banner
    # splice a 12-token passage into docs 20 and 21 (textually distinct
    # docs otherwise, so near-dedup keeps both)
    passage = " ".join(f"boiler{j}" for j in range(12))
    docs[20] = docs[20] + " " + passage
    docs[21] = passage + " " + docs[21]
    out = str(tmp_path / "exp_cut")
    _, counters, _ = pretrain_prep(
        _ds(docs, 4), _ds(ev, 1), out, num_merges=25, cap=64,
        line_dedup=True, cut_spans_window=8,
    )
    # 4 of the 5 banner copies cut (first survives)
    assert counters["lines_cut"] == 4
    assert counters["after_line_dedup"] == counters["after_exact_dedup"]
    # both passage copies excised (12 tokens each, window 8), plus the
    # "spam "*40 junk doc — every one of its 8-token windows repeats
    # within the doc, so it cuts to nothing and drops here (one stage
    # earlier than the quality filter would have caught it)
    assert counters["tokens_cut"] >= 24 + 40
    assert counters["after_cut_spans"] == counters["after_near_dedup"] - 1
    lineage = json.load(open(os.path.join(out, "lineage.json")))
    assert lineage["params"]["line_dedup"] is True
    assert lineage["params"]["cut_spans_window"] == 8


def test_pretrain_prep_dsir_stage(ray_session, tmp_path):
    """The optional DSIR stage: survivors resample toward the target
    corpus; the budget holds and target-like docs dominate."""
    rng = np.random.RandomState(77)
    tvocab = [f"targ{i}" for i in range(30)]
    jvocab = [f"junkw{i}" for i in range(30)]
    docs = []
    for i in range(50):
        v = tvocab if i % 2 == 0 else jvocab
        docs.append(" ".join(rng.choice(v, 14)))
    target = [" ".join(rng.choice(tvocab, 14)) for _ in range(8)]
    ev = [" ".join(f"e{i}{j}" for j in range(12)) for i in range(3)]
    out = str(tmp_path / "exp_dsir")
    _, counters, _ = pretrain_prep(
        _ds(docs, 4), _ds(ev, 1), out, num_merges=25, cap=64,
        dsir_target_ds=_ds(target, 2), dsir_k=10,
    )
    assert counters["after_dsir"] == 10
    assert counters["exported_rows"] == 10
    # the selected docs are the target-vocab ones (even doc_ids)
    frags = glob.glob(os.path.join(out, "part=*", "*.parquet"))
    t = pa.concat_tables([pq.read_table(f) for f in frags])
    assert all(d % 2 == 0 for d in t["doc_id"].to_pylist())
    lineage = json.load(open(os.path.join(out, "lineage.json")))
    assert lineage["params"]["dsir_k"] == 10


def test_pretrain_prep_all_options_partition_invariant(ray_session, tmp_path):
    """The FULL composition (line dedup + span cut + DSIR + gpt2ish
    BPE) must be a pure function of corpus content: identical lineage
    counters, BPE model, and packed rows under different partitionings."""
    docs, ev = _corpus()
    banner = "subscribe today for more updates please friends"
    for i in range(2, 7):
        docs[i] = docs[i] + "\n" + banner
    passage = " ".join(f"boiler{j}" for j in range(12))
    docs[20] = docs[20] + " " + passage
    docs[21] = passage + " " + docs[21]
    target = [" ".join(f"tok{i}" for i in range(10, 24)) for _ in range(4)]
    outs = {}
    for blocks in (1, 6):
        out = str(tmp_path / f"expall{blocks}")
        _, counters, model = pretrain_prep(
            _ds(docs, blocks), _ds(ev, 1), out, num_merges=25, cap=64,
            line_dedup=True, cut_spans_window=8,
            dsir_target_ds=_ds(target, 2), dsir_k=30,
            bpe_pretok="gpt2ish",
        )
        frags = glob.glob(os.path.join(out, "part=*", "*.parquet"))
        t = pa.concat_tables([pq.read_table(f) for f in frags])
        df = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs[blocks] = (counters, model, df[["doc_id", "n_tokens", "bin"]])
    assert outs[1][0] == outs[6][0]
    assert outs[1][1] == outs[6][1]
    assert outs[1][1].pretok == "gpt2ish"
    assert outs[1][2].equals(outs[6][2])
    assert outs[1][0]["after_dsir"] == 30
