"""dedup_cut_spans — exact-substring span removal (Lee et al. 2022).

Pins: planted cross-doc passages are cut from every occurrence,
intra-doc repeats are cut, overlapping windows merge into one span,
clean docs pass through byte-identical, short-doc exact duplicates cut
to empty, exact agreement with a collision-free token-tuple reference,
and partition invariance.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from email_address_parser_ray.stages.dedup import dedup_cut_spans


def _ref_cut(texts, window=8, min_count=2):
    """Pure-Python reference on token TUPLES (no hashing)."""
    from collections import Counter

    def windows(toks):
        if len(toks) < window:
            return [tuple(toks)]
        return [tuple(toks[i:i + window]) for i in range(len(toks) - window + 1)]

    counts = Counter()
    for t in texts:
        counts.update(windows(t.split()))
    dup = {w for w, n in counts.items() if n >= min_count}
    out_texts, out_cut = [], []
    for t in texts:
        toks = t.split()
        ws = windows(toks)
        if len(toks) < window:
            if ws[0] in dup:
                out_texts.append("")
                out_cut.append(len(toks))
            else:
                out_texts.append(t)
                out_cut.append(0)
            continue
        covered = np.zeros(len(toks), bool)
        hit = False
        for i, w in enumerate(ws):
            if w in dup:
                covered[i:i + window] = True
                hit = True
        if not hit:
            out_texts.append(t)  # byte-identical passthrough
            out_cut.append(0)
            continue
        out_texts.append(" ".join(np.asarray(toks, object)[~covered]))
        out_cut.append(int(covered.sum()))
    return out_texts, out_cut


def _run(texts, window=8, min_count=2, blocks=4):
    ds = ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
    ).repartition(blocks)
    out = dedup_cut_spans(ds, window=window, min_count=min_count).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _words(tag, n):
    return " ".join(f"{tag}{i}" for i in range(n))


def test_planted_cross_doc_passage_cut_everywhere(ray_session):
    passage = _words("dup", 12)
    docs = [
        _words("a", 20) + " " + passage + " " + _words("b", 20),
        _words("c", 15) + " " + passage + " " + _words("d", 9),
        _words("e", 30),
    ]
    out = _run(docs, window=8)
    ref_t, ref_c = _ref_cut(docs, window=8)
    assert list(out["text"]) == ref_t
    assert list(out["n_tokens_cut"]) == ref_c
    # the passage is gone from both carriers, unique context survives
    for row in (0, 1):
        assert "dup0" not in out["text"][row]
        assert "dup11" not in out["text"][row]
    assert "a0" in out["text"][0] and "b19" in out["text"][0]
    # clean doc byte-identical
    assert out["text"][2] == docs[2]
    assert out["n_tokens_cut"][2] == 0


def test_intra_doc_repeat_cut(ray_session):
    sent = _words("rep", 8)
    doc = sent + " " + _words("mid", 10) + " " + sent
    out = _run([doc, _words("z", 25)], window=8)
    assert "rep0" not in out["text"][0]
    assert "mid0" in out["text"][0]
    assert out["n_tokens_cut"][0] == 16
    assert out["text"][1] == _words("z", 25)


def test_overlapping_windows_merge_to_one_span(ray_session):
    # a 10-token duplicated passage with window 8 -> 3 overlapping
    # windows covering exactly 10 tokens, not 24
    passage = _words("p", 10)
    docs = [
        _words("l", 12) + " " + passage + " " + _words("r", 12),
        _words("m", 9) + " " + passage + " " + _words("n", 11),
    ]
    out = _run(docs, window=8)
    assert list(out["n_tokens_cut"]) == [10, 10]
    ref_t, _ = _ref_cut(docs, window=8)
    assert list(out["text"]) == ref_t


def test_short_doc_exact_duplicates_cut_to_empty(ray_session):
    docs = ["tiny doc here", "tiny doc here", "another unique tiny one"]
    out = _run(docs, window=8)
    assert list(out["text"]) == ["", "", "another unique tiny one"]
    assert list(out["n_tokens_cut"]) == [3, 3, 0]


def test_matches_reference_on_random_corpus(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(60)]
    shared = " ".join(rng.choice(vocab, 9))
    docs = []
    for i in range(40):
        body = " ".join(rng.choice(vocab, int(rng.integers(3, 40))))
        if i % 5 == 0:
            body = body + " " + shared
        docs.append(body)
    out = _run(docs, window=8, blocks=5)
    ref_t, ref_c = _ref_cut(docs, window=8)
    assert list(out["text"]) == ref_t
    assert list(out["n_tokens_cut"]) == ref_c


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"v{i}" for i in range(40)]
    shared = " ".join(rng.choice(vocab, 10))
    docs = [
        " ".join(rng.choice(vocab, int(rng.integers(2, 30))))
        + (" " + shared if i % 3 == 0 else "")
        for i in range(30)
    ]
    a = _run(docs, blocks=1)
    b = _run(docs, blocks=7)
    pd.testing.assert_frame_equal(a, b)


def test_min_count_threshold(ray_session):
    passage = _words("q", 9)
    docs = [
        _words("x", 10) + " " + passage,
        _words("y", 10) + " " + passage,
    ]
    # min_count=3: two occurrences are NOT cut
    out = _run(docs, window=8, min_count=3)
    assert list(out["n_tokens_cut"]) == [0, 0]
    assert list(out["text"]) == docs
