"""remove_frequent_lines — CCNet-style corpus-wide line dedup.

Pins: boilerplate lines keep exactly their first global occurrence
(original bytes), keep_first=False cuts all copies, normalization
decides identity but never rewrites survivors, blank lines are
untouchable, clean docs pass through byte-identical, a collision-free
reference agrees, and the pipeline is partition-invariant.
"""
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from email_address_parser_ray.stages.lines import remove_frequent_lines


def _run(texts, blocks=4, **kw):
    ds = ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
    ).repartition(blocks)
    out = remove_frequent_lines(ds, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _ref(texts, min_count=2, keep_first=True, norm=lambda s: s.strip().lower()):
    counts = Counter()
    for t in texts:
        for ln in t.split("\n"):
            k = norm(ln)
            if k:
                counts[k] += 1
    dup = {k for k, n in counts.items() if n >= min_count}
    seen = set()
    out_t, out_c = [], []
    for t in texts:
        kept, cut = [], 0
        for ln in t.split("\n"):
            k = norm(ln)
            if k and k in dup:
                if keep_first and k not in seen:
                    seen.add(k)
                    kept.append(ln)
                else:
                    cut += 1
            else:
                kept.append(ln)
        out_t.append(t if cut == 0 else "\n".join(kept))
        out_c.append(cut)
    return out_t, out_c


def test_boilerplate_keeps_first_occurrence(ray_session):
    banner = "Accept Cookies To Continue"
    docs = [
        f"unique alpha one\n{banner}\nunique alpha two",
        f"{banner}\nunique beta",
        f"unique gamma\n{banner}",
    ]
    out = _run(docs)
    ref_t, ref_c = _ref(docs)
    assert list(out["text"]) == ref_t
    assert list(out["n_lines_cut"]) == ref_c
    # exactly one copy of the banner survives, in doc 0 (first global)
    assert sum(banner in t for t in out["text"]) == 1
    assert banner in out["text"][0]


def test_cut_all_copies(ray_session):
    docs = ["nav menu\nreal body a", "nav menu\nreal body b"]
    out = _run(docs, keep_first=False)
    assert list(out["text"]) == ["real body a", "real body b"]
    assert list(out["n_lines_cut"]) == [1, 1]


def test_normalization_decides_identity_survivor_keeps_bytes(ray_session):
    docs = ["  COOKIE Banner  \ncontent one", "cookie banner\ncontent two"]
    out = _run(docs)
    # identities match after strip+lower; the FIRST occurrence survives
    # with its original bytes
    assert out["text"][0] == "  COOKIE Banner  \ncontent one"
    assert out["text"][1] == "content two"
    assert list(out["n_lines_cut"]) == [0, 1]


def test_blank_lines_never_cut(ray_session):
    docs = ["a\n\n\nb", "c\n\n\nd"]
    out = _run(docs)
    assert list(out["text"]) == docs
    assert list(out["n_lines_cut"]) == [0, 0]


def test_clean_docs_byte_identical(ray_session):
    docs = [f"only line {i}\nsecond {i}" for i in range(10)]
    out = _run(docs)
    assert list(out["text"]) == docs
    assert list(out["n_lines_cut"]) == [0] * 10


def test_min_count_threshold(ray_session):
    docs = ["twice\nx", "twice\ny", "z"]
    out = _run(docs, min_count=3)
    assert list(out["text"]) == docs


def test_intra_doc_repeat(ray_session):
    docs = ["chorus\nverse\nchorus\nbridge", "unrelated"]
    out = _run(docs)
    assert out["text"][0] == "chorus\nverse\nbridge"
    assert out["n_lines_cut"][0] == 1


def test_random_corpus_matches_reference_and_partition_invariant(ray_session):
    rng = np.random.default_rng(17)
    pool = [f"line {i} with words" for i in range(25)]
    docs = [
        "\n".join(rng.choice(pool, int(rng.integers(1, 8))))
        for _ in range(40)
    ]
    ref_t, ref_c = _ref(docs)
    a = _run(docs, blocks=1)
    b = _run(docs, blocks=7)
    assert list(a["text"]) == ref_t
    assert list(a["n_lines_cut"]) == ref_c
    pd.testing.assert_frame_equal(a, b)


def test_paragraph_mode(ray_session):
    """sep="\\n\\n" scrubs blank-line-separated PARAGRAPHS: a repeated
    two-line block keeps its first occurrence whole; single lines that
    repeat across different paragraphs are NOT touched at this grain."""
    boiler = "follow us on social media\nall rights reserved"
    docs = [
        f"intro one\n\n{boiler}",
        f"body two here\n\n{boiler}\n\nmore text",
        "standalone\n\nall rights reserved extra",  # not the same unit
    ]
    out = _run(docs, sep="\n\n")
    assert out["text"][0] == docs[0]          # first occurrence survives
    assert out["text"][1] == "body two here\n\nmore text"
    assert out["n_lines_cut"][1] == 1
    assert out["text"][2] == docs[2]
