"""Vectorized tokenizer conformance + free-text extraction tests.

Mirrors the reference's generated conformance suites (SURVEY.md §5) but
through the *batch* kernels (fastpath.tokenize_batch / extract_mentions_batch)
rather than the scalar grammar, and checks the extraction contract against
the synthesizer's gold mentions.
"""

import numpy as np
import pyarrow as pa
import pytest

from email_address_parser_ray.functions import corpus as C
from email_address_parser_ray.functions import fastpath as F
from email_address_parser_ray.sources import transcripts as T


@pytest.fixture(scope="module")
def corpus():
    return C.load_corpus()


def test_tokenize_batch_cartesian_strict(corpus):
    cart = C.cartesian_cases(corpus)
    out = F.tokenize_batch(pa.table({"address": cart["address"]}), "address")
    exp = np.array(cart["expected_valid_strict"].to_pylist())
    got = np.array(out["is_valid"].to_pylist())
    assert (got == exp).all()
    # verbatim capture + display round-trip on the 304 positives (build.rs:106-114)
    lp = out["local_part"].to_pylist()
    dm = out["domain"].to_pylist()
    for i in np.flatnonzero(exp):
        i = int(i)
        assert lp[i] == cart["local_part"][i].as_py()
        assert dm[i] == cart["domain"][i].as_py()
        assert f"{lp[i]}@{dm[i]}" == cart["address"][i].as_py()


def test_tokenize_batch_isemail_lax():
    ise = C.isemail_cases()
    out = F.tokenize_batch(pa.table({"address": ise["address"]}), "address", is_lax=True)
    exp = np.array(ise["expected_valid_lax"].to_pylist())
    got = np.array(out["is_valid"].to_pylist())
    assert (got == exp).all()


def test_strict_rejects_stay_rejected_without_lax():
    ise = C.isemail_cases()
    out = F.tokenize_batch(pa.table({"address": ise["address"]}), "address", is_lax=False)
    # strict mode can only accept a subset of what lax accepts (nom_parser.rs:12-22)
    lax = F.tokenize_batch(pa.table({"address": ise["address"]}), "address", is_lax=True)
    sv = np.array(out["is_valid"].to_pylist())
    lv = np.array(lax["is_valid"].to_pylist())
    assert not (sv & ~lv).any()


def test_trailing_newline_rejected():
    out = F.tokenize_batch(pa.table({"address": pa.array(["test@iana.org\n"])}), is_lax=True)
    assert out["is_valid"].to_pylist() == [False]


def test_canonical_key_consistency_scalar_vs_vector():
    addrs = ["Some.User@Example.COM", "x@y.z", "jose.garcía@dömain.example"]
    out = F.tokenize_batch(pa.table({"address": pa.array(addrs)}), is_lax=True)
    from email_address_parser_ray.functions.grammar import parse_address

    for i, a in enumerate(addrs):
        p = parse_address(a, True)
        assert out["canonical_key"][i].as_py() == p.canonical_key


def test_extraction_matches_gold_mentions():
    tabs = T.synthesize_tables(0.001)
    out = F.extract_mentions_batch(tabs["transcripts"])
    gold = tabs["gold_mentions"]
    a = (
        out.select(["conv_id", "turn_idx", "mention_idx", "address"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx", "mention_idx"])
        .reset_index(drop=True)
    )
    b = (
        gold.select(["conv_id", "turn_idx", "mention_idx", "address"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx", "mention_idx"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_extraction_styles_canonicalize_to_same_key():
    ents = T.build_entities(0.001)
    e = ents[0]
    keys = set()
    for style, addr in e["variants"]:
        if style in (T.STYLE_DOTLESS, T.STYLE_TYPO):
            continue  # these need fuzzy matching, not canonicalization
        p = F._parse_candidate(addr, True)
        assert p is not None, (style, addr)
        keys.add(p.canonical_key)
    assert len(keys) == 1, keys


def test_extraction_unicode_and_edge_placement():
    t = pa.table(
        {
            "conv_id": pa.array(["c"] * 4),
            "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
            "text": pa.array(
                [
                    "ping jose.garcía@dömain.example now",  # bare unicode
                    "wrap <\"quoted guy\"@iana.org> end",  # quoted in angle
                    "pers@x.example",  # whole text is the address
                    "a@b.c and <not an address> and d@e.f",  # failed angle span
                ]
            ),
        }
    )
    out = F.extract_mentions_batch(t)
    got = {(r["turn_idx"], r["address"]) for r in out.to_pylist()}
    assert (0, "jose.garcía@dömain.example") in got
    assert (1, '"quoted guy"@iana.org') in got
    assert (2, "pers@x.example") in got
    assert (3, "a@b.c") in got and (3, "d@e.f") in got
    assert len(got) == 5


def test_extraction_matches_scan_text_rowwise():
    """Mega-string batch scanner must agree with the per-row scanner."""
    texts = [
        "one user.name@x.example two",
        "<  spaced@y.example > literal <u@[127.0.0.1]>",
        "no candidates here",
        "twice a@b.cc a@b.cc and <a@b.cc>",
        "boundary:x@y.zz, and (x@y.zz) plus end x@y.zz",
    ]
    t = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array(range(len(texts)), pa.int32()),
            "text": pa.array(texts),
        }
    )
    batch = F.extract_mentions_batch(t)
    got = [(r["turn_idx"], r["mention_idx"], r["address"]) for r in batch.to_pylist()]
    want = []
    for i, tx in enumerate(texts):
        found = sorted(F.scan_text(tx, True), key=lambda p: p[0])
        for mi, (_pos, p) in enumerate(found):
            want.append((i, mi, p.address))
    assert got == want
