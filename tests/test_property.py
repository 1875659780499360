"""Property-based differential tests (hypothesis): the vectorized
tokenizer and the scalar grammar are two implementations of the same
spec (the reference's X1 regex-vs-nom pattern) — on ANY input they must
agree, never raise, and respect the parse round-trip invariant."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from email_address_parser_ray.functions.fastpath import tokenize_batch
from email_address_parser_ray.functions.grammar import parse_address

# address-shaped adversarial alphabet: atext, separators, quoting,
# comments, escapes, brackets, whitespace/control, some non-ASCII
_ALPHABET = 'abz019.@"()\\<>[]-_:;, \t\r\n!#$%&\'*+/=?^`{|}~é漢'
addrish = st.text(alphabet=_ALPHABET, min_size=0, max_size=48)


@settings(max_examples=300, deadline=None)
@given(st.lists(addrish, min_size=1, max_size=32))
def test_vectorized_agrees_with_scalar_lax(addrs):
    t = tokenize_batch(pa.table({"address": pa.array(addrs, pa.string())}),
                       "address", is_lax=True)
    for a, valid, lc, dc, key in zip(
        addrs,
        t["is_valid"].to_pylist(),
        t["local_canon"].to_pylist(),
        t["domain_canon"].to_pylist(),
        t["canonical_key"].to_pylist(),
    ):
        p = parse_address(a, is_lax=True)
        assert valid == (p is not None), repr(a)
        if p is not None:
            assert lc == p.local_canon, repr(a)
            assert dc == p.domain_canon, repr(a)
            assert key == p.canonical_key, repr(a)


@settings(max_examples=300, deadline=None)
@given(st.lists(addrish, min_size=1, max_size=32))
def test_vectorized_agrees_with_scalar_strict(addrs):
    t = tokenize_batch(pa.table({"address": pa.array(addrs, pa.string())}),
                       "address", is_lax=False)
    for a, valid in zip(addrs, t["is_valid"].to_pylist()):
        p = parse_address(a, is_lax=False)
        assert valid == (p is not None), repr(a)


@settings(max_examples=200, deadline=None)
@given(addrish)
def test_scalar_total_and_roundtrip(a):
    # never raises, and accepted parses reconstruct the input verbatim
    p = parse_address(a, is_lax=True)
    if p is not None:
        assert f"{p.local}@{p.domain}" == a
