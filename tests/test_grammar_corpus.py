"""Conformance-corpus parity with the reference parser.

Mirrors the reference's generated test suites (rust-lib/build.rs:30-58):
positive parse + capture + display round-trip, negative parse, isemail
lax-mode truth table, is_valid truth table, and instantiation semantics.
"""

from email_address_parser_ray.functions import corpus, grammar

CORPUS = corpus.load_corpus()
CART = corpus.cartesian_cases(CORPUS)
ISEMAIL = corpus.isemail_cases()


def test_corpus_shape():
    # 8 x 38 positives, 940 total combos (build.rs corpora)
    assert len(CORPUS.valid_local_parts) == 8
    assert len(CORPUS.valid_domains) == 38
    assert len(CORPUS.invalid_local_parts) == 12
    assert len(CORPUS.invalid_domains) == 9
    assert CART.num_rows == 940
    # 164 XML tests minus the 3 ignored domain-literal quoted-pair cases
    assert ISEMAIL.num_rows == 161


def test_positive_parse_capture_and_roundtrip():
    """generate_positive_parsing_test analog — build.rs:87-126."""
    for lp in CORPUS.valid_local_parts:
        for d in CORPUS.valid_domains:
            addr = f"{lp}@{d}"
            p = grammar.parse_address(addr)
            assert p is not None, f"expected {addr!r} to be parsed"
            assert p.local == lp, f"local_part of {addr!r}"
            assert p.domain == d, f"domain of {addr!r}"
            assert p.address == addr, "incorrect display"


def test_is_valid_truth_table_strict():
    """generate_is_valid_test analog — build.rs:362-420 (940 combos)."""
    for addr, exp in zip(
        CART["address"].to_pylist(), CART["expected_valid_strict"].to_pylist()
    ):
        assert grammar.is_valid(addr) == exp, f"{addr!r} expected valid={exp}"


def test_negative_parse_strict():
    """generate_negative_parsing_test analog — build.rs:128-167 (636 combos)."""
    for addr, exp in zip(
        CART["address"].to_pylist(), CART["expected_valid_strict"].to_pylist()
    ):
        if not exp:
            assert grammar.parse_address(addr) is None, f"{addr!r} must not parse"


def test_isemail_lax_truth_and_roundtrip():
    """generate_is_email_test analog — build.rs:169-281."""
    for addr, exp in zip(
        ISEMAIL["address"].to_pylist(), ISEMAIL["expected_valid_lax"].to_pylist()
    ):
        p = grammar.parse_address(addr, is_lax=True)
        assert (p is not None) == exp, f"{addr!r} expected lax-valid={exp}"
        if exp:
            assert p.address == addr, f"incorrect display for {addr!r}"


def test_instantiation_positive():
    """generate_positive_instantiation_test analog — build.rs:283-319."""
    for lp in CORPUS.valid_local_parts:
        for d in CORPUS.valid_domains:
            p, err = grammar.make_address(lp, d, is_lax=True)
            assert err is None
            assert p.local == lp and p.domain == d
            assert p.address == f"{lp}@{d}"


def test_instantiation_negative_strict_err_lax_ok():
    """generate_negative_instantiation_test analog — build.rs:321-360:
    strict must Err (with the reference's local-part-blaming message),
    lax must construct unvalidated."""
    combos = (
        [(lp, d) for lp in CORPUS.invalid_local_parts for d in CORPUS.valid_domains]
        + [(lp, d) for lp in CORPUS.valid_local_parts for d in CORPUS.invalid_domains]
        + [(lp, d) for lp in CORPUS.invalid_local_parts for d in CORPUS.invalid_domains]
    )
    for lp, d in combos:
        p, err = grammar.make_address(lp, d, is_lax=False)
        assert p is None and err == f"Invalid local part '{lp}'."
        p, err = grammar.make_address(lp, d, is_lax=True)
        assert err is None and p.local == lp and p.domain == d
