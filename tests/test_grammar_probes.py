"""Handwritten grammar edge-case probes.

One test per handwritten unit test in the reference
(rust-lib/src/email_address.rs:318-441), exercised through our public API
(the reference probes internal productions directly; we probe the composed
address or the part in a full-address context)."""

from email_address_parser_ray.functions import grammar


def _domain_strict_ok(d: str) -> bool:
    r = grammar._domain_strict(d, 0)
    return r is not None and r[0] == len(d)


def _domain_obs_ok(d: str) -> bool:
    r = grammar._domain_obs(d, 0)
    return r is not None and r[0] == len(d)


def _local_obs_ok(lp: str) -> bool:
    r = grammar._local_part_obs(lp, 0)
    return r is not None and r[0] == len(lp)


def _local_strict_ok(lp: str) -> bool:
    r = grammar._local_part_strict(lp, 0)
    return r is not None and r[0] == len(lp)


def _domain_literal_ok(d: str) -> bool:
    r = grammar._domain_literal(d, 0)
    return r is not None and r[0] == len(d)


def test_dash_label_rules():
    # email_address.rs:342-360
    assert not _domain_strict_ok("-google.com")
    assert not _domain_obs_ok("-google.com")
    assert not _domain_strict_ok("-google-.com")
    assert not _domain_strict_ok("google-.com")


def test_punycode_domain():
    assert _domain_strict_ok("xn--masekowski-d0b.pl")  # email_address.rs:362-368


def test_deprecated_local_part():
    # email_address.rs:370-381
    assert _local_obs_ok('"test"."test"')
    p = grammar.parse_address('"test"."test"@iana.org', is_lax=True)
    assert p is not None and p.local == '"test"."test"'


def test_domain_with_space_obs():
    # email_address.rs:383-388
    assert _domain_obs_ok(" iana .com")
    assert grammar.parse_address("test@ iana .com", is_lax=True) is not None


def test_cfws_near_at_strict():
    # email_address.rs:390-396 — strict accepts one WSP either side of dot-atom
    p = grammar.parse_address(" test @iana.org")
    assert p is not None and p.address == " test @iana.org"


def test_crlf_prefix_lax():
    # email_address.rs:398-404
    email = "\r\n test@iana.org"
    p = grammar.parse_address(email, is_lax=True)
    assert p is not None and p.address == email
    assert grammar.parse_address(email) is None  # strict rejects CRLF


def test_local_part_with_space_obs():
    assert grammar.parse_address("test . test@iana.org", is_lax=True) is not None


def test_domain_literal_with_bel():
    assert _domain_literal_ok("[RFC-5322-\x07-domain-literal]")  # email_address.rs:411-417


def test_quoted_local_with_space():
    assert _local_strict_ok('"test test"')  # email_address.rs:419-422


def test_idn():
    assert _domain_strict_ok("bücher.com")  # email_address.rs:424-427


def test_empty_local_and_domain():
    # email_address.rs:429-440
    assert grammar.parse_address("@", is_lax=True) is None
    p, err = grammar.make_address("", "", is_lax=False)
    assert p is None and err is not None
    p, err = grammar.make_address("", "", is_lax=True)
    assert err is None and p.local == "" and p.domain == ""


def test_structural_at_split_not_last_index():
    """nom splits at the structural '@' after the consumed local part; the
    reference's own JS regex parseEmail uses lastIndexOf('@') and diverges
    when a domain-literal contains '@' (dtext allows 0x40) —
    npm-packages/regex/src/index.ts:71 vs nom_parser.rs:55-60."""
    p = grammar.parse_address("test@[obs@literal]")
    assert p is not None
    assert p.local == "test"
    assert p.domain == "[obs@literal]"


def test_canonical_forms():
    p = grammar.parse_address(" test @iana.org")
    assert p.local_canon == "test" and p.domain_canon == "iana.org"
    p = grammar.parse_address('"test test"@iana.org')
    assert p.local_canon == "test test"
    p = grammar.parse_address("test@(comment)iana.org", is_lax=True)
    assert p is not None and p.domain_canon == "iana.org"
    p = grammar.parse_address("test@IANA.ORG")
    assert p.canonical_key == "test@iana.org"


def test_recursion_depth_cap():
    # obs_domain depth cap (nom_parser.rs:9): a domain of >128 dot segments
    # fails the obs path but the strict dot_atom path still accepts it.
    deep = "a" + ".a" * 200
    assert grammar._obs_domain_inner(deep, 0, 0) is None
    assert grammar.is_valid(f"test@{deep}")
