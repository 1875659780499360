"""RFC 5322/6532 addr-spec grammar — scalar reference implementation.

A from-scratch Python reimplementation of the *semantics* of the reference
parser (``/root/reference/rust-lib/src/nom_parser.rs``), used as:

  * the authoritative slow path of the vectorized tokenizer (the regex fast
    path in :mod:`.fastpath` handles the overwhelmingly common plain
    dot-atom shapes; everything else falls back to this parser), and
  * the oracle for the conformance corpus tests (``SURVEY.md §5``).

Semantics mirrored from the reference (file:line citations into
``/root/reference/``):

  * committed-choice (PEG) alternation and the strict-then-lax short circuit
    — ``rust-lib/src/nom_parser.rs:12-22``;
  * ``dot_atom = WSP? dot_atom_text WSP?`` with at most ONE whitespace char
    per side — ``nom_parser.rs:91-102``;
  * CFWS allowed after each ``.`` inside ``dot_atom_text`` (the nom parser
    is authoritative over the reference's own JS regex, which omits it) —
    ``nom_parser.rs:105-118``;
  * per-label no-leading/trailing-dash rule (stricter than RFC 5322 atext)
    — ``nom_parser.rs:121-138``;
  * obsolete local part / domain productions incl. hyphen-run separators
    and interior CFWS, recursion depth capped at 128 —
    ``nom_parser.rs:141-271``;
  * ``domain_literal`` WITHOUT quoted-pair (the JS regex adds it; nom is
    authoritative) — ``nom_parser.rs:334-374``;
  * quoted-pair accepting any ASCII octet incl. NUL/CR/LF —
    ``nom_parser.rs:598-603``;
  * ``FWS`` requiring WSP after CRLF — ``nom_parser.rs:471-494``;
  * RFC 6532: any scalar >= U+0080 accepted wherever atext/qtext/dtext/ctext
    allow — ``nom_parser.rs:590-592``.

The parser returns *verbatim* consumed slices (leading/embedded CFWS
survives into ``local``/``domain``, exactly like the reference's
``consumed``-combinator captures — ``nom_parser.rs:91-94``) plus *canonical*
forms (comments/FWS stripped, quoted strings unescaped, dots preserved)
which the reference deliberately does NOT provide; canonical columns are our
engine's derived blocking-key inputs and are never conflated with the
verbatim pair.

Every function here is pure and stateless; the hot pipeline path calls it
only for strings that the vectorized fast path could not classify.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass
from typing import Optional, Tuple

MAX_RECURSION_DEPTH = 128  # nom_parser.rs:9 — lax obs-domain guard
MAX_COMMENT_DEPTH = 200  # practical stack guard for nested comments (nom relies on the native stack)

_FAIL = -1

# ---------------------------------------------------------------------------
# Character classes (nom_parser.rs:582-637). Precomputed ASCII tables +
# a >=0x80 fast path (RFC 6532).
# ---------------------------------------------------------------------------

_ATEXT_SYMBOLS = "!#$%&'*+-/=?^_`{|}~"


def _build_tables():
    atext = [False] * 128
    atext_no_dash = [False] * 128
    qtext = [False] * 128
    dtext = [False] * 128
    ctext = [False] * 128
    qpair = [False] * 128
    for o in range(128):
        ch = chr(o)
        printable = 0x21 <= o <= 0x7E
        obs_ctl = (0x01 <= o <= 0x08) or o in (0x0B, 0x0C) or (0x0E <= o <= 0x1F) or o == 0x7F
        wsp = ch in " \t"
        a = ch.isascii() and (ch.isalnum() or ch in _ATEXT_SYMBOLS)
        atext[o] = a
        atext_no_dash[o] = a and ch != "-"
        qtext[o] = ch not in '"\\' and (printable or obs_ctl)
        dtext[o] = ch not in "[]\\" and (printable or obs_ctl)
        ctext[o] = ch not in "()\\" and (printable or obs_ctl)
        qpair[o] = printable or wsp or o in (0x00, 0x0D, 0x0A) or obs_ctl
    return (
        tuple(atext),
        tuple(atext_no_dash),
        tuple(qtext),
        tuple(dtext),
        tuple(ctext),
        tuple(qpair),
    )


(_ATEXT, _ATEXT_ND, _QTEXT, _DTEXT, _CTEXT, _QPAIR) = _build_tables()


def is_atext(ch: str) -> bool:
    o = ord(ch)
    return _ATEXT[o] if o < 128 else True


def is_atext_no_dash(ch: str) -> bool:
    o = ord(ch)
    return _ATEXT_ND[o] if o < 128 else True


def is_qtext(ch: str) -> bool:
    o = ord(ch)
    return _QTEXT[o] if o < 128 else True


def is_dtext(ch: str) -> bool:
    o = ord(ch)
    return _DTEXT[o] if o < 128 else True


def is_ctext(ch: str) -> bool:
    o = ord(ch)
    return _CTEXT[o] if o < 128 else True


def is_quoted_pair_char(ch: str) -> bool:
    o = ord(ch)
    return _QPAIR[o] if o < 128 else False  # quoted-pair is ASCII-only (nom_parser.rs:598-603)


# ---------------------------------------------------------------------------
# Whitespace productions
# ---------------------------------------------------------------------------


def _wsp0(s: str, i: int) -> Tuple[int, int]:
    n = len(s)
    count = 0
    while i < n and (s[i] == " " or s[i] == "\t"):
        i += 1
        count += 1
    return i, count


def _fws(s: str, i: int) -> int:
    """FWS = WSP+ | WSP* CRLF WSP+ , then (CRLF WSP+)* — nom_parser.rs:471-494."""
    i2, lead = _wsp0(s, i)
    i = i2
    if s.startswith("\r\n", i):
        j, cnt = _wsp0(s, i + 2)
        if cnt == 0:
            return _FAIL
        i = j
    elif lead == 0:
        return _FAIL
    while s.startswith("\r\n", i):
        j, cnt = _wsp0(s, i + 2)
        if cnt == 0:
            break
        i = j
    return i


def _skip_fws0(s: str, i: int) -> int:
    while True:
        j = _fws(s, i)
        if j != _FAIL and j > i:
            i = j
        else:
            return i


def _opt_wsp(s: str, i: int) -> int:
    if i < len(s) and (s[i] == " " or s[i] == "\t"):
        return i + 1
    return i


# ---------------------------------------------------------------------------
# Comments / CFWS
# ---------------------------------------------------------------------------


def _comment(s: str, i: int, depth: int) -> int:
    if depth >= MAX_COMMENT_DEPTH:
        return _FAIL
    n = len(s)
    if i >= n or s[i] != "(":
        return _FAIL
    i += 1
    while True:
        cp = i
        cand = i
        j = _fws(s, cand)
        if j != _FAIL:
            cand = j
        k = _ccontent(s, cand, depth)
        if k != _FAIL:
            i = k
            continue
        i = cp
        break
    j = _fws(s, i)
    if j != _FAIL:
        i = j
    if i < n and s[i] == ")":
        return i + 1
    return _FAIL


def _ccontent(s: str, i: int, depth: int) -> int:
    n = len(s)
    if i < n and is_ctext(s[i]):
        return i + 1
    if i + 1 < n and s[i] == "\\" and is_quoted_pair_char(s[i + 1]):
        return i + 2
    return _comment(s, i, depth + 1)


def _cfws(s: str, i: int) -> int:
    """CFWS = ((FWS? comment)+ FWS?) | FWS — nom_parser.rs:383-422."""
    found = False
    start = i
    while True:
        cp = i
        cand = i
        j = _fws(s, cand)
        if j != _FAIL:
            cand = j
        k = _comment(s, cand, 0)
        if k != _FAIL:
            i = k
            found = True
            continue
        i = cp
        break
    if found:
        j = _fws(s, i)
        return j if j != _FAIL else i
    return _fws(s, start)


def _skip_cfws0(s: str, i: int) -> int:
    n = len(s)
    while i < n and s[i] in " \t\r(":
        j = _cfws(s, i)
        if j != _FAIL and j > i:
            i = j
        else:
            break
    return i


# ---------------------------------------------------------------------------
# Core productions. Each returns (next_pos, canonical_str) or None.
# ---------------------------------------------------------------------------


def _dot_atom_label(s: str, i: int) -> Optional[Tuple[int, str]]:
    n = len(s)
    if i >= n or not is_atext_no_dash(s[i]):
        return None
    start = i
    i += 1
    while i < n and is_atext(s[i]):
        i += 1
    if s[i - 1] == "-":
        return None
    return i, s[start:i]


def _dot_atom_text(s: str, i: int) -> Optional[Tuple[int, str]]:
    r = _dot_atom_label(s, i)
    if r is None:
        return None
    i, lab = r
    parts = [lab]
    n = len(s)
    while i < n and s[i] == ".":
        j = _skip_cfws0(s, i + 1)  # CFWS allowed after each dot — nom_parser.rs:112
        r = _dot_atom_label(s, j)
        if r is None:
            return None  # hard failure, no backtrack to before the dot (`?` in nom)
        i, lab = r
        parts.append(lab)
    return i, ".".join(parts)


def _dot_atom(s: str, i: int) -> Optional[Tuple[int, str]]:
    i = _opt_wsp(s, i)
    r = _dot_atom_text(s, i)
    if r is None:
        return None
    i, canon = r
    i = _opt_wsp(s, i)
    return i, canon


def _qcontent(s: str, i: int) -> Optional[Tuple[int, str]]:
    n = len(s)
    if i < n and is_qtext(s[i]):
        return i + 1, s[i]
    if i + 1 < n and s[i] == "\\" and is_quoted_pair_char(s[i + 1]):
        return i + 2, s[i + 1]
    return None


def _quoted_string(s: str, i: int) -> Optional[Tuple[int, str]]:
    j = _cfws(s, i)
    if j != _FAIL:
        i = j
    n = len(s)
    if i >= n or s[i] != '"':
        return None
    i += 1
    parts = []
    while True:
        cp = i
        cand = i
        fw = _fws(s, cand)
        had_fws = fw != _FAIL
        if had_fws:
            cand = fw
        qc = _qcontent(s, cand)
        if qc is not None:
            if had_fws:
                parts.append(" ")  # interior FWS folds to one space in canonical form
            i, ch = qc
            parts.append(ch)
            continue
        i = cp
        break
    fw = _fws(s, i)
    if fw != _FAIL:
        i = fw
        parts.append(" ")
    if i >= n or s[i] != '"':
        return None
    i += 1
    j = _cfws(s, i)
    if j != _FAIL:
        i = j
    return i, "".join(parts)


def _domain_literal(s: str, i: int) -> Optional[Tuple[int, str]]:
    j = _cfws(s, i)
    if j != _FAIL:
        i = j
    n = len(s)
    if i >= n or s[i] != "[":
        return None
    i += 1
    parts = ["["]
    while True:
        cp = i
        cand = i
        fw = _fws(s, cand)
        if fw != _FAIL:
            cand = fw
        if cand < n and is_dtext(s[cand]):  # NO quoted-pair in dtext — nom_parser.rs:339-374
            parts.append(s[cand])
            i = cand + 1
            continue
        i = cp
        break
    fw = _fws(s, i)
    if fw != _FAIL:
        i = fw
    if i >= n or s[i] != "]":
        return None
    i += 1
    parts.append("]")
    j = _cfws(s, i)
    if j != _FAIL:
        i = j
    return i, "".join(parts)


def _atom(s: str, i: int) -> Optional[Tuple[int, str]]:
    j = _cfws(s, i)
    if j != _FAIL:
        i = j
    n = len(s)
    if i >= n or not is_atext(s[i]):
        return None
    start = i
    while i < n and is_atext(s[i]):
        i += 1
    canon = s[start:i]
    j = _cfws(s, i)
    if j != _FAIL:
        i = j
    return i, canon


def _word(s: str, i: int) -> Optional[Tuple[int, str]]:
    r = _atom(s, i)
    if r is not None:
        return r
    return _quoted_string(s, i)


def _obs_local_part(s: str, i: int) -> Optional[Tuple[int, str]]:
    """obs_local_part = FWS* word (CFWS* "." CFWS* word)* — nom_parser.rs:141-168."""
    i = _skip_fws0(s, i)
    r = _word(s, i)
    if r is None:
        return None
    i, w = r
    parts = [w]
    n = len(s)
    while True:
        cp = i
        cand = _skip_cfws0(s, i)
        if cand >= n or cand < n and s[cand] != ".":
            i = cp
            break
        cand = _skip_cfws0(s, cand + 1)
        r = _word(s, cand)
        if r is None:
            return None  # nom fails the whole production here (nom_parser.rs:160-163)
        i, w = r
        parts.append(w)
    return i, ".".join(parts)


def _obs_domain_inner(s: str, i: int, depth: int) -> Optional[Tuple[int, str]]:
    """Recursive obs_domain core — nom_parser.rs:221-257; depth cap nom_parser.rs:9."""
    if depth >= MAX_RECURSION_DEPTH:
        return None
    i = _skip_cfws0(s, i)
    n = len(s)
    if i >= n or not is_atext_no_dash(s[i]):
        return None
    start = i
    i += 1
    while i < n and is_atext_no_dash(s[i]):
        i += 1
    parts = [s[start:i]]
    while True:
        cp = i
        cand = _skip_cfws0(s, i)
        if cand < n and s[cand] == ".":
            r = _obs_domain_plus(s, cand + 1, depth + 1)
            if r is None:
                return None
            i, sub = r
            parts.append(".")
            parts.append(sub)
            continue
        h = cand
        while h < n and s[h] == "-":
            h += 1
        if h > cand:
            r = _obs_domain_plus(s, h, depth + 1)
            if r is None:
                return None
            i, sub = r
            parts.append("-" * (h - cand))
            parts.append(sub)
            continue
        i = cp
        break
    i = _skip_fws0(s, i)
    return i, "".join(parts)


def _obs_domain_plus(s: str, i: int, depth: int) -> Optional[Tuple[int, str]]:
    r = _obs_domain_inner(s, i, depth)
    if r is None:
        return None
    i, canon = r
    parts = [canon]
    while True:
        r = _obs_domain_inner(s, i, depth)
        if r is not None and r[0] > i:
            i, c2 = r
            parts.append(c2)
            continue
        break
    return i, "".join(parts)


# ---------------------------------------------------------------------------
# Alternations (committed choice, same order as nom — nom_parser.rs:71-88)
# ---------------------------------------------------------------------------


def _local_part_strict(s: str, i: int) -> Optional[Tuple[int, str]]:
    r = _dot_atom(s, i)
    if r is not None:
        return r
    return _quoted_string(s, i)


def _domain_strict(s: str, i: int) -> Optional[Tuple[int, str]]:
    r = _dot_atom(s, i)
    if r is not None:
        return r
    return _domain_literal(s, i)


def _local_part_obs(s: str, i: int) -> Optional[Tuple[int, str]]:
    r = _obs_local_part(s, i)
    if r is not None:
        return r
    r = _dot_atom(s, i)
    if r is not None:
        return r
    return _quoted_string(s, i)


def _domain_obs(s: str, i: int) -> Optional[Tuple[int, str]]:
    r = _obs_domain_inner(s, i, 0)
    if r is not None:
        return r
    r = _dot_atom(s, i)
    if r is not None:
        return r
    return _domain_literal(s, i)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ParsedAddress:
    """Analog of the reference ``EmailAddress`` (email_address.rs:79-82) plus
    engine-derived canonical forms (NOT a reference capability — SURVEY §1.1)."""

    local: str  # verbatim consumed slice, CFWS and all
    domain: str  # verbatim consumed slice
    local_canon: str
    domain_canon: str
    is_strict: bool

    @property
    def address(self) -> str:
        """Display round-trip: '{local}@{domain}' — email_address.rs:312-316."""
        return f"{self.local}@{self.domain}"

    @property
    def canonical_key(self) -> str:
        """Engine-derived matching key: NFC, domain casefolded."""
        return canonical_key(self.local_canon, self.domain_canon)


def canonical_key(local_canon: str, domain_canon: str) -> str:
    """Engine-derived matching key. ASCII stays on the cheap path (plain
    ``str.lower`` on the domain) so the scalar result is bit-identical to
    the vectorized Arrow kernel (:mod:`.fastpath`); non-ASCII gets
    NFC + casefold (computed in Python on both paths)."""
    l = local_canon if local_canon.isascii() else unicodedata.normalize("NFC", local_canon)
    if domain_canon.isascii():
        d = domain_canon.lower()
    else:
        d = unicodedata.normalize("NFC", domain_canon).casefold()
    return l + "@" + d


def _address_spec(s: str, strict: bool) -> Optional[ParsedAddress]:
    local_fn = _local_part_strict if strict else _local_part_obs
    domain_fn = _domain_strict if strict else _domain_obs
    r = local_fn(s, 0)
    if r is None:
        return None
    i, local_canon = r
    n = len(s)
    if i >= n or s[i] != "@":
        return None
    at = i
    r = domain_fn(s, at + 1)
    if r is None:
        return None
    j, domain_canon = r
    if j != n:  # all_consuming — nom_parser.rs:13-19
        return None
    return ParsedAddress(
        local=s[:at],
        domain=s[at + 1 :],
        local_canon=local_canon,
        domain_canon=domain_canon,
        is_strict=strict,
    )


def parse_address(s: str, is_lax: bool = False) -> Optional[ParsedAddress]:
    """``EmailAddress::parse`` analog — email_address.rs:149-155.

    Strict grammar first; the obsolete grammar is attempted only when
    ``is_lax`` and the strict parse failed (nom_parser.rs:12-22).
    """
    r = _address_spec(s, strict=True)
    if r is not None:
        return r
    if is_lax:
        return _address_spec(s, strict=False)
    return None


def is_valid(s: str, is_lax: bool = False) -> bool:
    """``EmailAddress::is_valid`` analog — email_address.rs:177-179."""
    return parse_address(s, is_lax) is not None


def make_address(
    local: str, domain: str, is_lax: bool = False
) -> Tuple[Optional[ParsedAddress], Optional[str]]:
    """``EmailAddress::new`` analog — email_address.rs:257-274.

    Joins the pair, re-parses. Strict failure yields the reference's exact
    error string (always blaming the local part — email_address.rs:266);
    lax mode NEVER fails: it constructs the unvalidated pair verbatim
    (email_address.rs:268-272).
    """
    joined = f"{local}@{domain}"
    parsed = parse_address(joined, is_lax)
    if parsed is not None:
        # Reference keeps the *caller's* parts, not the parser's split.
        return (
            ParsedAddress(
                local=local,
                domain=domain,
                local_canon=parsed.local_canon,
                domain_canon=parsed.domain_canon,
                is_strict=parsed.is_strict,
            ),
            None,
        )
    if is_lax:
        return (
            ParsedAddress(
                local=local,
                domain=domain,
                local_canon=local,
                domain_canon=domain,
                is_strict=False,
            ),
            None,
        )
    return None, f"Invalid local part '{local}'."
