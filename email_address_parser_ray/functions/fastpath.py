"""Vectorized addr-spec tokenizer — Arrow fast path + scalar fallback.

The reference parses one string at a time in Rust
(``/root/reference/rust-lib/src/nom_parser.rs``).  Our engine re-expresses
the same grammar as a two-tier *batch* kernel:

* **fast path** — a single anchored RE2 pattern run over the whole Arrow
  string column with ``pyarrow.compute`` (``match_substring_regex`` /
  ``extract_regex``), covering the plain ``dot-atom@dot-atom`` shape that
  dominates real traffic.  The pattern is constructed so that *every*
  full match is strict-valid under the reference grammar AND its
  canonical form equals the verbatim text (no CFWS/quoting present), so
  no per-row Python runs for these rows.
* **slow path** — the scalar PEG parser (:mod:`.grammar`, a faithful
  reimplementation of nom_parser.rs) applied only to the minority of
  rows the fast pattern rejects (quoted strings, domain literals, CFWS,
  comments, CRLF folding, obsolete productions).

Grammar notes baked into the fast pattern (citations into /root/reference):

* per-label no-leading/trailing ``-`` — nom_parser.rs:121-138;
* RFC 6532: any non-ASCII scalar is atext — nom_parser.rs:590-592,
  expressed as ``[^\\x00-\\x7F]`` in RE2;
* exactly one structural ``@`` (atext excludes ``@``), mirroring nom's
  structural split rather than the JS regex's ``lastIndexOf("@")``
  (npm-packages/regex/src/index.ts:71 divergence).

Also hosts the free-text mention scanner used by the extraction stage:
angle-bracketed ``<addr-spec>`` spans (parsed with the full grammar) and
bare plain-shape tokens, emitted in document order.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .grammar import ParsedAddress, canonical_key, parse_address

# --- RE2 (pyarrow) pattern pieces -----------------------------------------
_SYM = "!#$%&'*+\\-/=?^_`{|}~"  # atext symbols, '-' escaped
_A = f"[A-Za-z0-9{_SYM}]|[^\\x00-\\x7F]"          # atext (incl. '-', RFC 6532)
_ND = f"[A-Za-z0-9{_SYM.replace(chr(92) + '-', '')}]|[^\\x00-\\x7F]"  # atext minus '-'
_LABEL = f"(?:{_ND})(?:(?:{_A})*(?:{_ND}))?"       # no leading/trailing dash
_DOT_ATOM_TEXT = f"{_LABEL}(?:\\.{_LABEL})*"
PLAIN_FULL = f"^{_DOT_ATOM_TEXT}@{_DOT_ATOM_TEXT}$"
PLAIN_EXTRACT = f"^(?P<local_part>{_DOT_ATOM_TEXT})@(?P<domain>{_DOT_ATOM_TEXT})$"

# --- Python `re` equivalents for the free-text scanner --------------------
_PSYM = re.escape("!#$%&'*+-/=?^_`{|}~")
_PSYM_ND = re.escape("!#$%&'*+/=?^_`{|}~")  # atext symbols minus '-'
_PA = f"[A-Za-z0-9{_PSYM}\\u0080-\\U0010FFFF]"
_PND = f"[A-Za-z0-9{_PSYM_ND}\\u0080-\\U0010FFFF]"
_PLABEL = f"{_PND}(?:{_PA}*{_PND})?"
_PDAT = f"{_PLABEL}(?:\\.{_PLABEL})*"
PLAIN_RE = re.compile(f"{_PDAT}@{_PDAT}")
# \A/\Z, not ^/$: Python's $ matches before a trailing newline, which would
# wrongly accept "test@iana.org\n" (isemail case 99 expects reject)
PLAIN_FULL_RE = re.compile(f"\\A{_PDAT}@{_PDAT}\\Z")
ANGLE_RE = re.compile(r"<([^<>]*)>")
# bare token boundary: not preceded/followed by an atext/dot/@ char
_BOUND = f"[A-Za-z0-9{_PSYM}.@\\u0080-\\U0010FFFF]"
BARE_RE = re.compile(f"(?<!{_BOUND})({_PDAT}@{_PDAT})(?!{_BOUND})")


def _plain_mask(arr: pa.Array) -> np.ndarray:
    m = pc.match_substring_regex(arr, PLAIN_FULL)
    m = pc.fill_null(m, False)
    return np.asarray(m.to_numpy(zero_copy_only=False), dtype=bool)


def validate_column(
    arr: pa.ChunkedArray | pa.Array, is_lax: bool = False
) -> Tuple[np.ndarray, List[Optional[ParsedAddress]]]:
    """Scalar-result variant (tests / small batches): (valid_mask, parsed).

    Plain dot-atom@dot-atom rows are classified by one vectorized RE2
    pass; only the rejected minority runs the scalar grammar.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    plain = _plain_mask(arr)
    valid = plain.copy()
    parsed: List[Optional[ParsedAddress]] = [None] * n
    slow_idx = np.flatnonzero(~plain)
    slow_vals = arr.take(pa.array(slow_idx)).to_pylist() if len(slow_idx) else []
    for i in np.flatnonzero(plain):
        s = arr[int(i)].as_py()
        at = s.index("@")
        lp, dom = s[:at], s[at + 1 :]
        parsed[i] = ParsedAddress(lp, dom, lp, dom, True)
    for i, s in zip(slow_idx, slow_vals):
        if s is None:
            continue
        r = parse_address(s, is_lax)
        if r is not None:
            valid[i] = True
            parsed[i] = r
    return valid, parsed


def tokenize_batch(batch: pa.Table, column: str = "address", is_lax: bool = False) -> pa.Table:
    """Fully vectorized batch kernel: the ``EmailAddress::parse`` analog
    as a map_batches stage over a whole-string address column.

    Plain rows (the overwhelming majority) never touch per-row Python:
    one RE2 match + one RE2 extract + Arrow string kernels produce every
    output column zero-copy; the scalar grammar runs only on the
    non-plain minority (quoting/CFWS/literals/obs productions).
    """
    arr = batch[column]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    plain = _plain_mask(arr)

    ext = pc.extract_regex(arr, PLAIN_EXTRACT)
    local = pc.struct_field(ext, "local_part")
    domain = pc.struct_field(ext, "domain")
    # canonical key for plain+ASCII rows: local @ lower(domain), vectorized.
    # (matches grammar.canonical_key's ASCII path bit-for-bit)
    key_vec = pc.binary_join_element_wise(local, pc.utf8_lower(domain), "@")

    ascii_mask = np.asarray(
        pc.fill_null(pc.string_is_ascii(arr), True).to_numpy(zero_copy_only=False),
        dtype=bool,
    )
    easy = plain & ascii_mask

    valid = easy.copy()
    # slow path: non-plain rows OR plain-but-non-ASCII (NFC handling).
    # Merged back with replace_with_mask so the vectorized majority columns
    # are never converted to Python objects.
    slow_idx = np.flatnonzero(~easy)
    if len(slow_idx):
        s_local: List[Optional[str]] = []
        s_domain: List[Optional[str]] = []
        s_lc: List[Optional[str]] = []
        s_dc: List[Optional[str]] = []
        s_key: List[Optional[str]] = []
        s_strict: List[bool] = []
        slow_vals = arr.take(pa.array(slow_idx)).to_pylist()
        for i, s in zip(slow_idx, slow_vals):
            p = _parse_candidate(s, is_lax) if s is not None else None
            if p is None:
                s_local.append(None)
                s_domain.append(None)
                s_lc.append(None)
                s_dc.append(None)
                s_key.append(None)
                s_strict.append(False)
            else:
                valid[i] = True
                s_local.append(p.local)
                s_domain.append(p.domain)
                s_lc.append(p.local_canon)
                s_dc.append(p.domain_canon)
                s_key.append(p.canonical_key)
                s_strict.append(p.is_strict)
        slow_mask = pa.array(~easy)
        local_a = pc.replace_with_mask(local, slow_mask, pa.array(s_local, pa.string()))
        domain_a = pc.replace_with_mask(domain, slow_mask, pa.array(s_domain, pa.string()))
        lc_a = pc.replace_with_mask(local, slow_mask, pa.array(s_lc, pa.string()))
        dc_a = pc.replace_with_mask(domain, slow_mask, pa.array(s_dc, pa.string()))
        key_a = pc.replace_with_mask(key_vec, slow_mask, pa.array(s_key, pa.string()))
        strict_a = pc.replace_with_mask(
            pa.array(plain), slow_mask, pa.array(s_strict, pa.bool_())
        )
    else:
        local_a, domain_a, lc_a, dc_a, key_a = local, domain, local, domain, key_vec
        strict_a = pa.array(plain, pa.bool_())
    return (
        batch.append_column("is_valid", pa.array(valid, pa.bool_()))
        .append_column("local_part", local_a)
        .append_column("domain", domain_a)
        .append_column("local_canon", lc_a)
        .append_column("domain_canon", dc_a)
        .append_column("is_strict", strict_a)
        .append_column("canonical_key", key_a)
    )


# fast paths for the two most common non-plain shapes (both strict-valid):
# single leading/trailing WSP around a plain dot-atom pair (G8:
# dot_atom = WSP? dot_atom_text WSP?), and a simple quoted-string local
# (printable qtext + single interior spaces, no escapes/folding).
WSP_PLAIN_RE = re.compile(f"\\A([ \\t]?)({_PDAT})@({_PDAT})([ \\t]?)\\Z")
_QSAFE = "[\\x21\\x23-\\x5B\\x5D-\\x7E\\u0080-\\U0010FFFF]"
QUOTED_SIMPLE_RE = re.compile(
    f'\\A"({_QSAFE}+(?: {_QSAFE}+)*)"@({_PDAT})\\Z'
)


def _parse_candidate(s: str, is_lax: bool) -> Optional[ParsedAddress]:
    if PLAIN_FULL_RE.match(s):
        at = s.index("@")
        return ParsedAddress(s[:at], s[at + 1 :], s[:at], s[at + 1 :], True)
    m = WSP_PLAIN_RE.match(s)
    if m:
        lw, lc, dc, dw = m.groups()
        return ParsedAddress(lw + lc, dc + dw, lc, dc, True)
    m = QUOTED_SIMPLE_RE.match(s)
    if m:
        content, dom = m.groups()
        return ParsedAddress(f'"{content}"', dom, content, dom, True)
    return parse_address(s, is_lax)


def scan_text(text: str, is_lax: bool = True) -> Iterator[Tuple[int, ParsedAddress]]:
    """Yield (start_offset, ParsedAddress) for each address mention in free
    text, in document order.

    Extraction contract: ``<...>`` spans are parsed as full addr-specs with
    the complete (lax) grammar — the RFC 5322 angle-addr convention — and
    bare tokens of plain dot-atom@dot-atom shape are matched outside those
    spans.  Every bare emission is strict-valid by construction of the
    pattern (see module docstring).
    """
    spans: List[Tuple[int, int]] = []
    for m in ANGLE_RE.finditer(text):
        inner = m.group(1)
        p = _parse_candidate(inner, is_lax)
        if p is not None:
            # only a *successfully parsed* span shadows the bare scanner;
            # a failed span may still contain bare mentions inside it
            spans.append((m.start(), m.end()))
            yield m.start(), p
    if "@" in text:
        covered = spans
        for m in BARE_RE.finditer(text):
            s, e = m.span(1)
            if any(cs <= s < ce for cs, ce in covered):
                continue
            tok = m.group(1)
            at = tok.index("@")
            yield s, ParsedAddress(tok[:at], tok[at + 1 :], tok[:at], tok[at + 1 :], True)


def validate_pairs_batch(
    batch: pa.Table,
    local_col: str = "local_part",
    domain_col: str = "domain",
    is_lax: bool = False,
) -> pa.Table:
    """``EmailAddress::new`` analog as a batch kernel (A3 —
    email_address.rs:257-274): join the two columns with '@', re-run the
    full parse.  Strict failures produce the reference's exact error
    string — always blaming the local part (email_address.rs:266) — and
    lax mode NEVER fails (constructs the unvalidated pair, :268-272).
    Appends columns ``new_ok: bool`` and ``new_error: string``.
    """
    joined = pc.binary_join_element_wise(batch[local_col], batch[domain_col], "@")
    tokenized = tokenize_batch(pa.table({"address": joined}), "address", is_lax)
    valid = np.asarray(
        tokenized["is_valid"].to_numpy(zero_copy_only=False), dtype=bool
    )
    if is_lax:
        ok = np.ones(len(valid), dtype=bool)
        err = pa.array([None] * len(valid), pa.string())
    else:
        ok = valid
        locals_ = batch[local_col]
        err_all = pc.binary_join_element_wise(
            pa.scalar("Invalid local part '"), locals_, pa.scalar("'."), ""
        )
        err = pc.if_else(pa.array(valid), pa.scalar(None, pa.string()), err_all)
    return batch.append_column("new_ok", pa.array(ok)).append_column("new_error", err)


# joined-scan variants: '\x00' separates rows, so exclude it from spans
ANGLE_JOINED_RE = re.compile(r"<([^<>\x00]*)>")


def extract_mentions_batch(batch: pa.Table, is_lax: bool = True) -> pa.Table:
    """map_batches kernel: transcripts(text) -> one output row per mention.

    Mega-string scan: candidate rows (vectorized '@'/'<' prefilter) are
    joined with a NUL separator and each compiled pattern runs ONCE over
    the whole batch at C speed; match offsets map back to rows via
    ``np.searchsorted`` on the cumulative row offsets.  Per-mention Python
    runs only for angle-bracketed spans (full-grammar parse) — bare
    matches are strict-valid by pattern construction.
    """
    texts = batch["text"]
    has_candidate = np.asarray(
        pc.or_(
            pc.match_substring(texts, "@"), pc.match_substring(texts, "<")
        ).to_numpy(zero_copy_only=False),
        dtype=bool,
    )
    cand_idx = np.flatnonzero(has_candidate)
    found: List[Tuple[int, int, ParsedAddress]] = []  # (row, start, parsed)
    if len(cand_idx):
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts_py = texts.take(pa.array(cand_idx)).to_pylist()
        joined = "\x00".join(texts_py)
        lens = np.fromiter((len(t) for t in texts_py), dtype=np.int64)
        offsets = np.zeros(len(texts_py), dtype=np.int64)
        np.cumsum(lens[:-1] + 1, out=offsets[1:])

        angle_spans: List[Tuple[int, int]] = []
        raw: List[Tuple[int, ParsedAddress]] = []  # (global start, parsed)
        for m in ANGLE_JOINED_RE.finditer(joined):
            p = _parse_candidate(m.group(1), is_lax)
            if p is not None:
                angle_spans.append((m.start(), m.end()))
                raw.append((m.start(), p))
        span_starts = np.array([s for s, _ in angle_spans], dtype=np.int64)
        span_ends = np.array([e for _, e in angle_spans], dtype=np.int64)
        for m in BARE_RE.finditer(joined):
            s = m.start(1)
            if len(span_starts):
                j = int(np.searchsorted(span_starts, s, side="right") - 1)
                if j >= 0 and s < span_ends[j]:
                    continue  # inside a parsed angle span
            tok = m.group(1)
            at = tok.index("@")
            raw.append(
                (s, ParsedAddress(tok[:at], tok[at + 1 :], tok[:at], tok[at + 1 :], True))
            )
        # batch-map global offsets → candidate-row indices (one searchsorted)
        starts = np.fromiter((r[0] for r in raw), dtype=np.int64, count=len(raw))
        rows = np.searchsorted(offsets, starts, side="right") - 1
        found = [(int(rows[j]), raw[j][0], raw[j][1]) for j in range(len(raw))]
        found.sort(key=lambda t: (t[0], t[1]))

    n_found = len(found)
    o_gi = np.empty(n_found, dtype=np.int64)
    o_mi = np.empty(n_found, dtype=np.int32)
    o_addr: List[str] = []
    o_local: List[str] = []
    o_dom: List[str] = []
    o_lc: List[str] = []
    o_dc: List[str] = []
    o_key: List[str] = []
    o_strict: List[bool] = []
    prev_row = -1
    mi = 0
    for j, (row, _pos, p) in enumerate(found):
        mi = mi + 1 if row == prev_row else 0
        prev_row = row
        o_gi[j] = cand_idx[row]
        o_mi[j] = mi
        o_addr.append(p.address)
        o_local.append(p.local)
        o_dom.append(p.domain)
        o_lc.append(p.local_canon)
        o_dc.append(p.domain_canon)
        o_key.append(p.canonical_key)
        o_strict.append(p.is_strict)
    take = pa.array(o_gi)
    conv = batch["conv_id"]
    turn = batch["turn_idx"]
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    if isinstance(turn, pa.ChunkedArray):
        turn = turn.combine_chunks()
    return pa.table(
        {
            "conv_id": conv.take(take),
            "turn_idx": pc.cast(turn.take(take), pa.int32()),
            "mention_idx": pa.array(o_mi, pa.int32()),
            "address": pa.array(o_addr, pa.string()),
            "local_part": pa.array(o_local, pa.string()),
            "domain": pa.array(o_dom, pa.string()),
            "local_canon": pa.array(o_lc, pa.string()),
            "domain_canon": pa.array(o_dc, pa.string()),
            "canonical_key": pa.array(o_key, pa.string()),
            "is_strict": pa.array(o_strict, pa.bool_()),
        }
    )


def redact_mentions_batch(
    batch: pa.Table,
    is_lax: bool = True,
    placeholder: str = "[EMAIL]",
    column: str = "text",
) -> pa.Table:
    """PII-redaction kernel: the inverse of ``extract_mentions_batch``.

    Replaces every mention the extraction contract detects — parsed
    ``<addr-spec>`` spans (the whole ``<...>``) and bare strict tokens
    outside them — with ``placeholder``, leaving every other byte
    untouched.  Same mega-string scan as extraction (vectorized
    candidate prefilter, one compiled-pattern pass over the NUL-joined
    batch), so redact ∘ extract consistency is structural:
    ``extract(redact(t))`` is empty and redaction is idempotent as long
    as ``placeholder`` itself contains no '@' or '<'.  Training-data
    privacy surface (pairs with the retraction paths: forget the
    records AND scrub the text).

    Output = input table with ``column`` rewritten + an ``n_redacted``
    int32 column.
    """
    if "@" in placeholder or "<" in placeholder:
        raise ValueError("placeholder must not itself look like a mention")
    texts = batch[column]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    has_candidate = np.asarray(
        pc.or_(
            pc.match_substring(texts, "@"), pc.match_substring(texts, "<")
        ).to_numpy(zero_copy_only=False),
        dtype=bool,
    )
    n = batch.num_rows
    n_red = np.zeros(n, dtype=np.int32)
    cand_idx = np.flatnonzero(has_candidate)
    if len(cand_idx) == 0:
        return batch.append_column("n_redacted", pa.array(n_red, pa.int32()))

    texts_py = texts.take(pa.array(cand_idx)).to_pylist()
    joined = "\x00".join(texts_py)
    lens = np.fromiter((len(t) for t in texts_py), dtype=np.int64)
    offsets = np.zeros(len(texts_py), dtype=np.int64)
    np.cumsum(lens[:-1] + 1, out=offsets[1:])

    spans: List[Tuple[int, int]] = []
    for m in ANGLE_JOINED_RE.finditer(joined):
        if _parse_candidate(m.group(1), is_lax) is not None:
            spans.append((m.start(), m.end()))
    span_starts = np.array([s for s, _ in spans], dtype=np.int64)
    span_ends = np.array([e for _, e in spans], dtype=np.int64)
    for m in BARE_RE.finditer(joined):
        s, e = m.span(1)
        if len(span_starts):
            j = int(np.searchsorted(span_starts, s, side="right") - 1)
            if j >= 0 and s < span_ends[j]:
                continue  # inside a parsed angle span
        spans.append((s, e))
    spans.sort()

    redacted = list(texts_py)
    if spans:
        starts = np.fromiter((s for s, _ in spans), dtype=np.int64, count=len(spans))
        rows = np.searchsorted(offsets, starts, side="right") - 1
        j = 0
        while j < len(spans):
            row = int(rows[j])
            base = int(offsets[row])
            parts: List[str] = []
            at = 0
            src = texts_py[row]
            k = j
            while k < len(spans) and int(rows[k]) == row:
                s, e = spans[k]
                parts.append(src[at : s - base])
                parts.append(placeholder)
                at = e - base
                k += 1
            parts.append(src[at:])
            redacted[row] = "".join(parts)
            n_red[cand_idx[row]] = k - j
            j = k

    out_texts = texts.to_pylist()
    for i, row in enumerate(cand_idx):
        out_texts[int(row)] = redacted[i]
    cols = {name: batch[name] for name in batch.column_names}
    cols[column] = pa.array(out_texts, pa.string())
    cols["n_redacted"] = pa.array(n_red, pa.int32())
    return pa.table(cols)
