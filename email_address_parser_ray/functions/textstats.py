"""Text-analysis kernels for the training-data pipeline operators.

All shaped as vectorized ``map_batches`` bodies over the ``documents``
table (doc_id, text, lang, source, n_chars).  Where a kernel is
SQL-expressible it has a DuckDB oracle in ``__ray_entry__.oracle_sql``
(token/char counts, punctuation ratios, md5 fingerprints); heuristics
(language ID) are rows-only checks.
"""

from __future__ import annotations

import hashlib
import re
import unicodedata
from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")
# RE2's ASCII \S (what the DuckDB oracle's regexp_extract_all('\S+')
# matches): everything except [\t\n\f\r ] — notably \v, NBSP and NEL
# are token chars there, unlike Python's Unicode str.split()
_RE2_TOK = re.compile(r"[^\t\n\f\r ]+")
_TOKEN_RE = r"\S+"
_PUNCT_RE = "[.,;:!?]"
_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

# tiny per-language stopword lists for the n-gram/stopword language heuristic
_STOPWORDS: Dict[str, set] = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "that", "it", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"},
    "de": {"der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "mit"},
}


def normalize_text(
    text,
    *,
    form: str = "NFC",
    lower: bool = True,
    collapse_ws: bool = True,
    strip_marks: bool = False,
) -> pa.Array:
    """Vectorized text canonicalization: Unicode normalize -> lowercase ->
    collapse whitespace runs to a single space -> trim.  The operation
    order mirrors the DuckDB oracle expression
    ``trim(regexp_replace(lower(nfc_normalize(t)), '\\s+', ' ', 'g'), ' ')``
    byte-for-byte.

    ``strip_marks=True`` replaces the normalize step with NFD + removal of
    combining marks (``\\p{Mn}``), which reproduces DuckDB's
    ``strip_accents`` exactly (both keep ligatures and fullwidth forms —
    verified: ``Ø`` and ``ﬁ`` survive, ``é``/``ñ``/``ü`` lose their marks).

    Scale note: pyarrow 16's ``utf8_normalize`` decomposes but never
    composes (NFC/NFKC come back decomposed), so composing forms use an
    ASCII fast path — rows whose byte length equals their codepoint count
    skip normalization entirely; only the non-ASCII minority goes through
    ``unicodedata.normalize``.  On web-scale corpora that minority is the
    per-batch exception, not the rule, so the hot path stays in Arrow.
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    if strip_marks:
        text = pc.replace_substring_regex(
            pc.utf8_normalize(text, form="NFD"), r"\p{Mn}", ""
        )
    elif form in ("NFD", "NFKD"):
        text = pc.utf8_normalize(text, form=form)
    else:  # NFC / NFKC: Arrow can't compose — Python fallback on non-ASCII rows only
        nonascii = pc.not_equal(pc.binary_length(text), pc.utf8_length(text))
        if pc.any(nonascii).as_py():
            idx = np.flatnonzero(nonascii.to_numpy(zero_copy_only=False))
            fixed = pa.array(
                [unicodedata.normalize(form, text[i].as_py()) for i in idx],
                pa.string(),
            )
            mask = np.zeros(len(text), bool)
            mask[idx] = True
            text = pc.replace_with_mask(text, pa.array(mask), fixed)
    if lower:
        text = pc.utf8_lower(text)
    if collapse_ws:
        text = pc.utf8_trim(pc.replace_substring_regex(text, r"\s+", " "), " ")
    return text


def token_stats(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens (whitespace), n_chars, n_bpeish — fully vectorized."""
    text = batch["text"]
    n_tokens = pc.count_substring_regex(text, _TOKEN_RE)
    n_chars = pc.utf8_length(text)
    # BPE-ish token count: letter runs + digit runs + single symbols
    n_bpeish = pc.count_substring_regex(text, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_bpeish": pc.cast(n_bpeish, pa.int64()),
        }
    )


def quality_stats(batch: pa.Table) -> pa.Table:
    """Length/punctuation quality features, integer micro-ratios so the
    DuckDB oracle hashes identically (no float fuzz)."""
    text = batch["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.int64())
    n_upper = pc.cast(pc.count_substring_regex(text, "[A-Z]"), pa.int64())
    n_digit = pc.cast(pc.count_substring_regex(text, "[0-9]"), pa.int64())
    n_space = pc.cast(pc.count_substring_regex(text, "[ ]"), pa.int64())
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int64()))
    punct_ppm = pc.cast(
        pc.divide(pc.multiply(n_punct, pa.scalar(1_000_000, pa.int64())), denom),
        pa.int64(),
    )
    space_ppm = pc.cast(
        pc.divide(pc.multiply(n_space, pa.scalar(1_000_000, pa.int64())), denom),
        pa.int64(),
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_punct": n_punct,
            "n_upper": n_upper,
            "n_digit": n_digit,
            "punct_ppm": punct_ppm,
            "space_ppm": space_ppm,
        }
    )


def fingerprint(batch: pa.Table) -> pa.Table:
    """doc_id, fp = md5(text) — content fingerprint (matches DuckDB md5())."""
    texts = batch["text"].to_pylist()
    fps = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.table(
        {"doc_id": batch["doc_id"], "fp": pa.array(fps, pa.string())}
    )


def _md5_col(arr) -> pa.Array:
    return pa.array(
        [hashlib.md5(t.encode("utf-8")).hexdigest() for t in arr.to_pylist()],
        pa.string(),
    )


def messy_variant(text) -> pa.Array:
    """Deterministic perturbation for the normalization oracle.  The
    synthetic corpus is all-ASCII, lowercase, single-spaced — normalizing
    it raw would be an identity no-op, proving nothing.  Both sides (this
    kernel and the DuckDB SQL in ``__ray_entry__.oracle_sql``) build the
    SAME messy string — leading space, first 40 chars uppercased, tab,
    precomposed É, decomposed e+U+0301, CRLF, the original text, trailing
    double space — so the value check exercises case folding, NFC
    composition, accent stripping and whitespace collapse on real work."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    upper40 = pc.utf8_upper(pc.utf8_slice_codeunits(text, 0, 40))
    return pc.binary_join_element_wise(
        " ", upper40, "\t\u00c9 e\u0301\r\n", text, "  ", ""
    )


def normalization_profile(batch: pa.Table) -> pa.Table:
    """norm_fp/norm_len (NFC+lower+ws-collapse canonical form) and
    ascii_fp (accent-stripped form) of the messy variant — the
    value-checked surface of ``normalize_text``."""
    messy = messy_variant(batch["text"])
    norm = normalize_text(messy)
    asc = normalize_text(messy, strip_marks=True)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "norm_fp": _md5_col(norm),
            "norm_len": pc.cast(pc.utf8_length(norm), pa.int64()),
            "ascii_fp": _md5_col(asc),
        }
    )


def text_profile(batch: pa.Table) -> pa.Table:
    """One-pass per-document text profile: the union of ``token_stats``,
    ``quality_stats``, ``fingerprint`` and ``lang_id`` columns (shared
    doc_id / n_chars computed once).  One query surface for the whole
    text-analysis family — the driver's correctness gate caps at 50
    queries, so same-grain kernels over ``documents`` are value-checked
    through a single merged query."""
    toks = token_stats(batch)
    qual = quality_stats(batch)
    fp = fingerprint(batch)
    lang = lang_id(batch)
    norm = normalization_profile(batch)
    rep = repetition_stats(batch)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": toks["n_tokens"],
            "n_chars": toks["n_chars"],
            "n_bpeish": toks["n_bpeish"],
            "n_punct": qual["n_punct"],
            "n_upper": qual["n_upper"],
            "n_digit": qual["n_digit"],
            "punct_ppm": qual["punct_ppm"],
            "space_ppm": qual["space_ppm"],
            "fp": fp["fp"],
            "lang_pred": lang["lang_pred"],
            "lang_score_ppm": lang["lang_score_ppm"],
            "norm_fp": norm["norm_fp"],
            "norm_len": norm["norm_len"],
            "ascii_fp": norm["ascii_fp"],
            "top_tok_ppm": rep["top_tok_ppm"],
            "dup_2gram_ppm": rep["dup_2gram_ppm"],
        }
    )


def lang_id(batch: pa.Table) -> pa.Table:
    """Stopword-overlap language heuristic, integer arithmetic only so
    the DuckDB oracle (list_filter over the same stopword lists)
    reproduces it exactly.

    Over the first 256 lowercased whitespace tokens: each language is
    scored by stopword hit COUNT (shared denominator, so the argmax over
    counts equals the argmax over rates; ties favor the earlier language
    in _STOPWORDS order); 'und' unless the best hit-rate exceeds 2%
    (hits * 50 > n).  lang_score_ppm = hits * 1e6 // n.
    """
    texts = batch["text"].to_pylist()
    tok_rows = [_WS.split(t.lower().strip())[:256] for t in texts]  # cap per-row work
    lens = np.array([len(x) for x in tok_rows], np.int64)  # >= 1: splitting '' yields ['']
    n_rows = len(texts)
    flat = np.array([w for row in tok_rows for w in row], dtype=object)
    row_of = np.repeat(np.arange(n_rows, dtype=np.int64), lens)

    # hit counts per (row, language) in one np.isin sweep per language
    names = list(_STOPWORDS)
    hits = np.zeros((n_rows, len(names)), np.int64)
    for j, lang in enumerate(names):
        sw = np.array(sorted(_STOPWORDS[lang]), dtype=object)
        hits[:, j] = np.bincount(row_of[np.isin(flat, sw)], minlength=n_rows)

    # argmax ties favor the earlier language (np.argmax first-hit); zero
    # hits and sub-2%-rate rows fall back to 'und'
    best_j = hits.argmax(axis=1)
    best_hits = hits[np.arange(n_rows), best_j]
    name_arr = np.array(names, dtype=object)
    langs = np.where(best_hits * 50 > lens, name_arr[best_j], "und")
    ppms = best_hits * 1_000_000 // lens
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(langs, pa.string()),
            "lang_score_ppm": pa.array(ppms, pa.int64()),
        }
    )


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition filters, integer-exact for the SQL
    oracle: ``top_tok_ppm`` = most-frequent-token occurrences * 1e6 //
    n_tokens (the "top word fraction" rule) and ``dup_2gram_ppm`` =
    (bigram occurrences - distinct bigrams) * 1e6 // bigrams (the
    "duplicate n-gram fraction" rule).  Vectorized batch-wide: one
    np.unique over the flat token array, per-doc folds via reduceat /
    bincount — no per-doc Python beyond the tokenizing findall.

    Tokenizes on the exact class DuckDB's RE2 ``\\S+`` implies
    ([\\t\\n\\f\\r ] — probed: \\v/NBSP/NEL are token chars in RE2,
    but Python str.split() treats them as separators), so the oracle
    agrees on corpora containing exotic whitespace."""
    texts = batch["text"].to_pylist()
    tok_rows = [_RE2_TOK.findall(t) for t in texts]
    lens = np.fromiter((len(r) for r in tok_rows), np.int64, len(tok_rows))
    n = len(texts)
    flat = np.array([w for r in tok_rows for w in r], dtype=object)
    top = np.zeros(n, np.int64)
    dup_ppm = np.zeros(n, np.int64)
    if len(flat):
        uniq, inv = np.unique(flat, return_inverse=True)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        key = doc_of * np.int64(len(uniq) + 1) + inv
        ukey, cnt = np.unique(key, return_counts=True)
        udoc = (ukey // (len(uniq) + 1)).astype(np.int64)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(udoc)) + 1])
        top[udoc[starts]] = np.maximum.reduceat(cnt, starts)
        same = doc_of[:-1] == doc_of[1:]  # bigrams never cross docs
        bd = doc_of[:-1][same]
        if len(bd):
            arr = np.stack([bd, inv[:-1][same], inv[1:][same]], axis=1)
            tot2 = np.bincount(bd, minlength=n)
            dist2 = np.bincount(np.unique(arr, axis=0)[:, 0], minlength=n)
            dup_ppm = (tot2 - dist2) * 1_000_000 // np.maximum(tot2, 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "top_tok_ppm": pa.array(top * 1_000_000 // np.maximum(lens, 1), pa.int64()),
            "dup_2gram_ppm": pa.array(dup_ppm, pa.int64()),
        }
    )
