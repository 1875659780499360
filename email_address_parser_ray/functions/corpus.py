"""Conformance-corpus compiler.

Re-expresses the reference's build-time test generator
(``/root/reference/rust-lib/build.rs:9-66``) as a Python module that compiles
the same ``.test_data`` corpora into pyarrow tables (and Parquet fixtures)
consumed by pytest and by the pipeline correctness gates.

Decoding rules mirrored exactly:
  * the ``.txt`` corpus lines are fragments of Rust string literals —
    ``\\"`` and ``\\\\`` escapes must be decoded (same rule the reference's
    own JS test suite applies — npm-packages/regex/tests/email-regex.spec.ts:25-28);
  * isemail XML: numeric character refs, then Unicode control pictures
    U+2400/2407/2409/240A/240D -> real control characters (build.rs:243-254);
  * 3 domain-literal quoted-pair cases ignored (build.rs:214-218);
  * truth rule: ``category != "ISEMAIL_ERR"`` (build.rs:255-257).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import List

import pyarrow as pa

TEST_DATA_DIR = "/root/reference/.test_data"

# Addresses skipped by the reference generator because nom's domain_literal
# has no quoted-pair production (build.rs:214-218), decoded to raw chars.
IGNORED_ISEMAIL_ADDRESSES = (
    "test@[RFC-5322-\\\t-domain-literal]",
    "test@[RFC-5322-\\\x07-domain-literal]",
    "test@[RFC-5322-\\]-domain-literal]",
)

_CONTROL_PICTURES = {
    "␍": "\r",
    "␊": "\n",
    "␀": "\x00",
    "␇": "\x07",
    "␉": "\t",
}


def decode_rust_literal(line: str) -> str:
    """Decode a corpus line that is spliced into a Rust string literal."""
    out = []
    i = 0
    n = len(line)
    while i < n:
        ch = line[i]
        if ch == "\\" and i + 1 < n:
            out.append(line[i + 1])
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _read_corpus_file(name: str, root: str = TEST_DATA_DIR) -> List[str]:
    with open(os.path.join(root, name), encoding="utf-8") as f:
        return [decode_rust_literal(line) for line in f.read().splitlines()]


@dataclass(frozen=True)
class Corpus:
    valid_local_parts: List[str]
    valid_domains: List[str]
    invalid_local_parts: List[str]
    invalid_domains: List[str]


def load_corpus(root: str = TEST_DATA_DIR) -> Corpus:
    return Corpus(
        valid_local_parts=_read_corpus_file("valid_local_parts.txt", root),
        valid_domains=_read_corpus_file("valid_domains.txt", root),
        invalid_local_parts=_read_corpus_file("invalid_local_parts.txt", root),
        invalid_domains=_read_corpus_file("invalid_domains.txt", root),
    )


def cartesian_cases(corpus: Corpus) -> pa.Table:
    """All local x domain combos with expected strict validity, in the same
    emission order as build.rs (valid x valid, invalid x valid,
    valid x invalid, invalid x invalid — build.rs:412-417)."""
    case_id, locals_, domains, addresses, expected = [], [], [], [], []

    def emit(lps, doms, valid):
        for lp in lps:
            for d in doms:
                case_id.append(len(case_id) + 1)
                locals_.append(lp)
                domains.append(d)
                addresses.append(f"{lp}@{d}")
                expected.append(valid)

    emit(corpus.valid_local_parts, corpus.valid_domains, True)
    emit(corpus.invalid_local_parts, corpus.valid_domains, False)
    emit(corpus.valid_local_parts, corpus.invalid_domains, False)
    emit(corpus.invalid_local_parts, corpus.invalid_domains, False)
    return pa.table(
        {
            "case_id": pa.array(case_id, pa.int32()),
            "local_part": pa.array(locals_, pa.string()),
            "domain": pa.array(domains, pa.string()),
            "address": pa.array(addresses, pa.string()),
            "expected_valid_strict": pa.array(expected, pa.bool_()),
        }
    )


def isemail_cases(root: str = TEST_DATA_DIR) -> pa.Table:
    """The isemail conformance corpus, lax-mode truth — build.rs:169-281."""
    tree = ET.parse(os.path.join(root, "isemail_tests.xml"))
    ids, addresses, categories, expected = [], [], [], []
    for test in tree.getroot().findall("test"):
        addr_el = test.find("address")
        address = addr_el.text or ""
        for pic, real in _CONTROL_PICTURES.items():
            address = address.replace(pic, real)
        if address in IGNORED_ISEMAIL_ADDRESSES:
            continue
        category = (test.find("category").text or "").strip()
        ids.append(int(test.get("id")))
        addresses.append(address)
        categories.append(category)
        expected.append(category != "ISEMAIL_ERR")
    return pa.table(
        {
            "case_id": pa.array(ids, pa.int32()),
            "address": pa.array(addresses, pa.string()),
            "category": pa.array(categories, pa.string()),
            "expected_valid_lax": pa.array(expected, pa.bool_()),
        }
    )


def write_fixture_parquet(out_dir: str, root: str = TEST_DATA_DIR) -> dict:
    """Materialize the corpora as Parquet fixture tables (FIXTURES.md #2/#3)."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    corpus = load_corpus(root)
    paths = {}
    for name, table in (
        ("corpus_addresses", cartesian_cases(corpus)),
        ("isemail_cases", isemail_cases(root)),
    ):
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(table, path)
        paths[name] = path
    return paths


FIXTURE_DIR = "/tmp/eap_ray_cache/fixtures_v1"


def ensure_fixtures() -> dict:
    """Write (once) the conformance fixture tables under /tmp; returns
    name -> parquet path.  Used by the driver-visible conformance queries
    and their SQL oracles."""
    marker = os.path.join(FIXTURE_DIR, "_SUCCESS")
    if not os.path.exists(marker):
        paths = write_fixture_parquet(FIXTURE_DIR)
        with open(marker, "w") as f:
            f.write("ok\n")
        return paths
    return {
        "corpus_addresses": os.path.join(FIXTURE_DIR, "corpus_addresses.parquet"),
        "isemail_cases": os.path.join(FIXTURE_DIR, "isemail_cases.parquet"),
    }
