"""redact_mentions_batch — the privacy inverse of extraction: every
mention the extraction contract finds is replaced, nothing else moves,
and the two kernels stay consistent by construction."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from email_address_parser_ray.functions.fastpath import (
    extract_mentions_batch,
    redact_mentions_batch,
)


def _turns(texts):
    n = len(texts)
    return pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)], pa.string()),
            "turn_idx": pa.array(np.zeros(n, np.int32)),
            "text": pa.array(texts, pa.string()),
        }
    )


CASES = [
    "write to alice@example.com today",
    "cc Bob Smith <bob.smith@corp.example.org> and carol@example.net",
    "angle with obs form <\"quoted local\"@example.com> stays one span",
    "no mentions here at all",
    "failed span <not an address> but bare inner@example.com counts",
    "twice alice@example.com then alice@example.com again",
    "",
]


def test_redact_exact_spans_and_counts():
    out = redact_mentions_batch(_turns(CASES))
    got = out["text"].to_pylist()
    assert got[0] == "write to [EMAIL] today"
    assert got[1] == "cc Bob Smith [EMAIL] and [EMAIL]"
    assert got[2] == "angle with obs form [EMAIL] stays one span"
    assert got[3] == CASES[3]
    assert got[4] == "failed span <not an address> but bare [EMAIL] counts"
    assert got[5] == "twice [EMAIL] then [EMAIL] again"
    assert got[6] == ""
    assert out["n_redacted"].to_pylist() == [1, 2, 1, 0, 1, 2, 0]


def test_redact_count_matches_extract_and_empties_it():
    t = _turns(CASES)
    mentions = extract_mentions_batch(t)
    out = redact_mentions_batch(t)
    per_row = dict(
        zip(mentions["conv_id"].to_pylist(), [0] * mentions.num_rows)
    )
    for c in mentions["conv_id"].to_pylist():
        per_row[c] = per_row.get(c, 0) + 1
    for i, c in enumerate(t["conv_id"].to_pylist()):
        assert out["n_redacted"][i].as_py() == per_row.get(c, 0)
    again = extract_mentions_batch(out.drop_columns(["n_redacted"]))
    assert again.num_rows == 0


def test_redact_idempotent_and_placeholder_guard():
    t = _turns(CASES)
    once = redact_mentions_batch(t).drop_columns(["n_redacted"])
    twice = redact_mentions_batch(once)
    assert twice["text"].to_pylist() == once["text"].to_pylist()
    assert all(v == 0 for v in twice["n_redacted"].to_pylist())
    with pytest.raises(ValueError):
        redact_mentions_batch(t, placeholder="evil@ph")


def test_redact_distributed_over_real_transcripts(ray_session):
    from email_address_parser_ray.sources.transcripts import ensure_transcripts
    from email_address_parser_ray.pipelines.resolve import read_transcripts

    root = ensure_transcripts("/root/testdata/sf0.001")
    turns = read_transcripts(f"{root}/transcripts")
    red = turns.map_batches(redact_mentions_batch, batch_format="pyarrow").materialize()
    n_mentions = (
        turns.map_batches(extract_mentions_batch, batch_format="pyarrow")
        .count()
    )
    import pyarrow.compute as pc

    total = sum(
        pc.sum(t["n_redacted"]).as_py() or 0
        for t in __import__("ray").get(red.to_arrow_refs())
    )
    assert total == n_mentions > 0
    # scrubbed corpus yields zero mentions
    assert (
        red.map_batches(
            lambda t: extract_mentions_batch(t.drop_columns(["n_redacted"])),
            batch_format="pyarrow",
        ).count()
        == 0
    )
