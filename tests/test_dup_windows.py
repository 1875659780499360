"""Cross-document duplicated-window statistics (the Lee et al.
exact-substring dedup signal at window granularity): exact agreement
with a brute-force reference, planted shared passages, clean-corpus
zeros, and partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

from email_address_parser_ray.stages.dedup import dup_window_stats

WINDOW = 4


def _ds(texts, blocks=4):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(blocks)


def _brute(texts, window=WINDOW):
    """Reference: window = tuple of k tokens (short docs fold to one
    window of all their tokens, matching word_shingles_flat's rule)."""
    def windows(t):
        toks = t.split()
        if len(toks) < window:
            return [tuple(toks)]
        return [tuple(toks[i : i + window]) for i in range(len(toks) - window + 1)]

    counts = {}
    for t in texts:
        for w in windows(t):
            counts[w] = counts.get(w, 0) + 1
    out = []
    for i, t in enumerate(texts):
        ws = windows(t)
        nd = sum(1 for w in ws if counts[w] >= 2)
        out.append((i, len(ws), nd, nd * 1_000_000 // max(len(ws), 1)))
    return out


def _corpus(seed=7, n=50):
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(400)]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(8, 25))) for _ in range(n)]
    shared = "alpha beta gamma delta epsilon zeta"
    # plant the same passage into docs 0, 1, 2; doc 3 repeats a phrase
    # internally (within-doc duplication also counts)
    texts[0] += " " + shared
    texts[1] = shared + " " + texts[1]
    texts[2] += " " + shared
    texts[3] = texts[3] + " x y z q x y z q"
    return texts


def test_dup_window_stats_matches_brute(ray_session):
    texts = _corpus()
    got = (
        dup_window_stats(_ds(texts), window=WINDOW)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _brute(texts)
    assert [tuple(r) for r in got.to_numpy()] == want
    # the planted docs actually show the signal
    by_id = {r[0]: r for r in want}
    for d in (0, 1, 2):
        assert by_id[d][2] >= 3  # the shared passage's windows
    assert by_id[3][2] >= 2      # within-doc repeat


def test_dup_window_stats_clean_corpus_zero(ray_session):
    rng = np.random.RandomState(5)
    # globally unique tokens → no window can repeat
    texts = [
        " ".join(f"u{d}_{i}" for i in range(12)) for d in range(30)
    ]
    got = dup_window_stats(_ds(texts), window=WINDOW).to_pandas()
    assert got["n_dup_windows"].sum() == 0
    assert got["dup_win_ppm"].sum() == 0
    assert len(got) == 30


def test_dup_window_stats_partition_invariant(ray_session):
    texts = _corpus(seed=13)
    a = (
        dup_window_stats(_ds(texts, blocks=1), window=WINDOW)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        dup_window_stats(_ds(texts, blocks=8), window=WINDOW)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.values.tolist() == b.values.tolist()
